"""
KDE-smoothed mapping of events into binned space (cf. reference
``pisa/stages/utils/kde.py:18``): replaces the scatter-add histogram by an
adaptive Gaussian KDE evaluated at bin centers, with coszen-edge reflection,
log-dimension linearization, per-PID stacking, stashed-histogram caching and
bootstrap errors.
"""

from __future__ import annotations

from copy import deepcopy
from time import time

import numpy as np

from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils import kde as kde_hist
from pisa_tpu.utils.log import logging

__all__ = ["kde", "init_test"]


class kde(Stage):  # noqa: N801
    """See module docstring; parameters as in the reference (kde.py:18-48)."""

    def __init__(
        self,
        bw_method="silverman",
        coszen_name="reco_coszen",
        oversample=10,
        coszen_reflection=0.25,
        adaptive=True,
        alpha=0.1,
        stack_pid=True,
        stash_hists=False,
        bootstrap=False,
        bootstrap_niter=10,
        bootstrap_seed=None,
        linearize_log_dims=True,
        **std_kwargs,
    ):
        self.bw_method = bw_method
        self.coszen_name = coszen_name
        self.oversample = int(oversample)
        self.coszen_reflection = float(coszen_reflection)
        self.adaptive = adaptive
        self.alpha = float(alpha)
        self.stack_pid = stack_pid
        self.stash_hists = stash_hists
        self.stash_valid = False
        self.bootstrap = bootstrap
        self.bootstrap_niter = int(bootstrap_niter)
        self.bootstrap_seed = (
            int(bootstrap_seed) if bootstrap_seed is not None else None
        )
        self.linearize_log_dims = linearize_log_dims
        if stash_hists:
            self.stashed_hists = None
            self.stashed_errors = None

        super().__init__(
            expected_params=(),
            expected_container_keys=("weights",),
            supported_reps={
                "calc_mode": ["events"],
                "apply_mode": [MultiDimBinning],
            },
            **std_kwargs,
        )
        self.regularized_apply_mode = None

    def setup_function(self):
        """Replace log dimensions by linear binnings of the log of the
        variable (cf. reference kde.py:109-137)."""
        if not self.linearize_log_dims:
            self.regularized_apply_mode = self.apply_mode
            return
        dimensions = []
        for dim in self.apply_mode:
            if dim.is_lin:
                new_dim = deepcopy(dim)
            elif dim.is_irregular:
                new_dim = OneDimBinning(
                    dim.name, bin_edges=np.log(dim.bin_edges.magnitude)
                )
            else:
                new_dim = OneDimBinning(
                    dim.name,
                    domain=np.log(np.asarray(dim.domain.magnitude)),
                    num_bins=dim.num_bins,
                )
            dimensions.append(new_dim)
        self.regularized_apply_mode = MultiDimBinning(
            dimensions, name=self.apply_mode.name
        )

    # stacked-container support: the KDE math is a pure jnp map of
    # (sample, weights) -> binned density (utils/kde.py), so the stacked
    # (C, n_pad) event block evaluates as ONE vmap over the category axis —
    # 12 per-category KDE chains collapse into one batched kernel. NaN
    # padding slots carry exactly-zero weights, which the KDE already
    # treats as absent (weight-zeroing channel selection + the w>0
    # coordinate sanitization in adaptive_gaussian_kde). The host-side
    # stash/bootstrap paths keep the per-container route.
    def stacked_ok(self):
        return not self.bootstrap and not self.stash_hists

    def _apply_stacked(self, container):
        import jax
        import jax.numpy as jnp

        from pisa_tpu.utils import kde as kde_hist_mod

        container.representation = "events"
        dims_log = [d.is_log for d in self.apply_mode]
        cols = []
        for dim, is_log in zip(self.regularized_apply_mode, dims_log):
            vals = jnp.asarray(container[dim.name])  # (C, n_pad)
            if is_log and self.linearize_log_dims:
                vals = jnp.log(vals)
            cols.append(vals)
        sample = jnp.stack(cols, axis=-1)  # (C, n_pad, D)
        weights = jnp.asarray(container["weights"])  # (C, n_pad)

        kde_kwargs = dict(
            binning=self.regularized_apply_mode,
            bw_method=self.bw_method,
            coszen_name=self.coszen_name,
            coszen_reflection=self.coszen_reflection,
            adaptive=self.adaptive,
            alpha=self.alpha,
            oversample=self.oversample,
            stack_pid=self.stack_pid,
        )

        def one(s, w):
            return kde_hist_mod.kde_histogramdd(
                sample=s, weights=w, **kde_kwargs
            )

        kde_maps = jax.vmap(one)(sample, weights)  # (C,) + binning.shape
        container.representation = self.apply_mode
        container["weights"] = kde_maps.reshape(
            container.n_cats, self.apply_mode.size
        )

    def apply(self):
        # override: the KDE consumes actual event weights, no representation
        # auto-switch beforehand (cf. reference kde.py:139-152)
        if self.profile:
            t0 = time()
            self.apply_function()
            self.apply_times.append(time() - t0)
        else:
            self.apply_function()

    def apply_function(self):
        import jax
        import jax.numpy as jnp

        try:  # public alias removed in jax 0.9; same symbol
            from jax.core import trace_state_clean
        except ImportError:
            from jax._src.core import trace_state_clean

        # stash_hists caches concrete numpy histograms across calls; under
        # tracing (compiled template, core/template.py) that either crashes
        # on np.asarray(tracer) or — worse — silently bakes a stale numpy
        # stash into the compiled program as a constant. Refuse clearly.
        if self.stash_hists and not trace_state_clean():
            raise TypeError(
                "kde stage: stash_hists=True cannot run inside a compiled"
                " template (the stash would bake traced histograms into"
                " stale constants); set stash_hists=False or run the"
                " pipeline eagerly"
            )

        for container in self.data:
            if getattr(container, "is_stacked", False):
                self._apply_stacked(container)
                continue
            if self.stash_valid:
                self.data.representation = self.apply_mode
                container["weights"] = self.stashed_hists[
                    container.name
                ].copy()
                if self.bootstrap:
                    container["errors"] = self.stashed_errors[
                        container.name
                    ].copy()
                continue

            container.representation = "events"
            dims_log = [d.is_log for d in self.apply_mode]
            sample = []
            for dim, is_log in zip(self.regularized_apply_mode, dims_log):
                # jnp end-to-end: event coordinates and weights may be JAX
                # tracers when the stage runs inside a compiled template
                # (core/template.py) — the KDE math is tracer-safe
                vals = jnp.asarray(container[dim.name])
                if is_log and self.linearize_log_dims:
                    vals = jnp.log(vals)
                sample.append(vals)
            sample = jnp.stack(sample).T
            weights = jnp.asarray(container["weights"])
            if self.bootstrap:
                sample = np.asarray(sample, dtype=np.float64)
                weights = np.asarray(weights, dtype=np.float64)

            kde_kwargs = dict(
                sample=sample,
                binning=self.regularized_apply_mode,
                bw_method=self.bw_method,
                coszen_name=self.coszen_name,
                coszen_reflection=self.coszen_reflection,
                adaptive=self.adaptive,
                alpha=self.alpha,
                oversample=self.oversample,
                stack_pid=self.stack_pid,
            )

            if self.bootstrap:
                rng = np.random.default_rng(self.bootstrap_seed)
                n = container.size
                maps = []
                for _ in range(self.bootstrap_niter):
                    idx = rng.integers(n, size=n)
                    counts = np.bincount(idx, minlength=n)
                    maps.append(
                        kde_hist.kde_histogramdd(
                            weights=weights * counts, **kde_kwargs
                        )
                    )
                maps = np.stack(maps)
                kde_map = maps.mean(axis=0).ravel()
                kde_errors = maps.std(axis=0).ravel()
            else:
                kde_map = kde_hist.kde_histogramdd(
                    weights=weights, **kde_kwargs
                ).ravel()

            self.data.representation = self.apply_mode
            container["weights"] = kde_map
            if self.bootstrap:
                container["errors"] = np.ascontiguousarray(kde_errors)

            if self.stash_hists:
                if self.stashed_hists is None:
                    self.stashed_hists = {}
                    self.stashed_errors = {}
                self.stashed_hists[container.name] = np.asarray(
                    kde_map
                ).copy()
                if self.bootstrap:
                    self.stashed_errors[container.name] = kde_errors.copy()

        self.stash_valid = self.stash_hists


def init_test(**param_kwargs):
    """Instantiation example."""
    from pisa_tpu import ureg

    binning = MultiDimBinning(
        [
            OneDimBinning(
                "reco_energy", num_bins=5, is_log=True,
                domain=[1, 100] * ureg.GeV,
            ),
            OneDimBinning(
                "reco_coszen", num_bins=5, is_lin=True, domain=[-1, 1]
            ),
        ],
        name="kde_test",
    )
    return kde(
        calc_mode="events", apply_mode=binning, stack_pid=False, oversample=2
    )
