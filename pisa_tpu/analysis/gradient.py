"""
Compiled multi-pipeline objectives with analytic gradients.

Builds, for a DistributionMaker (or single Pipeline), one jitted function

    rescaled_free_params -> scalar objective (and its gradient)

by composing each pipeline's traced template (see
:class:`pisa_tpu.core.template.CompiledTemplate`), summing histograms across
pipelines, applying the metric against the data distribution, and adding
prior penalties. This replaces the reference's finite-difference minimizer
steps (~2*N_params template evaluations per gradient) with a single
forward+backward XLA execution.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pisa_tpu.core.map import Map, MapSet
from pisa_tpu.core.pipeline import Pipeline
from pisa_tpu.core.template import CompiledTemplate
from pisa_tpu.units import Quantity
from pisa_tpu.utils import stats

__all__ = ["CompiledDistribution", "CompiledDetectors"]


class CompiledDistribution:
    """Jitted summed-template evaluation for a hypo maker.

    Parameters
    ----------
    hypo_maker : DistributionMaker or Pipeline
    """

    def __init__(self, hypo_maker):
        if isinstance(hypo_maker, Pipeline):
            pipelines = [hypo_maker]
            self._params = hypo_maker.params
        else:
            pipelines = list(hypo_maker.pipelines)
            self._params = hypo_maker.params
        self.hypo_maker = hypo_maker

        free = self._params.free
        self.free_names = list(free.names)
        self._free_params = list(free)

        self.templates = []
        self.index_maps = []
        for p in pipelines:
            ct = CompiledTemplate(
                p, output_binning=p.output_binning, output_key=p.output_key
            )
            self.templates.append(ct)
            self.index_maps.append(
                np.asarray(
                    [self.free_names.index(n) for n in ct.free_names],
                    dtype=np.int32,
                )
            )
        self._sum_jitted = jax.jit(self._build_sum_fn())
        self._objective_cache = {}

    # -- shared building blocks -------------------------------------------------
    def _current_bounds(self):
        """Live param-range bounds — runtime inputs, so octant/range changes
        do not recompile (cf. CompiledTemplate._current_bounds)."""
        los, his = [], []
        for p in self._free_params:
            los.append(float(p.range[0].m_as(p.units)))
            his.append(float(p.range[1].m_as(p.units)))
        return np.asarray(los), np.asarray(his)

    def _build_sum_fn(self):
        templates = self.templates
        index_maps = self.index_maps

        def fn(vec, los=None, his=None, datas=None):
            total = None
            for i, (ct, idx) in enumerate(zip(templates, index_maps)):
                if len(idx):
                    sub = vec[idx]
                    sub_lo = None if los is None else los[idx]
                    sub_hi = None if his is None else his[idx]
                else:
                    sub = jnp.zeros((0,), vec.dtype)
                    sub_lo = sub_hi = None
                data = None if datas is None else datas[i]
                out = ct._build_fn()(sub, sub_lo, sub_hi, data)
                s = None
                for h in out["hist"].values():
                    s = h if s is None else s + h
                total = s if total is None else total + s
            return total

        return fn

    def _all_data_vals(self):
        """Per-template container-data argument lists (see
        CompiledTemplate._place_container_data)."""
        return [ct._data_vals for ct in self.templates]

    def current_rescaled_values(self):
        return np.asarray(
            [p._rescaled_value for p in self._free_params], dtype=np.float64
        )

    def set_rescaled_values(self, vec):
        for p, v in zip(self._free_params, np.asarray(vec)):
            p._rescaled_value = float(np.clip(v, 0.0, 1.0))

    def sum_hist(self, vec=None):
        if vec is None:
            vec = self.current_rescaled_values()
        los, his = self._current_bounds()
        return np.asarray(
            self._sum_jitted(
                jnp.asarray(vec), jnp.asarray(los), jnp.asarray(his),
                self._all_data_vals(),
            )
        )

    def get_outputs(self, vec=None, return_sum=True):
        """MapSet of the summed template (or list per pipeline)."""
        if vec is None:
            vec = self.current_rescaled_values()
        if return_sum:
            binning = self.templates[0].output_binning
            return MapSet(
                [
                    Map(
                        name=self.hypo_maker.label or "total",
                        hist=self.sum_hist(vec),
                        binning=binning,
                    )
                ],
                name="total",
            )
        return [
            ct.get_outputs(np.asarray(vec)[idx])
            for ct, idx in zip(self.templates, self.index_maps)
        ]

    # -- objective ---------------------------------------------------------------
    def build_objective(self, data_dist, metric, priors=True, data_variance=None):
        """(value_fn, value_and_grad_fn) over the rescaled vector, summing all
        pipelines' maps into one template compared against `data_dist`
        (a MapSet whose maps are summed, a Map, or an array).

        Sign convention: always minimized (llh-family negated), matching the
        reference's ``_minimizer_callable`` (``analysis.py:2493``).

        Results are memoized per (metric, priors, data content), so repeat
        fits against the same data distribution (octant/range/staged
        strategies, test suites) reuse the already-jitted objective instead
        of recompiling."""
        key = self._objective_cache_key(data_dist, metric, priors, data_variance)
        if key is not None:
            cached = self._objective_cache.get(key)
            if cached is not None:
                return cached
        result = self._build_objective_uncached(
            data_dist, metric, priors, data_variance
        )
        if key is not None:
            self._objective_cache[key] = result
        return result

    def _objective_cache_key(self, data_dist, metric, priors, data_variance):
        try:
            parts = [metric, bool(priors)]
            for m in (data_dist if isinstance(data_dist, MapSet) else [data_dist]):
                if isinstance(m, Map):
                    parts.append(m.hist.tobytes())
                    if m.variance is not None:
                        parts.append(m.variance.tobytes())
                else:
                    parts.append(np.asarray(m).tobytes())
            if data_variance is not None:
                parts.append(np.asarray(data_variance).tobytes())
            # the content tuple itself is the key (bytes/str/bool are all
            # hashable) — collision-proof, unlike hash(tuple(parts))
            return tuple(parts)
        except Exception:
            return None

    def _build_objective_uncached(
        self, data_dist, metric, priors=True, data_variance=None
    ):
        maximize = stats.is_metric_to_maximize(metric)
        metric_fn = getattr(stats, metric)

        if isinstance(data_dist, MapSet):
            data = None
            var = None
            for m in data_dist:
                data = m.hist.ravel() if data is None else data + m.hist.ravel()
                if m.variance is not None:
                    v = m.variance.ravel()
                    var = v if var is None else var + v
            data = jnp.asarray(data)
            data_var = jnp.asarray(var) if var is not None else None
        elif isinstance(data_dist, Map):
            data = jnp.asarray(data_dist.hist.ravel())
            data_var = (
                jnp.asarray(data_dist.variance.ravel())
                if data_dist.variance is not None
                else None
            )
        else:
            data = jnp.asarray(np.asarray(data_dist).ravel())
            data_var = None
        if data_variance is not None:
            data_var = jnp.asarray(np.asarray(data_variance).ravel())

        sum_fn = self._build_sum_fn()
        free_params = self._free_params

        # daemonflux covariance switch (reference param.py:1388-1402)
        from pisa_tpu.utils.daemonflux_native import compiled_daemon_penalty

        daemon = (
            compiled_daemon_penalty(
                free_params, [t.pipeline for t in self.templates]
            )
            if priors else None
        )
        daemon_skip = daemon[0] if daemon is not None else frozenset()

        uses_variance = metric in (
            "mod_chi2",
            "correct_chi2",
            "mcllh_mean",
            "mcllh_eff",
            "barlow_llh",
            "conv_llh",
            "signed_sqrt_mod_chi2",
        )

        def objective_with_data(vec, los, his, datas=None, data_arg=None):
            # `data_arg` lets callers supply the observed histogram as a
            # runtime (batchable) input — e.g. vmapped pseudo-experiment
            # fits (analysis/device_fit.py); the closed-over Asimov
            # variance is kept for variance-based metrics.
            exp = sum_fn(vec, los, his, datas)
            d = data if data_arg is None else data_arg
            if uses_variance:
                v = data_var if data_var is not None else jnp.zeros_like(exp)
                vals = metric_fn(d, exp, v)
            else:
                vals = metric_fn(d, exp)
            total = jnp.sum(vals)

            if priors:
                # recompute magnitudes for the prior penalties
                penalty = 0.0
                mags = []
                for i, p in enumerate(free_params):
                    lo, hi = los[i], his[i]
                    if p.scales_as_log:
                        mag = (
                            jnp.exp(
                                vec[i]
                                * (jnp.log(jnp.abs(hi)) - jnp.log(jnp.abs(lo)))
                            )
                            * lo
                        )
                    else:
                        mag = lo + (hi - lo) * vec[i]
                    mags.append(mag)
                    if p.prior is None or i in daemon_skip:
                        continue
                    if p.prior.units is not None:
                        # unit conversion is a static factor: convert 1 unit
                        factor = Quantity(1.0, p.units).m_as(p.prior.units)
                        x = mag * factor
                    else:
                        x = mag
                    llh = jnp.squeeze(p.prior.llh_jax(x))
                    penalty = penalty + llh * (1.0 if maximize else -2.0)
                if daemon is not None:
                    llh = daemon[1](mags)
                    penalty = penalty + llh * (1.0 if maximize else -2.0)
                total = total + penalty

            return -total if maximize else total

        def objective(vec, los, his, datas=None):
            return objective_with_data(vec, los, his, datas)

        value_jit = jax.jit(objective)
        vg_jit = jax.jit(jax.value_and_grad(objective, argnums=0))

        def value_fn(vec):
            los, his = self._current_bounds()
            return value_jit(
                jnp.asarray(vec), jnp.asarray(los), jnp.asarray(his),
                self._all_data_vals(),
            )

        def vg_fn(vec):
            los, his = self._current_bounds()
            return vg_jit(
                jnp.asarray(vec), jnp.asarray(los), jnp.asarray(his),
                self._all_data_vals(),
            )

        # expose the un-jitted objective for composition (CompiledDetectors)
        # and the data-as-argument form for on-device batched fits
        value_fn.raw = objective
        value_fn.raw_with_data = objective_with_data
        vg_fn.raw = objective
        vg_fn.raw_with_data = objective_with_data
        return value_fn, vg_fn


class CompiledDetectors:
    """Jitted joint objective over several detectors (cf. reference
    per-detector metric sums, ``analysis.py:2591-2601``): one
    :class:`CompiledDistribution` per detector, composed into a single
    differentiable function of the JOINT free-param vector (shared params
    fan out by indexing; suffixed detector-private params route to their
    detector)."""

    def __init__(self, detectors):
        self.hypo_maker = detectors
        self._cds = [
            CompiledDistribution(dm) for dm in detectors.distribution_makers
        ]
        joint_free = detectors.params.free
        self.free_names = list(joint_free.names)
        self._free_params = list(joint_free)

        self.index_maps = []
        for dm, det_name in zip(
            detectors.distribution_makers, detectors.det_names
        ):
            idxs = []
            for n in dm.params.free.names:
                # detector-private name collisions are suffixed in the joint
                # set; prefer the suffixed slot so a later detector's param
                # does not alias the first detector's bare-named one
                if f"{n}_{det_name}" in self.free_names:
                    idxs.append(self.free_names.index(f"{n}_{det_name}"))
                elif n in self.free_names:
                    idxs.append(self.free_names.index(n))
                else:
                    raise ValueError(
                        f"cannot locate {n!r} of detector {det_name!r} in"
                        " the joint free params"
                    )
            self.index_maps.append(np.asarray(idxs, dtype=np.int32))
        self._objective_cache = {}

    def current_rescaled_values(self):
        return np.asarray(
            [p._rescaled_value for p in self._free_params], dtype=np.float64
        )

    def _current_bounds(self):
        los, his = [], []
        for p in self._free_params:
            los.append(float(p.range[0].m_as(p.units)))
            his.append(float(p.range[1].m_as(p.units)))
        return np.asarray(los), np.asarray(his)

    def _all_data_vals(self):
        """Per-detector nested container-data argument lists (the `datass`
        runtime input of the joint objective)."""
        return [cd._all_data_vals() for cd in self._cds]

    def build_objective(self, data_dists, metric, priors=True):
        """(value_fn, value_and_grad_fn) of the joint rescaled vector.
        `data_dists` is the per-detector list of MapSets. Memoized per
        (metric, priors, data content) like
        :meth:`CompiledDistribution.build_objective`."""
        if not isinstance(data_dists, (list, tuple)):
            raise ValueError(
                "Detectors objectives need a per-detector list of data"
                " distributions"
            )
        try:
            parts = [metric, bool(priors)]
            for ds in data_dists:
                for m in (ds if isinstance(ds, MapSet) else [ds]):
                    if isinstance(m, Map):
                        parts.append(m.hist.tobytes())
                        # variance matters for variance-based metrics
                        # (mod_chi2 etc.) — mirror CompiledDistribution's key
                        if m.variance is not None:
                            parts.append(m.variance.tobytes())
                        else:
                            parts.append(None)
                    else:
                        parts.append(np.asarray(m).tobytes())
            # content tuple as key: collision-proof (cf.
            # CompiledDistribution._objective_cache_key)
            key = tuple(parts)
        except Exception:
            key = None
        if key is not None and key in self._objective_cache:
            return self._objective_cache[key]
        maximize = stats.is_metric_to_maximize(metric)

        # per-detector raw objectives WITHOUT priors (joint priors below
        # avoid double-counting shared params)
        raws = []
        for cd, data in zip(self._cds, data_dists):
            value_fn, _ = cd.build_objective(data, metric, priors=False)
            raws.append(value_fn.raw)

        free_params = self._free_params
        index_maps = self.index_maps

        # daemonflux covariance switch (reference param.py:1388-1402);
        # searched across all detectors' pipelines
        from pisa_tpu.utils.daemonflux_native import compiled_daemon_penalty

        daemon = (
            compiled_daemon_penalty(
                free_params,
                [t.pipeline for cd in self._cds for t in cd.templates],
            )
            if priors else None
        )
        daemon_skip = daemon[0] if daemon is not None else frozenset()

        def objective(vec, los, his, datass=None):
            total = 0.0
            for d, (raw, idx) in enumerate(zip(raws, index_maps)):
                datas = None if datass is None else datass[d]
                total = total + raw(vec[idx], los[idx], his[idx], datas)
            if priors:
                penalty = 0.0
                mags = []
                for i, p in enumerate(free_params):
                    lo, hi = los[i], his[i]
                    if p.scales_as_log:
                        mag = jnp.exp(
                            vec[i]
                            * (jnp.log(jnp.abs(hi)) - jnp.log(jnp.abs(lo)))
                        ) * lo
                    else:
                        mag = lo + (hi - lo) * vec[i]
                    mags.append(mag)
                    if p.prior is None or i in daemon_skip:
                        continue
                    if p.prior.units is not None:
                        mag = mag * Quantity(1.0, p.units).m_as(
                            p.prior.units
                        )
                    llh = jnp.squeeze(p.prior.llh_jax(mag))
                    penalty = penalty + llh * (1.0 if maximize else -2.0)
                if daemon is not None:
                    llh = daemon[1](mags)
                    penalty = penalty + llh * (1.0 if maximize else -2.0)
                # raw objectives are already sign-flipped for minimization
                total = total + (-penalty if maximize else penalty)
            return total

        value_jit = jax.jit(objective)
        vg_jit = jax.jit(jax.value_and_grad(objective, argnums=0))

        def _datass(self=self):
            return [cd._all_data_vals() for cd in self._cds]

        def value_fn(vec):
            los, his = self._current_bounds()
            return value_jit(
                jnp.asarray(vec), jnp.asarray(los), jnp.asarray(his),
                _datass(),
            )

        def vg_fn(vec):
            los, his = self._current_bounds()
            return vg_jit(
                jnp.asarray(vec), jnp.asarray(los), jnp.asarray(his),
                _datass(),
            )

        value_fn.raw = objective
        vg_fn.raw = objective
        if key is not None:
            self._objective_cache[key] = (value_fn, vg_fn)
        return value_fn, vg_fn
