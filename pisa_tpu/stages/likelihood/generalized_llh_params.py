"""
Precompute the per-bin inputs of the generalized Poisson-gamma likelihood
(cf. reference ``pisa/stages/likelihood/generalized_llh_params.py:59``):
per-bin MC-event counts, mean adjustment, empty-bin pseudo-weight filling
(strategy #2 of 1902.08831), and the alpha/beta mixture parameters.

TPU-first redesign: the reference loops over bins with per-bin boolean
masks; here every per-bin statistic is a ``segment_sum`` over the per-event
'bin_indices' array (from ``utils.add_indices``), fully vectorized and
differentiable w.r.t. the event weights — so generalized-llh fits get
analytic gradients through alpha/beta.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.ops import segment_sum

from pisa_tpu import FTYPE
from pisa_tpu.core.binning import MultiDimBinning
from pisa_tpu.core.stage import Stage

__all__ = ["generalized_llh_params", "init_test"]

PSEUDO_WEIGHT = 0.001


class generalized_llh_params(Stage):  # noqa: N801
    """Adds llh_alphas, llh_betas, n_mc_events; replaces binned weights by
    the pseudo-weight-filled sums."""

    def __init__(self, **std_kwargs):
        if not isinstance(std_kwargs.get("apply_mode"), MultiDimBinning):
            raise ValueError(
                "generalized_llh_params requires a binning as apply_mode"
            )
        super().__init__(
            expected_params=(),
            expected_container_keys=("weights", "bin_indices"),
            supported_reps={"apply_mode": [MultiDimBinning]},
            **std_kwargs,
        )

    def setup_function(self):
        n_bins = self.apply_mode.size

        self.data.representation = self.apply_mode
        for container in self.data:
            container["llh_alphas"] = np.empty(container.size, dtype=FTYPE)
            container["llh_betas"] = np.empty(container.size, dtype=FTYPE)
            container["n_mc_events"] = np.empty(container.size, dtype=FTYPE)
            container["old_sum"] = np.empty(container.size, dtype=FTYPE)

            # per-bin MC event counts (static): segment count of bin indices
            self.data.representation = "events"
            idx = np.asarray(container["bin_indices"])
            in_range = (idx >= 0) & (idx < n_bins)
            kfold = (
                np.asarray(container["kfold_mask"]).astype(bool)
                if "kfold_mask" in container.keys
                else np.ones(idx.shape, dtype=bool)
            )
            counts = np.bincount(
                idx[in_range & kfold], minlength=n_bins
            ).astype(FTYPE)

            self.data.representation = self.apply_mode
            container["n_mc_events"] = counts
            container.mark_changed("n_mc_events")

            # mean adjustment (cf. reference :140-147)
            mean_n = float(np.mean(counts))
            mean_adjustment = (
                -(1.0 - mean_n) + 1.0e-3 if mean_n < 1.0 else 0.0
            )
            container.set_aux_data("mean_adjustment", mean_adjustment)
            container.set_aux_data("pseudo_weight", PSEUDO_WEIGHT)

    def apply_function(self):
        n_bins = self.apply_mode.size

        for container in self.data:
            self.data.representation = self.apply_mode
            n_mc = jnp.asarray(container["n_mc_events"])

            self.data.representation = "events"
            idx = jnp.asarray(container["bin_indices"])
            w = jnp.asarray(container["weights"])
            if "kfold_mask" in container.keys:
                w = w * jnp.asarray(container["kfold_mask"])

            in_range = (idx >= 0) & (idx < n_bins)
            seg = jnp.where(in_range, idx, n_bins)  # overflow slot dropped
            w_in = jnp.where(in_range, w, 0.0)

            sum_w = segment_sum(w_in, seg, num_segments=n_bins + 1)[:n_bins]
            sum_w2 = segment_sum(
                w_in * w_in, seg, num_segments=n_bins + 1
            )[:n_bins]

            mean_adjustment = container["mean_adjustment"]
            pseudo_weight = container["pseudo_weight"]

            empty = n_mc == 0
            n_eff = jnp.where(empty, 1.0, n_mc)
            # empty-bin strategy #2: one pseudo-weight event
            sum_w_f = jnp.where(empty, pseudo_weight, sum_w)
            sum_w2_f = jnp.where(empty, pseudo_weight**2, sum_w2)

            mean_w = sum_w_f / n_eff
            # population variance of the weights (cf. reference :228-230)
            var_w = jnp.clip(sum_w2_f / n_eff - mean_w**2, 0.0, None)
            var_z = var_w + mean_w**2

            beta = jnp.where(var_z != 0, mean_w / var_z, 1.0)
            trad_alpha = jnp.where(
                var_z != 0, mean_w**2 / var_z, PSEUDO_WEIGHT
            )
            alpha = (n_eff + mean_adjustment) * trad_alpha

            self.data.representation = self.apply_mode
            container["llh_alphas"] = alpha
            container["llh_betas"] = beta
            container["old_sum"] = sum_w
            container["weights"] = sum_w_f
            for key in ("llh_alphas", "llh_betas", "old_sum", "weights"):
                container.mark_changed(key)


def init_test(**param_kwargs):
    """Instantiation example."""
    from pisa_tpu import ureg
    from pisa_tpu.core.binning import OneDimBinning

    binning = MultiDimBinning(
        [
            OneDimBinning(
                "true_energy", num_bins=5, is_log=True,
                domain=[1, 100] * ureg.GeV,
            )
        ],
        name="test",
    )
    return generalized_llh_params(apply_mode=binning, calc_mode="events")
