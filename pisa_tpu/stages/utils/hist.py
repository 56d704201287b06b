"""
Histogramming stage (cf. reference ``pisa/stages/utils/hist.py:17``):
converts per-event weights into binned weights under the output binning,
or re-bins binned weights via a precomputed transform matrix.

TPU-first: events->binned uses the scatter-add histogram kernel directly
(one uniform path — no regularized/log special-casing needed); the
binned->binned path keeps the reference's ``hist_transform`` matmul, which
maps perfectly onto the MXU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pisa_tpu.core.binning import MultiDimBinning
from pisa_tpu.core.stage import Stage
from pisa_tpu.core import translation

__all__ = ["hist", "init_test"]


class hist(Stage):  # noqa: N801
    """Parameters: unweighted (bool), apply_unc_weights (bool)."""

    def __init__(self, apply_unc_weights=False, unweighted=False, **std_kwargs):
        expected_container_keys = ["weights"]
        if apply_unc_weights:
            expected_container_keys.append("unc_weights")
        super().__init__(
            expected_params=(),
            expected_container_keys=tuple(expected_container_keys),
            supported_reps={
                "calc_mode": [MultiDimBinning, "events"],
                "apply_mode": [None, MultiDimBinning],
            },
            **std_kwargs,
        )
        self.apply_unc_weights = apply_unc_weights
        self.unweighted = unweighted
        self._binning_spec = None

    def setup_function(self):
        if self.apply_mode is None:
            self.apply_mode = self.data["output_binning"]
        self._binning_spec = translation.binning_to_spec(self.apply_mode)

        if isinstance(self.calc_mode, MultiDimBinning):
            # binned->binned: precompute the (calc_size, apply_size) transform
            # as an unweighted 2-binning joint histogram of the events
            # (cf. reference hist.py:95-160); applied as a matmul (MXU)
            if set(self.calc_mode.names) & set(self.apply_mode.names):
                raise ValueError(
                    "calc and apply binnings must use disjoint dimensions"
                )
            transform_binning = self.calc_mode * self.apply_mode
            for container in self.data:
                self.data.representation = "events"
                sample = [
                    container[name] for name in transform_binning.names
                ]
                h = translation.histogram(
                    sample, None, transform_binning, averaged=False
                )
                transform = np.asarray(h).reshape(
                    (self.calc_mode.size, self.apply_mode.size)
                )
                self.data.representation = self.calc_mode
                container["hist_transform"] = transform
        else:
            # events->binned: precompute the dense one-hot bin-membership
            # matrix per container while coordinates are concrete, so the
            # per-template histogram is one MXU matmul (the scatter-add
            # remains the fallback when the matrix is unavailable)
            self.data.representation = "events"
            for container in self.data:
                container.cached_hist_matrix(self.apply_mode)

    # stacked-container support: events->binned only (the binned->binned
    # transform path keeps per-container matrices)
    def stacked_ok(self):
        return not isinstance(self.calc_mode, MultiDimBinning)

    def prepare_stacked(self, data):
        # build the stacked one-hot membership matrix while coordinates are
        # concrete so the per-template histogram is ONE batched matmul
        if isinstance(self.calc_mode, MultiDimBinning):
            return
        if self.apply_mode is None:
            self.apply_mode = data["output_binning"]
        for container in data.containers:
            if getattr(container, "is_stacked", False):
                prev = container.representation
                container.representation = "events"
                try:
                    container.cached_hist_matrix(self.apply_mode)
                finally:
                    container.representation = prev

    def _apply_stacked(self, container):
        """All categories histogrammed in one batched op: (C, n) weights x
        (C, n, size) one-hot -> (C, size) (with the sumw2 channels stacked
        into the same matmul, as in the per-container path)."""
        container.representation = "events"
        weights = container["weights"]
        if "astro_weights" in container.keys:
            weights = weights + container["astro_weights"]
        if self.unweighted:
            # padded slots carry the out-of-range index sentinel, so their
            # unit weights drop out of the histogram like any OOR event
            weights = jnp.ones_like(weights)
        if self.apply_unc_weights:
            unc = container["unc_weights"]
        else:
            unc = 1.0
        w = unc * weights
        if self.error_method == "sumw2":
            chans = jnp.stack(
                [
                    w,
                    jnp.square(w),
                    jnp.square(unc) * weights
                    if self.apply_unc_weights
                    else w,
                ],
                axis=-1,
            )
            res = container.stacked_histogram(chans, self.apply_mode)
            hist_w, sumw2, bin_unc2 = res[..., 0], res[..., 1], res[..., 2]
        else:
            hist_w = container.stacked_histogram(w, self.apply_mode)
        container.representation = self.apply_mode
        container["weights"] = hist_w
        # histogramming does not invalidate the events representation
        container.validity["weights"][hash("events")] = True
        if self.error_method == "sumw2":
            container["errors"] = jnp.sqrt(sumw2)
            container["bin_unc2"] = bin_unc2

    def apply_function(self):
        if isinstance(self.calc_mode, MultiDimBinning):
            if self.unweighted:
                raise NotImplementedError(
                    "unweighted only implemented for event-wise calc"
                )
            for container in self.data:
                container.representation = self.calc_mode
                weights = container["weights"]
                if "astro_weights" in container.keys:
                    weights = weights + container["astro_weights"]
                if self.apply_unc_weights:
                    unc = container["unc_weights"]
                else:
                    unc = 1.0
                w = unc * weights
                transform = container["hist_transform"]
                hi = jax.lax.Precision.HIGHEST
                hist_w = jnp.matmul(w, transform, precision=hi)
                if self.error_method == "sumw2":
                    sumw2 = jnp.matmul(jnp.square(w), transform, precision=hi)
                    bin_unc2 = jnp.matmul(
                        jnp.square(unc) * weights
                        if self.apply_unc_weights
                        else w,
                        transform,
                        precision=hi,
                    )
                container.representation = self.apply_mode
                container["weights"] = hist_w
                if self.error_method == "sumw2":
                    container["errors"] = jnp.sqrt(sumw2)
                    container["bin_unc2"] = bin_unc2
        else:
            for container in self.data:
                if getattr(container, "is_stacked", False):
                    self._apply_stacked(container)
                    continue
                container.representation = "events"
                sample = [
                    container[name] for name in self.apply_mode.names
                ]
                weights = container["weights"]
                if "astro_weights" in container.keys:
                    weights = weights + container["astro_weights"]
                if self.unweighted:
                    weights = jnp.ones_like(weights)
                if self.apply_unc_weights:
                    unc = container["unc_weights"]
                else:
                    unc = 1.0
                w = unc * weights
                # MXU path: all weight channels histogrammed in ONE dense
                # matmul against the cached one-hot membership matrix (one
                # HBM read of the matrix per template)
                matrix = container.cached_hist_matrix(self.apply_mode)
                if matrix is not None:
                    if self.error_method == "sumw2":
                        chans = jnp.stack(
                            [
                                w,
                                jnp.square(w),
                                jnp.square(unc) * weights
                                if self.apply_unc_weights
                                else w,
                            ],
                            axis=-1,
                        )
                        res = translation.histogram_matmul(chans, matrix)
                        hist_w, sumw2, bin_unc2 = res[:, 0], res[:, 1], res[:, 2]
                    else:
                        hist_w = translation.histogram_matmul(w, matrix)
                else:
                    # param-independent bin indices: cached across template
                    # evaluations (None during a cold-cache trace -> inline)
                    idx = container.cached_flat_indices(self.apply_mode)
                    hist_w = translation.histogram(
                        sample, w, self._binning_spec, averaged=False, idx=idx
                    )
                    if self.error_method == "sumw2":
                        sumw2 = translation.histogram(
                            sample, jnp.square(w), self._binning_spec,
                            averaged=False, idx=idx,
                        )
                        bin_unc2 = translation.histogram(
                            sample,
                            jnp.square(unc) * weights
                            if self.apply_unc_weights
                            else w,
                            self._binning_spec,
                            averaged=False,
                            idx=idx,
                        )
                container.representation = self.apply_mode
                container["weights"] = hist_w
                # histogramming does not invalidate the events representation
                container.validity["weights"][hash("events")] = True
                if self.error_method == "sumw2":
                    container["errors"] = jnp.sqrt(sumw2)
                    container["bin_unc2"] = bin_unc2


def init_test(**param_kwargs):
    """Instantiation example."""
    return hist(calc_mode="events")
