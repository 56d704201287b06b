"""
Barr-style flux-systematics stage (cf. reference
``pisa/stages/flux/barr_simple.py``): applies nue/numu ratio, nu/nubar
ratio, spectral-index tilt, and Barr up/hor + nu/nubar parameterized
modifications to the nominal (nue, numu) flux pair per event.

The per-event gufunc of the reference becomes one fused jnp expression per
container (vectorized over events/grid points); `nubar` is a static per-
container constant so both signs specialize at trace time.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.ops.flux import barr

# standard flavor/interaction container vocabulary (same linking groups as
# osc.prob3; kept local to avoid a flux -> osc module dependency)
_NU_FLAVS = [
    "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
]
_NUBAR_FLAVS = [
    "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
    "nutaubar_nc",
]

__all__ = ["barr_simple", "init_test"]

_EGY_PIVOT = 24.0900951261  # GeV (cf. reference barr_simple.py)


def _apply_ratio_scale_sum_constant(ratio_scale, in1, in2):
    """Scale the in1/in2 ratio keeping in1+in2 fixed; (0,0) stays (0,0)
    (cf. reference ``apply_ratio_scale``)."""
    denom = jnp.where(in2 != 0, in2, 1.0)
    orig_ratio = in1 / denom
    orig_sum = in1 + in2
    new2 = orig_sum / (1.0 + ratio_scale * orig_ratio)
    new1 = ratio_scale * orig_ratio * new2
    both_zero = (in1 == 0) & (in2 == 0)
    return (
        jnp.where(both_zero, 0.0, new1),
        jnp.where(both_zero, 0.0, new2),
    )


class barr_simple(Stage):  # noqa: N801
    """Params: nue_numu_ratio, nu_nubar_ratio, delta_index, Barr_uphor_ratio,
    Barr_nu_nubar_ratio."""

    def __init__(self, **std_kwargs):
        super().__init__(
            expected_params=(
                "nue_numu_ratio",
                "nu_nubar_ratio",
                "delta_index",
                "Barr_uphor_ratio",
                "Barr_nu_nubar_ratio",
            ),
            expected_container_keys=(
                "true_energy",
                "true_coszen",
                "nu_flux_nominal",
                "nubar_flux_nominal",
                "nubar",
            ),
            **std_kwargs,
        )

    # stacked-container support: in grid (map) calc mode the grid is shared
    # across categories and the modified flux depends only on the nubar
    # sign, so ONE two-row chain serves all categories; in events calc mode
    # the (C, n_pad) coordinate arrays vectorize the same math with a
    # per-category (C, 1) nubar sign select (see pisa_tpu/core/stacking.py)
    supports_stacked = True

    # writes nu_flux only; never touches event weights
    stacked_rate_defer_safe = True

    def prepare_stacked(self, data):
        """Precompute the parameter-free Barr modification fields on the
        (concrete) calc sample — grid or stacked events — so the
        per-template program does only rational ops (see the 'factored
        forms' note in pisa_tpu/ops/flux/barr.py); the full-field evaluation
        cannot constant-fold because the coordinates enter compiled
        templates as device ARGUMENTS. In stacked events mode the NaN
        padding slots are sanitized here (concrete isnan mask), so the
        traced program's parameter-dependent math never touches a NaN —
        otherwise 0-weighted pad slots would still poison parameter
        GRADIENTS through 0 * NaN cotangent products."""
        for container in data.containers:
            if not getattr(container, "is_stacked", False):
                continue
            prev = container.representation
            container.representation = self.calc_mode
            try:
                energy = np.asarray(container["true_energy"], dtype=float)
                coszen = np.asarray(container["true_coszen"], dtype=float)
                invalid = np.isnan(energy) | np.isnan(coszen)
                if invalid.any():
                    energy = np.where(invalid, 1.0, energy)
                    coszen = np.where(invalid, 0.0, coszen)
                energy = jnp.asarray(energy)
                coszen = jnp.asarray(coszen)
                container["barr_nubar_field_e"] = barr.nubar_mod_field(
                    0, energy, coszen
                )
                container["barr_nubar_field_mu"] = barr.nubar_mod_field(
                    1, energy, coszen
                )
                container["barr_uphor_field_e"] = barr.uphor_mod_field(
                    0, energy, coszen
                )
                container["barr_log_e_pivot"] = jnp.log(energy / _EGY_PIVOT)
            finally:
                container.representation = prev

    def _compute_stacked(self, container, params):
        """Grid-mode stacked path: one chain producing the (2, ngrid, 2)
        nu/nubar flux pair, with rows mapping each category to its sign.
        Halves the linked path's work too: the per-sign intermediates are
        shared instead of recomputed per linked group."""
        (nue_numu_ratio, nu_nubar_ratio, delta_index, uphor, barr_nubar) = (
            params
        )
        energy = jnp.asarray(container["true_energy"])
        coszen = jnp.asarray(container["true_coszen"])
        nu_flux = jnp.asarray(container["nu_flux_nominal"])
        nubar_flux = jnp.asarray(container["nubar_flux_nominal"])
        if nu_flux.ndim != 2:
            raise ValueError(
                "stacked barr_simple expects a shared nominal flux on the"
                f" calc grid; got shape {nu_flux.shape}"
            )

        nu_e, nu_mu = _apply_ratio_scale_sum_constant(
            nue_numu_ratio, nu_flux[:, 0], nu_flux[:, 1]
        )
        nub_e, nub_mu = _apply_ratio_scale_sum_constant(
            nue_numu_ratio, nubar_flux[:, 0], nubar_flux[:, 1]
        )
        if "barr_log_e_pivot" in container:
            idx_scale = barr.spectral_index_scale_from_log(
                container["barr_log_e_pivot"], delta_index
            )
        else:
            idx_scale = barr.spectral_index_scale(
                energy, _EGY_PIVOT, delta_index
            )
        nu_e, nu_mu = nu_e * idx_scale, nu_mu * idx_scale
        nub_e, nub_mu = nub_e * idx_scale, nub_mu * idx_scale
        e_nu, e_nub = _apply_ratio_scale_sum_constant(
            nu_nubar_ratio, nu_e, nub_e
        )
        mu_nu, mu_nub = _apply_ratio_scale_sum_constant(
            nu_nubar_ratio, nu_mu, nub_mu
        )

        precomputed = "barr_nubar_field_e" in container
        if precomputed:
            field_e = container["barr_nubar_field_e"]
            field_mu = container["barr_nubar_field_mu"]
            uphor_e = barr.mod_ratio_uphor_from_field(
                container["barr_uphor_field_e"], uphor
            )
        out_rows = []
        for nubar, out_e, out_mu in ((1, e_nu, mu_nu), (-1, e_nub, mu_nub)):
            if precomputed:
                oe = out_e * barr.mod_ratio_nubar_from_field(
                    nubar, field_e, barr_nubar
                )
                om = out_mu * barr.mod_ratio_nubar_from_field(
                    nubar, field_mu, barr_nubar
                )
                oe = oe * uphor_e
            else:
                oe = out_e * barr.mod_ratio_nubar(
                    nubar, 0, energy, coszen, barr_nubar
                )
                om = out_mu * barr.mod_ratio_nubar(
                    nubar, 1, energy, coszen, barr_nubar
                )
                oe = oe * barr.mod_ratio_uphor(0, energy, coszen, uphor)
                om = om * barr.mod_ratio_uphor(1, energy, coszen, uphor)
            out_rows.append(jnp.stack([oe, om], axis=1))

        rows = (np.asarray(container.cat_aux("nubar")) < 0).astype(np.int32)
        container.set_stacked("nu_flux", jnp.stack(out_rows), rows=rows)

    def _compute_stacked_events(self, container, params):
        """Events-calc stacked path: the per-event gufunc of the reference
        (``pisa/stages/flux/barr_simple.py:146-246``) vectorized over the
        whole (C, n_pad) category-stacked event block, with the per-category
        nubar sign as a (C, 1) broadcast select instead of a static
        per-container constant. NaN padding slots are guarded by sanitizing
        the coordinate INPUTS (not the outputs): a padded slot's weight is
        exactly 0, but an unsanitized NaN would still reach parameter
        gradients through 0 * NaN cotangent products."""
        (nue_numu_ratio, nu_nubar_ratio, delta_index, uphor, barr_nubar) = (
            params
        )
        energy = jnp.asarray(container["true_energy"])  # (C, n_pad)
        coszen = jnp.asarray(container["true_coszen"])
        nu_flux = jnp.asarray(container["nu_flux_nominal"])  # (C, n_pad, 2)
        nubar_flux = jnp.asarray(container["nubar_flux_nominal"])
        sign = jnp.asarray(
            np.asarray(container.cat_aux("nubar"), dtype=float)[:, None],
            dtype=energy.dtype,
        )  # (C, 1)

        precomputed = "barr_log_e_pivot" in container
        if not precomputed:
            # sanitize pads inline (prepare_stacked normally did it)
            valid = ~(jnp.isnan(energy) | jnp.isnan(coszen))
            energy = jnp.where(valid, energy, 1.0)
            coszen = jnp.where(valid, coszen, 0.0)

        nu_e, nu_mu = _apply_ratio_scale_sum_constant(
            nue_numu_ratio, nu_flux[..., 0], nu_flux[..., 1]
        )
        nub_e, nub_mu = _apply_ratio_scale_sum_constant(
            nue_numu_ratio, nubar_flux[..., 0], nubar_flux[..., 1]
        )
        if precomputed:
            idx_scale = barr.spectral_index_scale_from_log(
                container["barr_log_e_pivot"], delta_index
            )
        else:
            idx_scale = barr.spectral_index_scale(
                energy, _EGY_PIVOT, delta_index
            )
        nu_e, nu_mu = nu_e * idx_scale, nu_mu * idx_scale
        nub_e, nub_mu = nub_e * idx_scale, nub_mu * idx_scale
        e_nu, e_nub = _apply_ratio_scale_sum_constant(
            nu_nubar_ratio, nu_e, nub_e
        )
        mu_nu, mu_nub = _apply_ratio_scale_sum_constant(
            nu_nubar_ratio, nu_mu, nub_mu
        )
        out_e = jnp.where(sign < 0, e_nub, e_nu)
        out_mu = jnp.where(sign < 0, mu_nub, mu_nu)

        if precomputed:
            out_e = out_e * barr.mod_ratio_nubar_from_field_signed(
                sign, container["barr_nubar_field_e"], barr_nubar
            )
            out_mu = out_mu * barr.mod_ratio_nubar_from_field_signed(
                sign, container["barr_nubar_field_mu"], barr_nubar
            )
            out_e = out_e * barr.mod_ratio_uphor_from_field(
                container["barr_uphor_field_e"], uphor
            )
        else:
            field_e = barr.nubar_mod_field(0, energy, coszen)
            field_mu = barr.nubar_mod_field(1, energy, coszen)
            out_e = out_e * barr.mod_ratio_nubar_from_field_signed(
                sign, field_e, barr_nubar
            )
            out_mu = out_mu * barr.mod_ratio_nubar_from_field_signed(
                sign, field_mu, barr_nubar
            )
            out_e = out_e * barr.mod_ratio_uphor(0, energy, coszen, uphor)
            out_mu = out_mu * barr.mod_ratio_uphor(1, energy, coszen, uphor)

        container["nu_flux"] = jnp.stack([out_e, out_mu], axis=-1)

    def compute_function(self):
        p = self.params
        nue_numu_ratio = p.nue_numu_ratio.m_as("dimensionless")
        nu_nubar_ratio = p.nu_nubar_ratio.m_as("dimensionless")
        delta_index = p.delta_index.m_as("dimensionless")
        uphor = p.Barr_uphor_ratio.m_as("dimensionless")
        barr_nubar = p.Barr_nu_nubar_ratio.m_as("dimensionless")

        if any(
            getattr(c, "is_stacked", False) for c in self.data.containers
        ):
            params_tuple = (
                nue_numu_ratio,
                nu_nubar_ratio,
                delta_index,
                uphor,
                barr_nubar,
            )
            for container in self.data:
                if self.is_map:
                    self._compute_stacked(container, params_tuple)
                else:
                    self._compute_stacked_events(container, params_tuple)
            return

        # grid (map) mode: the modified flux depends only on the shared
        # calc grid, the flavor-independent nominal flux pair and the
        # nubar sign — link the flavor containers so the grid math runs
        # twice (nu, nubar) instead of once per container (12x on the
        # flagship; measured ~1 ms/template of grid flux math before
        # linking, cf. benchmarks/attribution.py). Same pattern as
        # osc.prob3's compute linking (reference prob3.py:398-422).
        if self.is_map:
            self.data.link_containers("nu", _NU_FLAVS)
            self.data.link_containers("nubar", _NUBAR_FLAVS)

        for container in self.data:
            energy = jnp.asarray(container["true_energy"])
            coszen = jnp.asarray(container["true_coszen"])
            nu_flux = jnp.asarray(container["nu_flux_nominal"])
            nubar_flux = jnp.asarray(container["nubar_flux_nominal"])
            nubar = int(container["nubar"])

            # nue/numu ratio on both nu and nubar nominal pairs
            nu_e, nu_mu = _apply_ratio_scale_sum_constant(
                nue_numu_ratio, nu_flux[:, 0], nu_flux[:, 1]
            )
            nub_e, nub_mu = _apply_ratio_scale_sum_constant(
                nue_numu_ratio, nubar_flux[:, 0], nubar_flux[:, 1]
            )

            # spectral index
            idx_scale = barr.spectral_index_scale(
                energy, _EGY_PIVOT, delta_index
            )
            nu_e, nu_mu = nu_e * idx_scale, nu_mu * idx_scale
            nub_e, nub_mu = nub_e * idx_scale, nub_mu * idx_scale

            # nu/nubar ratio per flavor
            e_nu, e_nub = _apply_ratio_scale_sum_constant(
                nu_nubar_ratio, nu_e, nub_e
            )
            mu_nu, mu_nub = _apply_ratio_scale_sum_constant(
                nu_nubar_ratio, nu_mu, nub_mu
            )
            if nubar < 0:
                out_e, out_mu = e_nub, mu_nub
            else:
                out_e, out_mu = e_nu, mu_nu

            # Barr modifications
            out_e = out_e * barr.mod_ratio_nubar(
                nubar, 0, energy, coszen, barr_nubar
            )
            out_mu = out_mu * barr.mod_ratio_nubar(
                nubar, 1, energy, coszen, barr_nubar
            )
            out_e = out_e * barr.mod_ratio_uphor(0, energy, coszen, uphor)
            out_mu = out_mu * barr.mod_ratio_uphor(1, energy, coszen, uphor)

            container["nu_flux"] = jnp.stack([out_e, out_mu], axis=1)
            container.mark_changed("nu_flux")
        self.data.unlink_containers()


def init_test(**param_kwargs):
    """Instantiation example."""
    param_set = ParamSet(
        [
            Param(name="nue_numu_ratio", value=1.0, **param_kwargs),
            Param(name="nu_nubar_ratio", value=1.0, **param_kwargs),
            Param(name="delta_index", value=0.0, **param_kwargs),
            Param(name="Barr_uphor_ratio", value=0.0, **param_kwargs),
            Param(name="Barr_nu_nubar_ratio", value=0.0, **param_kwargs),
        ]
    )
    return barr_simple(params=param_set)
