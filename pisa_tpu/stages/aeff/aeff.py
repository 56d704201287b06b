"""
Effective-area / normalization stage (cf. reference
``pisa/stages/aeff/aeff.py``): ``weights *= weighted_aeff * livetime *
aeff_scale`` with per-category norms (nutau_cc_norm for nutau(bar)_cc,
nutau_norm for all nutau categories, nu_nc_norm for NC).
"""

from __future__ import annotations

from pisa_tpu import ureg
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage

__all__ = ["aeff", "init_test"]


class aeff(Stage):  # noqa: N801
    """Params: livetime, aeff_scale, nutau_cc_norm, nutau_norm, nu_nc_norm."""

    def __init__(self, **std_kwargs):
        super().__init__(
            expected_params=(
                "livetime",
                "aeff_scale",
                "nutau_cc_norm",
                "nutau_norm",
                "nu_nc_norm",
            ),
            expected_container_keys=("weights", "weighted_aeff"),
            **std_kwargs,
        )

    supports_stacked = True

    # weights *= weighted_aeff (static per-event) x scale (per-category
    # scalar) — exactly the rate-deferral contract (core/stage.py)
    stacked_rate_defer_safe = True
    stacked_static_weight_keys = ("weighted_aeff",)

    def apply_function(self):
        aeff_scale = self.params.aeff_scale.m_as("dimensionless")
        livetime_s = self.params.livetime.m_as("sec")
        nutau_cc_norm = self.params.nutau_cc_norm.m_as("dimensionless")
        nutau_norm = self.params.nutau_norm.m_as("dimensionless")
        nu_nc_norm = self.params.nu_nc_norm.m_as("dimensionless")

        for container in self.data:
            if getattr(container, "is_stacked", False):
                # per-category scale vector: name-based masks are concrete,
                # the norms stay traced (differentiable)
                import numpy as np

                import jax.numpy as jnp

                names = container.cat_names
                m_cc = np.asarray(
                    [n in ("nutau_cc", "nutaubar_cc") for n in names]
                )
                m_tau = np.asarray(["nutau" in n for n in names])
                m_nc = np.asarray(["nc" in n for n in names])
                scale = (
                    aeff_scale
                    * livetime_s
                    * jnp.where(m_cc, nutau_cc_norm, 1.0)
                    * jnp.where(m_tau, nutau_norm, 1.0)
                    * jnp.where(m_nc, nu_nc_norm, 1.0)
                )
                container["weights"] = (
                    container["weights"]
                    * container["weighted_aeff"]
                    * scale[:, None]
                )
                container.mark_changed("weights")
                continue
            scale = aeff_scale * livetime_s
            if container.name in ("nutau_cc", "nutaubar_cc"):
                scale = scale * nutau_cc_norm
            if "nutau" in container.name:
                scale = scale * nutau_norm
            if "nc" in container.name:
                scale = scale * nu_nc_norm
            container["weights"] = (
                container["weights"] * container["weighted_aeff"] * scale
            )
            container.mark_changed("weights")


def init_test(**param_kwargs):
    """Instantiation example."""
    param_set = ParamSet(
        [
            Param(name="livetime", value=10 * ureg.s, **param_kwargs),
            Param(name="aeff_scale", value=1.0, **param_kwargs),
            Param(name="nutau_cc_norm", value=1.0, **param_kwargs),
            Param(name="nutau_norm", value=1.0, **param_kwargs),
            Param(name="nu_nc_norm", value=1.0, **param_kwargs),
        ]
    )
    return aeff(params=param_set)
