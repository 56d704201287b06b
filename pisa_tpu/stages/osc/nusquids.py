"""
nuSQuIDS oscillation engine wrapper (cf. reference
``pisa/stages/osc/nusquids.py:36``): node-mode grids with interpolation and
low-pass filtering of fast (sterile) oscillations, via the external
nuSQuIDS C++ package.

nuSQuIDS is not available in this environment; the stage raises a clear
ImportError at construction (the reference treats it as an optional
external, ``run_unit_tests.py:52``). The native alternatives are:

- ``osc.prob3`` — 3-flavor matter oscillations incl. NSI, neutrino decay,
  LRI and Earth tomography, compiled to XLA (no external engine);
- ``osc.decoherence`` — decoherence physics;
- the ``calc_grid`` + container-translation machinery — the same
  "compute on a coarse node grid, interpolate to events" tractability
  trick as nuSQuIDS' node_mode (SURVEY §5.7).
"""

from __future__ import annotations

from pisa_tpu.core.stage import Stage

__all__ = ["nusquids", "init_test"]


class nusquids(Stage):  # noqa: N801
    """Requires the external `nuSQuIDS` python bindings."""

    def __init__(
        self,
        earth_model=None,
        detector_depth=None,
        prop_height=None,
        prop_height_range=None,
        YeI=None,
        YeO=None,
        YeM=None,
        rel_err=None,
        abs_err=None,
        prop_lowpass_cutoff=None,
        prop_lowpass_frac=None,
        eval_lowpass_cutoff=None,
        eval_lowpass_frac=None,
        apply_lowpass_above_hor=True,
        apply_height_avg_below_hor=True,
        suppress_interpolation_warning=False,
        node_mode=None,
        use_decoherence=False,
        num_decoherence_gamma=1,
        use_nsi=False,
        num_neutrinos=3,
        use_taus=False,
        exact_mode=False,
        vacuum=False,
        **std_kwargs,
    ):
        try:
            import nuSQuIDS as nsq  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "osc.nusquids requires the external 'nuSQuIDS' package,"
                " which is not installed in this environment. Use the"
                " native osc.prob3 (NSI/decay/LRI/tomography) or"
                " osc.decoherence services instead."
            ) from exc
        raise NotImplementedError(
            "nuSQuIDS bindings present but the wrapper is not implemented"
            " in this build; use osc.prob3 / osc.decoherence."
        )


def init_test(**param_kwargs):
    """Instantiation example (skipped: nuSQuIDS absent)."""
    import pytest

    pytest.importorskip("nuSQuIDS")
