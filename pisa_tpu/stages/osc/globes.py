"""
GLoBES oscillation engine wrapper (cf. reference
``pisa/stages/osc/globes.py``): 3+1 sterile-neutrino probabilities via the
external GLoBES C library.

GLoBES is not available in this environment; the stage raises a clear
ImportError at construction (optional external per the reference's policy).
The GLoBES capability (3+1 sterile oscillations) is covered NATIVELY by
``osc.nusquids`` (``ops/osc/sterile.py``: 4-flavor split-complex kernel,
NC matter potential, low-pass filtering, differentiable); ``osc.prob3``
covers NSI/decay/LRI, and arbitrary external probabilities can be supplied
through ``osc.external``.
"""

from __future__ import annotations

from pisa_tpu.core.stage import Stage

__all__ = ["globes", "init_test"]


class globes(Stage):  # noqa: N801
    """Requires the external GLoBES wrapper package."""

    def __init__(self, globes_wrapper=None, **std_kwargs):
        try:
            import GLoBES  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "osc.globes requires the external 'GLoBES' package, which"
                " is not installed in this environment. Use the native"
                " osc.prob3 or supply probabilities via osc.external."
            ) from exc
        raise NotImplementedError(
            "GLoBES present but the wrapper is not implemented in this"
            " build; use osc.prob3 or osc.external."
        )


def init_test(**param_kwargs):
    """Instantiation example (skipped: GLoBES absent)."""
    import pytest

    pytest.importorskip("GLoBES")
