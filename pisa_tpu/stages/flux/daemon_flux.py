"""
DAEMONFLUX atmospheric flux (cf. reference
``pisa/stages/flux/daemon_flux.py``): wraps the external ``daemonflux``
package (correlated ``daemon_*`` parameters from the flux fit covariance,
with a ``daemon_chi2`` penalty).

The daemonflux package is not bundled in this environment; the stage raises
a clear ImportError at construction when it is unavailable (matching how
the reference gates its optional externals, cf. ``run_unit_tests.py:52``).
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE
from pisa_tpu.core.stage import Stage

__all__ = ["daemon_flux", "init_test"]


class daemon_flux(Stage):  # noqa: N801
    """Requires the external `daemonflux` package."""

    def __init__(self, **std_kwargs):
        try:
            from daemonflux import Flux  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "flux.daemon_flux requires the external 'daemonflux'"
                " package, which is not installed in this environment."
                " Use flux.honda_ip or flux.mceq_barr instead."
            ) from exc

        from daemonflux import Flux

        self.flux_obj = Flux(location="IceCube", use_calibration=True)
        self.daemon_names = [
            p.replace("pi+", "pi").replace("K+", "K")
            for p in self.flux_obj.params.known_parameters
        ]
        expected_params = tuple(
            f"daemon_{n}" for n in self.daemon_names
        )
        super().__init__(
            expected_params=expected_params,
            expected_container_keys=("true_energy", "true_coszen", "nubar"),
            **std_kwargs,
        )

    def compute_function(self):
        from pisa_tpu.utils.log import logging

        params = {
            n: float(
                np.asarray(self.params[f"daemon_{n}"].value.magnitude)
            )
            for n in self.daemon_names
        }
        for container in self.data:
            e = np.asarray(container["true_energy"], dtype=np.float64)
            cz = np.asarray(container["true_coszen"], dtype=np.float64)
            sfx = "" if int(container["nubar"]) > 0 else "bar"
            flux = np.empty((container.size, 2), dtype=FTYPE)
            flux[:, 0] = self.flux_obj.flux(
                e, cz, f"nue{sfx}", params=params
            ) / e**3
            flux[:, 1] = self.flux_obj.flux(
                e, cz, f"numu{sfx}", params=params
            ) / e**3
            container["nu_flux"] = flux
            container.mark_changed("nu_flux")
        logging.trace("daemonflux evaluated")


def init_test(**param_kwargs):
    """Instantiation example (skipped when daemonflux is unavailable)."""
    import pytest

    pytest.importorskip("daemonflux")
    return daemon_flux()
