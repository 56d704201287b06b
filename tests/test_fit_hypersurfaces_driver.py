"""
End-to-end hypersurface production (cf. reference
``pisa-fit_hypersurfaces`` workflow): drive a pipeline over nominal +
systematic parameter points, fit per-bin hypersurfaces, serialize, and
apply them through the discr_sys.hypersurfaces stage.
"""

import numpy as np
import pytest

from pisa_tpu.scripts.fit_hypersurfaces import fit_hypersurfaces_from_pipeline
from pisa_tpu.utils.hypersurface import load_hypersurfaces, save_hypersurfaces


def test_fit_apply_roundtrip(tmp_path):
    # use aeff_scale as the "detector systematic": templates scale linearly,
    # so the fitted normalized hypersurfaces must be linear with slope 1
    cfg = "settings/pipeline/toy_generalized_llh.cfg"
    nominal = {"aeff_scale": 1.0}
    sys_points = [
        {"aeff_scale": 0.8},
        {"aeff_scale": 0.9},
        {"aeff_scale": 1.1},
        {"aeff_scale": 1.2},
    ]
    surfaces = fit_hypersurfaces_from_pipeline(
        pipeline_cfg=cfg,
        params={"aeff_scale": "linear"},
        nominal_param_values=nominal,
        sys_param_values=sys_points,
        norm=True,
    )
    assert set(surfaces) == {"nue_cc", "numu_cc"}
    hs = surfaces["numu_cc"]
    valid = hs.fit_valid
    assert valid.any()
    assert np.allclose(hs.intercept[valid], 1.0, atol=1e-4)
    assert np.allclose(hs.coeffts["aeff_scale"][valid, 0], 1.0, atol=1e-4)

    # serialization + stage application round trip
    path = str(tmp_path / "fitted_hs.json")
    save_hypersurfaces(surfaces, path)
    loaded = load_hypersurfaces(path)
    scale = np.asarray(loaded["numu_cc"].evaluate({"aeff_scale": 1.15}))
    assert np.allclose(scale[valid], 1.15, atol=1e-4)
