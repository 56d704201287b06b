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


def test_interpolated_fit_job_workflow(tmp_path):
    """prepare -> run per job (with resume) -> assemble -> load
    (cf. reference ``hyper_interpolator.py:761,618,598,549``)."""
    from pisa_tpu.utils.hypersurface import (
        assemble_interpolated_fits,
        get_incomplete_job_idx,
        load_interpolated_hypersurfaces,
        prepare_interpolated_fit,
        run_interpolated_fit,
    )

    fit_dir = str(tmp_path / "hs_fits")
    fit_cfg = {
        "pipeline_cfg": "settings/pipeline/toy_generalized_llh.cfg",
        "params": {"aeff_scale": "linear"},
        "nominal_dataset": {"param_values": {"aeff_scale": 1.0}},
        "sys_datasets": [
            {"param_values": {"aeff_scale": 0.8}},
            {"param_values": {"aeff_scale": 1.2}},
        ],
        "norm": True,
    }
    # interpolate over nu_nc_norm (an independent pipeline param)
    spec = {
        "nu_nc_norm": {"values": [0.8, 1.0, 1.2], "scales_log": False}
    }
    n_jobs = prepare_interpolated_fit(fit_dir, spec, fit_cfg)
    assert n_jobs == 3
    assert get_incomplete_job_idx(fit_dir) == [0, 1, 2]

    # assembling before all jobs are done must fail loudly
    run_interpolated_fit(fit_dir, 0)
    with pytest.raises(ValueError):
        assemble_interpolated_fits(fit_dir, str(tmp_path / "early.json"))

    # resume semantics: successful jobs are skipped, the rest run
    for j in range(n_jobs):
        run_interpolated_fit(fit_dir, j, skip_successful=True)
    assert get_incomplete_job_idx(fit_dir) == []

    out = str(tmp_path / "interpolated_hs.json.bz2")
    assemble_interpolated_fits(fit_dir, out)
    interps = load_interpolated_hypersurfaces(out)
    assert set(interps) == {"nue_cc", "numu_cc"}
    hs = interps["numu_cc"].get_hypersurface(nu_nc_norm=1.05)
    valid = hs.fit_valid
    assert valid.any()
    # aeff_scale scales templates linearly at every grid point, so the
    # interpolated surface keeps slope 1 / intercept 1
    scale = np.asarray(hs.evaluate({"aeff_scale": 1.15}))
    assert np.allclose(scale[valid], 1.15, atol=1e-3)
