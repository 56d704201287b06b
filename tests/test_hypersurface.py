"""
Hypersurface subsystem tests (ports the semantics of the reference's
``test_hypersurface_basics``, ``hypersurface.py:2380``): the vmapped
Gauss-Newton fit must recover known coefficients from toy ensembles; the
evaluation must be traceable/differentiable; serialization round-trips; the
official data-release CSV hyperplanes load and evaluate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pisa_tpu import ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.core.map import Map, MapSet
from pisa_tpu.utils.hypersurface import (
    Hypersurface,
    fit_hypersurfaces_from_maps,
    load_hypersurfaces,
    save_hypersurfaces,
)


@pytest.fixture
def binning():
    e = OneDimBinning("reco_energy", num_bins=3, is_log=True, domain=[5, 50] * ureg.GeV)
    cz = OneDimBinning("reco_coszen", num_bins=3, is_lin=True, domain=[-1, 1])
    return MultiDimBinning([e, cz], name="test")


def _toy_maps(binning, true_intercept, true_slopes, param_points, rng):
    """Build toy datasets whose bin counts follow an exact hypersurface."""
    B = binning.size
    nom = 1000.0 * (1.0 + 0.2 * rng.rand(B))
    maps = []
    for pv in param_points:
        factor = true_intercept + sum(
            true_slopes[name] * val for name, val in pv.items()
        )
        counts = nom * factor
        maps.append(
            Map(
                name="numu_cc",
                hist=counts.reshape(binning.shape),
                binning=binning,
                error_hist=np.sqrt(counts).reshape(binning.shape) * 0.01,
            )
        )
    return nom, maps


def test_fit_recovers_linear_coefficients(binning):
    rng = np.random.RandomState(42)
    slopes = {"dom_eff": 0.7, "hole_ice": -0.35}
    nominal_values = {"dom_eff": 1.0, "hole_ice": 0.25}
    # parameter points as shifts around nominal
    deltas = [
        {"dom_eff": 0.0, "hole_ice": 0.0},
        {"dom_eff": 0.12, "hole_ice": 0.0},
        {"dom_eff": -0.1, "hole_ice": 0.0},
        {"dom_eff": 0.0, "hole_ice": 0.15},
        {"dom_eff": 0.0, "hole_ice": -0.2},
        {"dom_eff": 0.08, "hole_ice": 0.1},
    ]
    nom_flat, maps = _toy_maps(binning, 1.0, slopes, deltas, rng)
    param_points = [
        {k: nominal_values[k] + d[k] for k in slopes} for d in deltas
    ]

    nominal_mapset = MapSet([maps[0]])
    sys_mapsets = [MapSet([m]) for m in maps]
    surfaces = fit_hypersurfaces_from_maps(
        nominal_mapset=nominal_mapset,
        nominal_param_values=param_points[0],
        sys_mapsets=sys_mapsets,
        sys_param_values=param_points,
        binning=binning,
        params={"dom_eff": "linear", "hole_ice": "linear"},
        include_nominal=False,
    )
    hs = surfaces["numu_cc"]
    assert np.allclose(hs.intercept, 1.0, atol=1e-5)
    assert np.allclose(hs.coeffts["dom_eff"][:, 0], slopes["dom_eff"], atol=1e-5)
    assert np.allclose(hs.coeffts["hole_ice"][:, 0], slopes["hole_ice"], atol=1e-5)

    # evaluation at a shifted point reproduces the generating factor
    pv = {"dom_eff": 1.1, "hole_ice": 0.05}
    scale = np.asarray(hs.evaluate(pv))
    expected = 1.0 + 0.7 * 0.1 + (-0.35) * (-0.2)
    assert np.allclose(scale, expected, atol=1e-5)


def test_fit_quadratic_form(binning):
    rng = np.random.RandomState(1)
    B = binning.size
    nom = 500.0 * (1.0 + 0.1 * rng.rand(B))
    vals = [-0.4, -0.2, 0.0, 0.2, 0.4, 0.6]
    m1, m2 = 0.5, -0.3
    maps, points = [], []
    for v in vals:
        counts = nom * (1.0 + m1 * v + m2 * v**2)
        maps.append(
            Map(
                name="m",
                hist=counts.reshape(binning.shape),
                binning=binning,
                error_hist=np.full(binning.shape, 0.5),
            )
        )
        points.append({"p": v})
    hs = Hypersurface(
        binning, ["p"], {"p": "quadratic"}, nominal_values={"p": 0.0}
    )
    hs.fit(maps[2], {"p": 0.0}, maps, points, norm=True)
    assert np.allclose(hs.intercept, 1.0, atol=1e-4)
    assert np.allclose(hs.coeffts["p"][:, 0], m1, atol=1e-4)
    assert np.allclose(hs.coeffts["p"][:, 1], m2, atol=1e-4)


def test_evaluate_is_differentiable(binning):
    hs = Hypersurface(
        binning, ["p"], {"p": "linear"}, nominal_values={"p": 0.0}
    )
    hs.coeffts["p"][:] = 0.5

    def total(p):
        return jnp.sum(hs.evaluate({"p": p}))

    g = jax.grad(total)(0.3)
    assert np.allclose(float(g), 0.5 * binning.size)


def test_serialization_roundtrip(binning, tmp_path):
    hs = Hypersurface(
        binning, ["a", "b"], {"a": "linear", "b": "exponential"},
        nominal_values={"a": 1.0, "b": 0.0},
    )
    hs.coeffts["a"][:, 0] = np.arange(binning.size)
    hs.coeffts["b"][:, 0] = 0.1
    hs.fit_cov_mat = np.tile(np.eye(hs.num_coeffts), (binning.size, 1, 1))
    path = str(tmp_path / "hs.json")
    save_hypersurfaces({"numu_cc": hs}, path)
    loaded = load_hypersurfaces(path)["numu_cc"]
    assert loaded.param_names == hs.param_names
    assert np.allclose(loaded.intercept, hs.intercept)
    assert np.allclose(loaded.coeffts["a"], hs.coeffts["a"])
    pv = {"a": 1.3, "b": 0.2}
    assert np.allclose(
        np.asarray(loaded.evaluate(pv)), np.asarray(hs.evaluate(pv))
    )


def test_data_release_csv_loading():
    e = OneDimBinning(
        "reco_energy", is_log=True,
        bin_edges=[
            5.62341325, 7.49894209, 10.0, 13.33521432, 17.7827941,
            23.71373706, 31.6227766, 42.16965034, 56.23413252,
        ] * ureg.GeV,
    )
    cz = OneDimBinning("reco_coszen", num_bins=8, is_lin=True, domain=[-1, 1])
    pid = OneDimBinning("pid", bin_edges=[-0.5, 0.5, 1.5])
    binning = MultiDimBinning([e, cz, pid], name="dragon_datarelease")
    surfaces = load_hypersurfaces(
        "events/IceCube_3y_oscillations/hyperplanes_*.csv.bz2", binning
    )
    assert set(surfaces) == {
        "nue_cc+nuebar_cc", "numu_cc+numubar_cc", "nutau_cc+nutaubar_cc",
        "nu_nc+nubar_nc",
    }
    hs = surfaces["numu_cc+numubar_cc"]
    # legacy semantics: raw param values; nominal point of the release
    nominal = {
        "ice_absorption": 0.0, "ice_scattering": 0.0, "opt_eff_headon": 0.0,
        "opt_eff_lateral": 25.0, "opt_eff_overall": 1.0,
    }
    scale = np.asarray(hs.evaluate(nominal))
    assert scale.shape == (binning.size,)
    # at the nominal point the correction should be near unity on average
    assert 0.8 < np.nanmean(scale) < 1.2


def test_interpolator_roundtrip_and_linearity(binning, tmp_path):
    """HypersurfaceInterpolator: linear interpolation of coefficients across
    a 1-D dm31 grid + serialization round-trip (cf. reference
    hyper_interpolator.py:48)."""
    from pisa_tpu.utils.hypersurface import (
        HypersurfaceInterpolator,
        load_interpolated_hypersurfaces,
        save_interpolated_hypersurfaces,
    )

    grid = [2.0e-3, 2.5e-3, 3.0e-3]
    fits = []
    for v in grid:
        hs = Hypersurface(
            binning, ["dom_eff"], {"dom_eff": "linear"},
            nominal_values={"dom_eff": 1.0},
        )
        hs.intercept[:] = 1.0 + 100.0 * v  # linear in the grid param
        hs.coeffts["dom_eff"][:, 0] = 10.0 * v
        fits.append(hs)

    spec = {"deltam31": {"values": grid, "scales_log": False}}
    interp = HypersurfaceInterpolator.from_fits(spec, fits)

    mid = interp.get_hypersurface(deltam31=2.25e-3)
    assert np.allclose(mid.intercept, 1.0 + 100.0 * 2.25e-3)
    assert np.allclose(mid.coeffts["dom_eff"][:, 0], 10.0 * 2.25e-3)

    # evaluation includes the interpolated slopes
    scale = np.asarray(mid.evaluate({"dom_eff": 1.2}))
    assert np.allclose(
        scale, 1.0 + 100.0 * 2.25e-3 + 10.0 * 2.25e-3 * 0.2
    )

    path = str(tmp_path / "interp_hs.json")
    save_interpolated_hypersurfaces({"numu_cc": interp}, path)
    loaded = load_interpolated_hypersurfaces(path)["numu_cc"]
    re_mid = loaded.get_hypersurface(deltam31=2.25e-3)
    assert np.allclose(re_mid.intercept, mid.intercept)
