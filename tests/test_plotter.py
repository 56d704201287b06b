"""Plotter smoke tests: files get produced, axes sane."""

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.core.map import Map, MapSet
from pisa_tpu.utils.plotter import Plotter


@pytest.fixture
def mapset():
    e = OneDimBinning("reco_energy", num_bins=6, is_log=True, domain=[5, 50] * ureg.GeV)
    cz = OneDimBinning("reco_coszen", num_bins=5, is_lin=True, domain=[-1, 1])
    binning = MultiDimBinning([e, cz], name="b")
    rng = np.random.RandomState(0)
    maps = [
        Map(
            name=n,
            hist=rng.uniform(1, 10, binning.shape),
            binning=binning,
            error_hist=rng.uniform(0.1, 0.5, binning.shape),
        )
        for n in ("numu_cc", "nue_cc")
    ]
    return MapSet(maps, name="test")


def test_plot_2d_array(mapset, tmp_path):
    p = Plotter(outdir=str(tmp_path), fmt="png", stamp="test")
    paths = p.plot_2d_array(mapset, fname="maps2d")
    import os
    assert all(os.path.exists(f) and os.path.getsize(f) > 0 for f in paths)


def test_plot_1d_and_ratio(mapset, tmp_path):
    p = Plotter(outdir=str(tmp_path), fmt="png", log=False)
    paths = p.plot_1d_all(mapset, "reco_energy", fname="proj")
    import os
    assert all(os.path.exists(f) for f in paths)
    paths = p.plot_1d_ratio(list(mapset), "reco_energy", fname="ratio")
    assert all(os.path.exists(f) for f in paths)


def test_plot_2d_single_and_1d_array(mapset, tmp_path):
    import os

    p = Plotter(outdir=str(tmp_path), fmt="png", log=False)
    paths = p.plot_2d_single(mapset, fname="single")
    assert len(paths) == 2 and all(os.path.exists(f) for f in paths)
    paths = p.plot_1d_array(mapset, "reco_energy", fname="arr1d")
    assert all(os.path.exists(f) for f in paths)


def test_plot_1d_stack_cmp_slices(mapset, tmp_path):
    import os

    p = Plotter(outdir=str(tmp_path), fmt="png", log=False)
    paths = p.plot_1d_stack(mapset, "reco_energy", fname="stack")
    assert all(os.path.exists(f) for f in paths)

    other = MapSet(
        [m * 1.2 for m in mapset], name="scaled"
    )
    paths = p.plot_1d_cmp(
        [mapset, other], "reco_energy", fname="cmp",
        labels=["nominal", "scaled"],
    )
    assert all(os.path.exists(f) for f in paths)

    paths = p.plot_1d_slices_array(
        [mapset, other], "reco_energy", fname="slices"
    )
    assert all(os.path.exists(f) for f in paths)


def test_hypersurface_bin_fit_plots(tmp_path):
    """Fit a small hypersurface, then write 1-D and 2-D fit-quality plots
    (cf. reference hypersurface_plotting.py)."""
    import os

    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    from pisa_tpu.utils.hypersurface import Hypersurface
    from pisa_tpu.utils.hypersurface_plotting import (
        plot_bin_fits,
        plot_bin_fits_2d,
    )

    e = OneDimBinning(
        "reco_energy", num_bins=3, is_log=True, domain=[5, 50] * ureg.GeV
    )
    cz = OneDimBinning("reco_coszen", num_bins=2, is_lin=True, domain=[-1, 1])
    binning = MultiDimBinning([e, cz], name="b")
    rng = np.random.RandomState(1)

    truth_slope = {"opt_eff": 0.3, "ice_abs": -0.1}
    nominal_vals = {"opt_eff": 1.0, "ice_abs": 0.0}
    nominal_hist = rng.uniform(50, 100, binning.shape)
    sys_values = [
        {"opt_eff": 1.0, "ice_abs": 0.0},
        {"opt_eff": 1.2, "ice_abs": 0.0},
        {"opt_eff": 0.8, "ice_abs": 0.0},
        {"opt_eff": 1.0, "ice_abs": 1.0},
        {"opt_eff": 1.0, "ice_abs": -1.0},
        {"opt_eff": 1.1, "ice_abs": 0.5},
    ]
    sys_maps = []
    for pv in sys_values:
        scale = (
            1.0
            + truth_slope["opt_eff"] * (pv["opt_eff"] - 1.0)
            + truth_slope["ice_abs"] * pv["ice_abs"]
        )
        sys_maps.append(
            Map(
                name="m",
                hist=nominal_hist * scale,
                binning=binning,
                error_hist=np.sqrt(nominal_hist * scale),
            )
        )
    nominal_map = sys_maps[0]

    hs = Hypersurface(
        binning,
        ["opt_eff", "ice_abs"],
        {"opt_eff": "linear", "ice_abs": "linear"},
    )
    hs.fit(nominal_map, nominal_vals, sys_maps, sys_values)

    fig, ax = plt.subplots()
    plot_bin_fits(
        ax, hs, (1, 1), "opt_eff", show_nominal=True,
        label="datasets", hs_label="fit",
    )
    f1 = os.path.join(str(tmp_path), "hs_1d.png")
    fig.savefig(f1)

    fig, ax = plt.subplots()
    plot_bin_fits_2d(ax, hs, 3, ["opt_eff", "ice_abs"])
    f2 = os.path.join(str(tmp_path), "hs_2d.png")
    fig.savefig(f2)
    plt.close("all")

    assert os.path.getsize(f1) > 0 and os.path.getsize(f2) > 0

    # the fitted 1-D curve at a dataset point reproduces the dataset scale
    from pisa_tpu.utils.hypersurface_plotting import _eval_curve

    y = _eval_curve(hs, 3, "opt_eff", np.array([1.2]))
    expect = 1.0 + truth_slope["opt_eff"] * 0.2
    np.testing.assert_allclose(y, expect, rtol=1e-3)
