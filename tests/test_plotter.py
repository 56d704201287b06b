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
