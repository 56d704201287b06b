"""pisa-tpu-compare CLI (cf. reference ``pisa/scripts/compare.py``):
diff/fract-diff/asymm products, summary json, plots, exit codes."""

import json
import os

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.core.map import Map, MapSet
from pisa_tpu.scripts.compare import compare_distributions, main


@pytest.fixture
def binning():
    e = OneDimBinning(
        "reco_energy", num_bins=6, is_log=True, domain=[5, 50] * ureg.GeV
    )
    cz = OneDimBinning("reco_coszen", num_bins=5, is_lin=True, domain=[-1, 1])
    return MultiDimBinning([e, cz], name="b")


@pytest.fixture
def mapset_pair(binning):
    rng = np.random.RandomState(7)
    ref_maps, test_maps = [], []
    for n in ("numu_cc", "numubar_cc", "nue_cc"):
        h = rng.uniform(1, 10, binning.shape)
        ref_maps.append(Map(name=n, hist=h, binning=binning))
        test_maps.append(Map(name=n, hist=h * 1.01, binning=binning))
    return (
        MapSet(ref_maps, name="ref"),
        MapSet(test_maps, name="test"),
    )


def test_compare_distributions(mapset_pair):
    ref, test = mapset_pair
    summary, diff, fdiff, asymm, ok = compare_distributions(
        ref, test, rtol=1e-8
    )
    assert not ok  # 1% off at rtol=1e-8
    assert set(summary) == {"numu_cc", "numubar_cc", "nue_cc"}
    s = summary["numu_cc"]
    assert np.isclose(s["max_abs_fract_diff"], 0.01)
    # diff = 0.01*ref; asymm = 0.01*sqrt(ref)
    d = np.asarray(diff["numu_cc"].hist)
    r = np.asarray(ref["numu_cc"].hist)
    assert np.allclose(d, 0.01 * r)
    assert np.allclose(np.asarray(asymm["numu_cc"].hist), 0.01 * np.sqrt(r))
    assert np.allclose(np.asarray(fdiff["numu_cc"].hist), 0.01)
    # within tolerance → ok
    _, _, _, _, ok2 = compare_distributions(ref, test, rtol=0.02)
    assert ok2


def test_cli_legacy_form(mapset_pair, tmp_path):
    ref, test = mapset_pair
    ref_p = str(tmp_path / "ref.json.bz2")
    test_p = str(tmp_path / "test.json.bz2")
    ref.to_json(ref_p)
    test.to_json(test_p)
    assert main([ref_p, test_p, "--rtol", "0.02"]) == 0
    assert main([ref_p, test_p, "--rtol", "1e-8"]) == 1


def test_cli_full_form(mapset_pair, tmp_path):
    ref, test = mapset_pair
    ref_p = str(tmp_path / "ref.json.bz2")
    test_p = str(tmp_path / "test.json.bz2")
    ref.to_json(ref_p)
    test.to_json(test_p)
    outdir = str(tmp_path / "out")
    rc = main(
        [
            "--ref", ref_p, "--ref-label", "a",
            "--test", test_p, "--test-label", "b",
            "--combine", "numu*",  # numu_cc + numubar_cc
            "--combine", "nue*",   # single match keeps its own name
            "--sum", "reco_coszen",
            "--outdir", outdir, "--json", "--png",
            "--fract-diff-max", "0.02",
            "--rtol", "0.02",
        ]
    )
    assert rc == 0
    files = os.listdir(outdir)
    assert "b__vs__a.summary.json" in files
    with open(os.path.join(outdir, "b__vs__a.summary.json")) as f:
        summary = json.load(f)
    assert "numu_numubar_cc" in summary and summary["numu_numubar_cc"]["allclose"]
    assert "b__vs__a.diff.json.bz2" in files
    assert any(f.endswith(".png") for f in files)
    # combined + summed shapes round-trip
    diff = MapSet.from_json(os.path.join(outdir, "b__vs__a.diff.json.bz2"))
    assert set(diff.names) == {"numu_numubar_cc", "nue_cc"}
    assert diff["numu_numubar_cc"].binning.names == ["reco_energy"]


def test_cli_sum_of_multiple_sources(mapset_pair, tmp_path):
    """Repeated --ref is summed (multi-pipeline distribution)."""
    ref, _ = mapset_pair
    p = str(tmp_path / "half.json.bz2")
    ref.to_json(p)
    whole = MapSet(
        [m + m for m in ref], name="whole"
    )
    w = str(tmp_path / "whole.json.bz2")
    whole.to_json(w)
    assert main(["--ref", p, "--ref", p, "--test", w]) == 0


def test_cli_missing_and_extra_maps(binning, tmp_path):
    a = MapSet(
        [Map(name="numu_cc", hist=np.ones(binning.shape), binning=binning)],
        name="a",
    )
    b = MapSet(
        [Map(name="nue_cc", hist=np.ones(binning.shape), binning=binning)],
        name="b",
    )
    ap, bp = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    a.to_json(ap)
    b.to_json(bp)
    assert main([ap, bp]) == 1
