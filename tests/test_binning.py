"""Tests for OneDimBinning / MultiDimBinning / VarBinning (modeled on the
reference's embedded binning tests)."""

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning, VarBinning


@pytest.fixture
def ebins():
    return OneDimBinning(
        "true_energy", domain=[1, 80] * ureg.GeV, num_bins=40, is_log=True
    )


@pytest.fixture
def czbins():
    return OneDimBinning(
        "true_coszen", domain=[-1, 1], num_bins=20, is_lin=True
    )


@pytest.fixture
def pidbin():
    return OneDimBinning(
        "pid",
        bin_edges=[-np.inf, 0.55, np.inf],
        bin_names=["cascade", "track"],
    )


class TestOneDimBinning:
    def test_log_edges(self, ebins):
        assert ebins.num_bins == 40
        assert ebins.is_log and not ebins.is_lin
        e = ebins.edge_magnitudes
        assert np.isclose(e[0], 1) and np.isclose(e[-1], 80)
        np.testing.assert_allclose(np.diff(np.log(e)), np.diff(np.log(e))[0])

    def test_lin_edges(self, czbins):
        assert czbins.is_lin and not czbins.is_log
        np.testing.assert_allclose(
            czbins.edge_magnitudes, np.linspace(-1, 1, 21)
        )

    def test_spacing_detection(self):
        b = OneDimBinning("x", bin_edges=np.linspace(0, 1, 11))
        assert b.is_lin
        b = OneDimBinning("x", bin_edges=np.logspace(0, 1, 11))
        assert b.is_log
        b = OneDimBinning("x", bin_edges=[0, 1, 5, 10])
        assert b.is_irregular

    def test_weighted_centers(self, ebins, czbins):
        e = ebins.edge_magnitudes
        np.testing.assert_allclose(
            ebins.weighted_centers.magnitude, np.sqrt(e[:-1] * e[1:])
        )
        c = czbins.edge_magnitudes
        np.testing.assert_allclose(
            czbins.weighted_centers.magnitude, (c[:-1] + c[1:]) / 2
        )

    def test_oversample_downsample(self, ebins):
        o = ebins.oversample(3)
        assert o.num_bins == 120
        assert o.is_log
        # oversampled edges contain originals
        for e in ebins.edge_magnitudes:
            assert np.any(np.isclose(o.edge_magnitudes, e))
        d = o.downsample(3)
        assert d == ebins

    def test_is_compat(self, ebins):
        assert ebins.is_compat(ebins.downsample(2))
        assert ebins.oversample(2).is_compat(ebins)
        other = OneDimBinning(
            "true_energy", domain=[1, 100] * ureg.GeV, num_bins=40, is_log=True
        )
        assert not ebins.is_compat(other)

    def test_units_equality(self):
        a = OneDimBinning("d", bin_edges=[0, 1, 2], units="km")
        b = OneDimBinning("d", bin_edges=[0, 1000, 2000], units="m")
        assert a == b
        assert a.hash == b.hash

    def test_serialization(self, ebins, tmp_path):
        f = str(tmp_path / "b.json")
        ebins.to_json(f)
        loaded = OneDimBinning.from_json(f)
        assert loaded == ebins
        assert loaded.hash == ebins.hash

    def test_bin_names(self, pidbin):
        assert pidbin.bin_names == ("cascade", "track")
        assert pidbin.num_bins == 2

    def test_indexing(self, ebins):
        sub = ebins[0:10]
        assert sub.num_bins == 10
        assert sub.edge_magnitudes[0] == ebins.edge_magnitudes[0]
        single = ebins[5]
        assert single.num_bins == 1


class TestMultiDimBinning:
    def test_basic(self, ebins, czbins, pidbin):
        mdb = MultiDimBinning([ebins, czbins, pidbin])
        assert mdb.shape == (40, 20, 2)
        assert mdb.size == 1600
        assert mdb.names == ["true_energy", "true_coszen", "pid"]
        assert mdb.index("true_coszen") == 1
        assert mdb["pid"] is pidbin
        assert mdb.true_energy is ebins

    def test_mul_operator(self, ebins, czbins):
        mdb = ebins * czbins
        assert isinstance(mdb, MultiDimBinning)
        assert mdb.shape == (40, 20)

    def test_meshgrid(self, ebins, czbins):
        mdb = ebins * czbins
        mg = mdb.meshgrid(entity="weighted_centers", attach_units=False)
        assert mg[0].shape == (40, 20)
        assert np.allclose(mg[0][:, 0], ebins.weighted_centers.magnitude)
        assert np.allclose(mg[1][0, :], czbins.weighted_centers.magnitude)

    def test_bin_volumes(self, czbins):
        mdb = MultiDimBinning([czbins])
        v = mdb.bin_volumes(attach_units=False)
        assert np.allclose(v.sum(), 2.0)

    def test_reorder(self, ebins, czbins):
        mdb = ebins * czbins
        r = mdb.reorder_dimensions(["true_coszen", "true_energy"])
        assert r.names == ["true_coszen", "true_energy"]
        with pytest.raises(ValueError):
            mdb.reorder_dimensions(["true_coszen"])

    def test_equality_hash(self, ebins, czbins):
        a = ebins * czbins
        b = ebins * czbins
        assert a == b and a.hash == b.hash
        c = czbins * ebins
        assert a != c

    def test_serialization(self, ebins, czbins, pidbin, tmp_path):
        mdb = MultiDimBinning([ebins, czbins, pidbin], name="reco")
        f = str(tmp_path / "mdb.json")
        mdb.to_json(f)
        loaded = MultiDimBinning.from_json(f)
        assert loaded == mdb
        assert loaded.name == "reco"

    def test_oversample(self, ebins, czbins):
        mdb = ebins * czbins
        o = mdb.oversample(2)
        assert o.shape == (80, 40)
        o2 = mdb.oversample(true_energy=2)
        assert o2.shape == (80, 20)


class TestVarBinning:
    def test_split_binning(self, ebins, czbins):
        b1 = ebins * czbins
        b2 = ebins * czbins.oversample(2)
        split = OneDimBinning("pid", bin_edges=[-3.0, 0.0, 1000.0])
        vb = VarBinning([b1, b2], split)
        assert vb.nselections == 2
        assert vb[0].shape == (40, 20)
        assert vb[1].shape == (40, 40)

    def test_cut_selections(self, ebins, czbins):
        b = ebins * czbins
        vb = VarBinning(
            [b, b], ["(true_coszen <= 0)", "(true_coszen > 0)"]
        )
        assert vb.nselections == 2
        assert vb.selections[0] == "(true_coszen <= 0)"

    def test_mismatched_dims_raises(self, ebins, czbins):
        with pytest.raises(ValueError):
            VarBinning(
                [MultiDimBinning([ebins]), MultiDimBinning([czbins])],
                ["a", "b"],
            )
