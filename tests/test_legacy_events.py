"""
Legacy Events / Data containers and FlavIntDataGroup
(cf. reference ``pisa/core/events.py:1089`` ``test_Events`` and
``pisa/utils/flavInt.py`` FlavIntDataGroup semantics).
"""

import numpy as np
import pytest

from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.core.events import Data, Events
from pisa_tpu.core.map import Map, MapSet
from pisa_tpu.utils.flavint import FlavIntDataGroup, NuFlavIntGroup


def _make_fields(n, seed, e_lo=1.0, e_hi=100.0):
    rng = np.random.RandomState(seed)
    return {
        "true_energy": rng.uniform(e_lo, e_hi, n),
        "true_coszen": rng.uniform(-1, 1, n),
        "weights": rng.rand(n),
    }


@pytest.fixture
def events():
    val = {}
    for i, fi in enumerate(
        ["nue_cc", "numu_cc", "nutau_cc", "nuebar_cc", "numubar_cc",
         "nutaubar_cc"]
    ):
        val[fi] = _make_fields(200 + 10 * i, seed=i)
    return Events(val)


@pytest.fixture
def ebinning():
    return OneDimBinning(
        "true_energy", num_bins=10, is_log=True, domain=(5, 50), units="GeV"
    )


class TestEvents:
    def test_flavints_present(self, events):
        present = {str(fi) for fi in events.flavints_present}
        assert "numu_cc" in present and "numu_nc" not in present

    def test_apply_cut(self, events):
        cut = "(true_energy >= 10) & (true_energy <= 50)"
        out = events.applyCut(cut)
        assert cut in out.metadata["cuts"]
        for fi in out.flavints_present:
            e = out[fi]["true_energy"]
            assert e.min() >= 10 and e.max() <= 50
            # weights stay aligned
            assert len(out[fi]["weights"]) == len(e)
        # re-applying is a no-op returning the same object
        assert out.applyCut(cut) is out

    def test_apply_cut_np_namespace(self, events):
        out = events.applyCut("np.log10(true_energy) >= 1")
        for fi in out.flavints_present:
            assert out[fi]["true_energy"].min() >= 10

    def test_keep_inbounds(self, events, ebinning):
        out = events.keepInbounds(ebinning)
        for fi in out.flavints_present:
            e = out[fi]["true_energy"]
            assert e.min() >= 5 and e.max() <= 50
        assert len(out.metadata["cuts"]) == 1
        # idempotent: all criteria recorded -> unmodified
        assert out.keepInbounds(ebinning) is out

    def test_histogram(self, events, ebinning):
        m = events.histogram(
            "numu_cc", ebinning, weights_col="weights", errors=True
        )
        assert isinstance(m, Map)
        fields = events["numu_cc"]
        in_range = (fields["true_energy"] >= 5) & (fields["true_energy"] <= 50)
        from pisa_tpu import FTYPE

        np.testing.assert_allclose(
            m.hist.sum(), fields["weights"][in_range].sum(),
            rtol=1e-12 if FTYPE == np.float64 else 1e-5,
        )

    def test_json_round_trip(self, events, tmp_path):
        fname = str(tmp_path / "events.json")
        events.save(fname)
        loaded = Events(fname)
        assert loaded.data_eq(events)


class TestFlavIntDataGroup:
    def test_grouped_access(self):
        g = FlavIntDataGroup(flavint_groups="numu_cc+numubar_cc; nuall_nc")
        g["numu_cc+numubar_cc"] = {"x": np.arange(3.0)}
        # access by any contained flavint
        np.testing.assert_array_equal(g["numu_cc"]["x"], np.arange(3.0))

    def test_transform_groups_concatenates(self):
        val = {
            "numu_cc": {"x": np.arange(3.0)},
            "numubar_cc": {"x": np.arange(4.0)},
        }
        g = FlavIntDataGroup(val=val)
        t = g.transform_groups(["numu_cc+numubar_cc"])
        assert len(t["numu_cc+numubar_cc"]["x"]) == 7

    def test_transform_rejects_split(self):
        val = {"numu_cc+numubar_cc": {"x": np.arange(3.0)}}
        g = FlavIntDataGroup(val=val)
        with pytest.raises(ValueError):
            g.transform_groups(["numu_cc"])


class TestData:
    @pytest.fixture
    def data(self):
        val = {
            "numu_cc+numubar_cc": _make_fields(300, seed=1),
            "nue_cc+nuebar_cc": _make_fields(200, seed=2),
            "muons": _make_fields(100, seed=3),
        }
        return Data(val, metadata={"name": "toy"})

    def test_sidebands(self, data):
        assert data.contains_muons and not data.contains_noise
        assert "muons" in data.names
        assert len(data.muons["true_energy"]) == 100
        # canonical compact group names; access works by any spec
        assert set(data.neutrinos.keys()) == {
            "numu_numubar_cc", "nue_nuebar_cc"
        }
        assert len(data["numu_cc+numubar_cc"]["true_energy"]) == 300

    def test_histogram_set(self, data, ebinning):
        ms = data.histogram_set(
            ebinning, nu_weights_col="weights", mu_weights_col=None,
            noise_weights_col=None, mapset_name="toy", errors=True,
        )
        assert isinstance(ms, MapSet)
        assert {m.name for m in ms} == {
            "numu_numubar_cc", "nue_nuebar_cc", "muons"
        }
        # unweighted muons: counts
        mu = [m for m in ms if m.name == "muons"][0]
        fields = data.muons
        in_range = (fields["true_energy"] >= 5) & (
            fields["true_energy"] <= 50
        )
        assert mu.hist.sum() == in_range.sum()

    def test_apply_cut_and_inbounds(self, data, ebinning):
        out = data.keepInbounds(ebinning)
        for key in out.names:
            e = out[key]["true_energy"]
            assert e.min() >= 5 and e.max() <= 50

    def test_add_concatenates(self, data):
        tot = data + data
        assert len(tot["numu_cc"]["true_energy"]) == 600
        assert len(tot.muons["true_energy"]) == 200

    def test_transform_groups(self, data):
        t = data.transform_groups(
            ["nue_cc+nuebar_cc+numu_cc+numubar_cc"]
        )
        key = [k for k in t.names if k != "muons"][0]
        assert len(t[key]["true_energy"]) == 500
        assert t.contains_muons

    def test_digitize(self, data, ebinning):
        idx = data.digitize("numu_cc+numubar_cc", ebinning)
        assert idx.shape == (300, 1)
        assert idx.min() >= 0 and idx.max() <= ebinning.num_bins + 1
