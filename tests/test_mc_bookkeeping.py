"""
MC run-settings, data-proc-params, and the make_events_file workflow
(cf. reference ``pisa/utils/mcSimRunSettings.py``,
``pisa/utils/data_proc_params.py``, ``pisa/scripts/make_events_file.py``).
"""

import numpy as np
import pytest

from pisa_tpu.utils.data_proc_params import DataProcParams
from pisa_tpu.utils.mc_sim_run_settings import (
    DetMCSimRunsSettings,
    MCSimRunSettings,
)

RUN_SPEC = {
    "geom": "v36",
    "azimuth_max": "2*pi",
    "azimuth_min": 0,
    "energy_max": 80,
    "energy_min": 1,
    "physical_events_fract": 0.8,
    "genie_prescale_factor": 1.2,
    "flavints": "numu,numubar",
    "nu_to_total_fract": 0.5,
    "num_events_per_file": 1000,
    "num_i3_files": 10,
    "sim_spectral_index": 1,
    "xsec_version": "genie_2.8.6",
    "zenith_max": "pi",
    "zenith_min": 0,
}

PROC_SPEC = {
    "mydet": {
        "5": {
            "field_map": {
                "true_energy": "truth/energy",
                "true_zenith": "truth/zenith",
                "reco_energy": "reco/energy",
                "reco_coszen": "reco/coszen",
                "one_weight": "weight/one_weight",
                "nu_code": "truth/nu_code",
                "interaction_type": "truth/int_type",
                "pid": "reco/pid",
            },
            "cuts": {
                "analysis": {
                    "fields": ["reco_energy"],
                    "pass_if": "reco_energy > 2",
                },
            },
        }
    }
}


class TestMCSimRunSettings:
    def test_translate_and_totals(self):
        rs = MCSimRunSettings(RUN_SPEC, run="388", detector="mydet")
        assert rs["tot_gen"] == 10_000
        np.testing.assert_allclose(rs["azimuth_max"], 2 * np.pi)
        assert rs.get_energy_range() == (1, 80)
        assert rs.get_spectral_index() == 1
        flavs = {f.name for f in rs.get_flavs()}
        assert flavs == {"numu", "numubar"}

    def test_barnobarfract_and_num_gen(self):
        rs = MCSimRunSettings(RUN_SPEC)
        assert rs.barnobarfract(barnobar=1) == 0.5
        assert rs.barnobarfract(is_particle=False) == 0.5
        with pytest.raises(ValueError):
            rs.barnobarfract(barnobar=1, is_particle=True)
        # per-flavor ngen includes physical fraction
        np.testing.assert_allclose(
            rs.get_num_gen(flav_or_flavint="numu"), 10_000 * 0.5 * 0.8
        )
        # total (no selector)
        np.testing.assert_allclose(rs.get_num_gen(), 10_000 * 0.8)
        # flavor not simulated -> 0
        assert rs.get_num_gen(flav_or_flavint="nue") == 0

    def test_detector_level(self):
        det = DetMCSimRunsSettings({"mydet": {"388": RUN_SPEC}}, "mydet")
        assert det.detector == "mydet"
        np.testing.assert_allclose(
            det.get_num_gen("388", flav_or_flavint="numubar"), 4000.0
        )
        assert det.get_energy_range(388) == (1, 80)


@pytest.fixture
def source_h5(tmp_path):
    import h5py

    rng = np.random.RandomState(3)
    n = 1000
    path = str(tmp_path / "source.h5")
    with h5py.File(path, "w") as f:
        t = f.create_group("truth")
        t.create_dataset("energy", data=rng.uniform(1, 80, n))
        t.create_dataset("zenith", data=rng.uniform(0, np.pi, n))
        t.create_dataset(
            "nu_code", data=rng.choice([14, -14], n).astype(np.int32)
        )
        t.create_dataset(
            "int_type", data=rng.choice([1, 2], n).astype(np.int32)
        )
        r = f.create_group("reco")
        r.create_dataset("energy", data=rng.uniform(1, 80, n))
        r.create_dataset("coszen", data=rng.uniform(-1, 1, n))
        r.create_dataset("pid", data=rng.uniform(-1, 2, n))
        w = f.create_group("weight")
        w.create_dataset("one_weight", data=rng.uniform(0, 1e5, n))
    return path


class TestDataProcParams:
    def test_get_data_and_derived(self, source_h5):
        dpp = DataProcParams("MyDet", "5", PROC_SPEC)
        data = dpp.get_data(source_h5)
        assert set(data) >= {"true_energy", "true_coszen", "one_weight"}
        np.testing.assert_allclose(
            data["true_coszen"], np.cos(data["true_zenith"])
        )

    def test_named_and_generic_cuts(self, source_h5):
        dpp = DataProcParams("mydet", "v5", PROC_SPEC)
        data = dpp.get_data(source_h5)
        out = dpp.apply_cuts(data, "analysis")
        assert (out["reco_energy"] > 2).all()
        cc = dpp.apply_cuts(data, "cc")
        assert (cc["interaction_type"] == 1).all()
        nubar = dpp.apply_cuts(data, ["-1", "nc"])
        assert (nubar["nu_code"] < 0).all()
        assert (nubar["interaction_type"] == 2).all()

    def test_custom_cut_dict(self, source_h5):
        dpp = DataProcParams("mydet", "5", PROC_SPEC)
        data = dpp.get_data(source_h5)
        out = dpp.apply_cuts(
            data,
            {"fields": ["true_energy"], "pass_if": "true_energy < 10"},
            return_fields=["true_energy"],
        )
        assert list(out) == ["true_energy"]
        assert (out["true_energy"] < 10).all()

    def test_subselect(self):
        data = {"a": np.arange(5), "b": np.arange(5) * 2.0}
        out = DataProcParams.subselect(data, ["b"], indices=[0, 2])
        np.testing.assert_array_equal(out["b"], [0.0, 4.0])
        assert "a" not in out


class TestMakeEventsFile:
    def test_end_to_end(self, source_h5, tmp_path):
        from pisa_tpu.scripts.make_events_file import make_events_file

        evts, outpath = make_events_file(
            data_files={"388": [source_h5]},
            detector="mydet",
            proc_ver="5",
            cut="analysis",
            outdir=str(tmp_path / "out"),
            run_settings={"mydet": {"388": RUN_SPEC}},
            data_proc_params=PROC_SPEC,
            join="numu_cc+numubar_cc",
        )
        present = {str(fi) for fi in evts.flavints_present}
        assert "numu_cc" in present and "numubar_cc" in present
        # weighted_aeff: one_weight / ngen where the joined CC group pools
        # numu+numubar generation = tot_gen * physical_fract
        ngen_joined = 1000 * 10 * 0.8
        d = evts["numu_cc"]
        np.testing.assert_allclose(
            d["weighted_aeff"], d["one_weight"] / ngen_joined
        )
        # joined-group convention: every member holds the POOLED sample
        # (reference Events.histogram reads one representative member)
        np.testing.assert_array_equal(
            d["true_energy"], evts["numubar_cc"]["true_energy"]
        )
        # NC stays unjoined: per-flavor ngen, per-flavor (disjoint) samples
        d_nc = evts["numu_nc"]
        np.testing.assert_allclose(
            d_nc["weighted_aeff"], d_nc["one_weight"] / (ngen_joined / 2)
        )
        assert len(d_nc["true_energy"]) < len(d["true_energy"])
        # analysis cut applied
        assert (d["reco_energy"] > 2).all()
        assert evts.metadata["cuts"] == ["analysis"]
        import os

        assert os.path.exists(outpath)


class TestAddFluxToEventsFile:
    def test_adds_flux_fields(self, tmp_path):
        import numpy as np

        from pisa_tpu.scripts.add_flux_to_events_file import (
            add_fluxes_to_file,
        )
        from pisa_tpu.utils.fileio import from_file, to_file
        from pisa_tpu.utils.flux_weights import load_2d_table

        rng = np.random.RandomState(0)
        d = {
            "numu_cc": {
                "true_energy": rng.uniform(1, 80, 50),
                "true_coszen": rng.uniform(-1, 1, 50),
            },
            "muons": {"true_energy": rng.uniform(1, 80, 10)},
        }
        src = str(tmp_path / "ev.hdf5")
        to_file(d, src)
        table = load_2d_table("flux/honda-2015-spl-solmin-aa.d")
        out = add_fluxes_to_file(src, table, "nominal", overwrite=True)
        back = from_file(out)
        for t in ("nue", "nuebar", "numu", "numubar"):
            f = np.asarray(back["numu_cc"][f"nominal_{t}_flux"])
            assert f.shape == (50,) and (f > 0).all()
        # muons untouched
        assert "nominal_numu_flux" not in back["muons"]
        # idempotent without overwrite
        assert add_fluxes_to_file(src, table, "nominal") == out


class TestRetrieveExpression:
    """field_map entries may be expressions over node paths OR root-level
    dataset names (previously any expression referencing a root dataset
    raised NameError)."""

    def test_expression_over_root_dataset(self, tmp_path):
        import h5py

        path = str(tmp_path / "root.h5")
        z = np.linspace(0, np.pi, 50)
        with h5py.File(path, "w") as f:
            f.create_dataset("zenith", data=z)
            f.create_dataset("true_zenith", data=z + 0.1)
        with h5py.File(path, "r") as f:
            got = DataProcParams.retrieve_expression(f, "np.cos(zenith)")
            np.testing.assert_allclose(got, np.cos(z))
            # whole-identifier substitution: 'zenith' must not clobber
            # 'true_zenith'
            got2 = DataProcParams.retrieve_expression(
                f, "np.cos(true_zenith) + np.sin(zenith)"
            )
            np.testing.assert_allclose(got2, np.cos(z + 0.1) + np.sin(z))

    def test_expression_over_paths(self, tmp_path):
        import h5py

        path = str(tmp_path / "deep.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("a/x", data=np.arange(4.0))
            f.create_dataset("b/y", data=np.ones(4))
        with h5py.File(path, "r") as f:
            got = DataProcParams.retrieve_expression(f, "a/x * 2 + b/y")
            np.testing.assert_allclose(got, np.arange(4.0) * 2 + 1)
