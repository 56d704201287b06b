"""End-to-end pipeline tests (cf. reference
``pisa_tests/test_example_pipelines.py`` + embedded ``test_Pipeline``):
build pipelines from packaged configs, evaluate templates, validate physics
and orchestration semantics."""

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.core.pipeline import Pipeline


@pytest.fixture(scope="module")
def osc_pipeline():
    cfg = "settings/pipeline/osc_example_coarse.cfg"
    return Pipeline(cfg)


class TestOscExamplePipeline:
    def test_structure(self, osc_pipeline):
        p = osc_pipeline
        assert len(p.stages) == 3
        assert [s.stage_name for s in p.stages] == ["data", "flux", "osc"]
        assert "theta23" in p.params.names
        assert set(p.params.free.names) == {"delta_index", "theta23"}

    def test_param_sharing(self, osc_pipeline):
        # same-named params across stages are one object
        p = osc_pipeline
        t23_osc = p["osc"].params["theta23"]
        assert p.params["theta23"] is t23_osc

    def test_oscillogram_physics(self, osc_pipeline):
        maps = osc_pipeline.get_outputs()
        assert len(maps) == 12
        numu = maps["numu_cc"].hist
        assert numu.shape == (24, 24)
        # toy flux is (0, 1): weights = P(numu -> flav); unitarity across flavors
        tot = (
            maps["nue_cc"].hist + maps["numu_cc"].hist + maps["nutau_cc"].hist
        )
        from pisa_tpu import FTYPE
        np.testing.assert_allclose(
            tot, 1.0, atol=1e-10 if FTYPE == np.float64 else 2e-4
        )
        # strong disappearance dip at upgoing ~25 GeV
        E = np.logspace(0, 3, numu.shape[0] + 1)
        Ec = np.sqrt(E[:-1] * E[1:])
        dip_E = Ec[np.argmin(numu[:, 0])]
        assert 8 < dip_E < 40, dip_E  # first or second osc minimum (coarse grid)
        assert numu.min() < 0.05  # deep dip
        # nubar maps differ from nu maps (matter effects)
        assert not np.allclose(
            maps["numu_cc"].hist, maps["numubar_cc"].hist, atol=1e-3
        )

    def test_selector_switching(self, osc_pipeline):
        p = osc_pipeline
        nh = p.get_outputs()
        p.select_params("ih")
        assert p.params["deltam31"].value.magnitude < 0
        ih = p.get_outputs()
        assert not np.allclose(nh["numu_cc"].hist, ih["numu_cc"].hist)
        p.select_params("nh")
        nh2 = p.get_outputs()
        np.testing.assert_allclose(nh["numu_cc"].hist, nh2["numu_cc"].hist)

    def test_compute_cache(self, osc_pipeline):
        """Second evaluation with unchanged params reuses stage caches."""
        p = osc_pipeline
        m1 = p.get_outputs()
        osc_stage = p["osc"]
        h = osc_stage.param_hash
        m2 = p.get_outputs()
        assert osc_stage.param_hash == h
        np.testing.assert_allclose(m1["numu_cc"].hist, m2["numu_cc"].hist)

    def test_free_param_changes_template(self, osc_pipeline):
        p = osc_pipeline
        base = p.get_outputs()["numu_cc"].hist.copy()
        t23 = p.params["theta23"]
        orig = t23.value
        t23.value = 50 * ureg.degree
        changed = p.get_outputs()["numu_cc"].hist
        t23.value = orig
        assert not np.allclose(base, changed)

    def test_rerun_after_reset(self, osc_pipeline):
        p = osc_pipeline
        m1 = p.get_outputs()["numu_cc"].hist.copy()
        p.setup()
        m2 = p.get_outputs()["numu_cc"].hist
        np.testing.assert_allclose(m1, m2)


class TestExamplePipeline:
    """The reference's flagship example.cfg: simple_data_loader -> barr ->
    prob3 (grid->events) -> aeff -> hist, with sumw2 errors."""

    def test_runs_and_compiles(self):
        import numpy as np
        from pisa_tpu.core.pipeline import Pipeline

        p = Pipeline("settings/pipeline/example.cfg")
        out = p.get_outputs()
        assert len(out) == 12
        tot = sum(float(np.asarray(m.hist).sum()) for m in out)
        assert np.isfinite(tot) and tot > 0
        assert out["numu_cc"].error_hist is not None

        ct = p.compile()
        r = ct(ct.current_rescaled_values())
        tot_c = sum(float(np.asarray(h).sum()) for h in r["hist"].values())
        assert np.isclose(tot_c, tot, rtol=1e-6)

    def test_scan_totals_matches_per_call(self):
        """The in-device sequential-scan evaluation (bench.py's headline
        procedure) must agree with one-call-per-template evaluation."""
        import numpy as np
        from pisa_tpu.core.pipeline import Pipeline

        p = Pipeline("settings/pipeline/example.cfg")
        ct = p.compile()
        n_free = len(ct.current_rescaled_values())
        vecs = np.random.RandomState(7).uniform(
            0.2, 0.8, size=(4, n_free)
        ).astype(np.float32)
        scanned = np.asarray(ct.scan_totals(vecs))
        singles = np.asarray(
            [
                sum(float(np.asarray(h).sum()) for h in ct(v)["hist"].values())
                for v in vecs
            ]
        )
        assert np.all(np.isfinite(scanned))
        np.testing.assert_allclose(scanned, singles, rtol=2e-6)

    def test_param_selection_switch(self):
        import numpy as np
        from pisa_tpu.core.pipeline import Pipeline

        p = Pipeline("settings/pipeline/example.cfg")
        out_nh = p.get_outputs()
        nh_total = float(np.asarray(out_nh["numu_cc"].hist).sum())
        p.select_params(["ih", "earth"])
        out_ih = p.get_outputs()
        ih_total = float(np.asarray(out_ih["numu_cc"].hist).sum())
        assert nh_total != ih_total


class TestKdePipeline:
    """KDE-smoothed example pipeline (cf. reference test_kde_stage.py)."""

    def test_kde_totals_match_hist(self):
        import numpy as np
        from pisa_tpu.core.pipeline import Pipeline

        p_kde = Pipeline("settings/pipeline/kde_example.cfg")
        out_kde = p_kde.get_outputs()
        p_hist = Pipeline("settings/pipeline/example.cfg")
        out_hist = p_hist.get_outputs()

        tot_kde = sum(float(np.asarray(m.hist).sum()) for m in out_kde)
        tot_hist = sum(float(np.asarray(m.hist).sum()) for m in out_hist)
        # KDE smooths but approximately conserves the total weight
        assert np.isclose(tot_kde, tot_hist, rtol=0.25)
        for m in out_kde:
            assert np.all(np.asarray(m.hist) >= 0)

    def test_kde_pipeline_compiles(self):
        """The KDE stage is tracer-safe (weight-zeroed PID channels, static
        fold/reduction maps), so KDE pipelines compile into the in-device
        template path like histogram pipelines — compiled output must match
        the eager stage run, and the objective must be differentiable
        through the KDE."""
        import numpy as np
        from pisa_tpu.core.pipeline import Pipeline

        from pisa_tpu import FTYPE

        p = Pipeline("settings/pipeline/kde_example.cfg")
        out_eager = p.get_outputs()
        ct = p.compile()
        out_compiled = ct.get_outputs()
        # compiled tracing reorders fused reductions -> roundoff-level
        # differences at fp32
        rtol = 1e-6 if FTYPE == np.float64 else 1e-4
        for m in out_eager:
            np.testing.assert_allclose(
                np.asarray(out_compiled[m.name].hist),
                np.asarray(m.hist),
                rtol=rtol,
                err_msg=m.name,
            )

        # gradient flows through the KDE (bandwidths, pilot, fold)
        value_only, value_and_grad = ct.build_objective(
            out_eager, metric="chi2"
        )
        v0 = ct.current_rescaled_values() * 0.9 + 0.05
        val, grad = value_and_grad(v0)
        assert np.isfinite(float(val))
        grad = np.asarray(grad)
        assert np.all(np.isfinite(grad)) and np.any(grad != 0)

        # in-device scan path used by bench.py
        vecs = np.random.RandomState(3).uniform(
            0.3, 0.7, size=(3, len(v0))
        )
        tots = np.asarray(ct.scan_totals(vecs))
        assert np.all(np.isfinite(tots)) and np.all(tots > 0)


class TestTabulate:
    """Notebook display helpers (cf. reference ``pipeline.py:132-146``)."""

    def test_tabulate_plain_presto_html(self, osc_pipeline):
        p = osc_pipeline
        plain = p.tabulate()
        assert "stage number" in plain and "data.toy_event_generator" in plain
        presto = p.tabulate(tablefmt="presto")
        assert " | " in presto and "-+-" in presto
        html = p._repr_html_()
        assert html.startswith("<table>") and "osc.prob3" in html
        # one row per stage
        assert html.count("<tr>") == 1 + len(p.stages)
