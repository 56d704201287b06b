"""Tests for Map/MapSet and the stats metric family."""

import numpy as np
import pytest

from pisa_tpu import FTYPE

_FP64 = FTYPE == np.float64
STAT_RTOL = 1e-6 if _FP64 else 1e-4
STAT_ATOL = 0.0 if _FP64 else 1e-3
from scipy.special import gammaln as sp_gammaln

from pisa_tpu import ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.core.map import Map, MapSet
from pisa_tpu.utils import stats


@pytest.fixture
def binning():
    e = OneDimBinning("energy", domain=[1, 80] * ureg.GeV, num_bins=8, is_log=True)
    cz = OneDimBinning("coszen", domain=[-1, 1], num_bins=5, is_lin=True)
    return e * cz


@pytest.fixture
def m0(binning):
    rng = np.random.RandomState(0)
    return Map("nue", rng.uniform(1, 10, binning.shape), binning)


@pytest.fixture
def m1(binning):
    rng = np.random.RandomState(1)
    hist = rng.uniform(1, 10, binning.shape)
    return Map("numu", hist, binning, error_hist=np.sqrt(hist))


class TestMap:
    def test_basic(self, m0, binning):
        assert m0.shape == (8, 5)
        assert m0.binning == binning
        assert m0.variance is None

    def test_arithmetic_error_propagation(self, m1):
        s = m1 + m1
        np.testing.assert_allclose(s.hist, 2 * m1.hist)
        # independent propagation: var doubles... (2 copies treated indep)
        np.testing.assert_allclose(s.variance, 2 * m1.variance)
        p = m1 * 3.0
        np.testing.assert_allclose(p.variance, 9 * m1.variance)
        r = m1 / m1
        np.testing.assert_allclose(r.hist, 1.0)

    def test_mul_two_maps(self, m0, m1):
        p = m0 * m1
        np.testing.assert_allclose(p.hist, m0.hist * m1.hist)
        np.testing.assert_allclose(p.variance, m0.hist**2 * m1.variance)

    def test_sum_project(self, m0):
        total = m0.sum()
        assert np.isclose(total, m0.hist.sum())
        proj = m0.project("energy")
        assert proj.shape == (8,)
        np.testing.assert_allclose(proj.hist, m0.hist.sum(axis=1))

    def test_rebin_downsample(self, m0):
        d = m0.downsample(2, 1)
        assert d.shape == (4, 5)
        np.testing.assert_allclose(d.hist.sum(), m0.hist.sum())
        np.testing.assert_allclose(d.hist[0], m0.hist[0] + m0.hist[1])

    def test_split(self, binning):
        pid = OneDimBinning(
            "pid", bin_edges=[-1000.0, 0.0, 1000.0], bin_names=["cascades", "tracks"]
        )
        b3 = binning * pid
        m = Map("nu", np.arange(b3.size).reshape(b3.shape), b3)
        ms = m.split("pid")
        assert ms.names == ["nu_cascades", "nu_tracks"]
        np.testing.assert_allclose(ms["nu_tracks"].hist, m.hist[..., 1])

    def test_fluctuate_poisson(self, m0):
        f1 = m0.fluctuate("poisson", random_state=42)
        f2 = m0.fluctuate("poisson", random_state=42)
        np.testing.assert_array_equal(f1.hist, f2.hist)
        assert not np.allclose(f1.hist, m0.hist)
        assert f1.variance is not None

    def test_fluctuate_gauss(self, m1):
        f = m1.fluctuate("gauss", random_state=7)
        assert f.shape == m1.shape

    def test_serialization(self, m1, tmp_path):
        f = str(tmp_path / "m.json")
        m1.to_json(f)
        loaded = Map.from_json(f)
        assert loaded == m1
        assert loaded.name == "numu"
        np.testing.assert_allclose(loaded.variance, m1.variance)

    def test_metric(self, m0):
        # chi2 of identical maps is ~0
        assert m0.metric_per_map(m0, "chi2") < 1e-10
        assert abs(m0.metric_per_map(m0, "llh")) < 1e-8


class TestMapSet:
    def test_basic(self, m0, m1):
        ms = MapSet([m0, m1], name="test")
        assert ms.names == ["nue", "numu"]
        assert ms["numu"] is m1
        assert ms.numu is m1

    def test_arithmetic(self, m0, m1):
        ms = MapSet([m0, m1])
        doubled = ms * 2
        np.testing.assert_allclose(doubled["nue"].hist, 2 * m0.hist)
        s = ms + ms
        np.testing.assert_allclose(s["numu"].hist, 2 * m1.hist)

    def test_sum(self, m0, m1):
        ms = MapSet([m0, m1], name="total")
        total = ms.sum()
        np.testing.assert_allclose(total.hist, m0.hist + m1.hist)

    def test_combine_re(self, binning):
        maps = [
            Map(n, np.ones(binning.shape), binning)
            for n in ["nue_cc", "numu_cc", "nue_nc", "numu_nc"]
        ]
        ms = MapSet(maps)
        combined = ms.combine_re([r".*_cc", r".*_nc"])
        assert len(combined) == 2
        np.testing.assert_allclose(combined.maps[0].hist, 2.0)

    def test_combine_wildcard(self, binning):
        maps = [
            Map(n, np.ones(binning.shape), binning)
            for n in ["nue_cc", "numu_cc", "nue_nc"]
        ]
        combined = MapSet(maps).combine_wildcard("nue_*")
        assert len(combined) == 1
        np.testing.assert_allclose(combined.maps[0].hist, 2.0)

    def test_metric_total(self, m0, m1):
        ms = MapSet([m0, m1])
        assert ms.metric_total(ms, "chi2") < 1e-9

    def test_serialization(self, m0, m1, tmp_path):
        ms = MapSet([m0, m1], name="x")
        f = str(tmp_path / "ms.json")
        ms.to_json(f)
        loaded = MapSet.from_json(f)
        assert loaded == ms


class TestStats:
    """Validate metric formulas against independent numpy implementations."""

    rng = np.random.RandomState(3)
    a = rng.poisson(10, 50).astype(float)
    e = rng.uniform(5, 15, 50)
    var = rng.uniform(0.1, 2.0, 50)

    def test_chi2(self):
        expect = (self.a - self.e) ** 2 / self.e
        np.testing.assert_allclose(np.asarray(stats.chi2(self.a, self.e)), expect, rtol=STAT_RTOL, atol=STAT_ATOL)

    def test_llh_stirling(self):
        expect = (
            self.a * np.log(self.e)
            - self.e
            - (self.a * np.log(self.a) - self.a)
        )
        np.testing.assert_allclose(np.asarray(stats.llh(self.a, self.e)), expect, rtol=STAT_RTOL, atol=STAT_ATOL)

    def test_poisson_llh(self):
        expect = self.a * np.log(self.e) - self.e - sp_gammaln(self.a + 1)
        np.testing.assert_allclose(
            np.asarray(stats.poisson_llh(self.a, self.e)), expect, rtol=STAT_RTOL, atol=STAT_ATOL
        )

    def test_mod_chi2(self):
        expect = (self.a - self.e) ** 2 / (self.var + self.e)
        np.testing.assert_allclose(
            np.asarray(stats.mod_chi2(self.a, self.e, self.var)), expect, rtol=STAT_RTOL, atol=STAT_ATOL
        )

    def test_correct_chi2(self):
        tv = self.var + self.e
        expect = (self.a - self.e) ** 2 / tv + np.log(tv)
        np.testing.assert_allclose(
            np.asarray(stats.correct_chi2(self.a, self.e, self.var)), expect, rtol=STAT_RTOL, atol=STAT_ATOL
        )

    def test_mcllh_formulas(self):
        # against the reference poisson_gamma formula
        for aa, bb, fn in [(0.0, 0.0, stats.mcllh_mean), (1.0, 0.0, stats.mcllh_eff)]:
            alpha = self.e**2 / self.var + aa
            beta = self.e / self.var + bb
            k = self.a
            expect = (
                alpha * np.log(beta)
                + sp_gammaln(k + alpha)
                - sp_gammaln(k + 1)
                - (k + alpha) * np.log1p(beta)
                - sp_gammaln(alpha)
            )
            np.testing.assert_allclose(
                np.asarray(fn(self.a, self.e, self.var)), expect, rtol=STAT_RTOL, atol=STAT_ATOL
            )

    def test_mcllh_zero_variance_poisson_limit(self):
        out = np.asarray(stats.mcllh_eff(self.a, self.e, np.zeros_like(self.e)))
        expect = np.asarray(stats.poisson_llh(self.a, self.e))
        np.testing.assert_allclose(out, expect, rtol=STAT_RTOL, atol=STAT_ATOL)

    def test_llh_zero_actual_finite(self):
        # reference gives NaN at a=0 (Stirling); we use the limit -> finite
        out = np.asarray(stats.llh(np.zeros(3), np.ones(3)))
        assert np.all(np.isfinite(out))

    def test_metrics_jit_and_grad(self):
        import jax

        def neg_llh(e):
            return -stats.llh(self.a, e).sum()

        g = jax.grad(neg_llh)(np.asarray(self.e))
        # analytic: d/de (-(a ln e - e)) = -(a/e - 1)
        np.testing.assert_allclose(
            np.asarray(g), -(self.a / self.e - 1),
            rtol=1e-5 if _FP64 else 2e-4, atol=STAT_ATOL,
        )

    def test_maximize_minimize(self):
        assert stats.is_metric_to_maximize("llh")
        assert not stats.is_metric_to_maximize("mod_chi2")
        assert stats.it_got_better(-10, -20, "llh")
        assert stats.it_got_better(1.0, 2.0, "chi2")

    def test_barlow_llh_sane(self):
        # exact at data == expected, worse elsewhere
        out_eq = np.asarray(stats.barlow_llh(self.e, self.e, self.var)).sum()
        out_off = np.asarray(stats.barlow_llh(self.e * 1.5, self.e, self.var)).sum()
        assert out_eq > out_off

    def test_conv_llh_normalized(self):
        # conv_llh(a, a) ~ 0 by construction
        out = np.asarray(stats.conv_llh(self.a[:5], self.a[:5], self.var[:5]))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)
