"""Tests for Param/ParamSet/ParamSelector/Prior/DerivedParam (modeled on
reference ``pisa/core/param.py:1741+`` embedded tests and the covariance
harness ``pisa_tests/test_covariance.py``)."""

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.core.param import DerivedParam, Param, ParamSelector, ParamSet
from pisa_tpu.core.prior import Prior


def mk_theta23(val=42.0, fixed=False):
    return Param(
        name="theta23",
        value=val * ureg.degree,
        range=[0, 90] * ureg.degree,
        prior=Prior(kind="uniform"),
        is_fixed=fixed,
    )


class TestParam:
    def test_basic(self):
        p = mk_theta23()
        assert p.value.m_as("degree") == 42.0
        assert not p.is_fixed
        p.value = 45 * ureg.degree
        assert p.value.m_as("deg") == 45

    def test_unit_conversion_on_set(self):
        p = mk_theta23()
        p.value = (np.pi / 4) * ureg.rad
        assert np.isclose(p.value.m_as("degree"), 45.0)
        # value keeps original units
        assert p.value.units == ureg.degree

    def test_range_validation(self):
        p = mk_theta23()
        with pytest.raises(ValueError):
            p.value = 100 * ureg.degree

    def test_rescaling_roundtrip(self):
        p = mk_theta23(val=45.0)
        assert np.isclose(p._rescaled_value, 0.5)
        p._rescaled_value = 0.25
        assert np.isclose(p.value.m_as("degree"), 22.5)

    def test_log_scaling(self):
        p = Param(
            name="x",
            value=1.0,
            range=[0.1, 10.0],
            scales_as_log=True,
            is_fixed=False,
        )
        assert np.isclose(p._rescaled_value, 0.5)
        p._rescaled_value = 1.0
        assert np.isclose(p.value.magnitude, 10.0)

    def test_negative_log_range(self):
        p = Param(
            name="x",
            value=-1.0,
            range=[-10.0, -0.1],
            scales_as_log=True,
            is_fixed=False,
        )
        r = p._rescaled_value
        p2 = Param(
            name="x", value=-1.0, range=[-10.0, -0.1], scales_as_log=True
        )
        p2._rescaled_value = r
        assert np.isclose(p2.value.magnitude, -1.0)

    def test_prior_penalty(self):
        p = Param(
            name="y",
            value=1.5,
            range=[0, 3],
            prior=Prior(kind="gaussian", mean=1.0, stddev=0.5),
            is_fixed=False,
        )
        assert np.isclose(p.prior_penalty("llh"), -0.5)
        assert np.isclose(p.prior_penalty("chi2"), 1.0)

    def test_nominal_reset(self):
        p = mk_theta23()
        p.value = 50 * ureg.degree
        p.reset()
        assert p.value.m_as("degree") == 42.0

    def test_randomize_in_range(self):
        p = mk_theta23()
        p.randomize(7)
        assert 0 <= p.value.m_as("degree") <= 90

    def test_serialization(self, tmp_path):
        p = Param(
            name="z",
            value=2.5e-3 * ureg.eV**2,
            range=[1e-3, 7e-3] * ureg.eV**2,
            prior=Prior(kind="gaussian", mean=2.5e-3 * ureg.eV**2, stddev=1e-4 * ureg.eV**2),
            is_fixed=False,
        )
        f = str(tmp_path / "p.json")
        p.to_json(f)
        loaded = Param.from_json(f)
        assert loaded == p
        assert loaded.prior == p.prior


class TestParamSet:
    def setup_method(self):
        self.t23 = mk_theta23()
        self.dm31 = Param(
            name="deltam31",
            value=2.5e-3 * ureg.eV**2,
            range=[1e-3, 7e-3] * ureg.eV**2,
            is_fixed=True,
        )
        self.norm = Param(
            name="aeff_scale", value=1.0, range=[0.0, 3.0], is_fixed=False
        )
        self.ps = ParamSet([self.t23, self.dm31, self.norm])

    def test_access(self):
        assert self.ps.names == ("theta23", "deltam31", "aeff_scale")
        assert self.ps["theta23"] is self.t23
        assert self.ps.theta23 is self.t23
        assert "deltam31" in self.ps

    def test_free_fixed(self):
        assert self.ps.free.names == ("theta23", "aeff_scale")
        assert self.ps.fixed.names == ("deltam31",)
        self.ps.fix("theta23")
        assert self.ps.free.names == ("aeff_scale",)
        self.ps.unfix("theta23")

    def test_identity_sharing_update(self):
        other = ParamSet([mk_theta23()])
        other.update(self.t23, existing_must_match=True)
        assert other["theta23"] is self.t23
        # changing via one alias is visible via the other
        self.t23.value = 43 * ureg.degree
        assert other["theta23"].value.m_as("deg") == 43
        self.t23.value = 42 * ureg.degree

    def test_update_conflict_raises(self):
        conflicting = Param(
            name="theta23",
            value=10 * ureg.degree,
            range=[0, 90] * ureg.degree,
            is_fixed=False,
        )
        with pytest.raises(ValueError):
            ParamSet([self.t23]).update(conflicting, existing_must_match=True)

    def test_rescaled_values(self):
        free = self.ps.free
        rv = free._rescaled_values
        assert all(0 <= v <= 1 for v in rv)
        free._rescaled_values = [0.5, 0.5]
        assert np.isclose(self.ps.theta23.value.m_as("deg"), 45)
        assert np.isclose(self.ps.aeff_scale.value.magnitude, 1.5)

    def test_values_hash_changes(self):
        h0 = self.ps.values_hash
        self.ps.theta23.value = 44 * ureg.degree
        assert self.ps.values_hash != h0

    def test_randomize_reset(self):
        self.ps.randomize_free(3)
        assert not np.isclose(self.ps.theta23.value.m_as("deg"), 42)
        self.ps.reset_free()
        assert np.isclose(self.ps.theta23.value.m_as("deg"), 42)

    def test_priors_penalty(self):
        assert self.ps.priors_penalty("llh") == 0.0

    def test_serialization(self, tmp_path):
        f = str(tmp_path / "ps.json")
        self.ps.to_json(f)
        loaded = ParamSet.from_json(f)
        assert loaded.names == self.ps.names
        assert loaded == self.ps


class TestCovariance:
    """Covariance rotation round-trip (cf. pisa_tests/test_covariance.py)."""

    def mk_ps(self):
        a = Param(
            name="a",
            value=1.0,
            range=[-5.0, 7.0],
            prior=Prior(kind="gaussian", mean=1.0, stddev=1.0),
            is_fixed=False,
        )
        b = Param(
            name="b",
            value=2.0,
            range=[-4.0, 8.0],
            prior=Prior(kind="gaussian", mean=2.0, stddev=2.0),
            is_fixed=False,
        )
        return ParamSet([a, b])

    def test_rotation_roundtrip(self):
        ps = self.mk_ps()
        cov = {"a": {"a": 1.0, "b": 0.6}, "b": {"a": 0.6, "b": 4.0}}
        ps.add_covariance(cov)
        # originals become derived, new rotated params exist and are free
        assert "a_rotated" in ps and "b_rotated" in ps
        assert isinstance(ps["a"], DerivedParam)
        assert not ps["a_rotated"].is_fixed
        # at rotated values 0, derived params equal their means
        ps["a_rotated"].value = 0.0
        ps["b_rotated"].value = 0.0
        assert np.isclose(ps["a"].value.magnitude, 1.0)
        assert np.isclose(ps["b"].value.magnitude, 2.0)
        # sampling: covariance of derived params reproduces input cov
        rng = np.random.RandomState(0)
        samples = []
        s1 = ps["a_rotated"].prior.stddev.magnitude
        s2 = ps["b_rotated"].prior.stddev.magnitude
        for _ in range(4000):
            ps["a_rotated"].value = rng.normal(0, s1)
            ps["b_rotated"].value = rng.normal(0, s2)
            samples.append(
                [ps["a"].value.magnitude, ps["b"].value.magnitude]
            )
        emp = np.cov(np.asarray(samples).T)
        assert np.allclose(
            emp, [[1.0, 0.6], [0.6, 4.0]], atol=0.25
        ), emp

    def test_derived_zero_penalty(self):
        ps = self.mk_ps()
        ps.add_covariance({"a": {"a": 1.0}})
        assert ps["a"].prior_penalty("llh") == 0.0


class TestParamSelector:
    def mk_selector(self):
        reg = ParamSet(
            [Param(name="aeff_scale", value=1.0, range=[0, 3], is_fixed=False)]
        )
        nh = Param(
            name="deltam31",
            value=2.5e-3 * ureg.eV**2,
            range=[1e-3, 7e-3] * ureg.eV**2,
        )
        ih = Param(
            name="deltam31",
            value=-2.4e-3 * ureg.eV**2,
            range=[-7e-3, -1e-3] * ureg.eV**2,
        )
        return ParamSelector(
            regular_params=reg,
            selector_param_sets={"nh": [nh], "ih": [ih]},
            selections="nh",
        )

    def test_selection(self):
        sel = self.mk_selector()
        assert sel.params["deltam31"].value.magnitude > 0
        sel.select_params("ih")
        assert sel.params["deltam31"].value.magnitude < 0
        sel.select_params("nh")
        assert sel.params["deltam31"].value.magnitude > 0

    def test_regular_params_present(self):
        sel = self.mk_selector()
        assert "aeff_scale" in sel.params

    def test_missing_selection_error(self):
        sel = self.mk_selector()
        with pytest.raises(KeyError):
            sel.select_params("bogus", error_on_missing=True)


class TestPrior:
    def test_uniform(self):
        p = Prior(kind="uniform", llh_offset=-1.0)
        assert p.llh(5.0) == -1.0
        assert p.chi2(5.0) == 2.0

    def test_gaussian(self):
        p = Prior(kind="gaussian", mean=10 * ureg.GeV, stddev=2 * ureg.GeV)
        assert np.isclose(p.llh(12 * ureg.GeV), -0.5)
        # bare number interpreted in prior units
        assert np.isclose(p.llh(12.0), -0.5)
        # other units converted
        assert np.isclose(p.llh(12000 * ureg.MeV), -0.5)

    def test_linterp(self):
        p = Prior(kind="linterp", param_vals=[0.0, 1.0, 2.0], llh_vals=[-2.0, 0.0, -2.0])
        assert np.isclose(p.llh(0.5), -1.0)
        assert p.max_at.magnitude == 1.0
        with pytest.raises(ValueError):
            p.llh(3.0)

    def test_spline(self):
        from scipy.interpolate import splrep

        x = np.linspace(0, np.pi, 50)
        y = -((x - 1.5) ** 2)
        knots, coeffs, deg = splrep(x, y)
        p = Prior(kind="spline", knots=knots, coeffs=coeffs, deg=deg)
        assert np.isclose(p.llh(1.0), -0.25, atol=1e-4)
        assert np.isclose(p.max_at.magnitude, 1.5, atol=0.01)

    def test_jax_matches_host(self):
        p = Prior(kind="gaussian", mean=1.0, stddev=0.5)
        xs = np.linspace(0, 2, 7)
        np.testing.assert_allclose(
            np.asarray(p.llh_jax(xs)), p.llh(xs), rtol=1e-6
        )

    def test_serialization_roundtrip(self):
        p = Prior(kind="gaussian", mean=10 * ureg.GeV, stddev=2 * ureg.GeV)
        p2 = Prior.from_state(p.state)
        assert p == p2
