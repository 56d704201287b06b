"""Tests for the foundation layer: units, jsons, hashing, comparisons."""

import numpy as np
import pytest

from pisa_tpu import ureg, Q_
from pisa_tpu.units import DimensionalityError
from pisa_tpu.utils.comparisons import recursiveEquality
from pisa_tpu.utils.hash import hash_obj
from pisa_tpu.utils.jsons import to_json, from_json


class TestUnits:
    def test_basic_conversion(self):
        q = 2.5 * ureg.km
        assert q.m_as("m") == 2500.0
        assert q.m_as(ureg.km) == 2.5
        assert (1 * ureg.GeV).m_as("eV") == 1e9

    def test_angles_dimensionless(self):
        q = 180 * ureg.degree
        assert np.isclose(q.m_as("rad"), np.pi)
        # pint-like: angles convert to dimensionless
        assert np.isclose(q.m_as("dimensionless"), np.pi)
        # but unit identity distinguishes them
        assert ureg.degree != ureg.dimensionless
        assert ureg.rad != ureg.dimensionless
        assert ureg.deg == ureg.degree

    def test_ev_squared(self):
        q = 2.5e-3 * ureg.eV**2
        assert q.m_as("eV**2") == 2.5e-3
        assert str(q.units) == "eV ** 2"

    def test_incompatible_raises(self):
        with pytest.raises(DimensionalityError):
            (1 * ureg.km).m_as("s")

    def test_arithmetic(self):
        a = 1 * ureg.km
        b = 500 * ureg.m
        assert (a + b).m_as("m") == 1500.0
        assert (a - b).magnitude == 0.5
        assert ((a * b).m_as("m**2")) == 500_000.0
        assert (a / b).m_as("dimensionless") == 2.0
        assert (2 * a).magnitude == 2

    def test_array_magnitude(self):
        arr = np.array([1.0, 2.0]) * ureg.GeV
        assert arr.shape == (2,)
        np.testing.assert_allclose(arr.m_as("MeV"), [1000.0, 2000.0])

    def test_comparisons(self):
        assert (1 * ureg.km) == (1000 * ureg.m)
        assert (1 * ureg.km) < (2000 * ureg.m)
        assert (1 * ureg.km) != (1 * ureg.s)

    def test_parse(self):
        assert ureg("2.5 km").m_as("m") == 2500.0
        assert ureg("3 * GeV").m_as("GeV") == 3
        assert ureg("1.5").magnitude == 1.5
        assert ureg.parse_units("eV ** 2") == (ureg.eV**2)
        q = ureg("2.5 * units.common_year")
        assert np.isclose(q.m_as("s"), 2.5 * 365 * 86400)

    def test_common_vs_julian_year(self):
        assert (1 * ureg.common_year).m_as("s") == 365.0 * 86400
        assert (1 * ureg.julian_year).m_as("s") == 365.25 * 86400


class TestJsons:
    def test_roundtrip(self, tmp_path):
        content = {
            "a": np.arange(4).astype(float),
            "b": 3.5 * ureg.GeV,
            "c": {"nested": [1, 2, "x"]},
            "d": np.inf,
            "e": None,
        }
        fname = str(tmp_path / "test.json")
        to_json(content, fname)
        loaded = from_json(fname)
        assert np.allclose(loaded["a"], content["a"])
        assert loaded["b"] == content["b"]
        assert loaded["c"] == {"nested": [1, 2, "x"]}
        assert np.isposinf(loaded["d"])
        assert loaded["e"] is None

    def test_bz2(self, tmp_path):
        fname = str(tmp_path / "test.json.bz2")
        to_json({"x": [1.5, 2.5]}, fname)
        assert from_json(fname) == {"x": [1.5, 2.5]}


class TestHash:
    def test_deterministic(self):
        obj = {"a": np.linspace(0, 1, 10), "b": 2.5 * ureg.km}
        assert hash_obj(obj) == hash_obj(obj)

    def test_distinct(self):
        assert hash_obj([1, 2, 3]) != hash_obj([1, 2, 4])

    def test_unit_normalization(self):
        # same physical value in different units hashes equal
        assert hash_obj(1 * ureg.km, sigfigs=12) == hash_obj(1000 * ureg.m, sigfigs=12)

    def test_sigfig_rounding(self):
        a = hash_obj(1.00000000001, sigfigs=5)
        b = hash_obj(1.00000000002, sigfigs=5)
        assert a == b


class TestComparisons:
    def test_recursive_equality(self):
        x = {"a": [1.0, 2.0], "b": {"c": np.ones(3)}}
        y = {"a": [1.0, 2.0], "b": {"c": np.ones(3)}}
        assert recursiveEquality(x, y)
        y["b"]["c"] = np.zeros(3)
        assert not recursiveEquality(x, y)

    def test_quantity_equality(self):
        assert recursiveEquality(1 * ureg.km, 1000 * ureg.m)
        assert not recursiveEquality(1 * ureg.km, 1 * ureg.m)


class TestSplineUtils:
    """Spline/CombinedSpline/spline_smooth (cf. reference spline.py)."""

    def test_spline_get_map(self):
        import numpy as np
        from pisa_tpu import ureg
        from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
        from pisa_tpu.core.map import Map
        from pisa_tpu.utils.spline import CombinedSpline, Spline

        binning = MultiDimBinning(
            [OneDimBinning("true_energy", num_bins=10, is_log=True,
                           domain=[1, 100] * ureg.GeV)],
            name="b",
        )

        def eval_spl(spline, b, name=""):
            x = np.asarray(b["true_energy"].weighted_centers.magnitude)
            return Map(name=name, hist=spline(x), binning=b)

        s = Spline("numu_cc", spline=lambda x: x**-2, eval_spl=eval_spl)
        m = s.get_map(binning)
        assert m.hist.shape == (10,)
        assert np.all(np.diff(np.asarray(m.hist)) < 0)

        cs = CombinedSpline([s])
        ms = cs.get_mapset(binning)
        assert ms.names == ["numu_cc"]

    def test_spline_smooth(self):
        import numpy as np
        from pisa_tpu import ureg
        from pisa_tpu.core.binning import OneDimBinning
        from pisa_tpu.utils.spline import spline_smooth

        b = OneDimBinning("e", num_bins=20, is_lin=True, domain=[0, 10])
        rng = np.random.RandomState(0)
        x = np.asarray(b.weighted_centers.magnitude)
        truth = np.stack([np.sin(x / 2), np.cos(x / 2)], axis=1)
        noisy = truth + rng.normal(0, 0.05, truth.shape)
        smoothed = spline_smooth(
            noisy, b, b, axis=0, smooth_factor=0.5,
            errors=np.full(truth.shape, 0.05),
        )
        # smoothing reduces the residual vs truth
        assert (
            np.abs(smoothed - truth).mean()
            < np.abs(noisy - truth).mean()
        )


def test_cross_sections_store():
    from pisa_tpu.utils.cross_sections import test_CrossSections

    test_CrossSections()
