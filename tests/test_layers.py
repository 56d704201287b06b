"""Earth-layer geometry tests, mirroring reference ``layers.py:485-669``
(test_layers_1..4 expectations) against the closed-form vectorized
implementation."""

import numpy as np
import pytest

from pisa_tpu.ops.osc.layers import Layers


@pytest.fixture
def layer():
    lyr = Layers("osc/PREM_4layer.dat", detector_depth=1.0, prop_height=20.0)
    lyr.setElecFrac(0.4656, 0.4656, 0.4957)
    return lyr


def nonzero_segments(dist_row):
    return dist_row[dist_row > 0]


class TestCriticalCoszen:
    def test_limits(self, layer):
        ref = np.array(
            [
                1.0,
                1.0,
                -0.4461133826191877,
                -0.8375825182106081,
                -0.9814881717430358,
                -1.0,
            ]
        )
        np.testing.assert_allclose(layer.coszen_limit, ref, rtol=1e-12)


class TestPathLength:
    def test_total_vacuum_path(self, layer):
        input_cz = np.cos(
            np.array(
                [0.0, 36.0, 63.0, 90.0, 105.0, 125.0, 170.0, 180.0]
            )
            * np.pi
            / 180.0
        )
        expected = np.array(
            [
                21.0,
                25.934954968613056,
                45.9673929915939,
                517.6688130455607,
                3376.716060094899,
                7343.854310588515,
                12567.773643090592,
                12761.0,
            ]
        )
        layer.calcPathLength(input_cz)
        np.testing.assert_allclose(layer.distance, expected, rtol=1e-9)


class TestSegments:
    """Reference test_layers_3 expectations."""

    cz_values = np.array([1.0, 0.0, -0.4461133826191877, -1.0])

    def get(self, layer):
        layer.calcLayers(self.cz_values)
        return (
            layer.distance.reshape(4, layer.max_layers),
            layer.density.reshape(4, layer.max_layers),
            layer.n_layers,
        )

    def test_downgoing(self, layer):
        dist, dens, n = self.get(layer)
        np.testing.assert_allclose(
            nonzero_segments(dist[0]), [20.0, 1.0], rtol=1e-9
        )

    def test_horizontal(self, layer):
        dist, _, _ = self.get(layer)
        np.testing.assert_allclose(
            nonzero_segments(dist[1]),
            [404.79277484435556, 112.87603820120549],
            rtol=1e-9,
        )

    def test_tangent(self, layer):
        dist, _, _ = self.get(layer)
        np.testing.assert_allclose(
            nonzero_segments(dist[2]),
            [44.525143211129944, 5685.725369597015],
            rtol=1e-6,
        )

    def test_upgoing(self, layer):
        dist, dens, _ = self.get(layer)
        np.testing.assert_allclose(
            nonzero_segments(dist[3]),
            [20.0, 670.0, 2221.0, 2260.0, 2440.0, 2260.0, 2221.0, 669.0],
            rtol=1e-9,
        )
        # symmetric density profile through the core
        d = dens[3][dist[3] > 0]
        # atmosphere has zero electron-weighted density (outside R_MANTLE)
        assert d[0] == 0.0
        np.testing.assert_allclose(d[1:], d[1:][::-1], rtol=1e-12)

    def test_totals_match_vacuum(self, layer):
        dist, _, _ = self.get(layer)
        layer.calcPathLength(self.cz_values)
        np.testing.assert_allclose(
            dist.sum(axis=1), layer.distance, rtol=1e-9
        )

    def test_many_coszen_no_nan(self, layer):
        cz = np.linspace(-1, 1, 10001)
        layer.calcLayers(cz)
        d = layer.distance.reshape(len(cz), layer.max_layers)
        assert np.all(np.isfinite(d))
        layer.calcPathLength(cz)
        np.testing.assert_allclose(d.sum(axis=1), layer.distance, rtol=1e-6)


class TestElecFrac:
    """Reference test_layers_4: repeated setElecFrac is reproducible."""

    def test_reproducible(self):
        layer = Layers("osc/PREM_4layer.dat", detector_depth=1.0, prop_height=20.0)
        cz = np.array([1.0, 0.0, -0.4461133826191877, -1.0])
        layer.setElecFrac(0.4656, 0.4656, 0.4957)
        layer.calcLayers(cz)
        d1 = layer.density.copy()
        layer.setElecFrac(0.5, 0.5, 0.5)
        layer.calcLayers(cz)
        d2 = layer.density.copy()
        assert not np.allclose(d1, d2)
        layer.setElecFrac(0.4656, 0.4656, 0.4957)
        layer.calcLayers(cz)
        np.testing.assert_allclose(layer.density, d1, rtol=1e-14)

    def test_expected_weighting(self):
        layer = Layers("osc/PREM_4layer.dat", detector_depth=1.0, prop_height=20.0)
        layer.setElecFrac(0.5, 0.5, 0.5)
        # mantle shell (outer radius 6371) weighted by YeM=0.5
        np.testing.assert_allclose(layer.rhos[1], 3.3 * 0.5)
        # inner core weighted by YeI
        np.testing.assert_allclose(layer.rhos[-1], 13.0 * 0.5)
        # electron + neutron fractions complementary
        np.testing.assert_allclose(
            layer.rhos + layer.rhos_neutron_weighted,
            layer.rhos_unweighted * (layer.radii <= 6371.0),
            rtol=1e-12,
        )


class TestScaling:
    def test_density_scaling(self):
        layer = Layers("osc/PREM_4layer.dat", detector_depth=1.0, prop_height=20.0)
        layer.setElecFrac(0.5, 0.5, 0.5)
        base = layer.rhos.copy()
        layer.scaling(1.2)
        layer.setElecFrac(0.5, 0.5, 0.5)
        np.testing.assert_allclose(layer.rhos, 1.2 * base, rtol=1e-12)
        # reset
        layer.scaling(None)
        layer.setElecFrac(0.5, 0.5, 0.5)
        np.testing.assert_allclose(layer.rhos, base, rtol=1e-12)
