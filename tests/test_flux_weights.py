"""
Flux-table tests: the vectorized integral-preserving evaluation must match a
direct per-event transcription of the published NuFlux/PISA scheme
(cumulative splrep + derivative; cf. reference ``flux_weights.py:267-349``)
to round-off, and satisfy physical sanity constraints.
"""

import numpy as np
import pytest
from scipy import interpolate

from pisa_tpu.utils.flux_weights import (
    calculate_2d_flux_weights,
    load_2d_table,
)


def _reference_style_eval(flux_file, energies, coszens, primary):
    """Per-event loop transcription of the integral-preserving scheme, built
    independently with scipy splrep/splev (the algorithm as published)."""
    table = np.genfromtxt(
        f"pisa_tpu/resources/flux/{flux_file.split('/')[-1]}",
        usecols=range(5),
    )
    mask = np.all(np.isnan(table) | np.equal(table, 0), axis=1)
    table = table[~mask].T
    cols = ["energy", "numu", "numubar", "nue", "nuebar"]
    flux = dict(zip(cols, table))
    for key in flux:
        flux[key] = np.array(np.split(flux[key], 20))
    en = flux["energy"][0]
    logenergy = np.linspace(-1.025, 4.025, 102)
    # per-band cumulative splines (bands file-ordered cz descending)
    splines = {}
    for iband, band in enumerate(flux[primary]):
        cum = [0.0]
        tot = 0.0
        for f, e in zip(band, en):
            tot += f * e * 0.05
            cum.append(tot)
        cz_value = "%.2f" % (1.05 - (iband + 1) * 0.1)
        splines[cz_value] = interpolate.splrep(logenergy, cum, s=0)

    czkeys = ["%.2f" % x for x in np.linspace(-0.95, 0.95, 20)]
    cz_spline_points = np.linspace(-1, 1, 21)
    out = np.empty_like(energies)
    for i in range(len(energies)):
        log_e = np.log10(energies[i])
        vals = np.zeros(21)
        for j in range(20):
            vals[j + 1] = interpolate.splev(log_e, splines[czkeys[j]], der=1)
        int_vals = np.cumsum(vals) * 0.1
        sp = interpolate.splrep(cz_spline_points, int_vals, s=0)
        out[i] = interpolate.splev(coszens[i], sp, der=1) / energies[i]
    return out


@pytest.fixture(scope="module")
def honda():
    return load_2d_table("flux/honda-2015-spl-solmin-aa.d")


def test_matches_reference_algorithm(honda):
    rng = np.random.RandomState(3)
    energies = 10 ** rng.uniform(0, 3, 50)
    coszens = rng.uniform(-1, 1, 50)
    for prim in ("numu", "nuebar"):
        mine = calculate_2d_flux_weights(energies, coszens, honda[prim])
        ref = _reference_style_eval(
            "flux/honda-2015-spl-solmin-aa.d", energies, coszens, prim
        )
        assert np.allclose(mine, ref, rtol=1e-9), prim


def test_flux_physical(honda):
    energies = np.logspace(0, 3, 200)
    coszens = np.full_like(energies, -0.6)
    w = calculate_2d_flux_weights(energies, coszens, honda["numu"])
    assert np.all(w > 0)
    # falls steeply with energy (roughly E^-3 at high E)
    assert w[0] / w[-1] > 1e6
    # numu flux exceeds nue flux at these energies
    we = calculate_2d_flux_weights(energies, coszens, honda["nue"])
    assert np.all(w / we > 1.0)


def test_table_value_recovery(honda):
    """Integral-preservation: the spline derivative evaluated at a table
    grid point approximately recovers the table flux value."""
    table = np.genfromtxt(
        "pisa_tpu/resources/flux/honda-2015-spl-solmin-aa.d", usecols=range(5)
    )
    mask = np.all(np.isnan(table) | np.equal(table, 0), axis=1)
    table = table[~mask].T
    flux = dict(zip(["energy", "numu", "numubar", "nue", "nuebar"], table))
    for key in flux:
        flux[key] = np.array(np.split(flux[key], 20))
    en = flux["energy"][0]
    # band 5 (file order, cz descending from 0.95): cz center 0.45
    iband = 5
    cz_center = 1.05 - (iband + 1) * 0.1
    sel = slice(30, 60)  # mid-energy rows, away from table edges
    vals = calculate_2d_flux_weights(
        en[sel], np.full(en[sel].shape, cz_center), honda["numu"]
    )
    assert np.allclose(vals, flux["numu"][iband][sel], rtol=0.05)


def test_bartol_loads():
    t = load_2d_table("flux/bartol-2004-sno-solmax-aa.d")
    w = calculate_2d_flux_weights(
        np.array([5.0, 50.0]), np.array([-0.3, 0.4]), t["numu"]
    )
    assert np.all(w > 0)
