"""
Flux-table tests: the vectorized integral-preserving evaluation must match a
direct per-event transcription of the published NuFlux/PISA scheme
(cumulative splrep + derivative; cf. reference ``flux_weights.py:267-349``)
to round-off, and satisfy physical sanity constraints.
"""

import numpy as np
import pytest
from scipy import interpolate

from pisa_tpu.utils.resources import find_resource
from pisa_tpu.utils.flux_weights import (
    calculate_2d_flux_weights,
    load_2d_table,
)


def _reference_style_eval(flux_file, energies, coszens, primary):
    """Per-event loop transcription of the integral-preserving scheme, built
    independently with scipy splrep/splev (the algorithm as published)."""
    table = np.genfromtxt(
        find_resource(flux_file),
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
        find_resource("flux/honda-2015-spl-solmin-aa.d"), usecols=range(5)
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


# ---------------------------------------------------------------------------
# 3-D tables + enpow (VERDICT round 1 item 7)
# ---------------------------------------------------------------------------
def _reference_style_eval_3d(
    flux_file, energies, coszens, azimuths, primary, enpow=1,
    az_linear=True,
):
    """Per-event loop transcription of the published 3-D scheme
    (cf. reference ``flux_weights.py:352-604``), built independently with
    scipy splrep/splev."""
    table = np.genfromtxt(
        find_resource(flux_file),
        usecols=range(5),
    )
    mask = np.all(np.isnan(table) | np.equal(table, 0), axis=1)
    table = table[~mask].T
    cols = ["energy", "numu", "numubar", "nue", "nuebar"]
    flux = dict(zip(cols, table))
    en = np.array(np.split(flux["energy"], 240))[0]
    n_e = en.size
    logenergy = np.linspace(-1.025, 4.025, n_e + 1)

    # file order: cz blocks descending from 0.95, az ascending within
    prim3 = flux[primary].reshape(20, 12, n_e)
    azkeys = np.linspace(15.0, 345.0, 12)
    splines = {}
    for iaz, az in enumerate(azkeys):
        az_sp = {}
        for icz in range(20):
            band = prim3[icz, iaz]
            cum = [0.0]
            tot = 0.0
            for f, e in zip(band, en):
                tot += f * e**enpow * 0.05
                cum.append(tot)
            cz_value = "%.2f" % (1.05 - (icz + 1) * 0.1)
            az_sp[cz_value] = interpolate.splrep(logenergy, cum, s=0)
        splines[az] = az_sp

    czkeys = ["%.2f" % x for x in np.linspace(-0.95, 0.95, 20)]
    cz_spline_points = np.linspace(-1, 1, 21)
    out = np.empty_like(energies)
    for i in range(len(energies)):
        log_e = np.log10(energies[i])
        az_deg = azimuths[i] * 180.0 / np.pi
        az_vals = []
        for az in azkeys:
            vals = np.zeros(21)
            for j in range(20):
                vals[j + 1] = interpolate.splev(
                    log_e, splines[az][czkeys[j]], der=1
                )
            int_vals = np.cumsum(vals) * 0.1
            sp = interpolate.splrep(cz_spline_points, int_vals, s=0)
            az_vals.append(interpolate.splev(coszens[i], sp, der=1))
        if az_linear:
            az_vals.append(az_vals[0])
            az_vals = np.asarray(az_vals) / energies[i] ** enpow
            az_knots = np.linspace(15.0, 375.0, 13)
            sp = interpolate.splrep(az_knots, az_vals, k=1)
            a = az_deg + 360.0 if az_deg < 15.0 else az_deg
            out[i] = interpolate.splev(a, sp, der=0)
        else:
            az_vals = np.insert(np.asarray(az_vals), 0, 0.0)
            az_int = np.cumsum(az_vals) * 30.0
            az_knots = np.linspace(0.0, 360.0, 13)
            sp = interpolate.splrep(az_knots, az_int, s=0)
            out[i] = (
                interpolate.splev(az_deg, sp, der=1) / energies[i] ** enpow
            )
    return out


@pytest.fixture(scope="module")
def honda3d():
    from pisa_tpu.utils.flux_weights import load_3d_table

    return load_3d_table("flux/honda-2015-spl-solmin.d")


@pytest.mark.parametrize("az_linear", [True, False])
def test_3d_matches_reference_algorithm(honda3d, az_linear):
    from pisa_tpu.utils.flux_weights import calculate_3d_flux_weights

    rng = np.random.RandomState(11)
    ens = 10 ** rng.uniform(0.0, 3.0, 25)
    czs = rng.uniform(-0.99, 0.99, 25)
    azs = rng.uniform(0.0, 2 * np.pi, 25)
    for prim in ("numu", "nuebar"):
        ours = calculate_3d_flux_weights(
            ens, czs, azs, honda3d[prim], az_linear=az_linear
        )
        ref = _reference_style_eval_3d(
            "flux/honda-2015-spl-solmin.d", ens, czs, azs, prim,
            az_linear=az_linear,
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-12)


def test_3d_physical_and_matches_2d_average(honda3d):
    """3-D fluxes are positive, and their azimuth average is within ~15%
    of the azimuth-averaged (aa) table evaluation at mid energies."""
    from pisa_tpu.utils.flux_weights import calculate_3d_flux_weights

    ens = np.full(12, 10.0)
    czs = np.full(12, 0.25)
    azs = np.deg2rad(np.linspace(15, 345, 12))
    f3 = calculate_3d_flux_weights(ens, czs, azs, honda3d["numu"])
    assert (f3 > 0).all()
    aa = load_2d_table("flux/honda-2015-spl-solmin-aa.d")
    f2 = calculate_2d_flux_weights(
        np.array([10.0]), np.array([0.25]), aa["numu"]
    )[0]
    assert abs(np.mean(f3) - f2) / f2 < 0.15


def test_enpow2_matches_reference_algorithm(honda):
    """enpow=2 through the vectorized 2-D path vs the direct transcription
    with the same power."""
    from pisa_tpu.utils.flux_weights import load_2d_table as _load

    table = _load("flux/honda-2015-spl-solmin-aa.d", enpow=2)
    rng = np.random.RandomState(13)
    ens = 10 ** rng.uniform(0.0, 3.0, 30)
    czs = rng.uniform(-0.99, 0.99, 30)
    ours = calculate_2d_flux_weights(ens, czs, table["numu"], enpow=2)

    # transcription with enpow=2: integrate flux*E^2, divide by E^2
    tab = np.genfromtxt(
        find_resource("flux/honda-2015-spl-solmin-aa.d"),
        usecols=range(5),
    )
    mask = np.all(np.isnan(tab) | np.equal(tab, 0), axis=1)
    tab = tab[~mask].T
    flux = dict(zip(["energy", "numu", "numubar", "nue", "nuebar"], tab))
    for key in flux:
        flux[key] = np.array(np.split(flux[key], 20))
    en = flux["energy"][0]
    logenergy = np.linspace(-1.025, 4.025, 102)
    splines = {}
    for iband, band in enumerate(flux["numu"]):
        cum = np.concatenate([[0.0], np.cumsum(band * en**2 * 0.05)])
        cz_value = "%.2f" % (1.05 - (iband + 1) * 0.1)
        splines[cz_value] = interpolate.splrep(logenergy, cum, s=0)
    czkeys = ["%.2f" % x for x in np.linspace(-0.95, 0.95, 20)]
    cz_spline_points = np.linspace(-1, 1, 21)
    ref = np.empty_like(ens)
    for i in range(len(ens)):
        vals = np.zeros(21)
        for j in range(20):
            vals[j + 1] = interpolate.splev(
                np.log10(ens[i]), splines[czkeys[j]], der=1
            )
        sp = interpolate.splrep(cz_spline_points, np.cumsum(vals) * 0.1, s=0)
        ref[i] = interpolate.splev(czs[i], sp, der=1) / ens[i] ** 2
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-12)

    # enpow=2 and enpow=1 agree at the few-percent level away from edges
    base = calculate_2d_flux_weights(ens, czs, honda["numu"])
    assert np.max(np.abs(ours / base - 1.0)) < 0.2
