"""
NuFit theta23 spline-prior production and consumption
(cf. reference ``pisa/scripts/make_nufit_theta23_spline_priors.py`` and
``pisa_examples/resources/priors/*.json``).
"""

import gzip

import numpy as np
import pytest

from pisa_tpu.core.prior import Prior
from pisa_tpu.scripts.make_nufit_theta23_spline_priors import (
    build_spline_priors,
    extract_vals,
)
from pisa_tpu.utils.fileio import from_file
from pisa_tpu.utils.resources import find_resource


def _fake_nufit_file(path, s2_best, width=0.01, offset=0.0):
    s2 = np.linspace(0.3, 0.7, 81)
    dchi2 = (s2 - s2_best) ** 2 / width + offset
    with gzip.open(path, "wt") as f:
        f.write("# some header\n")
        f.write("# T23 projection: sin^2(theta23) Delta_chi^2\n")
        for x, y in zip(s2, dchi2):
            f.write(f"{x:.6f} {y:.6f}\n")
        f.write("# other section\n")
        f.write("0.5 99.0\n")


def test_extract_vals_sections(tmp_path):
    path = str(tmp_path / "v99.release.gz")
    _fake_nufit_file(path, 0.55)
    with gzip.open(path, "rt") as f:
        x, y = extract_vals(
            f, "# T23 projection: sin^2(theta23) Delta_chi^2"
        )
    assert len(x) == 81
    assert 99.0 not in y  # the other section is excluded


def test_build_and_consume_priors(tmp_path):
    io_path = str(tmp_path / "v99.io.gz")
    no_path = str(tmp_path / "v99.no.gz")
    _fake_nufit_file(io_path, 0.58, offset=2.0)  # IO disfavored by 2
    _fake_nufit_file(no_path, 0.55, offset=0.0)

    written = build_spline_priors(
        io_path, no_path, str(tmp_path / "out"), version="v99",
        shifted=True, minimised=True,
    )
    assert len(written) == 3

    priors = from_file(written[0])
    assert set(priors) == {"theta23_ih", "theta23_nh"}
    p = Prior(
        kind="spline",
        knots=np.asarray(priors["theta23_nh"]["knots"]),
        coeffs=np.asarray(priors["theta23_nh"]["coeffs"]),
        deg=priors["theta23_nh"]["deg"],
        units=priors["theta23_nh"]["units"],
    )
    # llh = -dchi2/2 maximal at the injected best point
    th = np.linspace(
        np.arcsin(np.sqrt(0.35)), np.arcsin(np.sqrt(0.65)), 301
    )
    llh = np.asarray([float(p.llh(t)) for t in th])
    best = th[np.argmax(llh)]
    np.testing.assert_allclose(
        np.sin(best) ** 2, 0.55, atol=2e-3
    )
    # curvature: llh drops by ~0.5 at dchi2 = 1 -> s2 = 0.55 +- 0.1
    llh_best = llh.max()
    i_sigma = np.argmin(np.abs(np.sin(th) ** 2 - 0.65))
    np.testing.assert_allclose(llh_best - llh[i_sigma], 0.5, rtol=0.05)

    # minimised variant: single ordering-agnostic prior
    minim = from_file(written[2])
    assert set(minim) == {"theta23"}


def test_vendored_nufit_priors_load():
    """The NuFit v2.0 priors shipped in resources must build working spline
    Priors with a maximum in the physical theta23 range."""
    priors = from_file(
        find_resource("priors/nufitv20standardtheta23splines.json")
    )
    for key in ("theta23_nh", "theta23_ih"):
        spec = priors[key]
        p = Prior(
            kind="spline",
            knots=np.asarray(spec["knots"], dtype=float),
            coeffs=np.asarray(spec["coeffs"], dtype=float),
            deg=int(spec["deg"]),
            units=spec["units"],
        )
        th = np.linspace(0.65, 0.95, 121)  # rad; ~37-54 deg
        llh = np.asarray([float(p.llh(t)) for t in th])
        assert np.isfinite(llh).all()
        best_deg = np.degrees(th[np.argmax(llh)])
        assert 38 < best_deg < 52, best_deg
