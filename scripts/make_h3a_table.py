#!/usr/bin/env python
"""
Generate a Hillas-Gaisser "H3a" atmospheric-neutrino flux table in the
tau-mode 2-D format consumed by ``flux.hillasg`` /
``utils.flux_weights.load_2d_hillas_table`` (the reference's "hg_taumode"
layout, ``pisa/utils/flux_weights.py:50-131``: columns energy, numu,
numubar, nue, nuebar, nutau, nutaubar; 100 coszen blocks descending from
+0.99 to -0.99; 100 log10-energy rows at 0.05 steps from 10 GeV to 1 PeV).

The reference does not redistribute its (MCEq-produced, IceCube-internal)
H3a table, so this script COMPUTES one from first principles with the
standard analytic cascade approximations — adequate as a nominal flux for
pipeline validation and for exercising the integral-preserving
interpolation end-to-end; NOT a replacement for a full cascade calculation:

1. Primary spectrum: Gaisser (2012) "H3a" three-population model
   [Astropart. Phys. 35 (2012) 801, Table 1]: per mass group i and
   population j,  phi_i(E) = a_ij * E^-(g_ij + 1) * exp(-E / (Z_i * R_j))
   with rigidities R = 4 PV, 30 PV, 2 EV; converted to an all-nucleon flux
   phi_N(E_N) = sum_i A_i^2 * phi_i(A_i * E_N).
2. Conventional nu_mu / nu_e from the two-component (pion + kaon) analytic
   formula (Gaisser, "Cosmic Rays and Particle Physics", ch. 6-7):
   phi_nu = phi_N(E) * sum_M A_M(gamma) / (1 + B_M * E * cos(theta*) / eps_M)
   with spectrum-weighted decay moments A_M(gamma) computed from the LOCAL
   spectral index of phi_N (so the knee steepening propagates), critical
   energies eps_pi = 115 GeV, eps_K = 850 GeV, and the Chirkin cos(theta*)
   atmospheric-curvature correction.
3. nu_e additionally gets the muon-decay component with its own critical
   energy; nu/nubar split by an energy-dependent charge ratio.
4. nu_tau is the PROMPT (charm) component only: isotropic at these
   energies, equal nu/nubar (eps_c = 2.4e7 GeV).

Self-check: the script prints the generated nu_mu flux against the vendored
Honda 2015 azimuth-averaged table at overlapping energies (the H3a primary
normalization differs from Honda's GH-fit by design; agreement within a
factor ~2 over 10-100 GeV is the expected ballpark for this analytic
level).

Usage: python scripts/make_h3a_table.py [out_path]
Writes pisa_tpu/resources/flux/hillas-h3a-taumode.d by default.
"""

from __future__ import annotations

import os
import sys

import numpy as np

# ---------------------------------------------------------------------------
# 1. H3a primary spectrum -> all-nucleon flux
# ---------------------------------------------------------------------------

# (Z, A) per mass group; normalizations a_ij [m^-2 s^-1 sr^-1 GeV^(g_ij)]
# and integral indices g_ij per population (Gaisser 2012 Table 1, H3a).
_GROUPS = [
    ("p", 1, 1),
    ("He", 2, 4),
    ("CNO", 7, 14),
    ("MgSi", 13, 27),
    ("Fe", 26, 56),
]
_POPS = [
    # R [GV],  a per group,                     gamma per group
    (4e6, [7860.0, 3550.0, 2200.0, 1430.0, 2120.0],
     [1.66, 1.58, 1.63, 1.67, 1.63]),
    (30e6, [20.0, 20.0, 13.4, 13.4, 13.4], [1.4] * 5),
    (2e9, [1.7, 1.7, 1.14, 1.14, 1.14], [1.4] * 5),
]


def nucleon_flux(e_n):
    """All-nucleon H3a flux [GeV^-1 m^-2 s^-1 sr^-1] at nucleon energy
    `e_n` [GeV]."""
    e_n = np.asarray(e_n, dtype=np.float64)
    total = np.zeros_like(e_n)
    for gi, (_, z, a) in enumerate(_GROUPS):
        e_part = a * e_n  # energy per particle delivering nucleons at e_n
        for rig, a_list, g_list in _POPS:
            aa, g = a_list[gi], g_list[gi]
            phi_part = aa * e_part ** (-(g + 1.0)) * np.exp(
                -e_part / (z * rig)
            )
            total += a * a * phi_part
    return total


def local_gamma(e_n, rel_step=0.01):
    """Local DIFFERENTIAL spectral index alpha(E) = -dln(phi_N)/dlnE."""
    lo, hi = e_n * (1 - rel_step), e_n * (1 + rel_step)
    return -(np.log(nucleon_flux(hi)) - np.log(nucleon_flux(lo))) / (
        np.log(hi) - np.log(lo)
    )


# ---------------------------------------------------------------------------
# 2. analytic cascade: conventional + prompt components
# ---------------------------------------------------------------------------

# spectrum-weighted hadronic production moments (standard values for
# E ~ 10-10^5 GeV; Gaisser ch. 5 Table 5.2-level accuracy)
Z_NPI = 0.079
Z_NK = 0.0118
Z_NN = 0.298
R_PI = 0.5731  # (m_mu/m_pi)^2
R_K = 0.0458  # (m_mu/m_K)^2
BR_K_MUNU = 0.6356
BR_KE3 = 0.0507
EPS_PI = 115.0  # GeV
EPS_K = 850.0
EPS_MU = 1.0
EPS_C = 2.4e7
B_HIGH = 1.1  # low/high asymptotic matching constant (muon-formula value)
# prompt (charm) normalization relative to phi_N: ballpark of
# perturbative-charm (ERS-class) predictions
A_PROMPT = 1.0e-5
PROMPT_TAU_FRACTION = 0.10  # nu_tau share of the prompt neutrino yield


def _z_two_body(alpha, r):
    """Spectrum-weighted nu moment of a two-body M -> mu nu decay for a
    differential primary index `alpha`: Z = (1-r)^(alpha-1) / alpha."""
    return (1.0 - r) ** (alpha - 1.0) / alpha


def costheta_star(cz):
    """Chirkin atmospheric-curvature effective cosine (the standard
    parameterization used for the sec(theta) rise near the horizon)."""
    p1, p2, p3, p4, p5 = (
        0.102573, -0.068287, 0.958633, 0.0407253, 0.817285,
    )
    cz = np.abs(np.asarray(cz, dtype=np.float64))
    num = cz**2 + p1**2 + p2 * cz**p3 + p4 * cz**p5
    den = 1.0 + p1**2 + p2 + p4
    return np.sqrt(num / den)


def charge_ratio(e):
    """nu_mu / nubar_mu production ratio: ~1.1 at 10 GeV rising slowly
    (pi+/pi- and K+/K- excess of a proton-rich primary beam)."""
    return np.clip(1.10 + 0.07 * np.log10(np.asarray(e) / 10.0), 1.05, 1.45)


def nue_to_numu_lowE(e, cs):
    """Muon-decay nu_e component relative to the pion-term nu_mu flux:
    suppressed once muons reach the ground before decaying."""
    return 0.17 / (1.0 + B_HIGH * e * cs / (EPS_MU * 25.0))


def fluxes(e, cz):
    """All six neutrino fluxes [GeV^-1 m^-2 s^-1 sr^-1] at (e [GeV], cz).

    Returns dict with numu, numubar, nue, nuebar, nutau, nutaubar.
    """
    e = np.asarray(e, dtype=np.float64)
    phi_n = nucleon_flux(e)
    alpha = local_gamma(e)
    cs = costheta_star(cz)

    a_pi = (Z_NPI / (1.0 - Z_NN)) * _z_two_body(alpha, R_PI)
    a_k = (Z_NK / (1.0 - Z_NN)) * _z_two_body(alpha, R_K) * BR_K_MUNU
    pi_term = a_pi / (1.0 + B_HIGH * e * cs / EPS_PI)
    k_term = a_k / (1.0 + B_HIGH * e * cs / EPS_K)
    prompt = A_PROMPT / (1.0 + e * cs / EPS_C)

    numu_tot = phi_n * (pi_term + k_term + prompt * (1 - PROMPT_TAU_FRACTION))
    r = charge_ratio(e)
    numu = numu_tot * r / (1.0 + r)
    numubar = numu_tot * 1.0 / (1.0 + r)

    # nu_e: K_e3 + muon decay + prompt (prompt ~ equal e/mu)
    a_ke3 = (Z_NK / (1.0 - Z_NN)) * BR_KE3 * 0.134
    ke3_term = a_ke3 / (1.0 + B_HIGH * e * cs / EPS_K)
    mu_term = pi_term * nue_to_numu_lowE(e, cs)
    nue_tot = phi_n * (
        ke3_term + mu_term + prompt * (1 - PROMPT_TAU_FRACTION)
    )
    # e+ excess in the mu-decay chain roughly follows the meson ratio
    nue = nue_tot * r / (1.0 + r)
    nuebar = nue_tot * 1.0 / (1.0 + r)

    nutau = phi_n * prompt * PROMPT_TAU_FRACTION / 2.0
    return {
        "numu": numu, "numubar": numubar,
        "nue": nue, "nuebar": nuebar,
        "nutau": nutau, "nutaubar": nutau.copy(),
    }


# ---------------------------------------------------------------------------
# 3. write the hg_taumode table
# ---------------------------------------------------------------------------

def main(out_path=None):
    here = os.path.dirname(os.path.abspath(__file__))
    if out_path is None:
        out_path = os.path.join(
            here, "..", "pisa_tpu", "resources", "flux",
            "hillas-h3a-taumode.d",
        )
    log_centers = np.linspace(1.025, 5.975, 100)
    energies = 10.0**log_centers
    cz_edges = np.linspace(-1.0, 1.0, 101)
    cz_centers = 0.5 * (cz_edges[:-1] + cz_edges[1:])

    lines = [
        "# Hillas-Gaisser H3a atmospheric neutrino flux (GENERATED:"
        " scripts/make_h3a_table.py)",
        "# analytic pion/kaon/prompt cascade approximation on the H3a"
        " primary nucleon flux — see the script docstring",
        "# units: GeV^-1 m^-2 s^-1 sr^-1; blocks: coszen descending"
        " 0.99 .. -0.99 (100 bands)",
        "# columns: Enu[GeV] numu numubar nue nuebar nutau nutaubar",
    ]
    for cz in cz_centers[::-1]:  # descending, like the Honda layout
        lines.append(f"# average flux in [cosZ = {cz - 0.01:.2f} --"
                     f" {cz + 0.01:.2f}]")
        f = fluxes(energies, cz)
        for i, e in enumerate(energies):
            lines.append(
                f"{e:.4E} {f['numu'][i]:.4E} {f['numubar'][i]:.4E}"
                f" {f['nue'][i]:.4E} {f['nuebar'][i]:.4E}"
                f" {f['nutau'][i]:.4E} {f['nutaubar'][i]:.4E}"
            )
    out_path = os.path.normpath(out_path)
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(lines)} lines)")

    # self-check vs the vendored Honda table at overlapping energies
    try:
        sys.path.insert(0, os.path.join(here, ".."))
        from pisa_tpu.utils.flux_weights import (
            calculate_2d_flux_weights, load_2d_table,
        )

        h3a = load_2d_table(os.path.basename(out_path))
        honda = load_2d_table("flux/honda-2015-spl-solmin-aa.d")
        e_chk = np.array([15.0, 50.0, 150.0])
        cz_chk = np.full_like(e_chk, -0.45)
        for prim in ("numu", "nue"):
            a = calculate_2d_flux_weights(e_chk, cz_chk, h3a[prim])
            b = calculate_2d_flux_weights(e_chk, cz_chk, honda[prim])
            print(f"self-check {prim}: H3a/Honda = "
                  + ", ".join(f"{x:.2f}" for x in a / b))
    except Exception as exc:  # self-check is advisory
        print(f"self-check skipped: {exc}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
