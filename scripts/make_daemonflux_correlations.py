"""
Build the vendored daemonflux correlation matrix
(``pisa_tpu/resources/flux/daemonflux_correlations.json``).

The daemonflux package (arXiv:2303.00022) carries a calibrated covariance
over its 24 flux parameters; its chi2 penalty is ``v^T C^-1 v`` with C the
parameter correlation matrix (reference
``pisa/stages/flux/daemon_flux.py:185-237`` delegates to
``daemonflux.Flux.chi2``). The package is not installable here, but the
reference repo PUBLISHES the exact diagonal of C^-1: the executed notebook
``/root/reference/pisa_examples/test_daemonflux_stage.ipynb`` prints the
``mod_chi2`` prior penalty for a +1 sigma pull of every single daemon
parameter, and for a one-hot pull ``chi2 = (C^-1)_{ii}``.

Those 24 published values pin every parameter's MULTIPLE correlation with
the rest ( R_i^2 = 1 - 1/(C^-1)_{ii} ); the individual off-diagonals are
not published. This script completes the matrix with the single-factor
model

    C = diag(1 - lambda_i^2) + lambda lambda^T   (C_ij = lambda_i lambda_j)

whose 24 loadings are solved (Sherman-Morrison + 1-D root find) so that
diag(C^-1) reproduces the published penalties EXACTLY. Consequences:

* one-hot pulls: chi2 identical to the reference's published values
  (validated to < 1e-9 relative below);
* correlated pulls: chi2 != sum v_i^2 with the positive-correlation
  structure of a common calibration factor — directionally correct (the
  published multiple correlations are all large, 0.37-0.9995) but the
  pairwise signs/magnitudes are the factor-model completion, not the
  unpublished daemonflux off-diagonals.
"""

from __future__ import annotations

import json
import os

import numpy as np

# (C^-1)_{ii} per parameter: the reference's executed
# test_daemonflux_stage.ipynb "pulling daemon_<name> by +1 sigma ->
# prior penalty" outputs (mod_chi2 metric; the llh outputs are exactly
# -chi2/2, confirming the quadratic form).
PUBLISHED_CINV_DIAG = {
    "K_158G": 20.669470253081645,
    "K_2P": 814.8682652831213,
    "K_31G": 4.782145410066022,
    "antiK_158G": 5.167670432051022,
    "antiK_2P": 1031.85177816583,
    "antiK_31G": 1.3990423733149342,
    "n_158G": 14.836491989252387,
    "n_2P": 25.899890686254334,
    "p_158G": 4.46257312225151,
    "p_2P": 5.483267988091329,
    "pi_158G": 11.911597541051378,
    "pi_20T": 502.47445811353646,
    "pi_2P": 6.57641176598746,
    "pi_31G": 4.444786009326376,
    "antipi_158G": 12.221933008588517,
    "antipi_20T": 775.6952824781608,
    "antipi_2P": 29.310435339308967,
    "antipi_31G": 4.631939860229628,
    "GSF_1": 16.409186227794525,
    "GSF_2": 2.015149291427169,
    "GSF_3": 2.25374883811211,
    "GSF_4": 1.1634572364445062,
    "GSF_5": 6.304930670286332,
    "GSF_6": 2.966133147926686,
}


def solve_factor_loadings(d):
    """Solve for u_i = lambda_i^2/(1-lambda_i^2) such that the factor
    model's inverse diagonal equals `d`.

    With S = sum(u), Sherman-Morrison gives
        (C^-1)_{ii} = (1+u_i)(1+S-u_i)/(1+S)
    so per-parameter u_i solves  u^2 - S u + (d_i-1)(1+S) = 0  (take the
    smaller root: the larger one assigns near-unity loadings to weakly
    constrained parameters), and S must satisfy S = sum_i u_i(S).
    """
    d = np.asarray(d, dtype=np.float64)

    def u_of(S):
        disc = S * S - 4.0 * (d - 1.0) * (1.0 + S)
        if np.any(disc < 0):
            return None
        return 0.5 * (S - np.sqrt(disc))

    def f(S):
        u = u_of(S)
        return None if u is None else float(np.sum(u) - S)

    # bracket: the minimal feasible S makes the discriminant vanish for
    # d_max (S^2 = 4(d_max-1)(1+S)); S -> inf gives sum(u) -> sum(d-1) < S
    dm = float(np.max(d)) - 1.0
    lo = 2.0 * dm + 2.0 * np.sqrt(dm * dm + dm) + 1e-9
    assert f(lo) is not None and f(lo) > 0, (
        "published penalties admit no single-factor completion"
    )
    hi = lo
    while (fh := f(hi)) is None or fh > 0:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        if fm is None or fm > 0:
            lo = mid
        else:
            hi = mid
    S = 0.5 * (lo + hi)
    u = u_of(S)
    lam = np.sqrt(u / (1.0 + u))
    return lam, S


def build():
    names = list(PUBLISHED_CINV_DIAG)
    d = np.array([PUBLISHED_CINV_DIAG[n] for n in names])
    lam, S = solve_factor_loadings(d)
    corr = np.outer(lam, lam)
    np.fill_diagonal(corr, 1.0)

    cinv = np.linalg.inv(corr)
    rel = np.abs(np.diag(cinv) - d) / d
    assert rel.max() < 1e-9, f"inverse-diagonal mismatch {rel.max():.2e}"
    # PD check
    w = np.linalg.eigvalsh(corr)
    assert w.min() > 0, "correlation matrix must be positive definite"
    return names, corr, lam, S, rel.max()


def main():
    names, corr, lam, S, relmax = build()
    out = {
        "_meta": {
            "source": "diag(C^-1) published by the reference's executed"
                      " pisa_examples/test_daemonflux_stage.ipynb"
                      " (+1 sigma single-parameter mod_chi2 penalties);"
                      " off-diagonals completed with a single-factor"
                      " model C = diag(1-l^2) + l l^T solved so that"
                      " diag(C^-1) matches the published values exactly",
            "max_rel_inv_diag_error": relmax,
            "factor_loadings": {n: float(v) for n, v in zip(names, lam)},
            "inv_diag_targets": PUBLISHED_CINV_DIAG,
        },
    }
    for i, a in enumerate(names):
        out[a] = {
            b: float(corr[i, j]) for j, b in enumerate(names)
        }
    dest = os.path.join(
        os.path.dirname(__file__), "..", "pisa_tpu", "resources", "flux",
        "daemonflux_correlations.json",
    )
    with open(os.path.abspath(dest), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {os.path.abspath(dest)}")
    print(f"loadings range [{lam.min():.4f}, {lam.max():.6f}], S={S:.1f}")
    print(f"max relative inverse-diagonal error: {relmax:.2e}")


if __name__ == "__main__":
    main()
