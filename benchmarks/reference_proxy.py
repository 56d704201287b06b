"""
Numba-free vectorized-numpy transcription of the reference PISA per-template
algorithm, for BASELINE CALIBRATION only (cf. BASELINE.md; VERDICT round 1,
item 2).

Reference PISA cannot run in this environment (numba/pint/etc. are not
installed and there is no network), so the reference-CPU baseline is
calibrated with this proxy: the same published algorithm the reference's
numba kernels implement — Barger et al. 3-flavor matter oscillations
(``pisa/stages/osc/prob3numba/numba_osc_kernels.py:122,349,835``), grid ->
event 'average' lookup (``pisa/core/translation.py:228``), per-event weight
products, and ``numpy.histogramdd`` binning (the reference's own correctness
oracle, ``pisa/core/translation.py:779``) — expressed as vectorized
complex128 numpy over the full point batch.

Why this is a fair stand-in for numba-compiled reference throughput: the
per-template cost is dominated by dense small-matrix arithmetic over ~40k
grid points x ~#layers (the reference JIT-compiles a per-point scalar loop;
vectorized numpy runs the identical flop stream through compiled C loops).
Per-op dispatch overhead is amortized over the 40k-point batch. On this
box's single vCPU the proxy is if anything FASTER than single-thread numba
scalar code would be (measured in ``BASELINE_MEASURED.md``); the recorded
baseline additionally multiplies by the CI benchmark box's 4 vCPUs
(``.github/workflows/benchmark_pipeline_times.yml``: PISA_TARGET=parallel,
4 threads) as a conservative upper bound on reference parallel scaling.

Numerical parity of the oscillation math with the framework's own kernels
is pinned by ``tests/test_reference_proxy.py`` (<=1e-9 fp64), which makes
the calibration defensible: same inputs, same probabilities, independently
implemented twice.

Run: ``python benchmarks/reference_proxy.py [--templates N] [--quick]``
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

TWO_SQRT2_GF = 1.52588e-4  # 2*sqrt(2)*G_F in (eV^2 cm^3)/(mole GeV)
HBAR_C_FACTOR = 2.534  # (1/2)/(hbar c) in GeV/(eV^2 km)


# ---------------------------------------------------------------------------
# oscillation probabilities: vectorized complex128 numpy
# ---------------------------------------------------------------------------
def pmns_numpy(theta12, theta13, theta23, deltacp):
    """Standard PDG 3-flavor mixing matrix (complex128), angles in rad
    (cf. reference ``pisa/stages/osc/osc_params.py:175``)."""
    s12, s13, s23 = np.sin([theta12, theta13, theta23])
    c12, c13, c23 = np.cos([theta12, theta13, theta23])
    ed = np.exp(1j * deltacp)
    edc = np.conj(ed)
    return np.array(
        [
            [c12 * c13, s12 * c13, s13 * edc],
            [
                -s12 * c23 - c12 * s23 * s13 * ed,
                c12 * c23 - s12 * s23 * s13 * ed,
                s23 * c13,
            ],
            [
                s12 * s23 - c12 * c23 * s13 * ed,
                -c12 * s23 - s12 * c23 * s13 * ed,
                c23 * c13,
            ],
        ],
        dtype=np.complex128,
    )


def osc_probs_numpy(dm21, dm31, U, nubar, energy, densities, distances):
    """P(nu_a -> nu_b) through layered matter, complex128 numpy.

    Same algorithm as the reference's ``osc_probs_layers_kernel``
    (Barger et al.; ``numba_osc_kernels.py:122``), vectorized over the
    point batch with a python loop over the (small) layer axis.

    Parameters
    ----------
    dm21, dm31 : float (eV^2)
    U : (3,3) complex128 PMNS
    nubar : +1 nu / -1 nubar
    energy : (N,) GeV
    densities : (N, L) electron column densities (mol/cm^3)
    distances : (N, L) layer path lengths (km); 0-length slots = identity

    Returns
    -------
    probs : (N, 3, 3)
    """
    energy = np.asarray(energy, dtype=np.float64)
    n_pts = energy.shape[0]
    n_layers = distances.shape[1]

    if nubar < 0:
        U = np.conj(U)

    H_vac = (U * np.array([0.0, dm21, dm31])) @ U.conj().T  # (3,3)

    eye = np.eye(3, dtype=np.complex128)
    product = np.broadcast_to(eye, (n_pts, 3, 3)).copy()

    one_over_2e = (0.5 / energy)[:, None, None]  # (N,1,1)
    two_e = 2.0 * energy

    for il in range(n_layers):
        rho = densities[:, il]
        baseline = distances[:, il]
        live = baseline > 0.0
        if not np.any(live):
            continue

        # flavor-basis Hamiltonian with the standard matter potential
        # diag(a, 0, 0); nubar flips the sign (conj of a real diagonal)
        a = 0.5 * rho * TWO_SQRT2_GF * (1.0 if nubar > 0 else -1.0)
        H_full = H_vac[None, :, :] * one_over_2e
        H_full = H_full.copy()
        H_full[:, 0, 0] += a

        # eigenvalues of the Hermitian Hamiltonian; the Barger amplitude is
        # permutation-symmetric so no vacuum-matched ordering is needed
        m = np.linalg.eigvalsh(H_full) * two_e[:, None]  # (N,3) "2E*lambda"

        H_mass_2e = (
            U.conj().T[None, :, :] @ H_full @ U[None, :, :]
        ) * two_e[:, None, None]

        # Barger et al. eq. 10: T = sum_k exp(-i m_k L/(2E) / hbar-c) P_k,
        # P_k = prod_{j != k} (2E H_mass - m_j) / (m_k - m_j)
        h = [
            H_mass_2e - m[:, k, None, None] * eye[None, :, :]
            for k in range(3)
        ]
        d01 = m[:, 0] - m[:, 1]
        d02 = m[:, 0] - m[:, 2]
        d12 = m[:, 1] - m[:, 2]
        prod0 = (h[1] @ h[2]) / (d01 * d02)[:, None, None]
        prod1 = (h[2] @ h[0]) / (d12 * -d01)[:, None, None]
        prod2 = (h[0] @ h[1]) / (d02 * d12)[:, None, None]

        s = -(baseline / energy) * HBAR_C_FACTOR
        p = np.exp(1j * m * s[:, None])  # (N,3)

        T = (
            p[:, 0, None, None] * prod0
            + p[:, 1, None, None] * prod1
            + p[:, 2, None, None] * prod2
        )
        T[~live] = eye  # padding slots act as identity

        product = T @ product  # each layer left-multiplies

    # mass -> flavor basis, then probabilities
    Tf = U[None, :, :] @ product @ U.conj().T[None, :, :]
    return np.abs(np.swapaxes(Tf, 1, 2)) ** 2  # probs[n, a, b]


# ---------------------------------------------------------------------------
# grid -> events lookup and histogramming (reference translation kernels)
# ---------------------------------------------------------------------------
def lookup_grid_to_events(grid_vals, edges_per_dim, event_coords):
    """'average'-mode lookup of grid-cell values at event coordinates
    (cf. reference ``pisa/core/translation.py:228``)."""
    idx = 0
    stride = 1
    shape = [len(e) - 1 for e in edges_per_dim]
    for d in range(len(edges_per_dim) - 1, -1, -1):
        k = np.clip(
            np.searchsorted(edges_per_dim[d], event_coords[d], side="right")
            - 1,
            0,
            shape[d] - 1,
        )
        idx = idx + k * stride
        stride *= shape[d]
    return grid_vals.reshape(-1)[idx]


def histogram_events(sample, weights, edges):
    """Weighted histogramdd + sumw2 (the reference's binning oracle,
    ``pisa/core/translation.py:90,779``)."""
    hist, _ = np.histogramdd(sample, bins=edges, weights=weights)
    sumw2, _ = np.histogramdd(sample, bins=edges, weights=weights**2)
    return hist, sumw2


# ---------------------------------------------------------------------------
# the flagship per-template workload
# ---------------------------------------------------------------------------
def build_flagship_workload(n_grid=200):
    """Assemble the IceCube-3y per-template inputs using the framework's
    setup machinery (setup cost is NOT timed — the reference also builds
    layers/grids once at setup)."""
    from pisa_tpu.core.binning import OneDimBinning, MultiDimBinning
    from pisa_tpu.ops.osc.layers import Layers
    from pisa_tpu.utils.resources import find_resource
    import pandas as pd

    # calc grid: true_allsky_fine (200 x 200)
    e_bins = OneDimBinning(
        "true_energy", num_bins=n_grid, is_log=True, domain=[1, 1000],
        units="GeV",
    )
    cz_bins = OneDimBinning(
        "true_coszen", num_bins=n_grid, is_lin=True, domain=[-1, 1],
    )
    grid = MultiDimBinning([e_bins, cz_bins])
    e_centers = np.asarray(e_bins.weighted_centers.m)
    cz_centers = np.asarray(cz_bins.weighted_centers.m)
    ee, cc = np.meshgrid(e_centers, cz_centers, indexing="ij")
    grid_e, grid_cz = ee.ravel(), cc.ravel()

    layers = Layers(
        find_resource("osc/PREM_12layer.dat"),
        detector_depth=2.0,
        prop_height=20.0,
    )
    layers.setElecFrac(0.4656, 0.4656, 0.4957)
    layers.calcLayers(grid_cz)
    densities = layers.density.reshape(grid_cz.size, -1)
    distances = layers.distance.reshape(grid_cz.size, -1)

    # events (240k, 12 flavint containers)
    df = pd.read_csv(
        find_resource(
            "events/IceCube_3y_oscillations/neutrino_mc.csv.bz2"
        )
    )
    containers = []
    for flav, pdg_base in (("e", 12), ("mu", 14), ("tau", 16)):
        for nubar in (1, -1):
            for current in ("cc", "nc"):
                mask = (df["pdg"] == nubar * pdg_base) & (
                    (df["type"] >= 1) if current == "cc" else (df["type"] == 0)
                )
                sub = df[mask]
                containers.append(
                    dict(
                        flav={"e": 0, "mu": 1, "tau": 2}[flav],
                        nubar=nubar,
                        true_energy=sub["true_energy"].to_numpy(),
                        true_coszen=sub["true_coszen"].to_numpy(),
                        reco_energy=sub["reco_energy"].to_numpy(),
                        reco_coszen=sub["reco_coszen"].to_numpy(),
                        pid=sub["pid"].to_numpy(),
                        weighted_aeff=sub["weight"].to_numpy() * 1e-4,
                    )
                )

    # output binning: dragon_datarelease (8E x 8cz x 2pid;
    # settings/binning/IceCube_3y_oscillations.cfg)
    out_edges = [
        np.array(
            [5.62341325, 7.49894209, 10.0, 13.33521432, 17.7827941,
             23.71373706, 31.6227766, 42.16965034, 56.23413252]
        ),
        np.linspace(-1.0, 1.0, 9),
        np.array([-0.5, 0.5, 1.5]),
    ]

    edges_per_dim = [
        np.asarray(e_bins.bin_edges.m),
        np.asarray(cz_bins.bin_edges.m),
    ]
    return dict(
        grid_e=grid_e,
        grid_cz=grid_cz,
        densities=densities,
        distances=distances,
        containers=containers,
        out_edges=out_edges,
        edges_per_dim=edges_per_dim,
        grid_shape=tuple(grid.shape),
    )


def run_template(wl, theta12, theta13, theta23, deltacp, dm21, dm31,
                 barr_params, aeff_scale, livetime_s):
    """ONE full template: flux mod + osc + lookup + weights + histogram —
    the per-minimizer-iteration work of the reference flagship pipeline."""
    U = pmns_numpy(theta12, theta13, theta23, deltacp)

    # oscillation probabilities on the calc grid, nu and nubar chains
    # (the reference links the 6 nu / 6 nubar containers to 2 calcs,
    # prob3.py:398-422)
    probs = {}
    for nubar in (1, -1):
        probs[nubar] = osc_probs_numpy(
            dm21, dm31, U, nubar, wl["grid_e"], wl["densities"],
            wl["distances"],
        )

    # simple Barr-style flux modification on the grid (stand-in for
    # barr_simple's per-point gufunc; same arithmetic intensity class)
    delta_index = barr_params.get("delta_index", 0.0)
    flux_e = np.power(wl["grid_e"] / 24.0900951261, -delta_index)
    flux_mu = flux_e * (1.0 + barr_params.get("nue_numu_ratio", 0.0) * 0.0)

    totals = None
    sample_cache = {}
    for c in wl["containers"]:
        pe = lookup_grid_to_events(
            probs[c["nubar"]][:, 0, c["flav"]],
            wl["edges_per_dim"],
            [c["true_energy"], c["true_coszen"]],
        )
        pm = lookup_grid_to_events(
            probs[c["nubar"]][:, 1, c["flav"]],
            wl["edges_per_dim"],
            [c["true_energy"], c["true_coszen"]],
        )
        fe = lookup_grid_to_events(
            flux_e, wl["edges_per_dim"],
            [c["true_energy"], c["true_coszen"]],
        )
        fm = lookup_grid_to_events(
            flux_mu, wl["edges_per_dim"],
            [c["true_energy"], c["true_coszen"]],
        )
        w = c["weighted_aeff"] * livetime_s * aeff_scale * (
            fe * pe + fm * pm
        )
        key = id(c)
        if key not in sample_cache:
            sample_cache[key] = np.stack(
                [c["reco_energy"], c["reco_coszen"], c["pid"]], axis=1
            )
        hist, sumw2 = histogram_events(
            sample_cache[key], w, wl["out_edges"]
        )
        totals = hist if totals is None else totals + hist
    return totals


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--templates", type=int, default=10)
    ap.add_argument(
        "--quick", action="store_true",
        help="1/10 grid + 1/10 events (CI smoke)",
    )
    args = ap.parse_args(argv)

    print("# building flagship workload (setup, not timed)", file=sys.stderr)
    wl = build_flagship_workload(n_grid=20 if args.quick else 200)
    if args.quick:
        sel = slice(None, None, 10)
        for c in wl["containers"]:
            for k, v in c.items():
                if isinstance(v, np.ndarray):
                    c[k] = v[sel]

    rng = np.random.default_rng(0)
    t_first = None
    times = []
    for i in range(args.templates + 1):
        th23 = np.deg2rad(45.0 + rng.uniform(-5, 5))
        dm31 = 2.5e-3 + rng.uniform(-2e-4, 2e-4)
        t0 = time.time()
        totals = run_template(
            wl,
            theta12=np.deg2rad(33.4),
            theta13=np.deg2rad(8.5),
            theta23=th23,
            deltacp=0.0,
            dm21=7.4e-5,
            dm31=dm31,
            barr_params={"delta_index": rng.uniform(-0.1, 0.1)},
            aeff_scale=1.0,
            livetime_s=2.5 * 365.25 * 86400.0,
        )
        dt = time.time() - t0
        if i == 0:
            t_first = dt
        else:
            times.append(dt)
        print(
            f"# template {i}: {dt:.3f}s (sum {float(np.sum(totals)):.1f})",
            file=sys.stderr,
        )
    mean = float(np.mean(times))
    print(
        f"# first {t_first:.3f}s; mean of {len(times)}: {mean:.3f}s",
        file=sys.stderr,
    )
    import json

    print(
        json.dumps(
            {
                "metric": "reference_proxy_templates_per_sec",
                "value": round(1.0 / mean, 4),
                "unit": "templates/s",
                "mean_s": round(mean, 4),
                "n": len(times),
                "quick": bool(args.quick),
            }
        )
    )


if __name__ == "__main__":
    main()
