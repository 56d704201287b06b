"""
Native 3+1 sterile-neutrino oscillations (``ops/osc/sterile.py``) — the
capability the reference delegates to the external nuSQuIDS engine
(``pisa/stages/osc/nusquids.py:36-140``).

Checks: the 4-flavor mixing matrix construction (unitarity, PDG reduction),
vacuum 3+1 probabilities against a direct complex128 matrix-exponential
evaluation, exact reduction to the 3-flavor kernel when the sterile sector
decouples, matter-NC sensitivity of the sterile entry, and the low-pass
density-matrix path (exact when the filter passes everything; kills
interference from fast Delta-m41 oscillations when engaged, reproducing the
analytically averaged probability).
"""

import numpy as np
import pytest

from pisa_tpu import FTYPE
from pisa_tpu.ops.cplx import to_numpy
from pisa_tpu.ops.osc.kernels import (
    HBAR_C_FACTOR,
    TWO_SQRT2_GF,
    osc_probs_layers,
)
from pisa_tpu.ops.osc.pmns import dm_matrix, pmns_matrix_complex
from pisa_tpu.ops.osc.sterile import osc_probs_layers_4nu, pmns4_matrix

ATOL = 1e-9 if FTYPE == np.float64 else 2e-4

TH12, TH13, TH23 = 0.5839, 0.1496, 0.7854
TH14, TH24, TH34 = 0.15, 0.2, 0.1
DCP13, DCP14, DCP24 = 1.2, 0.6, -0.4
DM21, DM31, DM41 = 7.42e-5, 2.514e-3, 1.3


def _U4_numpy():
    """Direct complex128 construction, independent of the C implementation."""
    def rot(i, j, th, d=0.0):
        R = np.eye(4, dtype=complex)
        R[i, i] = R[j, j] = np.cos(th)
        R[i, j] = np.sin(th) * np.exp(-1j * d)
        R[j, i] = -np.sin(th) * np.exp(1j * d)
        return R

    return (
        rot(2, 3, TH34)
        @ rot(1, 3, TH24, DCP24)
        @ rot(0, 3, TH14, DCP14)
        @ rot(1, 2, TH23)
        @ rot(0, 2, TH13, DCP13)
        @ rot(0, 1, TH12)
    )


def test_pmns4_unitary_and_matches_numpy():
    U = pmns4_matrix(TH12, TH13, TH23, TH14, TH24, TH34,
                     DCP13, DCP14, DCP24)
    Uc = to_numpy(U)
    np.testing.assert_allclose(Uc @ Uc.conj().T, np.eye(4), atol=ATOL)
    np.testing.assert_allclose(Uc, _U4_numpy(), atol=ATOL)


def test_pmns4_reduces_to_pdg():
    U = pmns4_matrix(TH12, TH13, TH23, 0.0, 0.0, 0.0, DCP13)
    Uc = to_numpy(U)
    U3 = np.asarray(
        to_numpy_c(pmns_matrix_complex(
            np.sin(TH12), np.sin(TH13), np.sin(TH23), DCP13
        ))
    )
    np.testing.assert_allclose(Uc[:3, :3], U3, atol=ATOL)
    np.testing.assert_allclose(Uc[3, :3], 0.0, atol=ATOL)
    np.testing.assert_allclose(Uc[:3, 3], 0.0, atol=ATOL)
    np.testing.assert_allclose(Uc[3, 3], 1.0, atol=ATOL)


def to_numpy_c(x):
    """Complex numpy view of a C or complex array."""
    from pisa_tpu.ops.cplx import C

    if isinstance(x, C):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    return np.asarray(x)


def _vacuum_exact(U, dms, energy, length, nubar=1):
    """P(a->b) from the exact vacuum evolution exp(-i diag phases)."""
    Uc = to_numpy_c(U)
    if nubar < 0:
        Uc = Uc.conj()
    out = np.empty((len(energy), 4, 4))
    for n, (E, L) in enumerate(zip(energy, length)):
        phases = np.exp(-1j * np.asarray(dms) * L * HBAR_C_FACTOR / E)
        T = Uc @ np.diag(phases) @ Uc.conj().T
        out[n] = np.abs(T.T) ** 2  # P(a->b) = |T[b,a]|^2
    return out


@pytest.mark.parametrize("nubar", [1, -1])
def test_vacuum_matches_exact(nubar):
    rng = np.random.default_rng(1)
    n = 32
    energy = rng.uniform(1.0, 50.0, n)
    length = rng.uniform(100.0, 8000.0, n)
    dens = np.zeros((n, 2))
    dist = np.stack([length, np.zeros(n)], axis=1)

    U = pmns4_matrix(TH12, TH13, TH23, TH14, TH24, TH34,
                     DCP13, DCP14, DCP24)
    dms = (0.0, DM21, DM31, DM41)
    probs = np.asarray(
        osc_probs_layers_4nu(
            np.asarray(dms), U, nubar, energy, dens, dens, dist
        )
    )
    exact = _vacuum_exact(U, dms, energy, length, nubar)
    np.testing.assert_allclose(probs, exact, atol=200 * ATOL)
    # unitarity rows
    np.testing.assert_allclose(probs.sum(axis=2), 1.0, atol=200 * ATOL)


@pytest.mark.parametrize("nubar", [1, -1])
def test_reduces_to_three_flavor_in_matter(nubar):
    """theta_i4 = 0, any dm41: the active block must equal the 3-flavor
    kernel through the same matter chain."""
    rng = np.random.default_rng(2)
    n = 24
    energy = rng.uniform(1.0, 40.0, n)
    dens = rng.uniform(1.0, 8.0, (n, 3))
    dist = rng.uniform(100.0, 3000.0, (n, 3))
    dist[:, 2] = 0.0

    U4 = pmns4_matrix(TH12, TH13, TH23, 0.0, 0.0, 0.0, DCP13)
    probs4 = np.asarray(
        osc_probs_layers_4nu(
            np.asarray((0.0, DM21, DM31, DM41)), U4, nubar, energy,
            dens, dens * 0.6, dist,
        )
    )

    U3 = pmns_matrix_complex(
        np.sin(TH12), np.sin(TH13), np.sin(TH23), DCP13
    )
    probs3 = np.asarray(
        osc_probs_layers(
            dm_matrix(DM21, DM31), U3,
            np.diag([1.0, 0.0, 0.0]).astype(complex),
            np.zeros((3, 3), complex), np.zeros((3, 3)),
            nubar, energy, dens, dist,
        )
    )
    np.testing.assert_allclose(
        probs4[:, :3, :3], probs3, atol=500 * ATOL
    )
    # decoupled sterile state
    np.testing.assert_allclose(probs4[:, 3, 3], 1.0, atol=200 * ATOL)


def test_nc_potential_matters():
    """The sterile-sector NC potential (neutron-weighted density) must
    change probabilities when the sterile mixes."""
    rng = np.random.default_rng(3)
    n = 16
    energy = rng.uniform(2.0, 30.0, n)
    dens = rng.uniform(2.0, 8.0, (n, 2))
    dist = rng.uniform(1000.0, 6000.0, (n, 2))

    U = pmns4_matrix(TH12, TH13, TH23, TH14, TH24, TH34,
                     DCP13, DCP14, DCP24)
    dms = np.asarray((0.0, DM21, DM31, DM41))
    with_nc = np.asarray(
        osc_probs_layers_4nu(dms, U, 1, energy, dens, dens * 0.6, dist)
    )
    without_nc = np.asarray(
        osc_probs_layers_4nu(dms, U, 1, energy, dens, dens * 0.0, dist)
    )
    assert np.max(np.abs(with_nc - without_nc)) > 1e-4


def test_lowpass_identity_when_open():
    """A cutoff far above every oscillation frequency must reproduce the
    exact amplitude-picture result (the density-matrix path is then an
    exact reformulation)."""
    rng = np.random.default_rng(4)
    n = 12
    energy = rng.uniform(5.0, 50.0, n)
    dens = rng.uniform(1.0, 6.0, (n, 2))
    dist = rng.uniform(200.0, 2000.0, (n, 2))

    U = pmns4_matrix(TH12, TH13, TH23, TH14, TH24, TH34,
                     DCP13, DCP14, DCP24)
    dms = np.asarray((0.0, DM21, DM31, DM41))
    exact = np.asarray(
        osc_probs_layers_4nu(dms, U, 1, energy, dens, dens * 0.6, dist)
    )
    lp = np.asarray(
        osc_probs_layers_4nu(
            dms, U, 1, energy, dens, dens * 0.6, dist,
            lowpass_cutoff=1e6,
        )
    )
    np.testing.assert_allclose(lp, exact, atol=500 * ATOL)


def test_lowpass_averages_fast_oscillations():
    """Vacuum, one layer, eV^2-scale dm41 at low energy: with the filter
    set between the slow (atmospheric) and fast (sterile) frequencies, the
    result must equal the analytically phase-averaged probability (cross
    terms with m4 dropped), while the unfiltered result oscillates."""
    E = np.full(64, 2.0)
    L = np.linspace(500.0, 520.0, 64)  # tiny window: fast phase wraps many
    dens = np.zeros((64, 1))
    dist = L[:, None]

    U = pmns4_matrix(TH12, TH13, TH23, TH14, TH24, TH34,
                     DCP13, DCP14, DCP24)
    dms = (0.0, DM21, DM31, DM41)
    # frequencies: dm41*hc/E ~ 1.3*2.534/2 ~ 1.6 rad/km; atm ~ 3e-3
    cutoff = 0.1  # between slow and fast
    lp = np.asarray(
        osc_probs_layers_4nu(
            np.asarray(dms), U, 1, E, dens, dens, dist,
            lowpass_cutoff=cutoff, lowpass_frac=0.1,
        )
    )

    # analytic average: P_avg(a->b) = sum_k |U_ak|^2 |U_bk|^2 over the fast
    # pairs; keep slow interference among (1,2,3) exactly
    Uc = to_numpy_c(U)
    out = np.empty((64, 4, 4))
    for n_, (e_, l_) in enumerate(zip(E, L)):
        phases = np.exp(
            -1j * np.asarray(dms) * l_ * HBAR_C_FACTOR / e_
        )
        for a in range(4):
            for b in range(4):
                amp = Uc[b, :] * Uc[a, :].conj()  # A_k contributions
                # slow block interferes fully; m4 decoheres
                slow = amp[:3] * phases[:3]
                p = np.abs(slow.sum()) ** 2 + np.abs(amp[3]) ** 2
                out[n_, a, b] = p
    np.testing.assert_allclose(lp, out, atol=max(1e-6, 500 * ATOL))

    # unfiltered oscillates visibly across the window; filtered is smooth
    exact = np.asarray(
        osc_probs_layers_4nu(np.asarray(dms), U, 1, E, dens, dens, dist)
    )
    # (the filtered curve retains the slow atmospheric drift by design, so
    # its std is not ~0 — but the fast Delta-m41 wiggle is gone)
    assert exact[:, 1, 1].std() > 3 * lp[:, 1, 1].std()


def test_gradients_flow():
    """Analytic gradients w.r.t. dm41 and the mixing matrix entries."""
    import jax
    import jax.numpy as jnp

    energy = np.array([5.0, 10.0])
    dens = np.full((2, 1), 3.0)
    dist = np.full((2, 1), 1500.0)

    def f(dm41):
        U = pmns4_matrix(TH12, TH13, TH23, TH14, TH24, TH34,
                         DCP13, DCP14, DCP24)
        dms = jnp.stack(
            [jnp.zeros_like(dm41), jnp.asarray(DM21),
             jnp.asarray(DM31), dm41]
        )
        p = osc_probs_layers_4nu(
            dms, U, 1, jnp.asarray(energy), jnp.asarray(dens),
            jnp.asarray(dens * 0.6), jnp.asarray(dist),
        )
        return jnp.sum(p[:, 1, 1])

    g = jax.grad(f)(jnp.asarray(DM41, dtype=FTYPE))
    assert np.isfinite(float(g)) and float(g) != 0.0
    if FTYPE == np.float64:
        # central differences are only meaningful above the dtype's
        # resolution: at fp32 the f(dm41 +- 1e-5) difference sits below
        # roundoff of the O(1) probabilities, so the FD quotient is noise
        # (the analytic gradient itself is pinned at fp64 here and by the
        # kernel-level parity tests)
        h = 1e-5
        fd = (f(jnp.asarray(DM41 + h)) - f(jnp.asarray(DM41 - h))) / (2 * h)
        np.testing.assert_allclose(float(g), float(fd), rtol=5e-3)


def test_sterile_example_pipeline_e2e():
    """The packaged sterile_example.cfg runs end-to-end through the full
    Pipeline path (toy events -> barr flux -> NATIVE osc.nusquids with
    num_neutrinos=4 and low-pass filtering), cf. reference nusquids
    pipeline configs (pisa/stages/osc/nusquids.py)."""
    from pisa_tpu.core.pipeline import Pipeline

    p = Pipeline("settings/pipeline/sterile_example.cfg")
    outs = p.get_outputs()
    tot = sum(float(m.nominal_values.sum()) for m in outs)
    assert np.isfinite(tot) and tot > 0
    # the osc.nusquids stage must actually be the 4-flavor engine
    svc = [s for s in p.stages if s.stage_name == "osc"][0]
    assert getattr(svc, "num_neutrinos", 0) == 4


def test_high_energy_resonance_unitarity_fp32():
    """Regression: around the ~TeV sterile matter resonance the active
    cluster contains a near-degenerate mu/tau pair; without second-level
    projector deflation fp32 showed ~8% unitarity violation (row sums
    1.06-1.08) through the 28-layer PREM chain.  Pin row sums to 2% at
    fp32 (machine precision at fp64)."""
    from pisa_tpu.ops.osc.layers import Layers
    from pisa_tpu.utils.resources import find_resource

    layers = Layers(
        find_resource("osc/PREM_12layer.dat"),
        detector_depth=2.0, prop_height=20.0,
    )
    layers.setElecFrac(0.4656, 0.4656, 0.4957)
    cz = np.linspace(-1.0, -0.3, 8)
    layers.calcLayers(cz)
    n = int(np.max(layers.n_layers))
    dens = layers.density.reshape(len(cz), -1)[:, :n]
    dist = layers.distance.reshape(len(cz), -1)[:, :n]

    U = pmns4_matrix(TH12, TH13, TH23, 0.12, 0.15, 0.0, DCP13, 0.0, 0.0)
    dms = np.array([0.0, DM21, DM31, 1.0])
    # post-Newton-Schulz (ops/osc/sterile._unitarize): measured worst
    # |row sum - 1| on this set is 1.2e-6 at fp32 (was 5.5e-3); bound at
    # ~15x margin. fp64 is machine precision.
    tol = 2e-5 if FTYPE == np.float32 else 1e-6
    for energy in (100.0, 500.0, 2000.0):
        E = np.full(len(cz), energy)
        for nubar in (1, -1):
            p = np.asarray(
                osc_probs_layers_4nu(dms, U, nubar, E, dens, dens * 0.468,
                                     dist)
            )
            np.testing.assert_allclose(
                p.sum(axis=2), 1.0, atol=tol,
                err_msg=f"E={energy} nubar={nubar}",
            )
            assert p.min() > -tol


def test_globes_service_conventions():
    """The native osc.globes service preserves the reference's weight
    conventions (globes.py:155-172,245-291): CC events get
    P(nue->flav), P(numu->flav); NC events get the nonsterile survival
    sum; with theta24=theta34=0 the sterile state decouples and NC
    weights are untouched."""
    from pisa_tpu import ureg
    from pisa_tpu.core.container import Container, ContainerSet
    from pisa_tpu.stages.osc.globes import globes, init_test

    rng = np.random.RandomState(7)
    n = 30

    def make_data():
        containers = []
        for name, nubar, flav in (
            ("numu_cc", 1, 1), ("numu_nc", 1, 1), ("nutau_cc", 1, 2),
        ):
            c = Container(name, representation="events")
            c.set_aux_data("nubar", nubar)
            c.set_aux_data("flav", flav)
            c["true_energy"] = 10 ** rng.uniform(0.5, 2, n).astype(FTYPE)
            c["true_coszen"] = rng.uniform(-1, 0, n).astype(FTYPE)
            c["nu_flux"] = rng.uniform(0.5, 2.0, (n, 2)).astype(FTYPE)
            c["weights"] = np.ones(n, dtype=FTYPE)
            containers.append(c)
        return ContainerSet("test", containers)

    svc = init_test()
    svc.data = make_data()
    svc.setup()
    svc.run()

    for c in svc.data:
        p4 = np.asarray(c["probability4"])
        w = np.asarray(c["weights"])
        flux = np.asarray(c["nu_flux"])
        flav = int(c["flav"])
        if c.name.endswith("_cc"):
            expected = flux[:, 0] * p4[:, 0, flav] + flux[:, 1] * p4[:, 1, flav]
        else:
            nonsterile = p4[:, flav, :3].sum(axis=-1)
            np.testing.assert_allclose(
                nonsterile, 1.0 - p4[:, flav, 3],
                atol=5e-2 if FTYPE == np.float32 else 1e-7,
            )
            expected = flux[:, 0] * 0.0 + flux[:, 1] * 1.0
            expected = expected * nonsterile
        np.testing.assert_allclose(w, expected, rtol=2e-5)

    # sterile decoupled -> NC untouched, CC == plain 3-flavor
    svc2 = init_test()
    for pname in ("theta24", "theta34"):
        svc2.params[pname].value = 0 * ureg.degree
    svc2.data = make_data()
    svc2.setup()
    svc2.run()
    for c in svc2.data:
        if c.name.endswith("_nc"):
            np.testing.assert_allclose(
                np.asarray(c["prob_nonsterile"]), 1.0,
                atol=1e-2 if FTYPE == np.float32 else 1e-7,
            )
