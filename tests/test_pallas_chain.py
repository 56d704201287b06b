"""
Pallas layer-chain kernel vs the XLA oscillation path.

The compiled kernel runs only on TPU; these tests exercise the identical
kernel body through the Pallas interpreter on CPU, so the algebraic
restructuring (mass basis, Hermitian triangles, shared spectral projectors,
polynomial atan2) is validated against the XLA implementation that the
golden-pickle suite (tests/test_osc_golden.py) anchors to the reference
(cf. /root/reference/pisa/stages/osc/prob3numba/numba_osc_kernels.py:122).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pisa_tpu import FTYPE
from pisa_tpu.ops.cplx import C
from pisa_tpu.ops.osc.kernels import osc_probs_layers
from pisa_tpu.ops.osc.pallas_chain import (
    _atan2_pos,
    osc_probs_layers_pallas,
)
from pisa_tpu.ops.osc.pmns import dm_matrix, pmns_matrix

_F64 = FTYPE == np.float64


def _setup(n=96, n_layers=5, seed=7):
    # the suite runs under x64 (conftest), so this validates the kernel
    # algebra in fp64; on TPU the same code runs in fp32 (x64 off)
    rng = np.random.RandomState(seed)
    e = np.asarray(10 ** rng.uniform(0, 2, n), dtype=np.float64)
    dens = np.asarray(rng.uniform(1, 12, (n, n_layers)), dtype=np.float64)
    dist = np.asarray(
        rng.uniform(50, 1000, (n, n_layers)), dtype=np.float64
    )
    dist[:, -1] = 0.0  # padding slot
    mix = pmns_matrix(
        jnp.sin(0.58), jnp.sin(0.15), jnp.sin(0.78), 1.2
    )
    dm = dm_matrix(7.4e-5, 2.5e-3)
    mat_pot = C.of(np.diag([1.0, 0.0, 0.0]).astype(np.complex128))
    mat_decay = C.of(np.zeros((3, 3), np.complex128))
    lri = np.zeros((3, 3), np.float64)
    return e, dens, dist, mix, dm, mat_pot, mat_decay, lri


@pytest.mark.parametrize("nubar", [1, -1])
def test_matches_xla_path(nubar):
    e, dens, dist, mix, dm, mat_pot, mat_decay, lri = _setup()
    ref = np.asarray(
        osc_probs_layers(
            dm, mix, mat_pot, mat_decay, lri, nubar, e, dens, dist
        )
    )
    U = mix if nubar > 0 else mix.conj()
    out = np.asarray(
        osc_probs_layers_pallas(
            dm, U, mat_pot, lri, nubar,
            jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist),
            interpret=True,
        )
    )
    assert out.shape == ref.shape == (e.size, 3, 3)
    # identical math, different association order: fp32 chain-product level
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # rows are probability distributions
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=2e-5)


def test_nsi_matter_potential():
    """Generalized (NSI) matter potentials exercise the full complex
    M_eff path (off-diagonal, non-real entries)."""
    e, dens, dist, mix, dm, _, mat_decay, lri = _setup(seed=11)
    eps = np.array(
        [
            [1.0 + 0.0j, 0.04 + 0.01j, 0.003 - 0.02j],
            [0.04 - 0.01j, 0.02, 0.011 + 0.005j],
            [0.003 + 0.02j, 0.011 - 0.005j, -0.01],
        ],
        dtype=np.complex64,
    )
    mat_pot = C.of(eps)
    ref = np.asarray(
        osc_probs_layers(dm, mix, mat_pot, mat_decay, lri, -1, e, dens, dist)
    )
    out = np.asarray(
        osc_probs_layers_pallas(
            dm, mix.conj(), mat_pot, lri, -1,
            jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist),
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_gradient_flows_through_custom_vjp():
    """d(sum probs)/d(dm31) via the Pallas custom_vjp must match the XLA
    gradient (the backward pass IS the XLA path; this checks the wiring)."""
    e, dens, dist, mix, _, mat_pot, mat_decay, lri = _setup(n=32, n_layers=3)
    ej, dnj, dxj = jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist)

    def loss_pallas(dm31):
        dm = dm_matrix(7.4e-5, dm31)
        probs = osc_probs_layers_pallas(
            dm, mix, mat_pot, lri, 1, ej, dnj, dxj, interpret=True
        )
        return jnp.sum(probs[:, 1, 1])

    def loss_xla(dm31):
        dm = dm_matrix(7.4e-5, dm31)
        probs = osc_probs_layers(
            dm, mix, mat_pot, mat_decay, lri, 1, ej, dnj, dxj
        )
        return jnp.sum(probs[:, 1, 1])

    g_pal = float(jax.grad(loss_pallas)(jnp.float32(2.5e-3)))
    g_xla = float(jax.grad(loss_xla)(jnp.float32(2.5e-3)))
    assert np.isfinite(g_pal)
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-4)


def test_atan2_polynomial_accuracy():
    rng = np.random.RandomState(3)
    y = np.abs(rng.standard_normal(4096)).astype(np.float32)
    x = rng.standard_normal(4096).astype(np.float32)
    got = np.asarray(_atan2_pos(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    np.testing.assert_allclose(got, want, atol=5e-7)
    # conventions at the degenerate points
    z = jnp.zeros((4,), jnp.float32)
    assert float(_atan2_pos(z, z)[0]) == 0.0
    np.testing.assert_allclose(
        np.asarray(_atan2_pos(z, -jnp.ones((4,), jnp.float32))), np.pi,
        rtol=1e-6,
    )


def test_chain_order_permutation_invariance():
    """Evaluating through a chain-length sort (the per-block dynamic layer
    bound's enabler) must return results in the original point order."""
    e, dens, dist, mix, dm, mat_pot, mat_decay, lri = _setup(n=96, n_layers=6)
    # heterogeneous chain lengths, zero-padded tails
    rng = np.random.RandomState(5)
    nl = rng.randint(1, 7, e.size)
    for i, k in enumerate(nl):
        dist[i, k:] = 0.0
        dens[i, k:] = 0.0
    order = np.argsort(np.count_nonzero(dist > 0, axis=1)).astype(np.int32)

    kwargs = dict(interpret=True)
    base = np.asarray(
        osc_probs_layers_pallas(
            dm, mix, mat_pot, lri, 1,
            jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist), **kwargs,
        )
    )
    sorted_path = np.asarray(
        osc_probs_layers_pallas(
            dm, mix, mat_pot, lri, 1,
            jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist),
            order=order, **kwargs,
        )
    )
    np.testing.assert_allclose(sorted_path, base, atol=1e-6)
    # and against the XLA reference path
    ref = np.asarray(
        osc_probs_layers(dm, mix, mat_pot, mat_decay, lri, 1, e, dens, dist)
    )
    np.testing.assert_allclose(sorted_path, ref, atol=2e-5)


def test_slot_index_compaction_parity():
    """The slot-compacted XLA path (transition algebra only over real
    distance>0 slots, identity-scattered back) must match the padded path
    in values AND parameter gradients at fp64 machine precision."""
    e, dens, dist, mix, dm, mat_pot, mat_decay, lri = _setup(
        n=96, n_layers=6, seed=3
    )
    rng = np.random.RandomState(5)
    nl = rng.randint(1, 7, e.size)
    for i, k in enumerate(nl):
        dist[i, k:] = 0.0
        dens[i, k:] = 0.0
    slot = np.flatnonzero(
        np.swapaxes(dist, 0, 1).ravel() > 0.0
    ).astype(np.int32)
    assert 0 < len(slot) < dist.size

    for nubar in (1, -1):
        p0 = np.asarray(
            osc_probs_layers(
                dm, mix, mat_pot, mat_decay, lri, nubar, e, dens, dist
            )
        )
        p1 = np.asarray(
            osc_probs_layers(
                dm, mix, mat_pot, mat_decay, lri, nubar, e, dens, dist,
                slot_index=jnp.asarray(slot),
            )
        )
        np.testing.assert_allclose(p1, p0, atol=1e-13 if _F64 else 2e-6)

    def loss(dm31, slot_index):
        dmv = dm_matrix(7.4e-5, dm31)
        probs = osc_probs_layers(
            dmv, mix, mat_pot, mat_decay, lri, 1, jnp.asarray(e),
            jnp.asarray(dens), jnp.asarray(dist), slot_index=slot_index,
        )
        return jnp.sum(probs[:, 1, 1] ** 2)

    g0 = float(jax.grad(lambda d: loss(d, None))(2.5e-3))
    g1 = float(
        jax.grad(lambda d: loss(d, jnp.asarray(slot)))(2.5e-3)
    )
    assert abs(g1 - g0) <= (1e-10 if _F64 else 2e-5) * abs(g0)


def test_slot_index_through_pallas_vjp():
    """slot_index forwarded through the Pallas custom_vjp must leave the
    gradient unchanged (the backward pass uses the compacted XLA path)."""
    e, dens, dist, mix, _, mat_pot, mat_decay, lri = _setup(
        n=32, n_layers=3
    )
    slot = np.flatnonzero(
        np.swapaxes(dist, 0, 1).ravel() > 0.0
    ).astype(np.int32)
    ej, dnj, dxj = jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist)

    def loss(dm31, **kw):
        dm = dm_matrix(7.4e-5, dm31)
        probs = osc_probs_layers_pallas(
            dm, mix, mat_pot, lri, 1, ej, dnj, dxj, interpret=True, **kw
        )
        return jnp.sum(probs[:, 1, 1])

    g0 = float(jax.grad(loss)(2.5e-3))
    g1 = float(
        jax.grad(lambda d: loss(d, slot_index=jnp.asarray(slot)))(2.5e-3)
    )
    assert abs(g1 - g0) <= (1e-10 if _F64 else 2e-5) * abs(g0)


def test_fwdgrad_values_and_gradients():
    """The forward-mode (in-kernel JVP) gradient path must reproduce the
    Pallas primal values and the XLA reverse-mode parameter gradients.

    Values differ from the XLA path only by the kernel's polynomial
    atan2 (~2e-9); gradients inherit that formulation difference at the
    ~1e-7 relative level — the fwd-kernel gradient is the exact
    derivative of the Pallas function itself."""
    from pisa_tpu.ops.osc.pallas_chain import (
        osc_probs_layers_pallas_fwdgrad,
    )

    rng = np.random.RandomState(3)
    n, n_layers = 96, 6
    e = 10 ** rng.uniform(0, 2, n)
    nl = rng.randint(1, 7, n)
    dens = rng.uniform(1, 10, (n, n_layers))
    dist = rng.uniform(50, 1000, (n, n_layers))
    for i, k in enumerate(nl):
        dens[i, k:] = 0.0
        dist[i, k:] = 0.0
    order = np.argsort(np.count_nonzero(dist > 0, axis=1)).astype(np.int32)

    theta = jnp.asarray([0.58, 0.15, 0.78, 1.2, 7.4e-5, 2.5e-3])
    mat_pot = C.of(np.diag([1.0, 0.0, 0.0]).astype(np.complex128))
    mat_decay = C.of(np.zeros((3, 3), np.complex128))
    lri = np.zeros((3, 3))

    mix = pmns_matrix(
        jnp.sin(theta[0]), jnp.sin(theta[1]), jnp.sin(theta[2]), theta[3]
    )
    dm = dm_matrix(theta[4], theta[5])
    # value parity: nu with sorted order, nubar without (each interpret
    # launch is expensive; the order/no-order symmetry is covered by
    # test_sorted_order_parity for the shared primal kernel)
    for nubar, use_order in ((1, order), (-1, None)):
        ref = np.asarray(
            osc_probs_layers(
                dm, mix, mat_pot, mat_decay, lri, nubar, e, dens, dist
            )
        )
        out = np.asarray(
            osc_probs_layers_pallas_fwdgrad(
                theta, nubar, e, dens, dist, interpret=True,
                order=use_order,
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-8 if _F64 else 5e-5)

    w = jnp.asarray(rng.uniform(-1, 1, (n, 3, 3)))

    def loss_fwd(th):
        return jnp.sum(
            w * osc_probs_layers_pallas_fwdgrad(
                th, 1, e, dens, dist, interpret=True, order=order
            )
        )

    def loss_xla(th):
        mx = pmns_matrix(
            jnp.sin(th[0]), jnp.sin(th[1]), jnp.sin(th[2]), th[3]
        )
        dmv = dm_matrix(th[4], th[5])
        return jnp.sum(
            w * osc_probs_layers(
                dmv, mx, mat_pot, mat_decay, lri, 1, jnp.asarray(e),
                jnp.asarray(dens), jnp.asarray(dist),
            )
        )

    g1 = np.asarray(jax.grad(loss_fwd)(theta))
    g2 = np.asarray(jax.grad(loss_xla)(theta))
    assert np.abs(g1 - g2).max() / np.abs(g2).max() < (
        1e-6 if _F64 else 5e-5
    )


def test_fwdgrad_planar_values_and_gradients():
    """The PLANAR-layout prepared path (channel-first (2, 3, n), the
    flagship stacked template's fast path) must match the (n, 3, 3)
    reference values on the e/mu initial-state rows and reproduce the XLA
    parameter gradients."""
    from pisa_tpu.ops.osc.pallas_chain import (
        osc_probs_layers_pallas_fwdgrad_prepared_planar,
        prepare_chain_geometry,
    )

    rng = np.random.RandomState(5)
    n, n_layers = 96, 6
    e = 10 ** rng.uniform(0, 2, n)
    nl = rng.randint(1, 7, n)
    dens = rng.uniform(1, 10, (n, n_layers))
    dist = rng.uniform(50, 1000, (n, n_layers))
    for i, k in enumerate(nl):
        dens[i, k:] = 0.0
        dist[i, k:] = 0.0
    order = np.argsort(np.count_nonzero(dist > 0, axis=1)).astype(np.int32)
    geom = prepare_chain_geometry(
        jnp.asarray(e, FTYPE), jnp.asarray(dens, FTYPE),
        jnp.asarray(dist, FTYPE), order=order,
    )

    theta = jnp.asarray([0.58, 0.15, 0.78, 1.2, 7.4e-5, 2.5e-3])
    mat_pot = C.of(np.diag([1.0, 0.0, 0.0]).astype(np.complex128))
    mat_decay = C.of(np.zeros((3, 3), np.complex128))
    lri = np.zeros((3, 3))
    mix = pmns_matrix(
        jnp.sin(theta[0]), jnp.sin(theta[1]), jnp.sin(theta[2]), theta[3]
    )
    dm = dm_matrix(theta[4], theta[5])

    for nubar in (1, -1):
        ref = np.asarray(
            osc_probs_layers(
                dm, mix, mat_pot, mat_decay, lri, nubar, e, dens, dist
            )
        )
        planar = np.asarray(
            osc_probs_layers_pallas_fwdgrad_prepared_planar(
                theta, nubar, geom, n, interpret=True,
            )
        )
        assert planar.shape == (2, 3, n)
        # planar[init, final, :] == ref[:, init, final]
        np.testing.assert_allclose(
            planar, ref[:, :2, :].transpose(1, 2, 0),
            atol=1e-8 if _F64 else 5e-5,
        )

    w = jnp.asarray(rng.uniform(-1, 1, (2, 3, n)))

    def loss_planar(th):
        return jnp.sum(
            w * osc_probs_layers_pallas_fwdgrad_prepared_planar(
                th, 1, geom, n, interpret=True,
            )
        )

    def loss_xla(th):
        mx = pmns_matrix(
            jnp.sin(th[0]), jnp.sin(th[1]), jnp.sin(th[2]), th[3]
        )
        dmv = dm_matrix(th[4], th[5])
        probs = osc_probs_layers(
            dmv, mx, mat_pot, mat_decay, lri, 1, jnp.asarray(e),
            jnp.asarray(dens), jnp.asarray(dist),
        )
        return jnp.sum(w * probs[:, :2, :].transpose(1, 2, 0))

    g1 = np.asarray(jax.grad(loss_planar)(theta))
    g2 = np.asarray(jax.grad(loss_xla)(theta))
    assert np.abs(g1 - g2).max() / np.abs(g2).max() < (
        1e-6 if _F64 else 5e-5
    )


def test_odd_sizes_padding():
    """N not a multiple of the 1024-point block must pad transparently."""
    e, dens, dist, mix, dm, mat_pot, mat_decay, lri = _setup(n=96)
    full = np.asarray(
        osc_probs_layers_pallas(
            dm, mix, mat_pot, lri, 1,
            jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist),
            interpret=True,
        )
    )
    part = np.asarray(
        osc_probs_layers_pallas(
            dm, mix, mat_pot, lri, 1,
            jnp.asarray(e[:77]), jnp.asarray(dens[:77]),
            jnp.asarray(dist[:77]), interpret=True,
        )
    )
    np.testing.assert_allclose(part, full[:77], atol=1e-6)


def test_fwdgrad_prepared_matches_unprepared():
    """The prepared-geometry fwdgrad path (static blocks computed once via
    prepare_chain_geometry, as prob3 does at setup) must reproduce the
    unprepared path's values AND parameter gradients exactly (identical
    kernel launches; only the block prep moved out of the traced
    program)."""
    from pisa_tpu.ops.osc.pallas_chain import (
        osc_probs_layers_pallas_fwdgrad,
        osc_probs_layers_pallas_fwdgrad_prepared,
        prepare_chain_geometry,
    )

    rng = np.random.RandomState(13)
    n, n_layers = 80, 6
    e = 10 ** rng.uniform(0, 2, n)
    nl = rng.randint(1, 7, n)
    dens = rng.uniform(1, 10, (n, n_layers))
    dist = rng.uniform(50, 1000, (n, n_layers))
    for i, k in enumerate(nl):
        dens[i, k:] = 0.0
        dist[i, k:] = 0.0
    order = np.argsort(np.count_nonzero(dist > 0, axis=1)).astype(np.int32)
    theta = jnp.asarray([0.58, 0.15, 0.78, 1.2, 7.4e-5, 2.5e-3])

    geom = prepare_chain_geometry(
        jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist), order=order
    )
    ref = np.asarray(
        osc_probs_layers_pallas_fwdgrad(
            theta, 1, e, dens, dist, interpret=True, order=order
        )
    )
    out = np.asarray(
        osc_probs_layers_pallas_fwdgrad_prepared(
            theta, 1, geom, n=n, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)  # identical math

    w = jnp.asarray(rng.uniform(-1, 1, (n, 3, 3)))

    def loss_prep(th):
        return jnp.sum(
            w * osc_probs_layers_pallas_fwdgrad_prepared(
                th, 1, geom, n=n, interpret=True
            )
        )

    def loss_ref(th):
        return jnp.sum(
            w * osc_probs_layers_pallas_fwdgrad(
                th, 1, e, dens, dist, interpret=True, order=order
            )
        )

    g1 = np.asarray(jax.grad(loss_prep)(theta))
    g2 = np.asarray(jax.grad(loss_ref)(theta))
    np.testing.assert_allclose(g1, g2, rtol=1e-6, atol=0)


def test_fwdgrad_prepared_active_subset():
    """With active=(1,2,5) the backward must return the full-gradient
    values on the active components and exactly zero on the rest."""
    from pisa_tpu.ops.osc.pallas_chain import (
        osc_probs_layers_pallas_fwdgrad_prepared,
        prepare_chain_geometry,
    )

    rng = np.random.RandomState(5)
    n, n_layers = 64, 5
    e = 10 ** rng.uniform(0, 2, n)
    dens = rng.uniform(1, 10, (n, n_layers))
    dist = rng.uniform(50, 1000, (n, n_layers))
    dist[:, -1] = 0.0
    order = np.argsort(np.count_nonzero(dist > 0, axis=1)).astype(np.int32)
    geom = prepare_chain_geometry(
        jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist), order=order
    )
    theta = jnp.asarray([0.58, 0.15, 0.78, 1.2, 7.4e-5, 2.5e-3])
    w = jnp.asarray(rng.uniform(-1, 1, (n, 3, 3)))

    def loss(th, active):
        return jnp.sum(
            w * osc_probs_layers_pallas_fwdgrad_prepared(
                th, 1, geom, n=n, interpret=True, active=active
            )
        )

    g_full = np.asarray(jax.grad(lambda t: loss(t, None))(theta))
    g_act = np.asarray(jax.grad(lambda t: loss(t, (1, 2, 5)))(theta))
    np.testing.assert_allclose(g_act[[1, 2, 5]], g_full[[1, 2, 5]],
                               rtol=1e-6)
    assert np.all(g_act[[0, 3, 4]] == 0.0)
    assert np.abs(g_full[[0, 3, 4]]).max() > 0  # full path really differs


def test_fwdgrad_multitangent_matches_separate(monkeypatch):
    """The shared-primal multitangent backward (one launch, per-layer
    linearize) must reproduce the separate-launch tangent gradients
    exactly. Off by default (measured neutral on v5e); exercised here
    explicitly."""
    from pisa_tpu.ops.osc.pallas_chain import (
        osc_probs_layers_pallas_fwdgrad_prepared,
        prepare_chain_geometry,
    )

    rng = np.random.RandomState(21)
    n, n_layers = 64, 5
    e = 10 ** rng.uniform(0, 2, n)
    dens = rng.uniform(1, 10, (n, n_layers))
    dist = rng.uniform(50, 1000, (n, n_layers))
    dist[:, -1] = 0.0
    order = np.argsort(np.count_nonzero(dist > 0, axis=1)).astype(np.int32)
    geom = prepare_chain_geometry(
        jnp.asarray(e), jnp.asarray(dens), jnp.asarray(dist), order=order
    )
    theta = jnp.asarray([0.58, 0.15, 0.78, 1.2, 7.4e-5, 2.5e-3])
    w = jnp.asarray(rng.uniform(-1, 1, (n, 3, 3)))

    def loss(th):
        return jnp.sum(
            w * osc_probs_layers_pallas_fwdgrad_prepared(
                th, -1, geom, n=n, interpret=True, active=(1, 2, 5)
            )
        )

    monkeypatch.setenv("PISA_TPU_OSC_MULTITANGENT", "0")
    g_sep = np.asarray(jax.grad(loss)(theta))
    monkeypatch.setenv("PISA_TPU_OSC_MULTITANGENT", "1")
    g_multi = np.asarray(jax.grad(loss)(theta))
    np.testing.assert_allclose(g_multi, g_sep, rtol=5e-6, atol=0)
