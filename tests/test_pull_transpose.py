"""Padded-pull transposed gather (translation.build_pull_transpose /
gather_pull_transpose): value, reverse-mode, and forward-mode parity with
the plain XLA gather/scatter pair, including fanout overflow and invalid
indices. Reference semantics anchor: lookup == reference
``pisa/core/translation.py:228`` (out-of-range events get 0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pisa_tpu.core import translation


def _plain_gather(table, gidx):
    invalid = (gidx < 0) | (gidx >= table.shape[0])
    safe = jnp.asarray(np.where(invalid, 0, gidx))
    out = table[safe]
    mask = jnp.asarray(invalid)
    if out.ndim > mask.ndim:
        mask = mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim))
    return jnp.where(mask, 0.0, out)


@pytest.mark.parametrize("extra", [(), (2,)])
@pytest.mark.parametrize("max_fanout", [32, 2])
def test_pull_gather_matches_plain(extra, max_fanout):
    rng = np.random.RandomState(0)
    M, shape = 50, (4, 37)
    gidx = rng.randint(-1, M + 1, size=shape)  # includes invalid -1 and M
    gidx[0, :10] = 3  # hot cell to force overflow at max_fanout=2
    table = jnp.asarray(rng.uniform(size=(M,) + extra))
    ct_w = jnp.asarray(rng.uniform(size=shape + extra))

    pull = translation.build_pull_transpose(gidx, M, max_fanout=max_fanout)
    out_pull = translation.gather_pull_transpose(table, gidx, pull)
    out_plain = _plain_gather(table, gidx)
    np.testing.assert_allclose(
        np.asarray(out_pull), np.asarray(out_plain), rtol=0, atol=0
    )

    def loss_pull(t):
        return jnp.sum(
            translation.gather_pull_transpose(t, gidx, pull) * ct_w
        )

    def loss_plain(t):
        return jnp.sum(_plain_gather(t, gidx) * ct_w)

    g_pull = jax.grad(loss_pull)(table)
    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(
        np.asarray(g_pull), np.asarray(g_plain), rtol=1e-12, atol=1e-12
    )

    # forward mode must keep working (Fisher matrices use jacfwd through
    # the template, analysis/fisher.py:45)
    tangent = jnp.asarray(rng.uniform(size=table.shape))
    _, jv_pull = jax.jvp(loss_pull, (table,), (tangent,))
    _, jv_plain = jax.jvp(loss_plain, (table,), (tangent,))
    np.testing.assert_allclose(float(jv_pull), float(jv_plain), rtol=1e-12)


def test_pull_gather_under_jit_and_vg():
    rng = np.random.RandomState(1)
    M = 200
    gidx = rng.randint(0, M, size=(3, 1000))
    pull = translation.build_pull_transpose(gidx, M)
    table0 = jnp.asarray(rng.uniform(size=(M,)))
    w = jnp.asarray(rng.uniform(size=(3, 1000)))

    @jax.jit
    def vg(t):
        return jax.value_and_grad(
            lambda tt: jnp.sum(
                translation.gather_pull_transpose(tt, gidx, pull) ** 2 * w
            )
        )(t)

    v, g = vg(table0)
    v2, g2 = jax.value_and_grad(
        lambda tt: jnp.sum(_plain_gather(tt, gidx) ** 2 * w)
    )(table0)
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-10)


def test_stacked_binned_to_array_pull_parity():
    """StackedContainer gather: pull path (default) vs scatter path
    (PISA_TPU_PULL_TRANSPOSE=0) — identical values and gradients."""
    import os

    from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
    from pisa_tpu.core.stacking import StackedContainer

    binning = MultiDimBinning(
        [
            OneDimBinning(
                "true_energy", bin_edges=np.logspace(0, 2, 11),
                is_log=True, units="GeV",
            ),
            OneDimBinning(
                "true_coszen", bin_edges=np.linspace(-1, 1, 6),
                is_lin=True,
            ),
        ]
    )
    size = binning.size
    rng = np.random.RandomState(2)
    C, n_pad = 4, 500
    sc = StackedContainer.__new__(StackedContainer)
    sc.n_cats = C
    sc.rows = {}
    sc._flatidx = {}
    idx = rng.randint(0, size + 1, size=(C, n_pad)).astype(np.int32)
    # monkeypatch the flat-index source
    sc._events_flat_indices = lambda b: idx

    vals = rng.uniform(size=(3, size)).astype(np.float64)
    rows = np.array([0, 2, 1, 0], dtype=np.int32)

    def run(flag):
        os.environ["PISA_TPU_PULL_TRANSPOSE"] = flag

        def loss(v):
            out = sc._stacked_binned_to_array(v, rows, binning)
            return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

        val, grad = jax.value_and_grad(loss)(jnp.asarray(vals))
        return float(val), np.asarray(grad)

    try:
        v1, g1 = run("1")
        v0, g0 = run("0")
    finally:
        os.environ.pop("PISA_TPU_PULL_TRANSPOSE", None)
    np.testing.assert_allclose(v1, v0, rtol=1e-12)
    np.testing.assert_allclose(g1, g0, rtol=1e-12)
