"""
Decompose the osc STAGE's in-template cost beyond the bare kernel.

The two-sign kernel probe (osc_twosign_probe.py) measures ~0.84 ms for
both propagations, yet stage-level attribution charges ~2.8 ms to
osc.prob3 — this probe times a lax.scan (the template's access pattern)
over progressively larger slices of the stage's per-template work:

  kernel      two raw kernel launches from a precomputed pvec
  +pack       theta -> PMNS -> packed 57-scalar vectors (x2 signs)
  +epilogue   tau-row reconstruction + unsort gather (x2)
  +assemble   prob_e/prob_mu projection rows + rate fusion +
              grid->events gather (flagship 240k events) + weights mult

Usage: python benchmarks/osc_stage_tail_probe.py [--n 40960] [--scan 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--events", type=int, default=240000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pisa_tpu.ops.osc import pallas_chain as pc
    from pisa_tpu.ops.osc.layers import Layers

    dtype = np.float32 if not jax.config.jax_enable_x64 else np.float64
    rng = np.random.RandomState(3)
    n = args.n
    cz = np.linspace(-1.0, 1.0, n).astype(dtype)
    e = (10 ** rng.uniform(0.0, 2.0, n)).astype(dtype)

    layers = Layers("osc/PREM_12layer.dat", detector_depth=2.0,
                    prop_height=20.0)
    layers.setElecFrac(0.4656, 0.4656, 0.4957)
    layers.calcLayers(cz)
    densities = layers.density.reshape(n, layers.max_layers).astype(dtype)
    distances = layers.distance.reshape(n, layers.max_layers).astype(dtype)
    order = np.argsort((distances > 0).sum(axis=1), kind="stable")
    geom = pc.prepare_chain_geometry(e, densities, distances, order=order)
    geom = {k: jax.device_put(v) for k, v in geom.items()}

    theta = jnp.asarray(
        np.array([0.5838, 0.1496, 0.8587, 4.084, 7.42e-5, 2.514e-3],
                 dtype=dtype)
    )
    pv0 = pc._theta_to_pvec(theta, False, 1, 1.0, np.dtype(dtype))
    pv0 = jax.device_put(pv0)

    # flagship-like per-event gather targets: 12 categories, 20k events
    n_ev = args.events
    n_cats = 12
    n_pad = n_ev // n_cats
    flat_idx = jnp.asarray(
        rng.randint(0, 6 * n, size=(n_cats, n_pad)), dtype=jnp.int32
    )
    weights0 = jnp.asarray(
        rng.uniform(0.5, 1.0, size=(n_cats, n_pad)).astype(dtype)
    )
    grp3 = jnp.asarray(
        (np.arange(n_cats) % 2).repeat(3).reshape(n_cats, 3)[:, 0] * 3
        + np.tile(np.arange(3), 4)[:n_cats],
        dtype=jnp.int32,
    )

    def kernel_only(th, _):
        p2 = pc.chain_probs_pallas_prepared(pv0, geom, n, raw=True)
        p2b = pc.chain_probs_pallas_prepared(
            pv0 * (1.0 + 0.0 * th[0]), geom, n, raw=True
        )
        return jnp.sum(p2) + jnp.sum(p2b)

    def with_pack(th, _):
        tot = 0.0
        for sign in (1, -1):
            pv = pc._theta_to_pvec(th, False, sign, 1.0, np.dtype(dtype))
            p2 = pc.chain_probs_pallas_prepared(pv, geom, n, raw=True)
            tot = tot + jnp.sum(p2)
        return tot

    def with_epilogue(th, _):
        tot = 0.0
        for sign in (1, -1):
            pv = pc._theta_to_pvec(th, False, sign, 1.0, np.dtype(dtype))
            p2 = pc.chain_probs_pallas_prepared(pv, geom, n, raw=True)
            probs_s = pc._tau_epilogue(p2)
            probs = probs_s[geom["inv"]] if "inv" in geom else probs_s
            tot = tot + jnp.sum(probs)
        return tot

    def assemble(th, _):
        ps = []
        for sign in (1, -1):
            pv = pc._theta_to_pvec(th, False, sign, 1.0, np.dtype(dtype))
            p2 = pc.chain_probs_pallas_prepared(pv, geom, n, raw=True)
            probs_s = pc._tau_epilogue(p2)
            probs = probs_s[geom["inv"]] if "inv" in geom else probs_s
            ps.append(probs.reshape(n, 3, 3))
        probability = jnp.stack(ps)  # (2, n, 3, 3)
        pe = jnp.moveaxis(probability[:, :, 0, :], -1, 1).reshape(6, -1)
        pm = jnp.moveaxis(probability[:, :, 1, :], -1, 1).reshape(6, -1)
        flux = jnp.ones((6, n, 2), dtype=pe.dtype)
        rate = flux[..., 0] * pe + flux[..., 1] * pm  # (6, n)
        ev_rate = rate.reshape(-1)[flat_idx]  # (12, n_pad) gather
        w = weights0 * ev_rate
        return jnp.sum(w)

    progs = [
        ("kernel   ", kernel_only),
        ("+pack    ", with_pack),
        ("+epilogue", with_epilogue),
        ("+assemble", assemble),
    ]
    dummy = jnp.zeros((args.scan,), dtype=dtype)
    for name, body in progs:
        @jax.jit
        def prog(th, dummy, body=body):
            def step(c, d):
                return c, body(th + d * 1e-9, None)
            _, outs = jax.lax.scan(step, jnp.zeros((), dtype=dtype), dummy)
            return outs

        out = jax.block_until_ready(prog(theta, dummy))
        t0 = time.time()
        for _ in range(args.reps):
            out = prog(theta, dummy)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.reps / args.scan
        print(f"{name}: {dt*1e3:7.3f} ms/template-osc "
              f"(checksum {float(np.sum(np.asarray(out))):.6e})")


if __name__ == "__main__":
    main()
