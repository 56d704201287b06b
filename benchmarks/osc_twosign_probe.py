"""
A/B probe: the flagship template launches the chain kernel TWICE per
template (nu and nubar packed parameters over identical geometry). Compare

  seq    two sequential `chain_probs_pallas_prepared` launches
  vmap   ONE launch vmapped over the (2, 57) packed-parameter batch
         (pallas lifts the vmap into an extra grid dimension)

at the flagship shape, both as bare dispatches and inside a lax.scan (the
template's access pattern).

Usage: python benchmarks/osc_twosign_probe.py [--n 40960] [--reps 50]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pisa_tpu.ops.cplx import C
    from pisa_tpu.ops.osc import pallas_chain as pc
    from pisa_tpu.ops.osc.layers import Layers
    from pisa_tpu.ops.osc.pmns import dm_matrix, pmns_matrix

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

    mix = pmns_matrix(np.sin(0.5838), np.sin(0.1496), np.sin(0.8587),
                      4.084)
    dm = dm_matrix(7.42e-5, 2.514e-3)
    mat_pot = C.of(np.diag([1.0, 0.0, 0.0]).astype(np.complex128))
    lri = np.zeros((3, 3), dtype)
    pv_nu = pc._pack_from_physics(dm, mix, mat_pot, lri, 1, dtype)
    pv_nub = pc._pack_from_physics(dm, mix, mat_pot, lri, -1, dtype)
    pvs = jax.device_put(jnp.stack([jnp.asarray(pv_nu).ravel(),
                                    jnp.asarray(pv_nub).ravel()]))

    def one(pv):
        return pc.chain_probs_pallas_prepared(
            pv.reshape(1, -1), geom, n, raw=True
        )

    @jax.jit
    def seq(pvs):
        return one(pvs[0]) + 2.0 * one(pvs[1])

    @jax.jit
    def vmapped(pvs):
        outs = jax.vmap(one)(pvs)
        return outs[0] + 2.0 * outs[1]

    for name, prog in (("seq ", seq), ("vmap", vmapped)):
        try:
            out = jax.block_until_ready(prog(pvs))
        except Exception as exc:
            print(f"{name}: FAIL {str(exc)[:200]}")
            continue
        t0 = time.time()
        for _ in range(args.reps):
            out = prog(pvs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.reps
        print(
            f"{name}: {dt * 1e3:.3f} ms/template-osc "
            f"(2 propagations), checksum "
            f"{float(np.asarray(out, dtype=np.float64).sum()):.9e}"
        )


if __name__ == "__main__":
    main()
