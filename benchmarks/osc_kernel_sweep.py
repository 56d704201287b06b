"""
One-process A/B sweep over the Pallas chain-kernel tuning knobs
(BLOCK_ROWS x UNROLL), reusing osc_kernel_probe's flagship-like shape.
Monkeypatches the module globals between configurations (both are read at
trace time), so the whole sweep pays Python/jax startup once.

Usage: python benchmarks/osc_kernel_sweep.py [--n 40960] [--reps 50]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--tangent", action="store_true")
    ap.add_argument("--block-rows", type=int, nargs="*",
                    default=[4, 8, 16])
    ap.add_argument("--unroll", type=int, nargs="*", default=[1, 2, 4])
    args = ap.parse_args()
    # monkeypatching pc.UNROLL/pc.BLOCK_ROWS bypasses the module's own
    # import-time validation; an unsupported UNROLL would round the layer
    # loop bound past the padded layer dim (OOB slab reads -> garbage
    # timings printed as data)
    bad = sorted(set(args.unroll) - {1, 2, 4})
    if bad:
        ap.error(f"--unroll values {bad} unsupported (must be 1, 2 or 4)")
    bad = sorted(u for u in args.block_rows if u < 1 or u % 4)
    if bad:
        ap.error(f"--block-rows values {bad} unsupported (positive"
                 " multiples of 4 required by the (8,128) fp32 tile)")

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

    mix = pmns_matrix(np.sin(0.5838), np.sin(0.1496), np.sin(0.8587), 4.084)
    dm = dm_matrix(7.42e-5, 2.514e-3)
    mat_pot = C.of(np.diag([1.0, 0.0, 0.0]).astype(np.complex128))
    lri = np.zeros((3, 3), dtype)
    pvec = jax.device_put(
        pc._pack_from_physics(dm, mix, mat_pot, lri, 1, dtype))
    dpvec = jax.device_put(
        jnp.asarray(rng.normal(size=pvec.shape) * 1e-3, dtype=dtype))

    results = []
    for br in args.block_rows:
        pc.BLOCK_ROWS = br
        geom = pc.prepare_chain_geometry(e, densities, distances,
                                         order=order)
        geom = {k: jax.device_put(v) for k, v in geom.items()}
        for ur in args.unroll:
            pc.UNROLL = ur
            if args.tangent:

                @jax.jit
                def prog(pv, dpv, _geom=geom):
                    return pc._launch_tangent(
                        pv, dpv, _geom["e2"], _geom["dens"],
                        _geom["dist"], _geom["nl"], n)

                call = lambda: prog(pvec, dpvec)  # noqa: E731
            else:

                @jax.jit
                def prog(pv, _geom=geom):
                    return pc.chain_probs_pallas_prepared(
                        pv, _geom, n, raw=True)

                call = lambda: prog(pvec)  # noqa: E731

            try:
                out = jax.block_until_ready(call())
            except Exception as exc:  # compile failures are data too
                print(f"BLOCK_ROWS={br:3d} UNROLL={ur}: FAIL {exc}")
                continue
            t0 = time.time()
            for _ in range(args.reps):
                out = call()
            jax.block_until_ready(out)
            dt = (time.time() - t0) / args.reps * 1e3
            csum = float(np.asarray(out, dtype=np.float64).sum())
            results.append((dt, br, ur))
            print(f"BLOCK_ROWS={br:3d} UNROLL={ur}: {dt:.3f} ms  "
                  f"checksum={csum:.9e}", flush=True)

    results.sort()
    print("best:", results[0])


if __name__ == "__main__":
    main()
