"""
Standalone timing probe for the Pallas layer-chain oscillation kernel.

Reproduces the flagship access pattern (sequential single-propagation
launches over chain-length-sorted PREM-12 geometry at the flagship grid
size) without building the whole pipeline, so kernel changes can be A/B
measured in seconds instead of minutes. The roofline doc's
"1.10 ms/propagation, 313k point-layer steps" numbers come from this
shape (cf. BASELINE_MEASURED.md "The oscillation kernel is
VPU-issue-bound").

Usage: python benchmarks/osc_kernel_probe.py [--n 40960] [--reps 50]
Prints ms/propagation (sequential launches) and the executed point-layer
step count implied by the per-block dynamic bounds.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--tangent", action="store_true",
                    help="probe the tangent kernel instead of the primal")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pisa_tpu.ops.osc import pallas_chain as pc
    from pisa_tpu.ops.osc.layers import Layers
    from pisa_tpu.ops.osc.pmns import dm_matrix, pmns_matrix

    dtype = np.float32 if not jax.config.jax_enable_x64 else np.float64

    rng = np.random.RandomState(3)
    n = args.n
    # flagship-like grid: coszen spans the full sky (downgoing chains are
    # 2 slots, core-crossing ~24), energies 1-100 GeV
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

    # executed point-layer steps implied by the per-block bounds, counting
    # the UNROLL round-up the kernel actually runs (ceil(nl/UNROLL)*UNROLL);
    # the dense rectangle is measured against the ORIGINAL layer width, with
    # the padded width reported separately
    nl = np.asarray(geom["nl"]).ravel()
    block = pc.BLOCK_ROWS * pc.LANES
    executed = -(-nl // pc.UNROLL) * pc.UNROLL
    steps = int(executed.sum()) * block
    dense = len(nl) * int(distances.shape[1]) * block
    pad_layers = int(np.asarray(geom["dens"]).shape[0])

    mix = pmns_matrix(np.sin(0.5838), np.sin(0.1496), np.sin(0.8587),
                      4.084)
    dm = dm_matrix(7.42e-5, 2.514e-3)
    from pisa_tpu.ops.cplx import C
    mat_pot = C.of(np.diag([1.0, 0.0, 0.0]).astype(np.complex128))
    lri = np.zeros((3, 3), dtype)
    pvec = pc._pack_from_physics(dm, mix, mat_pot, lri, 1, dtype)
    pvec = jax.device_put(pvec)

    if args.tangent:
        dpvec = jax.device_put(
            jnp.asarray(rng.normal(size=pvec.shape) * 1e-3, dtype=dtype))

        @jax.jit
        def prog(pv, dpv):
            return pc._launch_tangent(
                pv, dpv, geom["e2"], geom["dens"], geom["dist"],
                geom["nl"], n)

        call = lambda: prog(pvec, dpvec)
    else:

        @jax.jit
        def prog(pv):
            return pc.chain_probs_pallas_prepared(pv, geom, n, raw=True)

        call = lambda: prog(pvec)

    out = jax.block_until_ready(call())  # compile
    t0 = time.time()
    for _ in range(args.reps):
        out = call()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / args.reps
    kind = "tangent" if args.tangent else "primal"
    print(
        f"{kind}: {dt * 1e3:.3f} ms/propagation  "
        f"(n={n}, BLOCK_ROWS={pc.BLOCK_ROWS}, unroll={pc.UNROLL}, "
        f"steps={steps/1e3:.0f}k = {100.0 * steps / dense:.1f}% of dense "
        f"({distances.shape[1]} layers, padded to {pad_layers}), "
        f"platform={jax.default_backend()})"
    )
    # checksum so A/B runs can confirm identical math
    print(f"checksum: {float(np.asarray(out, dtype=np.float64).sum()):.9e}")


if __name__ == "__main__":
    main()
