"""Decompose the flagship TEMPLATE VALUE (no gradient) cost by constant
substitution, measured in-device (lax.scan over parameter vectors).

Configurations (cumulative):
  full        the shipping compiled template
  no-osc      planar osc launches replaced by a precomputed constant of the
              same shape (removes kernel + pack; keeps rate fusion + gather)
  no-gather   additionally the grid->events gather returns a precomputed
              constant (removes the 240k-event gather)
  no-flux     additionally barr_simple's grid flux is a constant (removes
              the flux grid compute)

The deltas attribute the template's per-eval wall to osc compute, the
rate gather, and the flux stage; what remains is hist + hypersurfaces +
bookkeeping. Run on TPU: python benchmarks/template_value_decomp.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pisa_tpu.core.pipeline import Pipeline
    from pisa_tpu.core.stacking import StackedContainer
    from pisa_tpu.ops.osc import pallas_chain
    from pisa_tpu.stages.flux.barr_simple import barr_simple

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = 3

    state = {"osc": None, "gather": None, "flux": None}

    orig_planar = pallas_chain.osc_probs_layers_pallas_fwdgrad_prepared_planar

    rng_c = np.random.RandomState(7)

    def _const_like(cache, key, out):
        if key not in cache:
            cache[key] = rng_c.uniform(0.1, 0.9, np.shape(out)).astype(
                np.dtype(out.dtype)
            )
        return jnp.asarray(cache[key])

    def patched_planar(theta, nubar, geom, n, **kw):
        out = orig_planar(theta, nubar, geom, n, **kw)
        if state["osc"] is not None:
            return _const_like(
                state["osc"], ("osc", int(nubar), tuple(out.shape)), out
            )
        return out

    pallas_chain.osc_probs_layers_pallas_fwdgrad_prepared_planar = (
        patched_planar
    )

    orig_gather = StackedContainer._stacked_binned_to_array

    def patched_gather(self, values, rows, src_binning):
        out = orig_gather(self, values, rows, src_binning)
        if state["gather"] is not None:
            return _const_like(
                state["gather"], ("g", tuple(out.shape)), out
            )
        return out

    StackedContainer._stacked_binned_to_array = patched_gather

    orig_barr = barr_simple._compute_stacked

    def patched_barr(self, container, params):
        orig_barr(self, container, params)
        if state["flux"] is not None:
            from pisa_tpu.core.container import _rep_hash

            h = _rep_hash(container.representation)
            arr = container._data["nu_flux"][h]
            container._data["nu_flux"][h] = _const_like(
                state["flux"], ("f", tuple(arr.shape)), arr
            )

    barr_simple._compute_stacked = patched_barr

    t0 = time.time()
    pipeline = Pipeline("settings/pipeline/IceCube_3y_neutrinos.cfg")
    ct = pipeline.compile()
    print(
        f"backend={jax.default_backend()} setup={time.time()-t0:.0f}s",
        flush=True,
    )
    v0 = ct.current_rescaled_values()
    data_ms = ct.get_outputs(v0)

    rng = np.random.RandomState(0)
    vecs = rng.uniform(0.2, 0.8, size=(n_scan, len(v0))).astype(np.float32)

    los, his = ct._current_bounds()
    los, his = jnp.asarray(los), jnp.asarray(his)
    cdata = ct._data_vals

    def run(label):
        # fresh trace so the current substitution switches take effect
        value_only, _ = ct.build_objective(data_ms, "mod_chi2")
        obj = value_only.raw

        def step(carry, v):
            return carry, obj(v, los, his, cdata)

        @jax.jit
        def scan_fn(vs):
            _, outs = jax.lax.scan(step, jnp.zeros(()), vs)
            return outs

        t0 = time.time()
        outs = np.asarray(scan_fn(jnp.asarray(vecs)))
        compile_s = time.time() - t0
        assert np.all(np.isfinite(outs)), f"{label}: non-finite"
        t0 = time.time()
        for i in range(reps):
            np.asarray(scan_fn(jnp.asarray(vecs + (i + 1) * 1e-6)))
        per = (time.time() - t0) / (n_scan * reps) * 1000
        print(f"{label:12s} {per:8.3f} ms/eval (compile {compile_s:.0f}s)",
              flush=True)
        return per

    res = {}
    res["full"] = run("full")
    state["osc"] = {}
    res["no-osc"] = run("no-osc")
    state["gather"] = {}
    res["no-gather"] = run("no-gather")
    state["flux"] = {}
    res["no-flux"] = run("no-flux")

    print("\nvalue decomposition (ms/eval, in-device):")
    print(f"  osc compute (kernel+pack)     {res['full']-res['no-osc']:8.3f}")
    print(f"  grid->events gather           {res['no-osc']-res['no-gather']:8.3f}")
    print(f"  flux grid compute             {res['no-gather']-res['no-flux']:8.3f}")
    print(f"  hist+hypersurf+residual       {res['no-flux']:8.3f}")
    print(f"  TOTAL value                   {res['full']:8.3f}")


if __name__ == "__main__":
    main()
