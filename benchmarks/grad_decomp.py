"""Decompose the flagship value_and_grad cost by stop_gradient bisection,
measured IN-DEVICE (a lax.scan over parameter vectors inside one program, so
the remote-tunnel dispatch latency — ~30 ms/call — does not pollute the
numbers). Monkeypatches stage outputs to constants (stop_gradient) and
reports the per-evaluation wall for each configuration.

Configurations:
  value       plain template evaluation (no gradient)
  full        nothing stopped (the shipping gradient)
  no-osc      oscillation probabilities stopped (removes the tangent-kernel
              launches AND the reverse through the osc pack/unsort)
  no-osc-flux modified flux also stopped (leaves the aeff/hist/hypersurface/
              objective reverse + residual tax)

Run on the TPU for numbers of record: python benchmarks/grad_decomp.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pisa_tpu.core.pipeline import Pipeline
    from pisa_tpu.ops.osc import pallas_chain
    from pisa_tpu.stages.flux.barr_simple import barr_simple
    from pisa_tpu.utils import stats

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = 3

    stop_osc = {"on": False}
    stop_flux = {"on": False}

    orig_prepared = pallas_chain.osc_probs_layers_pallas_fwdgrad_prepared

    def patched_prepared(*a, **k):
        out = orig_prepared(*a, **k)
        return jax.lax.stop_gradient(out) if stop_osc["on"] else out

    pallas_chain.osc_probs_layers_pallas_fwdgrad_prepared = patched_prepared

    orig_planar = pallas_chain.osc_probs_layers_pallas_fwdgrad_prepared_planar

    def patched_planar(*a, **k):
        out = orig_planar(*a, **k)
        return jax.lax.stop_gradient(out) if stop_osc["on"] else out

    pallas_chain.osc_probs_layers_pallas_fwdgrad_prepared_planar = (
        patched_planar
    )

    orig_barr = barr_simple._compute_stacked

    def patched_barr(self, container, params):
        orig_barr(self, container, params)
        if stop_flux["on"]:
            from pisa_tpu.core.container import _rep_hash

            h = _rep_hash(container.representation)
            container._data["nu_flux"][h] = jax.lax.stop_gradient(
                container._data["nu_flux"][h]
            )

    barr_simple._compute_stacked = patched_barr

    t0 = time.time()
    pipeline = Pipeline("settings/pipeline/IceCube_3y_neutrinos.cfg")
    ct = pipeline.compile()
    print(
        f"backend={jax.default_backend()}"
        f" stacked={ct._trace_data is not ct.pipeline.data}"
        f" setup={time.time()-t0:.0f}s",
        flush=True,
    )
    v0 = ct.current_rescaled_values()
    data_ms = ct.get_outputs(v0)
    data = {m.name: jnp.asarray(m.hist.ravel()) for m in data_ms}

    rng = np.random.RandomState(0)
    vecs = rng.uniform(0.2, 0.8, size=(n_scan, len(v0))).astype(np.float32)

    los, his = ct._current_bounds()
    los, his = jnp.asarray(los), jnp.asarray(his)
    cdata = ct._data_vals

    def run(label, with_grad):
        # fresh trace so the current stop_gradient switches take effect
        value_only, _ = ct.build_objective(data_ms, "mod_chi2")
        obj = value_only.raw

        if with_grad:
            def step(carry, v):
                val, g = jax.value_and_grad(obj)(v, los, his, cdata)
                return carry, val + jnp.sum(g)
        else:
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
        print(
            f"{label:14s} {per:8.3f} ms/eval (compile {compile_s:.0f}s)",
            flush=True,
        )
        return per

    res = {}
    res["value"] = run("value", with_grad=False)
    res["full"] = run("full vg", with_grad=True)
    stop_osc["on"] = True
    res["no-osc"] = run("vg no-osc", with_grad=True)
    stop_flux["on"] = True
    res["no-osc-flux"] = run("vg no-osc-flux", with_grad=True)

    print("\ndecomposition (ms/eval, in-device):")
    print(f"  forward template              {res['value']:8.3f}")
    print(f"  osc tangents + osc reverse    {res['full']-res['no-osc']:8.3f}")
    print(f"  flux reverse                  {res['no-osc']-res['no-osc-flux']:8.3f}")
    print(f"  downstream reverse + residual {res['no-osc-flux']-res['value']:8.3f}")
    print(f"  TOTAL vg                      {res['full']:8.3f}")


if __name__ == "__main__":
    main()
