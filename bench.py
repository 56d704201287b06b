"""
Benchmark: compiled-template throughput on the flagship IceCube 3-year
oscillation pipeline (+ the oscillogram pipeline as a secondary workload).

Mirrors the reference's benchmark procedure
(``pisa/scripts/benchmark_pipeline_performance.py:35-46,196-223``): evaluate
N randomized-parameter templates, excluding the first (compile) call, and
report the mean rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric (IceCube-3y templates/s); secondary metrics go to stderr.

Baselines (see BASELINE_MEASURED.md for procedure): the reference cannot run
here (numba is not installed), so the baseline is this framework's own eager
CPU fp64 evaluation of the identical pipeline — architecturally the closest
runnable analog of the reference's per-stage numba CPU evaluation — measured
on this machine (1 vCPU) and pinned below.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Eager CPU fp64 per-stage evaluation rates measured on this machine
# (1 vCPU), 10 randomized templates excluding the first; see
# BASELINE_MEASURED.md for the exact procedure and raw output.
CPU_BASELINE = {
    "icecube_3y": 0.046,  # templates/s (21.71 s/template)
    "osc_example": 0.45,  # templates/s
}

N_TEMPLATES = 50


def _bench_pipeline(cfg, n_templates=N_TEMPLATES):
    import jax
    import jax.numpy as jnp

    from pisa_tpu.core.pipeline import Pipeline

    t_setup = time.time()
    pipeline = Pipeline(cfg)
    ct = pipeline.compile()
    v0 = ct.current_rescaled_values()
    n_free = len(v0)

    # scalar-reduced template: forces completion per evaluation (the axon
    # backend's block_until_ready does not actually synchronize; only host
    # transfers do), and matches the fit-loop access pattern
    fn = ct._build_fn()
    tot_fn = jax.jit(
        lambda v, data: sum(
            jnp.sum(h) for h in fn(v, data=data)["hist"].values()
        )
    )
    data = ct._data_vals

    float(tot_fn(v0, data))  # compile (excluded)
    t_compiled = time.time()

    rng = np.random.RandomState(0)
    vecs = rng.uniform(0.05, 0.95, size=(n_templates, n_free))

    # adaptive sizing: per-call latency through the remote-TPU tunnel can
    # degrade by >10x during tunnel storms; probe one call and shrink the
    # sample so the headline still prints within the driver budget
    t_probe = time.time()
    float(tot_fn(vecs[0], data))
    probe = time.time() - t_probe
    if probe > 0.3 and n_templates > 10:
        vecs = vecs[:10]

    t0 = time.time()
    for v in vecs:
        float(tot_fn(v, data))  # materialize the scalar -> synchronization
    t1 = time.time()
    n_templates = len(vecs)
    per_template = (t1 - t0) / n_templates
    return {
        "rate": 1.0 / per_template,
        "ms_per_template": per_template * 1000,
        "setup_compile_s": t_compiled - t_setup,
        "n_free": n_free,
    }


def main():
    import jax

    # headline: flagship IceCube 3-year pipeline (csv events -> honda flux ->
    # barr -> prob3 -> aeff -> hist -> hypersurfaces)
    r3y = _bench_pipeline("settings/pipeline/IceCube_3y_neutrinos.cfg")
    result = {
        "metric": "icecube_3y_templates_per_sec",
        "value": round(r3y["rate"], 3),
        "unit": "templates/s",
        "vs_baseline": round(r3y["rate"] / CPU_BASELINE["icecube_3y"], 2),
    }
    print(json.dumps(result))
    print(
        f"# icecube_3y: setup+compile {r3y['setup_compile_s']:.1f}s;"
        f" {r3y['ms_per_template']:.1f} ms/template; {r3y['n_free']} free"
        f" params; platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )

    # batched evaluation (the scan/MCMC access pattern): vmap over many
    # parameter vectors per device call amortizes the per-call dispatch
    # latency (~35 ms through the axon tunnel on this setup)
    try:
        import jax as _jax
        import jax.numpy as _jnp

        from pisa_tpu.core.pipeline import Pipeline as _Pipeline

        p = _Pipeline("settings/pipeline/IceCube_3y_neutrinos.cfg")
        ct = p.compile()
        fn = ct._build_fn()
        lo, hi = map(_jnp.asarray, ct._current_bounds())
        tot = lambda v, data: sum(  # noqa: E731
            _jnp.sum(h) for h in fn(v, lo, hi, data)["hist"].values()
        )
        btot = _jax.jit(_jax.vmap(tot, in_axes=(0, None)))
        v0 = _jnp.asarray(ct.current_rescaled_values())
        batch = 32
        vb = _jnp.tile(v0, (batch, 1)) + _jnp.arange(batch)[:, None] * 1e-5
        np.asarray(btot(vb, ct._data_vals))  # compile (excluded)
        t0 = time.time()
        reps = 5
        for i in range(reps):
            np.asarray(btot(vb + i * 1e-5, ct._data_vals))
        rate_b = batch * reps / (time.time() - t0)

        # in-device rate: scan of batched evaluations inside ONE device
        # program — no per-call host round-trip through the tunnel; this is
        # the chip's true template throughput
        steps = 10

        @_jax.jit
        def _scan(vb, data):
            def step(c, _):
                r = _jax.vmap(tot, in_axes=(0, None))(vb + c * 1e-6, data)
                return c + _jnp.sum(r) * 1e-30, None
            c, _ = _jax.lax.scan(
                step, _jnp.float32(0.0), None, length=steps
            )
            return c

        float(_scan(vb, ct._data_vals))  # compile (excluded)
        t0 = time.time()
        float(_scan(vb, ct._data_vals))
        rate_d = batch * steps / (time.time() - t0)
        print(
            json.dumps(
                {
                    "metric": "icecube_3y_indevice_templates_per_sec",
                    "value": round(rate_d, 3),
                    "unit": "templates/s",
                    "vs_baseline": round(
                        rate_d / CPU_BASELINE["icecube_3y"], 2
                    ),
                }
            ),
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "icecube_3y_batched_templates_per_sec",
                    "value": round(rate_b, 3),
                    "unit": "templates/s",
                    "vs_baseline": round(
                        rate_b / CPU_BASELINE["icecube_3y"], 2
                    ),
                }
            ),
            file=sys.stderr,
        )
    except Exception as exc:
        print(f"# batched bench failed: {exc}", file=sys.stderr)

    try:
        rosc = _bench_pipeline("settings/pipeline/osc_example.cfg")
        print(
            json.dumps(
                {
                    "metric": "osc_example_templates_per_sec",
                    "value": round(rosc["rate"], 3),
                    "unit": "templates/s",
                    "vs_baseline": round(
                        rosc["rate"] / CPU_BASELINE["osc_example"], 2
                    ),
                }
            ),
            file=sys.stderr,
        )
        print(
            f"# osc_example: setup+compile {rosc['setup_compile_s']:.1f}s;"
            f" {rosc['ms_per_template']:.1f} ms/template",
            file=sys.stderr,
        )
    except Exception as exc:  # secondary workload must not kill the bench
        print(f"# osc_example bench failed: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
