"""
Benchmark: compiled-template throughput on the oscillation-analysis pipeline.

Mirrors the reference's benchmark procedure
(``pisa/scripts/benchmark_pipeline_performance.py:35-46,196-223``): evaluate
N randomized-parameter templates, excluding the first (compile) call, and
report the mean rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference cannot run in this environment (numba is not installed), so
the baseline is the reference's own CPU procedure measured as our eager CPU
fp64 evaluation of the identical pipeline, captured once and fixed below
(CPU_BASELINE_TEMPLATES_PER_SEC). vs_baseline = TPU rate / CPU baseline rate.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# Eager CPU fp64 evaluation rate for the same full osc_example pipeline
# (200x200 grid, 12 flavors -> 2 propagations), measured on this machine:
# ~2.2 s/template steady-state => 0.45 templates/s. This stands in for the
# (unrunnable-here) numba reference, which computes the same per-point
# layer-chain propagation on CPU.
CPU_BASELINE_TEMPLATES_PER_SEC = 0.45

N_TEMPLATES = 50


def main():
    import jax

    from pisa_tpu.core.pipeline import Pipeline

    import jax.numpy as jnp

    t_setup = time.time()
    pipeline = Pipeline("settings/pipeline/osc_example.cfg")
    ct = pipeline.compile()
    v0 = ct.current_rescaled_values()
    n_free = len(v0)

    # scalar-reduced template: forces completion per evaluation (the axon
    # backend's block_until_ready does not actually synchronize; only host
    # transfers do), and matches the fit-loop access pattern
    fn = ct._build_fn()
    tot_fn = jax.jit(
        lambda v: sum(jnp.sum(h) for h in fn(v)["hist"].values())
    )

    # first call: compile (excluded from timing)
    float(tot_fn(v0))
    t_compiled = time.time()

    rng = np.random.RandomState(0)
    vecs = rng.uniform(0.05, 0.95, size=(N_TEMPLATES, n_free))

    t0 = time.time()
    for v in vecs:
        float(tot_fn(v))  # materialize the scalar -> full synchronization
    t1 = time.time()

    per_template = (t1 - t0) / N_TEMPLATES
    rate = 1.0 / per_template
    grid_points = pipeline.output_binning.size
    result = {
        "metric": "osc_example_templates_per_sec",
        "value": round(rate, 3),
        "unit": "templates/s",
        "vs_baseline": round(rate / CPU_BASELINE_TEMPLATES_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(
        f"# setup+compile {t_compiled - t_setup:.1f}s;"
        f" {per_template * 1000:.1f} ms/template;"
        f" {grid_points * rate:,.0f} gridpoints/s x 2 propagations;"
        f" platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
