"""
Benchmark pipeline template throughput (cf. reference
``pisa/scripts/benchmark_pipeline_performance.py``): N randomized-parameter
templates, first (compile) call excluded; prints avg/min/max wall time.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", nargs="+", help="pipeline config(s)")
    parser.add_argument("-n", "--num-templates", type=int, default=50)
    parser.add_argument(
        "--eager", action="store_true",
        help="per-stage eager evaluation instead of the compiled template",
    )
    parser.add_argument(
        "--in-device", action="store_true",
        help="evaluate all templates back-to-back inside ONE device"
        " program (CompiledTemplate.scan_totals) — removes the per-call"
        " host round-trip; reports the average over the whole scan",
    )
    args = parser.parse_args(argv)

    import numpy as np

    from pisa_tpu.core.pipeline import Pipeline

    for cfg in args.config:
        pipeline = Pipeline(cfg)
        rng = np.random.RandomState(0)
        times = []
        if args.eager:
            free = pipeline.params.free
            pipeline.get_outputs()  # exclude first call
            for _ in range(args.num_templates):
                for prm in free:
                    lo, hi = prm.range
                    prm.value = lo + (hi - lo) * float(rng.uniform(0.05, 0.95))
                t0 = time.time()
                pipeline.get_outputs()
                times.append(time.time() - t0)
        elif args.in_device:
            ct = pipeline.compile()
            n_free = len(ct.current_rescaled_values())
            vecs = rng.uniform(
                0.05, 0.95, size=(args.num_templates, n_free)
            ).astype(np.float32)
            np.asarray(ct.scan_totals(vecs))  # compile, excluded
            t0 = time.time()
            np.asarray(ct.scan_totals(vecs + np.float32(1e-6)))
            per = (time.time() - t0) / args.num_templates
            times = [per] * args.num_templates
        else:
            import jax
            import jax.numpy as jnp

            ct = pipeline.compile()
            fn = ct._build_fn()
            tot = jax.jit(
                lambda v, data: sum(
                    jnp.sum(h) for h in fn(v, data=data)["hist"].values()
                )
            )
            n_free = len(ct.current_rescaled_values())
            # compile, excluded
            float(tot(ct.current_rescaled_values(), ct._data_vals))
            for _ in range(args.num_templates):
                v = rng.uniform(0.05, 0.95, n_free)
                t0 = time.time()
                float(tot(v, ct._data_vals))
                times.append(time.time() - t0)
        times = np.asarray(times)
        print(
            f"{cfg}: avg {times.mean()*1000:.2f} ms | min"
            f" {times.min()*1000:.2f} ms | max {times.max()*1000:.2f} ms |"
            f" {1.0/times.mean():.2f} templates/s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
