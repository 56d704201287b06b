"""
Benchmark: compiled-template throughput on the flagship IceCube 3-year
oscillation pipeline (+ the oscillogram pipeline as a secondary workload).

Mirrors the reference's benchmark procedure
(``pisa/scripts/benchmark_pipeline_performance.py:35-46,196-223``): evaluate
N randomized-parameter templates, excluding the first (compile) call, and
report the mean rate.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}
for the headline metric (IceCube-3y templates/s); secondary metrics go to
stderr.

Structure: the top-level process is a thin orchestrator that runs the actual
measurements in child processes under a hard deadline. Device calls through
the remote-TPU tunnel can hang indefinitely during tunnel outages (observed:
a previous driver run printed nothing for >9 minutes and was killed at
rc=124), and a hung XLA call cannot be interrupted by signals from within
the same process. If the accelerator leg times out or crashes, the
orchestrator falls back to an identical measurement made on CPU so a real
number is always recorded within the budget.

ALL workers spawn at t=0 (round-4 lesson: a 440 s one-time tunnel warm-up
consumed the whole budget when the secondary/tertiary workers were spawned
only AFTER the headline finished, leaving a single metric on record).
Their per-process tunnel warm-ups overlap; a cross-process flock
(``_device_lock``) serializes only the TIMED device sections so concurrent
workers cannot distort each other's measurements, and a marker file gives
the flagship headline measurement priority over the secondary workloads.
Every metric JSON line is streamed to stdout the moment it is measured;
the orchestrator re-emits the flagship templates/s line LAST because the
driver records the final stdout JSON line as the round's parsed metric.

Tunnel characterization (measured 2026-08-17, degraded-tunnel day): the
FIRST host<->device synchronization of a process blocks 93-460 s (one-time,
per-process, machine-wide-uncached); after it, bandwidth (256 MB in 3.6 s),
compiles (<1 s small / ~30 s pipeline) and per-call dispatch (~25 ms) are
normal. Two mitigations below: (1) each accelerator worker starts a
background warm-up thread at import so the block overlaps pipeline setup
(verified: main-thread first sync drops to ~10 s once the warm thread has
synced); (2) the accelerator headline is measured as ONE in-device
``lax.scan`` over the randomized parameter vectors — the reference's
"N randomized templates, first (JIT) call excluded" procedure
(``benchmark_pipeline_performance.py:196-223``) executed as a single device
program, which is also exactly how this framework's fit loops evaluate
templates (``analysis/device_fit.py``: L-BFGS inside ``lax.while_loop``).
That needs ~2 round-trips total instead of ~13, so a degraded tunnel
changes the headline by the dispatch share only. The host-dispatch-loop
rate (one round-trip per template, the closest literal analog of the
reference's wall-clock loop) is still measured and reported on stderr.

Baselines (see BASELINE_MEASURED.md for procedure): the reference cannot run
here (numba is not installed), so the baseline is calibrated with a
numba-free vectorized-numpy transcription of the reference's own
per-template algorithm (benchmarks/reference_proxy.py; oscillation math
pinned against this framework's kernels at 1e-9), measured on this machine
and scaled to the reference CI benchmark box's 4 vCPUs.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

# A site hook re-appends the experimental 'axon' TPU plugin to jax_platforms
# regardless of the JAX_PLATFORMS env var; when a platform was explicitly
# requested (the orchestrator's CPU-fallback leg sets JAX_PLATFORMS=cpu),
# honor it via the config API before any backend initializes (same
# workaround as tests/conftest.py and __graft_entry__.py). For accelerator
# platforms, keep 'cpu' available as a SECONDARY backend (the default
# backend is the first listed): the small-workload host routing
# (device_fit.minimize_on_device(platform='cpu'), bench toy-fit leg) needs
# jax.devices('cpu') to exist even when the ambient env pins the platform
# list to the accelerator alone.
_requested_platform = os.environ.get("JAX_PLATFORMS")
if _requested_platform:
    import jax as _jax

    _effective = _requested_platform
    if "cpu" not in [p.strip() for p in _effective.split(",")]:
        _effective = f"{_effective},cpu"
    _jax.config.update("jax_platforms", _effective)

# Reference-PISA CPU rates, calibrated with the numba-free transcription of
# the reference per-template algorithm (benchmarks/reference_proxy.py,
# oscillation math pinned vs our kernels at 1e-9) measured on this machine
# and scaled linearly to the reference CI benchmark box's 4 vCPUs (an upper
# bound on numba-parallel scaling); see BASELINE_MEASURED.md for the raw
# numbers and the calibration argument.
CPU_BASELINE = {
    "icecube_3y": 0.655,  # templates/s (proxy: 6.10 s/template on 1 vCPU)
    "osc_example": 0.64,  # templates/s (osc-only proxy x 4)
    # KDE pipeline (proxy --workload kde: osc on the 200x200 calc grid +
    # 12 containers x 2 PID channels of adaptive gaussian-product KDE,
    # 0.1675 t/s on 1 vCPU, x4)
    "kde_example": 0.67,  # templates/s
    # hypersurface ensemble fit (proxy --workload hypersurface: per-bin
    # scipy curve_fit over 13 datasets x 1152 non-empty bins, fit-only
    # wall 0.415 s, measured serial). NO x4 multi-core grant here: the
    # reference implementation loops bins serially in Python
    # (reference hypersurface.py:699 `for bin_idx in np.ndindex(...)`)
    # with no bin-level parallelism, unlike its numba pipeline kernels
    "hypersurface_fit_wall_s": 0.415,  # s
}

N_TEMPLATES = 50
# in-device scan: more templates to amortize the single dispatch (~25 ms)
N_TEMPLATES_INDEVICE = 100
INDEVICE_REPS = 3


def _start_tunnel_warmup():
    """Kick the one-time first-sync tunnel block (93-460 s observed) on a
    background thread so it overlaps pipeline setup + compile."""
    import threading

    def _warm():
        try:
            import jax
            import jax.numpy as jnp

            t0 = time.time()
            float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
            _log(f"tunnel warm-up finished ({time.time() - t0:.1f}s)")
        except Exception as exc:
            _log(f"tunnel warm-up failed: {exc!r:.120}")

    threading.Thread(target=_warm, daemon=True).start()

# Overall wall-clock budget for the whole bench (orchestrator enforces it on
# children); the driver's own timeout is believed to be ~9.5 min (570 s), so
# leave margin for interpreter startup. The CPU insurance leg runs
# CONCURRENTLY with the accelerator leg (it finishes in ~60 s; observed
# axon-tunnel first-call times vary 109-330 s), so a late TPU result no
# longer eats the fallback's budget.
DEADLINE_S = float(os.environ.get("PISA_TPU_BENCH_DEADLINE", 535))
_T_START = time.time()


def _remaining():
    return DEADLINE_S - (time.time() - _T_START)


def _log(msg):
    print(f"# bench[{time.time() - _T_START:6.1f}s] {msg}", file=sys.stderr)
    sys.stderr.flush()


def _retry_transient(f, tries=3, label=""):
    """Retry a device computation on transient backend errors (the axon
    tunnel intermittently raises FAILED_PRECONDITION on an otherwise
    healthy program; observed 2026-08-17)."""
    for attempt in range(tries):
        try:
            return f()
        except Exception as exc:  # jax.errors.JaxRuntimeError et al.
            if attempt == tries - 1:
                raise
            _log(f"transient error in {label} (retrying): {exc!r:.120}")
            time.sleep(2.0)


# Cross-process coordination between the concurrently-spawned workers: a
# flock serializes the TIMED device sections (the single chip serializes
# execution anyway; the lock keeps another worker's program from landing
# inside a measured interval), and a marker file lets the headline
# measurement go first. Host-side setup and the one-time tunnel warm-up
# (the expensive parts) overlap freely outside the lock.
_SYNC_DIR = os.environ.get("PISA_TPU_BENCH_SYNCDIR", "/tmp")
_LOCK_PATH = os.path.join(_SYNC_DIR, "pisa_tpu_bench.lock")


@contextlib.contextmanager
def _device_lock(label=""):
    import jax

    if jax.default_backend() == "cpu":
        # the CPU insurance leg shares no device with the TPU workers
        yield
        return
    with open(_LOCK_PATH, "w") as fh:
        t0 = time.time()
        fcntl.flock(fh, fcntl.LOCK_EX)
        waited = time.time() - t0
        if waited > 1.0:
            _log(f"device lock for {label or 'measurement'}:"
                 f" waited {waited:.1f}s")
        try:
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def _touch_marker(name):
    with open(os.path.join(_SYNC_DIR, name), "w"):
        pass


def _wait_marker(name, until_remaining):
    """Block until `name` exists, or until the budget drops below
    `until_remaining` (so a crashed headline worker cannot starve the
    others for the whole round)."""
    path = os.path.join(_SYNC_DIR, name)
    while not os.path.exists(path) and _remaining() > until_remaining:
        time.sleep(2.0)
    return os.path.exists(path)


def _emit(rec):
    """Stream one metric JSON line to stdout the moment it is measured."""
    print(json.dumps(rec))
    sys.stdout.flush()


def _bench_pipeline(cfg, n_templates=N_TEMPLATES):
    import jax
    import jax.numpy as jnp

    from pisa_tpu.core.pipeline import Pipeline

    t_setup = time.time()
    pipeline = Pipeline(cfg)
    ct = pipeline.compile()
    v0 = ct.current_rescaled_values()
    n_free = len(v0)
    _log(f"{cfg}: setup done, {n_free} free params")

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

    with _device_lock(label=f"dispatch-loop {cfg}"):
        _retry_transient(lambda: float(tot_fn(v0, data)), label="compile")
        t_compiled = time.time()
        _log(f"{cfg}: first call done ({t_compiled - t_setup:.1f}s)")

        rng = np.random.RandomState(0)
        vecs = rng.uniform(0.05, 0.95, size=(n_templates, n_free))

        # adaptive sizing: per-call latency through the remote-TPU tunnel
        # can degrade by >10x during tunnel storms; probe one call and
        # shrink the sample so the headline still prints within the budget
        t_probe = time.time()
        _retry_transient(lambda: float(tot_fn(vecs[0], data)), label="probe")
        probe = time.time() - t_probe
        if probe > 0.3 and n_templates > 10:
            vecs = vecs[:10]

        t0 = time.time()
        for v in vecs:
            float(tot_fn(v, data))  # materialize the scalar -> sync
        t1 = time.time()
    n_templates = len(vecs)
    per_template = (t1 - t0) / n_templates
    return {
        "rate": 1.0 / per_template,
        "ms_per_template": per_template * 1000,
        "setup_compile_s": t_compiled - t_setup,
        "n_free": n_free,
        "_ct": ct,
    }


def _bench_pipeline_indevice(
    cfg, n_templates=N_TEMPLATES_INDEVICE, reps=INDEVICE_REPS
):
    """Sequential randomized templates inside ONE device program.

    `lax.scan` over the parameter vectors = the reference's benchmark loop
    (templates evaluated one after another at randomized params) executed
    on-device, the access pattern of this framework's on-device fits. The
    first call (compile + container upload) is excluded, as the reference
    excludes its numba-JIT first call.
    """
    import jax
    import jax.numpy as jnp

    from pisa_tpu.core.pipeline import Pipeline

    t_setup = time.time()
    pipeline = Pipeline(cfg)
    ct = pipeline.compile()
    v0 = ct.current_rescaled_values()
    n_free = len(v0)
    _log(f"{cfg}: setup done, {n_free} free params")

    rng = np.random.RandomState(0)
    vecs = rng.uniform(0.05, 0.95, size=(n_templates, n_free)).astype(
        np.float32
    )

    with _device_lock(label=f"in-device scan {cfg}"):
        tots = _retry_transient(
            lambda: np.asarray(ct.scan_totals(vecs)), label="compile"
        )
        assert np.all(np.isfinite(tots)), "non-finite template totals"
        t_compiled = time.time()
        _log(f"{cfg}: first in-device call done"
             f" ({t_compiled - t_setup:.1f}s)")

        t0 = time.time()
        for i in range(reps):
            np.asarray(ct.scan_totals(vecs + np.float32((i + 1) * 1e-6)))
        per_template = (time.time() - t0) / (n_templates * reps)
    return {
        "rate": 1.0 / per_template,
        "ms_per_template": per_template * 1000,
        "setup_compile_s": t_compiled - t_setup,
        "n_free": n_free,
        "_ct": ct,
    }


def _bench_pipeline_eager(cfg, n_templates=5):
    """Eager per-template evaluation (`Pipeline.get_outputs()` per call) for
    pipelines that are not fully jit-traceable (the KDE stage's ISJ
    bandwidth selection runs host-side, as the reference's does)."""
    import numpy as np

    from pisa_tpu.core.pipeline import Pipeline

    t_setup = time.time()
    pipeline = Pipeline(cfg)
    free = pipeline.params.free
    with _device_lock(label=f"eager {cfg}"):
        pipeline.get_outputs()  # excluded first call (compile+setup)
        t_compiled = time.time()

        rng = np.random.RandomState(0)
        t0 = time.time()
        for _ in range(n_templates):
            for p in free:
                p._rescaled_value = float(rng.uniform(0.35, 0.65))
            pipeline.get_outputs()
        per_template = (time.time() - t0) / n_templates
    return {
        "rate": 1.0 / per_template,
        "ms_per_template": per_template * 1000,
        "setup_compile_s": t_compiled - t_setup,
        "n_free": len(free),
    }


def _worker_headline():
    """Measure the flagship pipeline; print the ONE stdout JSON line."""
    import jax

    platform = jax.default_backend()
    if platform == "cpu":
        # insurance leg: host dispatch is free on CPU; the plain wall-clock
        # loop with adaptive sizing fits the budget
        r3y = _bench_pipeline("settings/pipeline/IceCube_3y_neutrinos.cfg")
    else:
        r3y = _bench_pipeline_indevice(
            "settings/pipeline/IceCube_3y_neutrinos.cfg"
        )
    _emit(
        {
            "metric": "icecube_3y_templates_per_sec",
            "value": round(r3y["rate"], 3),
            "unit": "templates/s",
            "vs_baseline": round(r3y["rate"] / CPU_BASELINE["icecube_3y"], 2),
        }
    )
    # unblock the secondary/tertiary workers: the headline number is on
    # record, everything after this competes for the device lock fairly
    _touch_marker("headline_done")
    print(
        f"# icecube_3y: setup+compile {r3y['setup_compile_s']:.1f}s;"
        f" {r3y['ms_per_template']:.3f} ms/template; {r3y['n_free']} free"
        f" params; platform={platform}",
        file=sys.stderr,
    )

    # flagship Asimov theta23 fit (BASELINE workload 5 at production
    # scale): full bounded L-BFGS truth recovery on the compiled 3y
    # pipeline in ONE device program. The reference-side wall-clock is
    # measured, not assumed: scipy L-BFGS-B with finite-difference
    # gradients (the reference's only option, analysis.py:1561) is run
    # on the SAME landscape (each eval one compiled template) to count
    # its evaluations; reference wall = n_evals / CPU_BASELINE templates/s.
    # NO budget gate (round-4 lesson: the gate silenced this leg entirely);
    # if the budget truly runs out the orchestrator kills the worker, and
    # the headline line above has already streamed.
    try:
        import scipy.optimize as spo

        from pisa_tpu.analysis import device_fit

        ct = r3y["_ct"]
        v0 = np.asarray(ct.current_rescaled_values(), dtype=np.float64)
        data_ms = ct.get_outputs(v0)
        value_fn, _vg = ct.build_objective(data_ms, "mod_chi2")
        names = [p.name for p in ct._free_params]
        x0 = v0.copy()
        x0[names.index("theta23")] = min(
            0.95, x0[names.index("theta23")] + 0.10
        )
        los, his = ct._current_bounds()
        # CompiledTemplate's objective takes the flat per-container
        # data-argument list (CompiledDistribution's takes a list per
        # pipeline via _all_data_vals)
        datas = ct._data_vals

        def _one_fit():
            return device_fit.minimize_on_device(
                value_fn.raw, x0, los, his, datas
            )

        with _device_lock(label="asimov flagship fit"):
            res = _retry_transient(_one_fit, label="asimov-compile")
            t0 = time.time()
            res = _retry_transient(_one_fit, label="asimov-fit")
            dt = time.time() - t0
            print(
                f"# asimov flagship device fit: {dt:.2f}s,"
                f" {res['nit']} L-BFGS iterations, fun {res['fun']:.3e}",
                file=sys.stderr,
            )

            # reference-procedure evaluation count on the same landscape
            nev = [0]

            def fd_objective(x):
                nev[0] += 1
                return float(value_fn(x))

            fd = spo.minimize(
                fd_objective, x0, method="L-BFGS-B",
                bounds=[(0.0, 1.0)] * len(x0),
                options={"ftol": 1e-9, "eps": 1e-4, "maxiter": 100},
            )
        ref_wall = nev[0] / CPU_BASELINE["icecube_3y"]
        print(
            f"# reference-procedure FD L-BFGS-B: {nev[0]} template"
            f" evals ({fd.nit} iterations, success={fd.success});"
            f" implied reference wall {ref_wall:.0f}s",
            file=sys.stderr,
        )
        _emit(
            {
                "metric": "asimov_flagship_fit_wall_s",
                "value": round(dt, 2),
                "unit": "s",
                "vs_baseline": round(ref_wall / dt, 2),
                "fd_template_evals": nev[0],
                "device_lbfgs_iterations": int(res["nit"]),
            }
        )
    except Exception as exc:
        print(f"# asimov flagship fit failed: {exc}", file=sys.stderr)


def _worker_secondary():
    """Dispatch-loop/batched rates + the oscillogram pipeline."""
    import jax
    import jax.numpy as jnp

    from pisa_tpu.core.pipeline import Pipeline

    # let the headline measurement land first (the one-time tunnel warm-up
    # keeps running on this process's background thread while we wait);
    # proceed anyway once the budget gets tight so a crashed headline
    # worker cannot starve this one
    _wait_marker("headline_done", until_remaining=180.0)

    # the literal analog of the reference's wall-clock loop: one host
    # round-trip per template (dispatch-latency bound through the tunnel)
    try:
        rdisp = _bench_pipeline(
            "settings/pipeline/IceCube_3y_neutrinos.cfg", n_templates=10
        )
        _emit(
            {
                "metric": "icecube_3y_dispatch_loop_templates_per_sec",
                "value": round(rdisp["rate"], 3),
                "unit": "templates/s",
                "vs_baseline": round(
                    rdisp["rate"] / CPU_BASELINE["icecube_3y"], 2
                ),
            }
        )
    except Exception as exc:
        print(f"# dispatch-loop bench failed: {exc}", file=sys.stderr)

    # batched evaluation (the scan/MCMC access pattern): vmap over many
    # parameter vectors per device call amortizes the per-call dispatch
    # latency (~35 ms through the axon tunnel on this setup)
    try:
        p = Pipeline("settings/pipeline/IceCube_3y_neutrinos.cfg")
        ct = p.compile()
        fn = ct._build_fn()
        tot = lambda v, data: sum(  # noqa: E731
            jnp.sum(h) for h in fn(v, data=data)["hist"].values()
        )
        btot = jax.jit(jax.vmap(tot, in_axes=(0, None)))
        v0 = jnp.asarray(ct.current_rescaled_values())
        batch = 32
        vb = jnp.tile(v0, (batch, 1)) + jnp.arange(batch)[:, None] * 1e-5
        with _device_lock(label="batched + in-device scan"):
            _retry_transient(
                lambda: np.asarray(btot(vb, ct._data_vals)), label="batched"
            )
            _log("batched compile done")
            t0 = time.time()
            reps = 5
            for i in range(reps):
                np.asarray(btot(vb + i * 1e-5, ct._data_vals))
            rate_b = batch * reps / (time.time() - t0)

            # in-device rate: scan of batched evaluations inside ONE device
            # program — no per-call host round-trip through the tunnel;
            # this is the chip's true template throughput
            steps = 10

            @jax.jit
            def _scan(vb, data):
                def step(c, _):
                    r = jax.vmap(tot, in_axes=(0, None))(
                        vb + c * 1e-6, data
                    )
                    return c + jnp.sum(r) * 1e-30, None
                c, _ = jax.lax.scan(
                    step, jnp.float32(0.0), None, length=steps
                )
                return c

            _retry_transient(
                lambda: float(_scan(vb, ct._data_vals)), label="in-device"
            )
            t0 = time.time()
            float(_scan(vb, ct._data_vals))
            rate_d = batch * steps / (time.time() - t0)
        for metric, rate in (
            ("icecube_3y_indevice_templates_per_sec", rate_d),
            ("icecube_3y_batched_templates_per_sec", rate_b),
        ):
            _emit(
                {
                    "metric": metric,
                    "value": round(rate, 3),
                    "unit": "templates/s",
                    "vs_baseline": round(
                        rate / CPU_BASELINE["icecube_3y"], 2
                    ),
                }
            )
    except Exception as exc:
        print(f"# batched bench failed: {exc}", file=sys.stderr)

    for name, cfg, baseline, benchfn in (
        ("osc_example", "settings/pipeline/osc_example.cfg",
         CPU_BASELINE["osc_example"], _bench_pipeline_indevice),
    ):
        try:
            try:
                r = benchfn(cfg, n_templates=10)
            except Exception as exc:
                print(
                    f"# {name} in-device path failed ({exc}); falling back"
                    " to the dispatch loop", file=sys.stderr,
                )
                r = _bench_pipeline(cfg, n_templates=10)
            rec = {
                "metric": f"{name}_templates_per_sec",
                "value": round(r["rate"], 3),
                "unit": "templates/s",
            }
            if baseline:
                rec["vs_baseline"] = round(r["rate"] / baseline, 2)
            _emit(rec)
            print(
                f"# {name}: setup+compile {r['setup_compile_s']:.1f}s;"
                f" {r['ms_per_template']:.1f} ms/template",
                file=sys.stderr,
            )
        except Exception as exc:  # secondary must not kill the bench
            print(f"# {name} bench failed: {exc}", file=sys.stderr)


def _worker_tertiary():
    """The remaining BASELINE workloads (kde pipeline, hypersurface fit,
    Asimov device fit); runs CONCURRENTLY with the secondary worker so the
    per-process tunnel sync and host-side setup overlap."""
    # staggered below the secondary worker's 180 s threshold so the two do
    # not pile onto the device lock at the same instant if the headline
    # worker dies
    _wait_marker("headline_done", until_remaining=150.0)
    try:
        # the KDE stage is tracer-safe since round 2 (weight-zeroed PID
        # channels + static fold maps, utils/kde.py), so the KDE pipeline
        # uses the same in-device scan path as the flagship; eager is the
        # fallback if compilation ever regresses
        try:
            r = _bench_pipeline_indevice(
                "settings/pipeline/kde_example.cfg", n_templates=10
            )
            mode = "in-device"
        except Exception as exc:
            print(
                f"# kde_example compiled path failed ({exc});"
                " falling back to eager", file=sys.stderr,
            )
            r = _bench_pipeline_eager(
                "settings/pipeline/kde_example.cfg", n_templates=10
            )
            mode = "eager"
        _emit(
            {
                "metric": "kde_example_templates_per_sec",
                "value": round(r["rate"], 3),
                "unit": "templates/s",
                "vs_baseline": round(
                    r["rate"] / CPU_BASELINE["kde_example"], 2
                ),
            }
        )
        print(
            f"# kde_example ({mode}): setup {r['setup_compile_s']:.1f}s;"
            f" {r['ms_per_template']:.1f} ms/template",
            file=sys.stderr,
        )
    except Exception as exc:
        print(f"# kde_example bench failed: {exc}", file=sys.stderr)

    # hypersurface-fit wall-clock (BASELINE workload 4): vmapped
    # Gauss-Newton over a 13-dataset, 3-systematic ensemble on the
    # toy_flux pipeline (576 bins x 3 maps). Dataset generation is SETUP
    # (untimed, matching the reference's own exclude-the-JIT-first-call
    # benchmark convention); the fit itself is timed warm, and the
    # reference-side number is the same fit-only convention
    # (benchmarks/reference_proxy.py --workload hypersurface: per-bin
    # scipy curve_fit loop). KEEP the ensemble below in sync with
    # reference_proxy.HS_NOMINAL / HS_SYS_POINTS.
    if True:
        try:
            from pisa_tpu.core.pipeline import Pipeline
            from pisa_tpu.utils.hypersurface import (
                fit_hypersurfaces_from_maps,
            )

            hs_nominal = {
                "delta_index": 0.0, "theta23": 0.85, "aeff_scale": 1.0
            }
            hs_points = [
                {"delta_index": -0.10, "theta23": 0.85, "aeff_scale": 1.0},
                {"delta_index": +0.10, "theta23": 0.85, "aeff_scale": 1.0},
                {"delta_index": 0.0, "theta23": 0.70, "aeff_scale": 1.0},
                {"delta_index": 0.0, "theta23": 0.95, "aeff_scale": 1.0},
                {"delta_index": 0.0, "theta23": 0.85, "aeff_scale": 0.8},
                {"delta_index": 0.0, "theta23": 0.85, "aeff_scale": 1.2},
                {"delta_index": -0.05, "theta23": 0.75, "aeff_scale": 0.9},
                {"delta_index": +0.05, "theta23": 0.90, "aeff_scale": 1.1},
                {"delta_index": -0.08, "theta23": 0.95, "aeff_scale": 1.15},
                {"delta_index": +0.08, "theta23": 0.72, "aeff_scale": 0.85},
                {"delta_index": +0.03, "theta23": 0.80, "aeff_scale": 0.95},
                {"delta_index": -0.03, "theta23": 0.92, "aeff_scale": 1.05},
            ]

            pipeline = Pipeline("settings/pipeline/toy_flux_fit.cfg")

            def make_mapset(pv):
                for name, value in pv.items():
                    prm = pipeline.params[name]
                    prm.value = value * prm.value.units
                return pipeline.get_outputs()

            nominal_ms = make_mapset(hs_nominal)
            sys_ms = [make_mapset(pv) for pv in hs_points]
            binning = pipeline.output_binning
            fit_kwargs = dict(
                nominal_mapset=nominal_ms,
                nominal_param_values=hs_nominal,
                sys_mapsets=sys_ms,
                sys_param_values=hs_points,
                binning=binning,
                params={
                    "delta_index": "linear",
                    "theta23": "linear",
                    "aeff_scale": "linear",
                },
                norm=True,
                include_nominal=True,
            )
            with _device_lock(label="hypersurface fit"):
                fit_hypersurfaces_from_maps(**fit_kwargs)  # warm (compile)
                t0 = time.time()
                hs_fits = fit_hypersurfaces_from_maps(**fit_kwargs)
                dt = time.time() - t0
            n_bins = sum(
                int(np.sum(h.fit_valid)) for h in hs_fits.values()
            )
            _emit(
                {
                    "metric": "hypersurface_fit_wall_s",
                    "value": round(dt, 3),
                    "unit": "s",
                    "vs_baseline": round(
                        CPU_BASELINE["hypersurface_fit_wall_s"] / dt, 2
                    ),
                    "n_bin_fits": n_bins,
                    "n_datasets": 1 + len(hs_points),
                }
            )
        except Exception as exc:
            print(f"# hypersurface-fit bench failed: {exc}", file=sys.stderr)

    # toy Asimov fit wall-clock (BASELINE workload 5 at toy scale; the
    # flagship-scale version is asimov_flagship_fit_wall_s): full bounded
    # L-BFGS truth-recovery fit through the public Analysis "device"
    # method WITH small-workload routing (method_kwargs platform="cpu"):
    # at toy scale (576-cell grid, 3 params) a fit program is
    # per-dispatch-latency bound, so the library routes it to the host
    # backend — one local dispatch instead of ~30 ms tunnel round-trips
    # (cf. analysis/device_fit.py minimize_on_device(platform=...)).
    if True:
        try:
            import contextlib

            from pisa_tpu.analysis import device_fit
            from pisa_tpu.analysis.analysis import Analysis
            from pisa_tpu.core.distribution_maker import DistributionMaker

            import jax as _jax

            # small-workload routing, whole-pipeline edition: build the
            # toy hypo maker UNDER the host backend so its container data,
            # eager template evaluations and the fit program all live on
            # cpu — zero remote-tunnel round trips anywhere in the fit
            # (the flagship-scale work stays on the accelerator)
            host_ctx = (
                _jax.default_device(_jax.local_devices(backend="cpu")[0])
                if _jax.default_backend() != "cpu"
                else contextlib.nullcontext()
            )
            stack = contextlib.ExitStack()
            stack.enter_context(host_ctx)

            hm = DistributionMaker(
                ["settings/pipeline/toy_flux_fit.cfg"], label="toyflux"
            )
            truth = {
                "delta_index": 0.0, "theta23": 0.85, "aeff_scale": 1.2
            }
            for pname, val in truth.items():
                hm.params[pname].value = val
            data = hm.get_outputs(return_sum=True)
            hm.reset_free()

            import jax as _jax

            host_kwargs = (
                {"platform": "cpu"}
                if _jax.default_backend() != "cpu"
                else {}
            )

            def _one_fit():
                hm.params["delta_index"].value = -0.05
                hm.params["theta23"].value = 0.95
                hm.params["aeff_scale"].value = 0.8
                return Analysis().fit_recursively(
                    data, hm, "mod_chi2", None, "device", host_kwargs, None
                )

            with _device_lock(label="toy asimov fit"):
                _retry_transient(_one_fit, label="fit-compile")  # excluded
                t0 = time.time()
                res = _retry_transient(_one_fit, label="fit")
                dt = time.time() - t0

                # the bare warm fit PROGRAM (bounded L-BFGS while_loop on
                # the host backend) — the actual replacement for the
                # reference's inner minimizer loop; the full-wall number
                # above additionally pays the Analysis bookkeeping
                # (initial/best-fit template regeneration), which crosses
                # the remote-TPU tunnel when the ambient backend is axon
                from pisa_tpu.analysis.gradient import CompiledDistribution

                cd = CompiledDistribution(hm)
                value_fn, _ = cd.build_objective(data, "mod_chi2")
                x0 = np.asarray(
                    [p._rescaled_value for p in hm.params.free],
                    dtype=np.float64,
                )
                los, his = cd._current_bounds()
                datas = cd._all_data_vals()
                kw = dict(host_kwargs)
                device_fit.minimize_on_device(
                    value_fn.raw, x0, los, his, datas, **kw
                )  # warm/compile (excluded)
                t0 = time.time()
                reps = 5
                for _ in range(reps):
                    device_fit.minimize_on_device(
                        value_fn.raw, x0, los, his, datas, **kw
                    )
                dt_prog = (time.time() - t0) / reps
            _emit(
                {
                    "metric": "asimov_toy_fit_wall_s",
                    "value": round(dt, 4),
                    "unit": "s",
                    "vs_baseline": round(0.0028 / dt, 4),
                    "fit_program_wall_s": round(dt_prog, 5),
                    "note": "host-routed (small-workload routing:"
                            " whole pipeline on the host backend);"
                            " fit_program_wall_s is the warm bounded"
                            " L-BFGS program alone",
                }
            )
            stack.close()
            print(
                f"# asimov fit: metric_val {res.metric_val:.2e},"
                f" {res.minimizer_metadata.get('nit')} iterations",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"# asimov-fit bench failed: {exc}", file=sys.stderr)


def _spawn_child(mode, extra_env=None):
    """Start `python bench.py --worker <mode>` without waiting.

    stderr passes through to our stderr so the driver's tail always shows
    progress even on a timeout/kill; stdout goes to a pipe that a streaming
    reader thread drains line-by-line.
    """
    env = dict(os.environ)
    env["PYTHONUNBUFFERED"] = "1"
    if extra_env:
        env.update(extra_env)
    _log(f"spawn --worker {mode}"
         f" (platform={env.get('JAX_PLATFORMS', 'default')})")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", mode],
        stdout=subprocess.PIPE,
        stderr=None,  # inherit
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )


def _start_reader(proc, store, echo):
    """Thread that streams a child's stdout lines as they arrive.

    Round-4 lesson: metrics must reach the driver-visible stdout the moment
    they are measured — a killed/timed-out child then still leaves its
    already-measured metrics on record."""

    def _run():
        for raw in iter(proc.stdout.readline, b""):
            line = raw.decode(errors="replace").rstrip("\n")
            if not line:
                continue
            store.append(line)
            if echo:
                print(line)
                sys.stdout.flush()

    th = threading.Thread(target=_run, daemon=True)
    th.start()
    return th


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        if _requested_platform != "cpu":
            # overlap the tunnel's one-time first-sync block (93-460 s)
            # with pipeline setup + compile
            _start_tunnel_warmup()
        if sys.argv[2] == "headline":
            _worker_headline()
        elif sys.argv[2] == "secondary":
            _worker_secondary()
        elif sys.argv[2] == "tertiary":
            _worker_tertiary()
        return

    # Orchestrator: ALL workers spawn at t=0 —
    #   headline (accelerator), headline (CPU insurance), secondary,
    #   tertiary. Each process pays its own one-time tunnel first-sync;
    #   spawning everything up front overlaps those blocks (round 4's
    #   sequential spawn made a 440 s warm-up eat every later worker).
    # The workers coordinate via _device_lock/_wait_marker so the timed
    # sections still serialize with the headline first. The CPU insurance
    # leg's output is BANKED (not echoed) and only used if the accelerator
    # headline never lands.
    import tempfile

    sync_dir = tempfile.mkdtemp(prefix="pisa_tpu_bench_")
    child_env = {"PISA_TPU_BENCH_SYNCDIR": sync_dir}

    stores = {m: [] for m in ("headline", "cpu", "secondary", "tertiary")}
    procs = {
        "headline": _spawn_child("headline", extra_env=child_env),
        "cpu": _spawn_child(
            "headline", extra_env={**child_env, "JAX_PLATFORMS": "cpu"}
        ),
        "secondary": _spawn_child("secondary", extra_env=child_env),
        "tertiary": _spawn_child("tertiary", extra_env=child_env),
    }
    for name, proc in procs.items():
        _start_reader(proc, stores[name], echo=(name != "cpu"))

    while _remaining() > 12.0 and any(
        p.poll() is None for p in procs.values()
    ):
        time.sleep(1.0)

    for name, proc in procs.items():
        if proc.poll() is None:
            _log(f"deadline: killing still-running worker {name}")
            proc.kill()
            proc.communicate()
    time.sleep(0.5)  # let reader threads drain the final lines

    def _find_metric(lines, metric):
        found = None
        for line in lines:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("metric") == metric:
                found = line
        return found

    headline = _find_metric(
        stores["headline"], "icecube_3y_templates_per_sec"
    )
    if headline is None:
        _log("accelerator headline missing; using CPU insurance leg")
        for line in stores["cpu"]:  # banked lines, not yet echoed
            print(line)
        headline = _find_metric(
            stores["cpu"], "icecube_3y_templates_per_sec"
        )
    if headline is None:
        _log("ALL headline legs failed; emitting zero result")
        headline = json.dumps(
            {
                "metric": "icecube_3y_templates_per_sec",
                "value": 0.0,
                "unit": "templates/s",
                "vs_baseline": 0.0,
            }
        )

    # the driver records the FINAL stdout JSON line as the round's parsed
    # metric: the flagship templates/s must be the line of record
    print(headline)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
