"""
Multi-host (DCN) distributed evaluation (SURVEY §5.8; VERDICT round 1
missing item 9): two SEPARATE processes form a jax.distributed cluster
over localhost, contribute 4 CPU devices each to one 8-device global mesh,
evaluate an oscillation-probability reduction over a globally sharded
event axis (the cross-process psum is the DCN code path), and must agree
with the single-process value.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PISA_TPU_FTYPE"] = "fp64"  # exact parity with this process
    # the worker script's sys.path gets its own dir (tests/), not the repo
    # root — make pisa_tpu importable even without an editable install
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    vals = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_RESULT"):
                vals.append(float(line.split()[2]))
    assert len(vals) == 2, outs
    # both processes hold the same replicated global reduction
    assert vals[0] == pytest.approx(vals[1], rel=1e-12)

    # single-process reference value
    from pisa_tpu.ops.osc.kernels import osc_probs_layers
    from pisa_tpu.ops.osc.pmns import dm_matrix, pmns_matrix_complex

    rng = np.random.default_rng(7)
    n = 64
    energy = rng.uniform(1.0, 80.0, n)
    densities = rng.uniform(1.0, 10.0, (n, 3))
    distances = rng.uniform(100.0, 4000.0, (n, 3))
    U = pmns_matrix_complex(
        np.sin(0.5839), np.sin(0.1496), np.sin(0.7854), 1.2
    )
    probs = np.asarray(
        osc_probs_layers(
            dm_matrix(7.42e-5, 2.514e-3), U,
            np.diag([1.0, 0.0, 0.0]).astype(complex),
            np.zeros((3, 3), complex), np.zeros((3, 3)),
            1, energy, densities, distances,
        )
    )
    expected = float(probs[:, 1, 1].sum())
    # workers always run fp64 (exact cross-process parity between them);
    # when THIS process runs fp32 its reference kernels carry single
    # precision, so compare at the fp32 scale
    from pisa_tpu import FTYPE

    rel = 1e-10 if FTYPE == np.float64 else 1e-5
    assert vals[0] == pytest.approx(expected, rel=rel)
