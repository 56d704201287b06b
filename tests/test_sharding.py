"""
Multi-device (SPMD) template evaluation tests, on the 8 virtual CPU devices
forced by conftest. Asserts sharded == single-device output — the library
analog of the reference's llh-server use case (``pisa/utils/llh_server.py``).
"""

import numpy as np
import pytest

import jax

from pisa_tpu.core.pipeline import Pipeline
from pisa_tpu.parallel import (
    build_batched_objective,
    default_mesh,
    shard_containers,
)


@pytest.fixture(scope="module")
def pipeline_pair():
    # two independent pipelines: one stays single-device, one gets sharded
    p_ref = Pipeline("settings/pipeline/toy_fit_example.cfg")
    p_sh = Pipeline("settings/pipeline/toy_fit_example.cfg")
    return p_ref, p_sh


def test_mesh_has_8_devices():
    mesh = default_mesh()
    assert mesh.devices.size == 8


def test_sharded_template_matches_single_device(pipeline_pair):
    p_ref, p_sh = pipeline_pair
    ct_ref = p_ref.compile()
    ct_sh = p_sh.compile()
    mesh = default_mesh()
    ct_sh.shard(mesh)

    v0 = ct_ref.current_rescaled_values()
    out_ref = ct_ref(v0)
    out_sh = ct_sh(v0)
    assert set(out_ref["hist"]) == set(out_sh["hist"])
    for name in out_ref["hist"]:
        a = np.asarray(out_ref["hist"][name])
        b = np.asarray(out_sh["hist"][name])
        assert np.allclose(a, b, rtol=1e-10, atol=1e-12), name


def test_sharded_arrays_are_actually_distributed(pipeline_pair):
    _, p_sh = pipeline_pair
    mesh = default_mesh()
    shard_containers(p_sh.data, mesh)
    c = p_sh.data.containers[0]
    found_sharded = False
    for key, per_rep in c._data.items():
        for arr in per_rep.values():
            if isinstance(arr, jax.Array) and arr.shape and arr.shape[0] % 8 == 0:
                if len(arr.sharding.device_set) == 8:
                    found_sharded = True
    assert found_sharded, "no container array ended up sharded over the mesh"


def test_sharded_gradient_matches(pipeline_pair):
    """The analytic gradient of the SHARDED objective must match finite
    differences of its own (forward-parity-checked) value function — together
    with test_sharded_template_matches_single_device this implies gradient
    parity with the single-device program, at half the compile cost."""
    p_ref, p_sh = pipeline_pair
    ct_sh = p_sh.compile().shard(default_mesh())

    data_dist = ct_sh.get_outputs()
    val_fn, vg_sh = ct_sh.build_objective(data_dist, "chi2")
    v0 = np.clip(ct_sh.current_rescaled_values() + 0.07, 0.01, 0.99)
    val_s, g_s = vg_sh(v0)
    i = 0
    # fp32 objective values quantize at ~1e-7 relative; widen the FD step
    # and tolerance accordingly
    from pisa_tpu import FTYPE

    fp64 = FTYPE == np.float64
    eps = 1e-5 if fp64 else 1e-3
    vp, vm = v0.copy(), v0.copy()
    vp[i] += eps
    vm[i] -= eps
    fd = (float(val_fn(vp)) - float(val_fn(vm))) / (2 * eps)
    assert np.isclose(
        float(np.asarray(g_s)[i]), fd, rtol=1e-4 if fp64 else 3e-2
    )


def test_batched_objective_sharded_over_walkers(pipeline_pair):
    p_ref, _ = pipeline_pair
    ct = p_ref.compile()
    data_dist = ct.get_outputs()
    mesh = default_mesh()
    batched = build_batched_objective(ct, data_dist, "mod_chi2", mesh=mesh)
    value_only, _ = ct.build_objective(data_dist, "mod_chi2")

    rng = np.random.RandomState(7)
    vecs = rng.uniform(0.2, 0.8, size=(8, len(ct.free_names)))
    vals = np.asarray(batched(vecs))
    assert vals.shape == (8,)
    for i in (0, 3, 7):
        assert np.allclose(vals[i], float(value_only(vecs[i])), rtol=1e-8)
