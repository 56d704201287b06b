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
    p_ref, p_sh = pipeline_pair
    ct_ref = p_ref.compile()
    ct_sh = p_sh.compile().shard(default_mesh())

    data_dist = ct_ref.get_outputs()
    _, vg_ref = ct_ref.build_objective(data_dist, "chi2")
    _, vg_sh = ct_sh.build_objective(data_dist, "chi2")
    v0 = np.clip(ct_ref.current_rescaled_values() + 0.07, 0.01, 0.99)
    val_r, g_r = vg_ref(v0)
    val_s, g_s = vg_sh(v0)
    assert np.allclose(float(val_r), float(val_s), rtol=1e-8)
    assert np.allclose(np.asarray(g_r), np.asarray(g_s), rtol=1e-6, atol=1e-10)


def test_batched_objective_sharded_over_walkers(pipeline_pair):
    p_ref, _ = pipeline_pair
    ct = p_ref.compile()
    data_dist = ct.get_outputs()
    mesh = default_mesh()
    batched = build_batched_objective(ct, data_dist, "mod_chi2", mesh=mesh)
    value_only, _ = ct.build_objective(data_dist, "mod_chi2")

    rng = np.random.RandomState(7)
    vecs = rng.uniform(0.2, 0.8, size=(16, len(ct.free_names)))
    vals = np.asarray(batched(vecs))
    assert vals.shape == (16,)
    for i in (0, 5, 15):
        assert np.allclose(vals[i], float(value_only(vecs[i])), rtol=1e-8)
