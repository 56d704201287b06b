"""
Flagship-pipeline sharding parity (VERDICT round 1 item 3): the FULL
IceCube 3-year neutrino pipeline (csv_loader -> honda_ip -> barr_simple ->
prob3 -> aeff -> hist -> hypersurfaces, 15 free params) sharded over the
8-device virtual mesh must reproduce the single-device template and
analytic gradient bit-for-tolerance.

Events are deterministically subsampled (csv_loader
``fraction_events_to_keep``) to keep the two compiles affordable on the CI
box; the sharding semantics are event-count independent.
"""

import copy
import os

import numpy as np
import pytest

from pisa_tpu import FTYPE
from pisa_tpu.config.parser import parse_pipeline_config
from pisa_tpu.core.pipeline import Pipeline
from pisa_tpu.parallel import default_mesh

# Default: deterministic 2% subsample (4.8k of 240k events) keeps the two
# compiles affordable on the CI box. PISA_TPU_FULL_SHARD=1 runs the parity
# at the FULL 240k-event shape (slow; pair it with
# XLA_FLAGS=--xla_cpu_collective_call_terminate_timeout_seconds=1200 so
# XLA:CPU's 40 s collective rendezvous abort cannot fire mid-eval on a
# time-sliced 1-vCPU host) — the on-record full-shape run lives in
# artifacts/full_shard_parity_*.log.
FULL_SHARD = os.environ.get("PISA_TPU_FULL_SHARD", "") == "1"
FRACTION = None if FULL_SHARD else 0.02


def _flagship_config():
    cfg = parse_pipeline_config(
        "settings/pipeline/IceCube_3y_neutrinos.cfg"
    )
    key = ("data", "csv_loader")
    assert key in cfg
    if FRACTION is not None:
        cfg[key]["fraction_events_to_keep"] = FRACTION
    return cfg


@pytest.fixture(scope="module")
def compiled_pair():
    ct_ref = Pipeline(_flagship_config()).compile()
    ct_sh = Pipeline(_flagship_config()).compile()
    ct_sh.shard(default_mesh())
    return ct_ref, ct_sh


def test_sharded_template_is_the_stacked_program(compiled_pair):
    """VERDICT r3 item 1: the multi-chip program must BE the production
    (category-stacked) program — shard() must not fall back to
    per-container tracing."""
    ct_ref, ct_sh = compiled_pair
    assert ct_ref._trace_data is not ct_ref.pipeline.data
    assert getattr(ct_ref._trace_data.containers[0], "is_stacked", False)
    assert ct_sh._trace_data is not ct_sh.pipeline.data
    sc = ct_sh._trace_data.containers[0]
    assert getattr(sc, "is_stacked", False)
    # the padded event axis divides the mesh and is actually partitioned
    n_dev = len(default_mesh().devices.ravel())
    assert sc.n_pad % n_dev == 0
    from jax.sharding import NamedSharding

    ev_found = sharded = False
    for key, per in sc._data.items():
        for h, arr in per.items():
            rows = sc.rows.get((key, h))
            if (
                isinstance(rows, str)
                and rows == "cat"
                and hasattr(arr, "sharding")
                and np.shape(arr)[:2] == (sc.n_cats, sc.n_pad)
            ):
                ev_found = True
                s = arr.sharding
                if isinstance(s, NamedSharding) and len(s.spec) >= 2 and (
                    s.spec[1] == "data"
                ):
                    sharded = True
    assert ev_found and sharded, "no event-axis-sharded stacked array found"


def test_flagship_sharded_template_matches(compiled_pair):
    ct_ref, ct_sh = compiled_pair
    v = np.clip(ct_ref.current_rescaled_values() + 0.07, 0.05, 0.95)
    maps_ref = ct_ref.get_outputs(v)
    maps_sh = ct_sh.get_outputs(v)
    assert sorted(m.name for m in maps_ref) == sorted(
        m.name for m in maps_sh
    )
    ref = {m.name: np.asarray(m.hist) for m in maps_ref}
    n_ev = {}
    for c in ct_ref.pipeline.data.containers:
        rep0 = c.representation
        try:
            c.representation = "events"
            n_ev[c.name] = int(np.shape(c["weights"])[0])
        finally:
            c.representation = rep0
    print(
        f"\n[shard-parity] fraction={FRACTION} total_events="
        f"{sum(n_ev.values())} per_container={n_ev} "
        f"hist_shapes={[(m.name, np.asarray(m.hist).shape) for m in maps_sh][:3]}..."
    )
    # fp32: the sharded psum reassociates the event reduction, so bins
    # agree to accumulation roundoff, not bit-for-bit
    tol = (
        dict(rtol=1e-10, atol=1e-12)
        if FTYPE == np.float64
        else dict(rtol=1e-4, atol=1e-6)
    )
    for m in maps_sh:
        np.testing.assert_allclose(np.asarray(m.hist), ref[m.name], **tol)


def test_flagship_sharded_gradient_matches(compiled_pair):
    ct_ref, ct_sh = compiled_pair
    data = ct_ref.get_outputs()
    _, vg_ref = ct_ref.build_objective(data, "mod_chi2")
    _, vg_sh = ct_sh.build_objective(data, "mod_chi2")
    v = np.clip(ct_ref.current_rescaled_values() + 0.06, 0.05, 0.95)
    val_ref, g_ref = vg_ref(v)
    val_sh, g_sh = vg_sh(v)
    if FTYPE == np.float64:
        np.testing.assert_allclose(float(val_sh), float(val_ref), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(g_sh), np.asarray(g_ref), rtol=1e-8, atol=1e-12,
        )
    else:
        # fp32: reassociated reductions; the objective is a sum of ~1e4
        # per-bin terms and the gradient has near-cancelling entries
        np.testing.assert_allclose(float(val_sh), float(val_ref), rtol=1e-4)
        g_ref_a = np.asarray(g_ref)
        scale = np.max(np.abs(g_ref_a))
        np.testing.assert_allclose(
            np.asarray(g_sh) / scale, g_ref_a / scale, atol=1e-3,
        )
    assert np.isfinite(np.asarray(g_sh)).all()
    assert np.max(np.abs(np.asarray(g_sh))) > 0


def test_sharded_nondivisible_event_count_pads_and_masks():
    """VERDICT r3 item 8: event counts NOT divisible by the mesh size must
    pad-and-mask (NaN coordinates / zero weights), not silently replicate.
    A fraction of 0.017 gives per-category counts with no particular
    alignment; the stacked path re-pads n_pad to a multiple of 8 and the
    template must still match the unsharded one."""
    cfg = parse_pipeline_config("settings/pipeline/IceCube_3y_neutrinos.cfg")
    cfg[("data", "csv_loader")]["fraction_events_to_keep"] = 0.017
    ct_ref = Pipeline(copy.deepcopy(cfg)).compile()
    ct_sh = Pipeline(copy.deepcopy(cfg)).compile()
    if ct_sh._trace_data is not ct_sh.pipeline.data:
        # make the pre-shard padding genuinely indivisible so shard() must
        # re-stack (max category count at 1.7% is whatever csv_loader gives;
        # assert on the post-shard invariant instead of assuming)
        pass
    ct_sh.shard(default_mesh())
    if ct_sh._trace_data is not ct_sh.pipeline.data:
        assert ct_sh._trace_data.containers[0].n_pad % 8 == 0
    v = np.clip(ct_ref.current_rescaled_values() + 0.04, 0.05, 0.95)
    ref = {m.name: np.asarray(m.hist) for m in ct_ref.get_outputs(v)}
    tol = (
        dict(rtol=1e-10, atol=1e-12)
        if FTYPE == np.float64
        else dict(rtol=1e-4, atol=1e-6)
    )
    for m in ct_sh.get_outputs(v):
        np.testing.assert_allclose(np.asarray(m.hist), ref[m.name], **tol)
