"""Rate-deferral factorized histogram (CompiledTemplate._setup_rate_deferral
/ prob3._apply_stacked deferral / hist.prepare_rate_defer): the deferred
program must reproduce the gather-path template, errors, AND analytic
gradient on the flagship pipeline shape. Reference semantics anchor: the
'average'-mode grid->events lookup of ``pisa/core/translation.py:228``
(every event of a calc cell shares the cell's rate) is what makes the
grid-side contraction exact."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pisa_tpu.config.parser import parse_pipeline_config
from pisa_tpu.core.pipeline import Pipeline


def _flagship_config():
    cfg = parse_pipeline_config(
        "settings/pipeline/IceCube_3y_neutrinos.cfg"
    )
    cfg[("data", "csv_loader")]["fraction_events_to_keep"] = 0.02
    return cfg


@pytest.fixture(scope="module")
def compiled_pair():
    assert os.environ.get("PISA_TPU_RATE_DEFER", "1") not in ("0",)
    ct_defer = Pipeline(_flagship_config()).compile()
    os.environ["PISA_TPU_RATE_DEFER"] = "0"
    try:
        ct_gather = Pipeline(_flagship_config()).compile()
    finally:
        os.environ.pop("PISA_TPU_RATE_DEFER", None)
    return ct_defer, ct_gather


def test_deferral_is_active(compiled_pair):
    ct_defer, ct_gather = compiled_pair
    oscs = [
        s
        for s in ct_defer._traced_stages
        if type(s).__name__ == "prob3"
    ]
    assert oscs and getattr(oscs[0], "_defer_rate_to_hist", False), (
        "rate deferral did not engage on the flagship lineup"
    )
    oscs_g = [
        s
        for s in ct_gather._traced_stages
        if type(s).__name__ == "prob3"
    ]
    assert not getattr(oscs_g[0], "_defer_rate_to_hist", True)


def test_template_parity(compiled_pair):
    ct_defer, ct_gather = compiled_pair
    v0 = ct_defer.current_rescaled_values()
    ms_d = ct_defer.get_outputs(v0)
    ms_g = ct_gather.get_outputs(v0)
    assert set(m.name for m in ms_d) == set(m.name for m in ms_g)
    gmaps = {m.name: m for m in ms_g}
    for m in ms_d:
        ref = gmaps[m.name]
        np.testing.assert_allclose(
            m.hist, ref.hist, rtol=2e-5, atol=1e-10,
            err_msg=f"hist mismatch for {m.name}",
        )
        if m.error_hist is not None and ref.error_hist is not None:
            np.testing.assert_allclose(
                m.error_hist, ref.error_hist, rtol=2e-5, atol=1e-10,
                err_msg=f"error mismatch for {m.name}",
            )


def test_gradient_parity(compiled_pair):
    ct_defer, ct_gather = compiled_pair
    v0 = np.asarray(ct_defer.current_rescaled_values())
    v0 = np.clip(v0, 0.15, 0.85)
    data_ms = ct_gather.get_outputs(ct_gather.current_rescaled_values())

    _, vg_d = ct_defer.build_objective(data_ms, "mod_chi2")
    _, vg_g = ct_gather.build_objective(data_ms, "mod_chi2")
    val_d, grad_d = vg_d(jnp.asarray(v0))
    val_g, grad_g = vg_g(jnp.asarray(v0))
    np.testing.assert_allclose(
        float(val_d), float(val_g), rtol=5e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(grad_d), np.asarray(grad_g), rtol=5e-4, atol=2e-4
    )


def test_perturbed_parity(compiled_pair):
    """Off-nominal parameters (incl. the category scalars aeff_scale and
    nutau norms whose deferral handling goes through the in-trace scalar
    ratio) still match the gather path."""
    ct_defer, ct_gather = compiled_pair
    rng = np.random.RandomState(5)
    v = np.clip(
        np.asarray(ct_defer.current_rescaled_values())
        + rng.uniform(-0.1, 0.1, len(ct_defer._free_params)),
        0.05,
        0.95,
    )
    ms_d = ct_defer.get_outputs(v)
    ms_g = ct_gather.get_outputs(v)
    gmaps = {m.name: m for m in ms_g}
    for m in ms_d:
        np.testing.assert_allclose(
            m.hist, gmaps[m.name].hist, rtol=2e-5, atol=1e-10,
            err_msg=f"perturbed hist mismatch for {m.name}",
        )
