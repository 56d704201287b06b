"""
Service smoke matrix (cf. reference ``pisa_tests/test_services.py:201``):
discover every service under pisa_tpu.stages, instantiate it via its
``init_test``, feed it a synthetic two-container ContainerSet providing its
``expected_container_keys``, and run setup/compute/apply. The harness lives
in :mod:`pisa_tpu.testing.service_matrix` (shared with the
``pisa-tpu-test-services`` CLI, which also emits the markdown support
matrix).
"""

import importlib

import numpy as np
import pytest

from pisa_tpu.core.container import ContainerSet
from pisa_tpu.testing.service_matrix import (
    MAP_MODE_SERVICES,
    SOURCE_SERVICES,
    TEST_BINNING,
    discover_services,
    format_markdown_matrix,
    make_events_data,
    make_map_data,
)

SERVICES = discover_services()


def test_discovered_a_lot():
    assert len(SERVICES) >= 25, SERVICES


@pytest.mark.parametrize(
    "stage_name,service_name",
    SERVICES,
    ids=[f"{c}.{s}" for c, s in SERVICES],
)
def test_service_smoke(stage_name, service_name):
    module = importlib.import_module(
        f"pisa_tpu.stages.{stage_name}.{service_name}"
    )
    if not hasattr(module, "init_test"):
        pytest.skip(f"{stage_name}.{service_name} has no init_test")
    rng = np.random.RandomState(42)
    service = module.init_test()

    if service_name in SOURCE_SERVICES:
        data = ContainerSet("test", [])
        data["output_binning"] = TEST_BINNING
    else:
        data = make_events_data(service, rng)

    service.data = data
    service.setup()
    service.run()

    # all containers still hold finite weights afterwards
    for c in service.data:
        if "weights" in c.keys:
            w = np.asarray(c["weights"])
            assert np.all(np.isfinite(w)), f"{stage_name}.{service_name}"


@pytest.mark.parametrize(
    "stage_name,service_name",
    MAP_MODE_SERVICES,
    ids=[f"{c}.{s}:map" for c, s in MAP_MODE_SERVICES],
)
def test_service_smoke_map_mode(stage_name, service_name):
    """Run compute on a binned grid (calc_mode = binning), exercising the
    container-linking paths (cf. reference test_services' mode matrix)."""
    module = importlib.import_module(
        f"pisa_tpu.stages.{stage_name}.{service_name}"
    )
    rng = np.random.RandomState(7)
    service = module.init_test()
    service.calc_mode = TEST_BINNING

    cs = make_map_data(service, rng)
    service.data = cs
    service.setup()
    service.run()

    for c in service.data:
        if "weights" in c.keys:
            w = np.asarray(c["weights"])
            assert np.all(np.isfinite(w)), f"{stage_name}.{service_name}:map"


def test_markdown_matrix_formatting():
    rows = [
        ("osc", "prob3", "ok", "ok"),
        ("flux", "daemon_flux", "skip: daemonflux not installed", "n/a"),
        ("data", "grid", "ok", "n/a"),
    ]
    md = format_markdown_matrix(rows)
    assert "| osc.prob3 | ✓ | ✓ |" in md
    assert "gated" in md and "—" in md
