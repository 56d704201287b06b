"""
Service smoke matrix (cf. reference ``pisa_tests/test_services.py:201``):
discover every service under pisa_tpu.stages, instantiate it via its
``init_test``, feed it a synthetic two-container ContainerSet providing its
``expected_container_keys``, and run setup/compute/apply.
"""

import importlib
import pkgutil

import numpy as np
import pytest

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.core.container import Container, ContainerSet

import pisa_tpu.stages

N_EVTS = 40

TEST_BINNING = MultiDimBinning(
    [
        OneDimBinning(
            "true_energy", num_bins=5, is_log=True, domain=[1, 100] * ureg.GeV
        ),
        OneDimBinning("true_coszen", num_bins=4, is_lin=True, domain=[-1, 1]),
    ],
    name="test_binning",
)

# services whose data is produced by the service itself (sources)
SOURCE_SERVICES = {
    "toy_event_generator", "grid", "csv_loader", "csv_data_hist",
    "csv_icc_hist", "simple_data_loader", "sqlite_loader", "meows_loader",
}
# synthetic values per known container key
def _key_value(key, rng, n):
    if key == "true_energy":
        return 10 ** rng.uniform(0.1, 1.9, n).astype(FTYPE)
    if key in ("true_coszen", "reco_coszen"):
        return rng.uniform(-1, 1, n).astype(FTYPE)
    if key == "reco_energy":
        return 10 ** rng.uniform(0.8, 1.9, n).astype(FTYPE)
    if key == "pid":
        return rng.choice([0.0, 1.0], n).astype(FTYPE)
    if key in ("weights", "initial_weights", "weighted_aeff"):
        return np.ones(n, dtype=FTYPE)
    if key in ("nu_flux", "nu_flux_nominal", "nubar_flux_nominal"):
        return np.ones((n, 2), dtype=FTYPE)
    if key == "errors":
        return np.full(n, 0.1, dtype=FTYPE)
    if key == "bjorken_y":
        return rng.uniform(0.1, 0.9, n).astype(FTYPE)
    if key == "dis":
        return rng.choice([0.0, 1.0], n).astype(FTYPE)
    if key in (
        "mHNL", "hnl_proper_lifetime", "hnl_decay_width",
    ):
        return rng.uniform(0.5, 1.5, n).astype(FTYPE)
    if key == "hnl_true_energy":
        return 10 ** rng.uniform(0.1, 1.9, n).astype(FTYPE)
    if key == "hnl_distance_min":
        return np.full(n, 10.0, dtype=FTYPE)
    if key == "hnl_distance_max":
        return np.full(n, 100.0, dtype=FTYPE)
    if key == "bin_indices":
        return rng.randint(0, TEST_BINNING.size, n).astype(np.int32)
    if key.startswith(("linear_fit_", "quad_fit_")):
        return rng.uniform(-0.1, 0.1, n).astype(FTYPE)
    return rng.uniform(0.1, 1.0, n).astype(FTYPE)


def _make_data(service, rng):
    containers = []
    for name, nubar, flav in (
        ("nutau_cc", 1, 2), ("numubar_nc", -1, 1),
    ):
        c = Container(name, representation="events")
        c.set_aux_data("nubar", nubar)
        c.set_aux_data("flav", flav)
        for key in service.expected_container_keys:
            if key in c:  # e.g. aux data like nubar/flav
                continue
            c[key] = _key_value(key, rng, N_EVTS)
        # always provide the basics plus any binning dims the service uses
        extra = ["true_energy", "true_coszen", "weights"]
        for mode in (service.calc_mode, service.apply_mode):
            if isinstance(mode, MultiDimBinning):
                extra.extend(mode.names)
        for key in extra:
            if key not in c:
                c[key] = _key_value(key, rng, N_EVTS)
        containers.append(c)
    cs = ContainerSet("test", containers)
    cs["output_binning"] = TEST_BINNING
    return cs


def _discover_services():
    services = []
    for cat in pkgutil.iter_modules(pisa_tpu.stages.__path__):
        if not cat.ispkg:
            continue
        pkg = importlib.import_module(f"pisa_tpu.stages.{cat.name}")
        for mod in pkgutil.iter_modules(pkg.__path__):
            services.append((cat.name, mod.name))
    return services


SERVICES = _discover_services()


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
        data = _make_data(service, rng)

    service.data = data
    service.setup()
    service.run()

    # all containers still hold finite weights afterwards
    for c in service.data:
        if "weights" in c.keys:
            w = np.asarray(c["weights"])
            assert np.all(np.isfinite(w)), f"{stage_name}.{service_name}"


# services that support a binned calc_mode (map mode, linked containers)
MAP_MODE_SERVICES = [
    ("flux", "barr_simple"),
    ("flux", "honda_ip"),
    ("flux", "mceq_barr"),
    ("flux", "mceq_barr_red"),
    ("osc", "prob3"),
    ("osc", "two_nu_osc"),
    ("osc", "decoherence"),
    ("osc", "external"),
    ("absorption", "earth_absorption"),
]


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

    # map mode needs the full 12-flavor container set for linking
    containers = []
    for name in (
        "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
        "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
        "nutaubar_nc",
    ):
        c = Container(name, representation=TEST_BINNING)
        nubar = -1 if "bar" in name else 1
        flav = {"e": 0, "mu": 1, "tau": 2}[
            name.replace("bar", "").split("_")[0][2:]
        ]
        c.set_aux_data("nubar", nubar)
        c.set_aux_data("flav", flav)
        for key in service.expected_container_keys:
            if key in c or key in TEST_BINNING.names:
                continue
            c[key] = _key_value(key, rng, TEST_BINNING.size)
        if "weights" not in c and "weights" not in TEST_BINNING.names:
            c["weights"] = _key_value("weights", rng, TEST_BINNING.size)
        containers.append(c)
    cs = ContainerSet("test", containers)
    cs["output_binning"] = TEST_BINNING

    service.data = cs
    service.setup()
    service.run()
    for c in service.data:
        if "weights" in c.keys:
            assert np.all(np.isfinite(np.asarray(c["weights"])))
