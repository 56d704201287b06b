"""
Every packaged pipeline config instantiates and produces finite outputs
(cf. reference ``pisa_tests/test_example_pipelines.py:41``, which runs
``get_outputs()`` on every config under ``settings/pipeline/``).

The three IceCube 3-y data-release configs are exercised with physics
assertions in ``tests/test_icecube_3y.py`` and are skipped here to keep
the sweep fast; everything else — including configs no other test runs
end-to-end (``fast_example.cfg``, ``varbin_example.cfg``) — goes through
the full construct → setup → get_outputs path.
"""

import os

import numpy as np
import pytest

from pisa_tpu.utils.resources import find_resource

_HEAVY = {
    "IceCube_3y_neutrinos.cfg",
    "IceCube_3y_neutrinos_daemon.cfg",
    "IceCube_3y_muons.cfg",
    "IceCube_3y_data.cfg",
}


def _all_configs():
    d = find_resource("settings/pipeline")
    return sorted(
        f for f in os.listdir(d)
        if f.endswith(".cfg") and f not in _HEAVY
    )


@pytest.mark.parametrize("cfg_name", _all_configs())
def test_example_pipeline(cfg_name):
    from pisa_tpu.core.map import MapSet
    from pisa_tpu.core.pipeline import Pipeline

    p = Pipeline(f"settings/pipeline/{cfg_name}")
    out = p.get_outputs()
    # VarBinning configs return one MapSet per selection
    mapsets = out if isinstance(out, list) else [out]
    assert len(mapsets) >= 1
    total = 0.0
    for ms in mapsets:
        assert isinstance(ms, MapSet)
        for m in ms:
            h = np.asarray(m.hist)
            assert np.all(np.isfinite(h)), f"{cfg_name}:{m.name}"
            total += float(h.sum())
    assert np.isfinite(total)
    assert total != 0.0 or "data" in cfg_name
