"""
llh server/client round trip: a served llh must equal the in-process
compiled objective (wire-protocol parity with the reference's
llh_server/llh_client pair).
"""

import threading
import time

import numpy as np
import pytest

from pisa_tpu.core.pipeline import Pipeline


def test_llh_server_roundtrip(tmp_path):
    from pisa_tpu.utils import llh_server
    from pisa_tpu.utils.llh_client import Client

    p = Pipeline("settings/pipeline/toy_generalized_llh.cfg")
    ct = p.compile()
    ref = ct.get_outputs()
    ref_path = str(tmp_path / "ref.json")
    ref.to_json(ref_path)

    port = 19472
    t = threading.Thread(
        target=llh_server.serve,
        kwargs=dict(
            config="settings/pipeline/toy_generalized_llh.cfg",
            ref=ref_path,
            port=port,
            metric="llh",
        ),
        daemon=True,
    )
    t.start()

    # in-process expectation
    value_only, _ = ct.build_objective(ref, "llh")
    v0 = ct.current_rescaled_values()
    v1 = np.clip(v0 + 0.1, 0.05, 0.95)

    # wait for the server to come up
    client = None
    for _ in range(60):
        try:
            client = Client(("localhost", port))
            break
        except OSError:
            time.sleep(0.5)
    assert client is not None, "server did not come up"

    with client:
        for v in (v0, v1):
            served = client.get_llh(v)
            expected = -float(value_only(np.asarray(v)))
            assert served == pytest.approx(expected, rel=1e-10)
