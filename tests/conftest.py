"""
Test configuration: run everything on a virtual 8-device CPU mesh in fp64 so
golden-parity tests against the reference's float64 pickles are exact.
Env vars must be set before jax / pisa_tpu are first imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("PISA_TPU_FTYPE", "fp64")
