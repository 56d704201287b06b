"""
Test configuration: run everything on a virtual 8-device CPU mesh in fp64 so
golden-parity tests against the reference's float64 pickles are exact.
Env vars must be set before jax / pisa_tpu are first imported.
"""

import os

# Force CPU: the ambient environment pre-sets JAX_PLATFORMS=axon (the real
# TPU tunnel), which would make every test pay RPC/compile latency and lacks
# complex128. Set PISA_TPU_TEST_PLATFORM to override (e.g. 'axon' for on-TPU
# smoke tests).
_platform = os.environ.get("PISA_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("PISA_TPU_FTYPE", "fp64")

# A site hook re-appends the 'axon' TPU plugin to jax_platforms regardless of
# the env var; override via the config API (before any backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
