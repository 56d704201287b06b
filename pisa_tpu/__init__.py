"""
pisa_tpu — a TPU-native (JAX/XLA/Pallas) framework for binned statistical
inference on neutrino-oscillation measurements via Monte-Carlo reweighting.

Provides the capabilities of IceCube's PISA (reference: /root/reference,
``pisa/__init__.py``) redesigned TPU-first: each analysis pipeline compiles to
a single jit-compiled, differentiable ``params -> MapSet`` function.

Global runtime configuration (cf. reference ``pisa/__init__.py:50-82``):

- ``FTYPE``/``CTYPE``/``ITYPE``: float/complex/int dtypes selected once at
  import via the ``PISA_TPU_FTYPE`` env var (``fp32``/``fp64``; ``fp64``
  enables JAX x64 globally). TPU runs use fp32 (native); fp64 is used for
  CPU-side golden-parity tests.
- ``HASH_SIGFIGS``: significant figures used when normalizing quantities for
  hashing (12 for fp64, 5 for fp32 — matches reference
  ``pisa/__init__.py:277-283``).
- ``EPSILON``: comparison tolerance derived from HASH_SIGFIGS.
- ``CACHE_DIR``: on-disk cache location.
- ``ureg``/``Q_``: unit registry (minimal pint-compatible implementation in
  ``pisa_tpu.units``).
"""

import os

import numpy as np

__all__ = [
    "__version__",
    "FTYPE",
    "CTYPE",
    "ITYPE",
    "FTYPE_NAME",
    "HASH_SIGFIGS",
    "EPSILON",
    "CACHE_DIR",
    "PISA_TPU_NUM_DEVICES",
    "ureg",
    "Q_",
]

__version__ = "0.1.0"

# ---------------------------------------------------------------------------
# Float-type policy. Must run BEFORE the first `import jax` triggers backend
# initialization, since x64 must be enabled globally.
# ---------------------------------------------------------------------------
_ftype_env = os.environ.get("PISA_TPU_FTYPE", "fp32").strip().lower()
if _ftype_env in ("fp64", "float64", "double", "64"):
    FTYPE_NAME = "fp64"
    FTYPE = np.float64
    CTYPE = np.complex128
    ITYPE = np.int64
    HASH_SIGFIGS = 12
    import jax

    jax.config.update("jax_enable_x64", True)
elif _ftype_env in ("fp32", "float32", "single", "32"):
    FTYPE_NAME = "fp32"
    FTYPE = np.float32
    CTYPE = np.complex64
    ITYPE = np.int32
    HASH_SIGFIGS = 5
else:
    raise ValueError(
        f"Invalid PISA_TPU_FTYPE={_ftype_env!r}; expected 'fp32' or 'fp64'"
    )

EPSILON = 10 ** -HASH_SIGFIGS

# Honor an explicit JAX_PLATFORMS request via the config API. A site hook in
# this environment re-appends the experimental 'axon' TPU plugin to
# jax_platforms regardless of the env var, so e.g. JAX_PLATFORMS=cpu runs
# (CI legs, the bench CPU-insurance leg, CLI tools on busy machines) would
# silently initialize the TPU backend anyway. Must run before the first
# backend initialization; same workaround as tests/conftest.py.
_requested_platform = os.environ.get("JAX_PLATFORMS")
if _requested_platform:
    import jax as _jax_p

    # keep 'cpu' available as a SECONDARY backend behind a requested
    # accelerator (the default backend is the first listed): the
    # small-workload host routing (device_fit.minimize_on_device
    # (platform='cpu'), toy-scale fits) needs jax.devices('cpu') to exist
    # even when the ambient env pins JAX_PLATFORMS to the accelerator
    _effective_platform = _requested_platform
    if "cpu" not in [
        p.strip() for p in _effective_platform.split(",")
    ]:
        _effective_platform = f"{_effective_platform},cpu"
    try:
        _jax_p.config.update("jax_platforms", _effective_platform)
    except Exception:  # pragma: no cover - backend already initialized
        pass

# Number of (virtual) devices to target for sharded evaluation; actual mesh
# construction happens lazily in pisa_tpu.parallel.
PISA_TPU_NUM_DEVICES = int(os.environ.get("PISA_TPU_NUM_DEVICES", "0"))

CACHE_DIR = os.environ.get(
    "PISA_TPU_CACHE_DIR",
    os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "pisa_tpu",
    ),
)

def _machine_tag():
    """CPU-feature fingerprint scoping the persistent compilation cache.

    The XLA:CPU persistent cache stores AOT machine code specialized to the
    compiling host's ISA extensions; when several heterogeneous machines
    share this filesystem (observed: entries compiled with AMX/AVX512
    features this host lacks), loading a foreign entry can SIGILL. Scope the
    cache directory by a hash of the host's CPU flags so each machine only
    ever sees its own entries.
    """
    import hashlib
    import platform as _platform

    ident = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    ident += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


# Persistent XLA compilation cache (cf. reference CACHE_DIR holding numba's
# compiled-function disk cache, ``pisa/__init__.py:96-120``): repeat runs of
# bench/tests/fits skip recompiles of the big template programs.
if os.environ.get("PISA_TPU_COMPILATION_CACHE", "1") not in ("0", "off"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(CACHE_DIR, f"xla_cache-{_machine_tag()}"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from pisa_tpu.units import ureg, Quantity as Q_  # noqa: E402
