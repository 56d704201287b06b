"""
ctypes bindings for the native Poisson-gamma mixture library
(``poisson_gamma.c``) — the host-side C path of
``generalized_poisson_llh(use_c=True)``, mirroring the reference's
compiled extension (``pisa/utils/llh_defs/poisson_gamma.c`` built in its
``setup.py:241-243``).

The shared library is compiled lazily with the system C compiler into the
cache directory, keyed by a hash of the source, so no build step is
required; :func:`available` reports whether a compiler/library could be
obtained (callers fall back to the JAX implementation otherwise).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["available", "pg_log_mixture_c"]

_LIB = None
_TRIED = False


def _source_path():
    return os.path.join(os.path.dirname(__file__), "poisson_gamma.c")


def _build_lib():
    src = _source_path()
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    from pisa_tpu import CACHE_DIR

    outdir = os.path.join(CACHE_DIR, "native")
    os.makedirs(outdir, exist_ok=True)
    libpath = os.path.join(outdir, f"poisson_gamma_{digest}.so")
    if not os.path.isfile(libpath):
        cc = os.environ.get("CC", "cc")
        with tempfile.TemporaryDirectory() as tmp:
            tmppath = os.path.join(tmp, "poisson_gamma.so")
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmppath, src, "-lm"],
                check=True,
                capture_output=True,
            )
            os.replace(tmppath, libpath)
    return libpath


def _get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        try:
            lib = ctypes.CDLL(_build_lib())
            lib.pg_log_mixture.restype = None
            lib.pg_log_mixture.argtypes = [
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            _LIB = lib
        except (OSError, subprocess.CalledProcessError) as exc:
            from pisa_tpu.utils.log import logging

            logging.debug("native poisson_gamma unavailable: %s", exc)
    return _LIB


def available():
    """True if the native library compiled and loaded."""
    return _get_lib() is not None


def pg_log_mixture_c(k, alphas, betas):
    """log P(k) per bin via the native library.

    k : (B,) counts; alphas/betas : (B, S). Returns (B,) float64.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(
            "native poisson_gamma library unavailable (no C compiler?)"
        )
    k = np.ascontiguousarray(np.asarray(k, dtype=np.int64).ravel())
    alphas = np.ascontiguousarray(np.atleast_2d(alphas), dtype=np.float64)
    betas = np.ascontiguousarray(np.atleast_2d(betas), dtype=np.float64)
    if alphas.shape != betas.shape or alphas.shape[0] != k.shape[0]:
        raise ValueError(
            f"shape mismatch: k {k.shape}, alphas {alphas.shape},"
            f" betas {betas.shape}"
        )
    n_bins, n_sources = alphas.shape
    out = np.empty(n_bins, dtype=np.float64)
    max_k = int(k.max()) if n_bins else 0
    scratch = np.empty(2 * max_k + 1 + n_sources, dtype=np.float64)

    lib.pg_log_mixture(
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        alphas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        betas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_long(n_bins),
        ctypes.c_long(n_sources),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
