"""
Deterministic hashing of (almost) arbitrary objects, used to key provenance
and compile caches (cf. reference ``pisa/utils/hash.py:66,176``).
"""

import hashlib
import pickle
import struct

import numpy as np

from pisa_tpu.units import Quantity

__all__ = ["hash_obj", "hash_file"]


def _normalize(obj, sigfigs):
    """Recursively convert to a picklable, hash-stable structure; quantities
    are reduced to base units and floats rounded to `sigfigs` significant
    figures so fp32/fp64 pipelines hash consistently (cf. reference
    ``normQuant``, ``pisa/utils/comparisons.py:431``)."""
    if isinstance(obj, Quantity):
        base = obj.to_base_units()
        mag = base.magnitude
        if isinstance(mag, (int, np.integer)) and not isinstance(mag, bool):
            mag = float(mag)  # unit conversion may or may not floatify
        return ("quantity", _normalize(mag, sigfigs), str(base.units))
    if isinstance(obj, np.ndarray):
        if sigfigs is not None and np.issubdtype(obj.dtype, np.floating):
            return ("ndarray", _round_sig(obj.astype(np.float64), sigfigs).tobytes(), obj.shape)
        return ("ndarray", np.ascontiguousarray(obj).tobytes(), obj.shape)
    if isinstance(obj, (np.floating, float)):
        if sigfigs is not None:
            return float(_round_sig(np.float64(obj), sigfigs))
        return float(obj)
    if isinstance(obj, (np.integer, int, bool, str, bytes, type(None))):
        return obj
    if isinstance(obj, dict):
        return ("dict", tuple(sorted((str(k), _normalize(v, sigfigs)) for k, v in obj.items())))
    if isinstance(obj, (list, tuple)):
        return ("seq", tuple(_normalize(v, sigfigs) for v in obj))
    if hasattr(obj, "state") and not isinstance(obj, type):
        return (type(obj).__name__, _normalize(obj.state, sigfigs))
    return obj


def _round_sig(x, sigfigs):
    """Round to `sigfigs` significant figures (vectorized, handles 0/inf/nan)."""
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mags = np.where(
            np.isfinite(x) & (x != 0), np.floor(np.log10(np.abs(x))), 0.0
        )
    factor = 10.0 ** (sigfigs - 1 - mags)
    out = np.where(np.isfinite(x), np.round(x * factor) / factor, x)
    return out


def hash_obj(obj, hash_to="int", full_hash=True, sigfigs=None):
    """Hash any (picklable, after normalization) object.

    Parameters
    ----------
    obj : object
    hash_to : 'int' | 'hex'
    full_hash : bool
        If False, truncate to 64 bits.
    sigfigs : int or None
        Round floats to this many significant figures before hashing.
    """
    normalized = _normalize(obj, sigfigs)
    pkl = pickle.dumps(normalized, protocol=4)
    digest = hashlib.sha256(pkl).digest()
    if hash_to in ("int", int):
        n = int.from_bytes(digest[:8] if not full_hash else digest, "big")
        # keep within signed-64 for interop when truncated
        if not full_hash:
            n = struct.unpack("q", struct.pack("Q", n & (2**64 - 1)))[0]
        return n
    if hash_to == "hex":
        return digest.hex() if full_hash else digest.hex()[:16]
    raise ValueError(f"Unknown hash_to={hash_to!r}")


def hash_file(filename, hash_to="int", full_hash=True):
    """Hash a file's contents."""
    h = hashlib.sha256()
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.digest()
    if hash_to in ("int", int):
        return int.from_bytes(digest if full_hash else digest[:8], "big")
    return digest.hex() if full_hash else digest.hex()[:16]
