"""
Equality/closeness helpers across mixed containers, numpy arrays, and
quantities (cf. reference ``pisa/utils/comparisons.py:185,431,713``).
"""

import numbers

import numpy as np

from pisa_tpu import FTYPE, HASH_SIGFIGS
from pisa_tpu.units import Quantity, ureg

__all__ = [
    "ALLCLOSE_KW",
    "FTYPE_PREC",
    "recursiveEquality",
    "recursiveAllclose",
    "interpret_quantity",
    "normQuant",
    "isvalidname",
    "isscalar",
    "isbarenumeric",
    "inf2finite",
]

FTYPE_PREC = np.finfo(FTYPE).eps
ALLCLOSE_KW = dict(rtol=FTYPE_PREC * 4.0, atol=0, equal_nan=True)


def interpret_quantity(value, expect_sequence=False):
    """Coerce `value` into a Quantity (dimensionless if untagged)."""
    if isinstance(value, Quantity):
        return value
    if isinstance(value, str):
        return ureg(value)
    if expect_sequence and isinstance(value, (list, tuple)):
        if all(isinstance(v, Quantity) for v in value):
            units = value[0].units
            return Quantity(np.asarray([v.m_as(units) for v in value]), units)
        return Quantity(np.asarray(value))
    return Quantity(value)


def normQuant(obj, sigfigs=HASH_SIGFIGS):
    """Normalize a (possibly nested) object for hashing: quantities to base
    units, floats rounded to `sigfigs` significant figures."""
    from pisa_tpu.utils.hash import _normalize

    return _normalize(obj, sigfigs)


def recursiveEquality(x, y, rtol=None, atol=None):
    """Deep equality over dicts/sequences/arrays/quantities; floats compared
    with allclose at FTYPE precision."""
    kw = dict(ALLCLOSE_KW)
    if rtol is not None:
        kw["rtol"] = rtol
    if atol is not None:
        kw["atol"] = atol

    if isinstance(x, Quantity) or isinstance(y, Quantity):
        if not (isinstance(x, Quantity) and isinstance(y, Quantity)):
            return False
        if x.units.dims != y.units.dims:
            return False
        return recursiveEquality(
            x.to_base_units().magnitude, y.to_base_units().magnitude, rtol, atol
        )
    if isinstance(x, dict):
        if not isinstance(y, dict) or set(x) != set(y):
            return False
        return all(recursiveEquality(x[k], y[k], rtol, atol) for k in x)
    if isinstance(x, str) or isinstance(y, str):
        return x == y
    if isinstance(x, (list, tuple)) or isinstance(y, (list, tuple)):
        try:
            if len(x) != len(y):
                return False
        except TypeError:
            return False
        return all(recursiveEquality(a, b, rtol, atol) for a, b in zip(x, y))
    if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
        x, y = np.asarray(x), np.asarray(y)
        if x.shape != y.shape:
            return False
        if x.dtype.kind in "fc" or y.dtype.kind in "fc":
            return bool(np.allclose(x, y, **kw))
        return bool(np.array_equal(x, y))
    if isinstance(x, numbers.Number) and isinstance(y, numbers.Number):
        return bool(np.allclose(x, y, **kw))
    return x == y


def recursiveAllclose(x, y, **kwargs):
    return recursiveEquality(x, y, **kwargs)


# -- small predicates (cf. reference comparisons.py) ---------------------------
import re as _re  # noqa: E402

_VALID_NAME_RE = _re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def isvalidname(x):
    """Is `x` a valid Python identifier-style name?"""
    return isinstance(x, str) and bool(_VALID_NAME_RE.match(x))


def isscalar(x):
    """Is `x` a scalar (number, 0-d array, or scalar Quantity)?"""
    if isinstance(x, Quantity):
        x = x.magnitude
    return isinstance(x, numbers.Number) or (
        isinstance(x, np.ndarray) and x.ndim == 0
    )


def isbarenumeric(x):
    """Is `x` numeric WITHOUT units attached?"""
    if isinstance(x, Quantity):
        return False
    if isinstance(x, numbers.Number):
        return True
    if isinstance(x, np.ndarray) and x.dtype.kind in "biufc":
        return True
    return False


def inf2finite(x):
    """Map +-inf to the largest/smallest finite values of the dtype."""
    x = np.asarray(x)
    if x.dtype.kind not in "fc":
        return x
    info = np.finfo(x.dtype)
    return np.clip(x, info.min, info.max)
