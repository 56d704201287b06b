"""
JSON I/O aware of numpy arrays and unit-tagged quantities
(cf. reference ``pisa/utils/jsons.py:286,335``).

Serialization conventions (round-trip compatible with this module):
- numpy arrays  -> nested lists (dtype recorded only where needed by readers)
- Quantity      -> ``{"quantity": {"magnitude": ..., "units": "<str>"}}``
- np scalar     -> python scalar
- inf/nan       -> written as strings and restored on load
"""

import bz2
import json
import os

import numpy as np

from pisa_tpu.units import Quantity, ureg

__all__ = ["to_json", "from_json", "jsonify", "dejsonify"]


def jsonify(obj):
    """Convert `obj` into JSON-serializable primitives."""
    if hasattr(obj, "state") and not isinstance(obj, type):
        # Core objects expose a serializable `state` dict
        state = obj.state
        if isinstance(state, dict):
            return jsonify(state)
    if isinstance(obj, Quantity):
        return {
            "quantity": {
                "magnitude": jsonify(obj.magnitude),
                "units": str(obj.units),
            }
        }
    if isinstance(obj, dict):
        return {str(k): jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple, set)):
        return [jsonify(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return jsonify(obj.tolist())
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        obj = float(obj)
    if isinstance(obj, float):
        if np.isnan(obj):
            return "nan"
        if np.isposinf(obj):
            return "inf"
        if np.isneginf(obj):
            return "-inf"
        return obj
    if obj is None or isinstance(obj, (bool, int, str)):
        return obj
    if hasattr(obj, "item"):
        return obj.item()
    raise TypeError(f"Cannot jsonify object of type {type(obj)}: {obj!r}")


def dejsonify(obj):
    """Restore quantities and inf/nan sentinels from `jsonify` output."""
    if isinstance(obj, dict):
        if set(obj.keys()) == {"quantity"}:
            inner = obj["quantity"]
            return Quantity(
                _delistify(dejsonify(inner["magnitude"])),
                ureg.parse_units(inner["units"]),
            )
        return {k: dejsonify(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [dejsonify(v) for v in obj]
    if obj == "nan":
        return np.nan
    if obj == "inf":
        return np.inf
    if obj == "-inf":
        return -np.inf
    return obj


def _delistify(x):
    if isinstance(x, list):
        return np.asarray(x)
    return x


def to_json(content, filename, indent=2, overwrite=True, sort_keys=False):
    """Write `content` to a JSON file; ``.bz2`` suffix enables compression."""
    if os.path.exists(filename) and not overwrite:
        raise IOError(f"Refusing to overwrite existing file {filename}")
    d = os.path.dirname(filename)
    if d:
        os.makedirs(d, exist_ok=True)
    text = json.dumps(jsonify(content), indent=indent, sort_keys=sort_keys)
    if filename.endswith(".bz2"):
        with bz2.open(filename, "wt") as f:
            f.write(text)
    else:
        with open(filename, "w") as f:
            f.write(text)


def from_json(filename):
    """Read JSON (optionally ``.bz2``-compressed) written by :func:`to_json`."""
    if filename.endswith(".bz2"):
        with bz2.open(filename, "rt") as f:
            raw = json.load(f)
    else:
        with open(filename) as f:
            raw = json.load(f)
    return dejsonify(raw)
