"""
Generic file I/O dispatch by extension (cf. reference
``pisa/utils/fileio.py:486,542``): .json(.bz2), .csv, .pkl, .hdf5/.h5,
.dat/.txt (whitespace tables), .cfg (returns resolved path for the config
parser).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from pisa_tpu.utils.resources import find_resource

__all__ = ["from_file", "to_file", "expand"]


def expand(path):
    return os.path.expanduser(os.path.expandvars(path))


def from_file(fname, fmt=None, **kwargs):
    """Load a file based on its extension."""
    path = find_resource(fname)
    ext = (fmt or os.path.splitext(path.replace(".bz2", ""))[1][1:]).lower()

    if ext == "json":
        from pisa_tpu.utils.jsons import from_json

        return from_json(path)
    if ext == "csv":
        import pandas as pd

        return pd.read_csv(path, **kwargs)
    if ext in ("pkl", "pckl", "pickle"):
        with open(path, "rb") as f:
            return pickle.load(f)
    if ext in ("hdf5", "h5", "hdf"):
        from pisa_tpu.utils.hdf import from_hdf

        return from_hdf(path, **kwargs)
    if ext in ("dat", "txt"):
        return np.loadtxt(path, **kwargs)
    raise ValueError(f"Unhandled extension {ext!r} for file {fname!r}")


def to_file(obj, fname, fmt=None, **kwargs):
    """Write `obj` based on the target extension."""
    path = expand(fname)
    ext = (fmt or os.path.splitext(path.replace(".bz2", ""))[1][1:]).lower()
    if ext == "json":
        from pisa_tpu.utils.jsons import to_json

        return to_json(obj, path, **kwargs)
    if ext == "csv":
        return obj.to_csv(path, **kwargs)
    if ext in ("pkl", "pckl", "pickle"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f, protocol=4)
        return None
    if ext in ("hdf5", "h5", "hdf"):
        from pisa_tpu.utils.hdf import to_hdf

        return to_hdf(obj, path, **kwargs)
    raise ValueError(f"Unhandled extension {ext!r} for file {fname!r}")
