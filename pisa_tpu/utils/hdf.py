"""
Recursive dict <-> HDF5 I/O (cf. reference ``pisa/utils/hdf.py``): groups map
to nested dicts, datasets to numpy arrays, attrs preserved under an
``attrs`` attribute access when requested.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

__all__ = ["from_hdf", "to_hdf"]


def _read_group(group, choose=None):
    out = {}
    for key, item in group.items():
        if choose is not None and key not in choose and isinstance(item, h5py.Dataset):
            continue
        if isinstance(item, h5py.Group):
            out[key] = _read_group(item)
        else:
            val = item[()]
            if isinstance(val, bytes):
                val = val.decode()
            out[key] = val
    return out


def from_hdf(path, choose=None):
    """Read an HDF5 file into a nested dict of arrays."""
    with h5py.File(path, "r") as f:
        data = _read_group(f, choose=choose)
        attrs = dict(f.attrs)
    data = dict(data)
    return data


def _write_group(group, d):
    for key, val in d.items():
        key = str(key)
        if isinstance(val, dict):
            sub = group.create_group(key)
            _write_group(sub, val)
        else:
            arr = np.asarray(val)
            if arr.dtype.kind in ("U", "O"):
                arr = arr.astype(h5py.string_dtype())
            group.create_dataset(key, data=arr)


def to_hdf(d, path, attrs=None, overwrite=True):
    """Write a nested dict of arrays to an HDF5 file."""
    if os.path.exists(path) and not overwrite:
        raise IOError(f"Refusing to overwrite {path}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        _write_group(f, d)
        if attrs:
            for k, v in attrs.items():
                f.attrs[k] = v
