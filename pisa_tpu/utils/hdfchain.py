"""
Chained access to a set of HDF5 files holding same-schema tables
(cf. reference ``pisa/utils/hdfchain.py``: ``HDFChain`` / ``HDFTableProxy``
/ ``TableAccessor``). Reading a table path concatenates that dataset across
every file in the chain, in order; files missing the node contribute zero
rows (with a warning), matching the reference's semantics.

Implemented on h5py (the reference uses pytables): a "table" here is any
h5py Dataset found within ``maxdepth`` of the root.
"""

from __future__ import annotations

from glob import glob

import numpy as np

from pisa_tpu.utils.log import logging

__all__ = ["HDFTableProxy", "TableAccessor", "HDFChain"]


class HDFTableProxy:
    """Proxy for one dataset path across all files of a chain."""

    def __init__(self, path, dtype, files):
        self.path = path
        self._v_dtype = dtype
        self.files = files

    def _lengths(self):
        out = np.zeros(len(self.files), dtype=int)
        for i, f in enumerate(self.files):
            node = f.get(self.path)
            if node is None:
                logging.warning(
                    "node %s does not exist in file %s", self.path, f.filename
                )
            else:
                out[i] = node.shape[0]
        return out

    def read(self):
        """Concatenated rows of this dataset over every file."""
        parts = []
        for f in self.files:
            node = f.get(self.path)
            if node is None:
                logging.warning(
                    "node %s does not exist in file %s", self.path, f.filename
                )
                continue
            parts.append(np.asarray(node))
        if not parts:
            return np.zeros(0, dtype=self._v_dtype)
        return np.concatenate(parts, axis=0)

    def read_iter(self):
        for f in self.files:
            node = f.get(self.path)
            if node is not None:
                yield np.asarray(node)

    def col(self, colname):
        """One column (structured dtype field) concatenated over the chain."""
        return self.read()[colname]

    def col_iter(self, colname):
        for part in self.read_iter():
            yield part[colname]

    def __len__(self):
        return int(self._lengths().sum())

    def __repr__(self):
        return (
            f"chained table {self.path!r} with {len(self.files)} files,"
            f" {len(self)} rows, dtype={self._v_dtype}"
        )


class TableAccessor:
    """Attribute-style access to the chain's tables by basename
    (reference ``hdfchain.py:86``)."""

    def __init__(self, tabledict):
        self.__dict__.update(tabledict)

    def __repr__(self):
        return ", ".join(
            k for k, v in self.__dict__.items()
            if isinstance(v, HDFTableProxy)
        )


class HDFChain:
    """A chain over multiple HDF5 files (reference ``hdfchain.py:93``).

    Parameters
    ----------
    files : list of paths or glob string
    maxdepth : int
        only datasets at most this deep below the root are chained
    """

    def __init__(self, files, maxdepth=1, verbose=False, **kwargs):
        import h5py

        if isinstance(files, (list, tuple)):
            if len(files) == 0:
                raise ValueError("provided file list is empty!")
            names = list(files)
        elif isinstance(files, str):
            names = sorted(glob(files))
            if not names:
                raise ValueError("glob string matches no file!")
        else:
            raise ValueError(
                "parameter files must be either a list of filenames or a"
                " globstring"
            )
        if verbose:
            logging.info("opening %d files in chain...", len(names))
        self.files = [h5py.File(n, "r", **kwargs) for n in names]

        self._tables = {}
        self.pathes = {}
        first = self.files[0]

        def visit(name, obj):
            if not isinstance(obj, h5py.Dataset):
                return
            depth = name.count("/") + 1
            if depth > maxdepth:
                return
            base = name.rsplit("/", 1)[-1]
            path = "/" + name
            if base in self._tables:
                logging.warning(
                    "skipping additional occurrence of table %s at %s"
                    " (using %s)!", base, path, self._tables[base].path,
                )
                return
            proxy = HDFTableProxy(path, obj.dtype, self.files)
            self._tables[base] = proxy
            self.pathes[path] = proxy

        first.visititems(visit)
        self.root = TableAccessor(self._tables)

    def getNode(self, path):
        return self.pathes[path]

    def close(self):
        # guard: __init__ may have raised before self.files existed
        for f in getattr(self, "files", ()):
            try:
                f.close()
            except Exception:
                pass

    def __del__(self):
        self.close()
