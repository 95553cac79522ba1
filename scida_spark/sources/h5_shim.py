"""h5py-API-compatible backend over directory stores — the TEST DOUBLE
that lets the HDF5 source's real read kernel execute without libhdf5.

A "file" is a directory: groups are subdirectories, datasets are .npy
arrays. The surface mirrors exactly what the hdf5 source uses of h5py:
``File(path, "r")`` context manager, mapping access, ``keys()``,
``.shape``/``.dtype`` on datasets, and slice reads (memory-mapped, so a
row-range read touches only those pages — same I/O shape as h5py).

This module is imported BY NAME inside executor tasks (see
``sources/hdf5.py::read_splits_arrow``), so swapping it for real h5py
changes nothing but the import.
"""

from __future__ import annotations

import os

import numpy as np


class ShimDataset:
    def __init__(self, path: str, u6: bool = False):
        self._path = path
        self._u6 = u6
        # 0-d arrays cannot be memory-mapped; load them eagerly (tiny).
        try:
            self._arr = np.load(path, mmap_mode="r")
        except ValueError:
            self._arr = np.load(path)

    @property
    def shape(self):
        return self._arr.shape

    @property
    def dtype(self):
        if self._u6:
            # Reproduce h5py's behavior on MTNG's 6-byte unsigned ints:
            # any .dtype access fails to resolve '<u6' (reference
            # helpers_hdf5.py:36-47 catches exactly this message).
            raise TypeError("data type '<u6' not understood")
        return self._arr.dtype

    def __getitem__(self, key):
        return self._arr[key]

    def __len__(self):
        return self._arr.shape[0]

    @property
    def attrs(self) -> dict:
        """Per-dataset attributes from a ``<name>.attrs.json`` sidecar
        (h5py's ``Dataset.attrs`` surface — carries the per-field unit
        metadata like ``to_cgs``/``a_scaling``/``h_scaling``)."""
        import json

        p = self._path[: -len(".npy")] + ".attrs.json"
        if os.path.isfile(p):
            with open(p) as fh:
                return json.load(fh)
        return {}


class ShimGroup:
    def __init__(self, path: str):
        self._path = path

    def keys(self):
        out = []
        for e in sorted(os.listdir(self._path)):
            if e.endswith(".npy"):
                out.append(e[: -len(".npy")])
            elif os.path.isdir(os.path.join(self._path, e)):
                out.append(e)
        return out

    @property
    def attrs(self) -> dict:
        """Group attributes from an ``_attrs.json`` sidecar (h5py's
        ``obj.attrs`` mapping surface, read-only)."""
        import json

        p = os.path.join(self._path, "_attrs.json")
        if os.path.isfile(p):
            with open(p) as fh:
                return json.load(fh)
        return {}

    def __getitem__(self, name: str):
        sub = os.path.join(self._path, name)
        if os.path.isdir(sub):
            return ShimGroup(sub)
        npy = sub + ".npy"
        if os.path.isfile(npy):
            # A '<name>.u6' sidecar marks the dataset as a 6-byte uint
            # (h5py cannot resolve its dtype — see ShimDataset.dtype).
            return ShimDataset(npy, u6=os.path.isfile(sub + ".u6"))
        raise KeyError(name)

    def __contains__(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self._path, name)) or os.path.isfile(
            os.path.join(self._path, name + ".npy")
        )


class File(ShimGroup):
    def __init__(self, path: str, mode: str = "r"):
        if mode != "r":
            raise ValueError("h5_shim is read-only")
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        super().__init__(path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        pass
