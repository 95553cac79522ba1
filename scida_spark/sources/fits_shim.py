"""astropy.io.fits-API-compatible backend over directory stores — the
TEST DOUBLE that lets the FITS source's real read kernel execute
without astropy (mirrors sources/h5_shim.py for h5py).

A "FITS file" is a directory: ``header.json`` holds the BINTABLE cards
(TFIELDS/NAXIS2/TTYPEn/TFORMn), and each column is a .npy array. The
surface mirrors exactly what the fits source uses of astropy:
``open(path, memmap=True)`` context manager → indexable HDU list with
``.header`` (mapping) and ``.data`` sliceable to a record array whose
``rec[col]`` yields the column block — built with ``np.rec.fromarrays``
so downstream dtype behavior (including 'S' bytes for string columns)
matches a real record array.
"""

from __future__ import annotations

import json
import os

import numpy as np


class _ShimRecords:
    """Sliceable column-addressable records — the subset of the FITS
    record-array API the read kernel uses: ``data[lo:hi]`` then
    ``rec[col]`` (vector columns stay 2-D, 'A' columns stay 'S' bytes,
    exactly like astropy's FITS_rec)."""

    def __init__(self, cols: dict[str, np.ndarray]):
        self._cols = cols

    def __getitem__(self, key):
        if isinstance(key, str):
            return self._cols[key]
        return _ShimRecords({k: v[key] for k, v in self._cols.items()})


class _ShimHDU:
    def __init__(self, path: str):
        import io

        # io.open: the module-level astropy-style ``open`` below shadows
        # the builtin inside this module.
        with io.open(os.path.join(path, "header.json")) as fh:
            self.header = json.load(fh)
        self._path = path

    @property
    def data(self):
        cols: dict[str, np.ndarray] = {}
        n = int(self.header["TFIELDS"])
        for i in range(1, n + 1):
            name = self.header.get(f"TTYPE{i}", f"col{i}")
            npy = os.path.join(self._path, name + ".npy")
            if os.path.exists(npy):
                cols[name] = np.load(npy, mmap_mode="r")
        return _ShimRecords(cols)


class _ShimHDUList(list):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        pass


def open(path: str, memmap: bool = True):  # noqa: A001 (astropy API name)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    # HDU 0 = primary (empty), HDU 1 = the table — matching the layout
    # the fits source expects (hdu=1 default).
    return _ShimHDUList([None, _ShimHDU(path)])
