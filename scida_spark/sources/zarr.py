"""Zarr source — same split-planned reader framework as hdf5.py with a
zarr-python backend (reference io/_base.py:267-345 reads zarr through
the identical datadict path). zarr is not installed in this container;
the chunk-aligned split planning is importable and tested.
"""

from __future__ import annotations

try:
    import zarr  # noqa: F401

    HAS_ZARR = True
except ImportError:
    HAS_ZARR = False

from scida_spark.sources.hdf5 import Split


def plan_chunk_aligned_splits(
    nrows: int, chunk_rows: int, store_path: str, container: str,
    chunks_per_split: int = 8
) -> list[Split]:
    """Zarr chunks are the natural split unit: group ``chunks_per_split``
    consecutive chunks per task so each task does sequential I/O."""
    splits = []
    step = chunk_rows * chunks_per_split
    start = 0
    while start < nrows:
        stop = min(start + step, nrows)
        splits.append(Split(store_path, container, start, stop, start))
        start = stop
    return splits


def load_zarr_dataset(path: str, spark, **kwargs):
    if not HAS_ZARR:
        raise ImportError(
            "Zarr reading requires zarr-python, which is not installed in "
            "this environment; plan_chunk_aligned_splits is available."
        )
    raise NotImplementedError("end-to-end zarr load pending zarr availability")
