"""Shared reader-kernel helpers: numpy → Arrow conversion that honors
the DECLARED Spark schema, and uid-range filter narrowing.

Every source kernel must emit exactly the Arrow types its schema
declares. The dtype maps widen unsigned ints to LongType and keep
float32 as FloatType — so the kernel has to ``astype`` accordingly;
yielding raw ``uint32``/``uint64`` Arrow arrays crashes Spark with
UNSUPPORTED_ARROWTYPE, and ``.tolist()`` for 2-D data silently changes
the element type. One shared implementation (used by npy, zarr, hdf5,
fits) instead of four drifting copies.
"""

from __future__ import annotations

import numpy as np

_SPARK_TO_NP = {
    "long": np.int64,
    "integer": np.int32,
    "short": np.int16,
    "float": np.float32,
    "double": np.float64,
}


def to_arrow_column(arr: np.ndarray, field):
    """Convert a 1-D or 2-D numpy block to the Arrow array the Spark
    ``StructField`` declares (cast + FixedSizeList→list for 2-D)."""
    import pyarrow as pa

    t = field.dataType
    if t.typeName() == "array":
        el = _SPARK_TO_NP[t.elementType.typeName()]
        mat = np.ascontiguousarray(arr).astype(el, copy=False)
        flat = pa.array(mat.reshape(-1))
        return pa.FixedSizeListArray.from_arrays(flat, mat.shape[1]).cast(
            pa.list_(flat.type)
        )
    if t.typeName() == "string":
        a = np.asarray(arr)
        if a.dtype.kind == "S":  # FITS 'A' columns arrive as bytes
            return pa.array([b.decode("ascii", "replace").rstrip() for b in a])
        return pa.array([str(x) for x in a])
    el = _SPARK_TO_NP[t.typeName()]
    return pa.array(np.ascontiguousarray(arr).astype(el, copy=False))


def narrow_uid_bounds(filters, lo: int, hi: int):
    """Consume-nothing uid-range narrowing for DataSourceReader
    ``pushFilters``: yields every filter back (Spark re-applies them —
    pruning is purely an I/O optimization) while tightening [lo, hi).
    Returns (kept_filters_list, lo, hi).
    """
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    kept = []
    for f in filters:
        kept.append(f)
        if getattr(f, "attribute", None) != ("uid",):
            continue
        v = f.value
        if isinstance(f, GreaterThanOrEqual):
            lo = max(lo, int(v))
        elif isinstance(f, GreaterThan):
            lo = max(lo, int(v) + 1)
        elif isinstance(f, LessThanOrEqual):
            hi = min(hi, int(v) + 1)
        elif isinstance(f, LessThan):
            hi = min(hi, int(v))
        elif isinstance(f, EqualTo):
            lo = max(lo, int(v))
            hi = min(hi, int(v) + 1)
    return kept, lo, hi


def natural_sort_key(name: str):
    """Mixed digit/text natural sort that never compares int to str:
    emit (is_text, token) pairs (reference numeric file ordering,
    io/_base.py:1029-1045, without the crash on heterogeneous names)."""
    import re

    return [
        (0, int(t)) if t.isdigit() else (1, t)
        for t in re.split(r"(\d+)", name)
        if t != ""
    ]
