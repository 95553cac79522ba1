"""npy-dir source: a complete Spark 4 Python Data Source for directories
of ``.npy`` arrays — the runnable exemplar of the engine's custom-source
framework (HDF5/Zarr/FITS share the same split-planning semantics but
are gated on libraries absent from this container; numpy is installed,
so this source runs end-to-end and is fully tested).

Layout: ``<dir>/<field>.npy`` — one C-order array per field, all sharing
the leading dimension (the container row count), mirroring the
reference's one-dask-array-per-dataset model (reference
src/scida/io/_base.py:172-264). 2-D ``(N, k)`` fields become
``array<T>`` columns (§1.2 of SURVEY.md).

What it demonstrates, mapped to SURVEY §2.1/§4:

* schema discovery from metadata only — numpy headers are read without
  touching data (reference helpers_hdf5.py:55-135 walk)
* global ``uid`` injection from split bookkeeping (reference
  io/_base.py:734-750)
* splits = row ranges (``rows_per_split`` option) — chunk ≙ input split
* **uid-range filter pushdown → split pruning** (the one pushdown worth
  hand-writing per SURVEY §4: selector queries touch contiguous uid
  ranges, so most splits are skipped without opening files). Filters
  are *not* consumed — Spark re-applies them — so pruning is purely an
  I/O optimization and can never change results.
* column projection: the reader honors the schema Spark hands it, so
  only requested fields are memory-mapped.

Usage::

    spark.dataSource.register(NpyDataSource)
    df = (spark.read.format("npydir")
          .option("path", "/data/PartType0")
          .option("rows_per_split", 1 << 20)
          .load())
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_DTYPE_MAP = {
    "float32": FloatType(),
    "float64": DoubleType(),
    "int32": IntegerType(),
    "int64": LongType(),
    "uint32": LongType(),  # widen unsigned (reference coerces oddballs up,
    "uint64": LongType(),  # helpers_hdf5.py:36-47)
}


def read_npy_header(path: str) -> tuple[tuple[int, ...], str]:
    """(shape, dtype-name) from the .npy header only — no data I/O."""
    with open(path, "rb") as fh:
        version = np.lib.format.read_magic(fh)
        shape, fortran, dtype = np.lib.format._read_array_header(fh, version)
        if fortran:
            raise ValueError(f"{path}: Fortran-order arrays unsupported")
        return shape, dtype.name


def discover_schema(path: str) -> tuple[StructType, int, list[str]]:
    """Walk the directory's headers → (schema incl. uid, nrows, fields).

    Unsupported dtypes are skipped, matching the reference's policy for
    vlen/void columns (io/_base.py:706-714, io/fits.py:49-52).
    """
    fields: list[StructField] = [StructField("uid", LongType(), False)]
    names: list[str] = []
    nrows: int | None = None
    for entry in sorted(os.listdir(path)):
        # Skip hidden/tmp files (same convention Spark's file sources
        # use for `.`/`_` prefixes) so atomic writers can stage
        # `.field.tmp.npy` in-place before os.replace.
        if not entry.endswith(".npy") or entry.startswith((".", "_")):
            continue
        name = entry[: -len(".npy")]
        shape, dtype = read_npy_header(os.path.join(path, entry))
        if dtype not in _DTYPE_MAP or len(shape) > 2:
            continue
        if nrows is None:
            nrows = shape[0]
        elif shape[0] != nrows:
            raise ValueError(
                f"{entry}: leading dim {shape[0]} != container rows {nrows}"
            )
        t = _DTYPE_MAP[dtype]
        if len(shape) == 2:
            fields.append(StructField(name, ArrayType(t, False), False))
        else:
            fields.append(StructField(name, t, False))
        names.append(name)
    if nrows is None:
        raise ValueError(f"no readable .npy arrays under {path}")
    return StructType(fields), nrows, names


@dataclass
class RowRange(InputPartition):
    start: int  # global row / uid
    stop: int


class NpyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "npydir"

    def schema(self) -> StructType:
        schema, _, _ = discover_schema(self.options["path"])
        return schema

    def reader(self, schema: StructType) -> "NpyReader":
        return NpyReader(self.options["path"], schema,
                         int(self.options.get("rows_per_split", 1 << 20)))


class NpyReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType, rows_per_split: int):
        self.path = path
        self.schema = schema
        self.rows_per_split = max(1, rows_per_split)
        _, self.nrows, _ = discover_schema(path)
        # uid bounds narrowed by pushed filters (split pruning).
        self._uid_lo = 0
        self._uid_hi = self.nrows

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        # Prune-only: every filter is yielded back for Spark to
        # re-apply, so correctness never depends on this path.
        from scida_spark.sources.convert import narrow_uid_bounds

        kept, self._uid_lo, self._uid_hi = narrow_uid_bounds(
            filters, self._uid_lo, self._uid_hi
        )
        yield from kept

    def partitions(self):
        lo = (self._uid_lo // self.rows_per_split) * self.rows_per_split
        out = []
        start = lo
        while start < self._uid_hi:
            stop = min(start + self.rows_per_split, self.nrows)
            out.append(RowRange(start, stop))
            start = stop
        return out or [RowRange(0, 0)]

    def read(self, partition: RowRange):
        import pyarrow as pa

        from scida_spark.sources.convert import to_arrow_column

        lo, hi = partition.start, partition.stop
        if hi <= lo:
            return
        cols: dict[str, object] = {}
        for field in self.schema.fields:
            if field.name == "uid":
                cols["uid"] = pa.array(np.arange(lo, hi, dtype=np.int64))
                continue
            # Memory-map → only the requested row range touches disk;
            # convert to the DECLARED Arrow type (unsigned ints widen).
            arr = np.load(os.path.join(self.path, field.name + ".npy"),
                          mmap_mode="r")[lo:hi]
            cols[field.name] = to_arrow_column(arr, field)
        yield pa.RecordBatch.from_pydict(cols)


def register(spark) -> None:
    """Register the source + enable Python filter pushdown (a runtime
    SQL conf — required for pushFilters, default-off in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NpyDataSource)


def load_npy_dataset(path: str, spark, rows_per_split: int = 1 << 20,
                     units: bool | str = True):
    """Directory of ``<container>/<field>.npy`` trees → Dataset handle
    (one sub-container per subdirectory; a flat dir is one container)."""
    from scida_spark.dataset import Dataset
    from scida_spark.fields import FieldContainer
    from scida_spark.units import UnitRegistry

    register(spark)
    root = FieldContainer(name=os.path.basename(path.rstrip("/")))
    subdirs = [
        e for e in sorted(os.listdir(path))
        if os.path.isdir(os.path.join(path, e))
        and any(f.endswith(".npy") for f in os.listdir(os.path.join(path, e)))
    ]
    targets = [(d, os.path.join(path, d)) for d in subdirs] or [
        (os.path.basename(path.rstrip("/")), path)
    ]
    ureg = UnitRegistry()
    for name, sub in targets:
        df = (
            spark.read.format("npydir")
            .option("path", sub)
            .option("rows_per_split", rows_per_split)
            .load()
        )
        root[name] = FieldContainer(df, name=name, ureg=ureg)
    # npy trees carry no unit metadata; the units flag is accepted for
    # the uniform load(units=...) contract (nothing to attach here).
    _ = units
    return Dataset(path=path, data=root, metadata={}, ureg=ureg)
