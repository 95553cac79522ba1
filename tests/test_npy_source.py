"""End-to-end tests for the npy-dir Python Data Source — the runnable
exemplar of the custom-source framework (HDF5/Zarr/FITS are gated).

Mirrors the reference's synthetic-file integration pattern
(reference tests/integration/test_io_load.py, tests/helpers.py): build
deterministic arrays on disk, load through the full Spark path, assert
exact values, uid order, projection, and split-count invariance (the
Spark analog of the reference's chunk-size invariance,
tests/external/test_regression.py:129-144).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scida_spark.sources.npy import (
    NpyDataSource,
    discover_schema,
    load_npy_dataset,
    read_npy_header,
)

N = 1000


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npyds")
    rng = np.random.RandomState(7)
    np.save(d / "Masses.npy", rng.uniform(0.1, 2.0, N).astype(np.float64))
    np.save(d / "ParticleIDs.npy", np.arange(N, dtype=np.int64) * 10)
    np.save(d / "Coordinates.npy", rng.uniform(0, 100, (N, 3)).astype(np.float64))
    np.save(d / "Flags.npy", rng.randint(0, 5, N).astype(np.int32))
    return str(d)


def test_header_only_schema(npy_dir):
    shape, dtype = read_npy_header(npy_dir + "/Coordinates.npy")
    assert shape == (N, 3) and dtype == "float64"
    schema, nrows, names = discover_schema(npy_dir)
    assert nrows == N
    assert set(names) == {"Masses", "ParticleIDs", "Coordinates", "Flags"}
    assert schema["uid"].dataType.typeName() == "long"
    assert schema["Coordinates"].dataType.typeName() == "array"


def _read(spark, npy_dir, rows_per_split=128):
    from scida_spark.sources.npy import register

    register(spark)
    return (
        spark.read.format("npydir")
        .option("path", npy_dir)
        .option("rows_per_split", rows_per_split)
        .load()
    )


def test_exact_values_and_uid_order(spark, npy_dir):
    df = _read(spark, npy_dir)
    rows = df.orderBy("uid").collect()
    assert len(rows) == N
    masses = np.load(npy_dir + "/Masses.npy")
    coords = np.load(npy_dir + "/Coordinates.npy")
    assert [r.uid for r in rows] == list(range(N))
    assert rows[17].ParticleIDs == 170
    assert rows[17].Masses == pytest.approx(masses[17])
    assert list(rows[42].Coordinates) == pytest.approx(list(coords[42]))


def test_aggregate_matches_numpy(spark, npy_dir):
    df = _read(spark, npy_dir)
    got = df.agg(F.sum("Masses")).first()[0]
    assert got == pytest.approx(float(np.load(npy_dir + "/Masses.npy").sum()))


def test_split_count_invariance(spark, npy_dir):
    """Result is identical at any split size (reference chunk-size
    invariance, tests/external/test_regression.py:129-144)."""
    a = _read(spark, npy_dir, rows_per_split=64).orderBy("uid")
    b = _read(spark, npy_dir, rows_per_split=N + 5).orderBy("uid")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_uid_filter_pushdown_prunes_splits(spark, npy_dir):
    df = _read(spark, npy_dir, rows_per_split=100)
    sel = df.filter((F.col("uid") >= 250) & (F.col("uid") < 350))
    rows = sel.collect()
    assert sorted(r.uid for r in rows) == list(range(250, 350))
    # The pruned scan plans at most 2 of the 10 splits.
    assert sel.rdd.getNumPartitions() <= 2


def test_projection_reads_requested_columns(spark, npy_dir):
    df = _read(spark, npy_dir).select("uid", "Masses")
    assert df.columns == ["uid", "Masses"]
    assert df.count() == N


def test_load_npy_dataset_facade(spark, tmp_path):
    sub = tmp_path / "PartType0"
    sub.mkdir()
    np.save(sub / "Masses.npy", np.ones(50, dtype=np.float64) * 2.0)
    ds = load_npy_dataset(str(tmp_path), spark)
    cont = ds["PartType0"]
    assert cont.df.agg(F.sum("Masses")).first()[0] == pytest.approx(100.0)


def test_unsigned_int_columns_widen_to_long(spark, tmp_path):
    """uint32/uint64 columns must read as LongType values, not crash
    with UNSUPPORTED_ARROWTYPE (reader casts to the declared type)."""
    np.save(tmp_path / "Flags.npy", np.array([1, 2, 3], dtype=np.uint32))
    np.save(tmp_path / "IDs.npy", np.array([2**40, 5, 7], dtype=np.uint64))
    df = _read(spark, str(tmp_path))
    rows = df.orderBy("uid").collect()
    assert [r.Flags for r in rows] == [1, 2, 3]
    assert rows[0].IDs == 2**40
    assert dict(df.dtypes)["IDs"] == "bigint"


def test_float32_2d_keeps_float(spark, tmp_path):
    np.save(tmp_path / "Coords.npy", np.ones((4, 3), dtype=np.float32) * 1.5)
    df = _read(spark, str(tmp_path))
    assert df.schema["Coords"].dataType.elementType.typeName() == "float"
    assert list(df.first().Coords) == [1.5, 1.5, 1.5]
