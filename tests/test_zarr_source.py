"""End-to-end zarr v2 source tests: hand-written stores → full Spark
read path (values, uid order, fill_value chunks, compressors, pruning,
Dataset facade). Mirrors the npy-source test pattern."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scida_spark.sources.zarr import (
    ZarrDataSource,
    discover_zarr_container,
    read_zarr_rows,
    read_zarray_meta,
    register,
    write_zarr_array,
)

N = 1000


@pytest.fixture(scope="module")
def zarr_store(tmp_path_factory):
    d = tmp_path_factory.mktemp("zstore")
    rng = np.random.RandomState(13)
    write_zarr_array(str(d / "Masses"), rng.uniform(0.1, 2.0, N), chunks=128)
    write_zarr_array(str(d / "IDs"), np.arange(N, dtype=np.int64) * 3, chunks=256,
                     compressor=None)
    write_zarr_array(str(d / "Coordinates"),
                     rng.uniform(0, 100, (N, 3)), chunks=100, compressor="gzip")
    return str(d)


def test_metadata_only_discovery(zarr_store):
    m = read_zarray_meta(zarr_store + "/Masses")
    assert m.shape == (N,) and m.chunks == (128,) and m.compressor == "zlib"
    schema, nrows, metas = discover_zarr_container(zarr_store)
    assert nrows == N
    assert schema.fieldNames() == ["uid", "Coordinates", "IDs", "Masses"]
    assert schema["Coordinates"].dataType.typeName() == "array"


def test_read_rows_kernel_across_chunks(zarr_store):
    masses = read_zarr_rows(read_zarray_meta(zarr_store + "/Masses"), 120, 300)
    full = np.concatenate(
        [read_zarr_rows(read_zarray_meta(zarr_store + "/Masses"), 0, N)]
    )
    assert np.array_equal(masses, full[120:300])


def _read(spark, store, chunks_per_split=2):
    register(spark)
    return (
        spark.read.format("zarrdir")
        .option("path", store)
        .option("chunks_per_split", chunks_per_split)
        .load()
    )


def test_exact_values_and_uid(spark, zarr_store):
    df = _read(spark, zarr_store)
    rows = df.orderBy("uid").collect()
    assert [r.uid for r in rows] == list(range(N))
    assert rows[5].IDs == 15
    ref = read_zarr_rows(read_zarray_meta(zarr_store + "/Coordinates"), 42, 43)[0]
    assert list(rows[42].Coordinates) == pytest.approx(list(ref))


def test_split_count_invariance(spark, zarr_store):
    a = _read(spark, zarr_store, chunks_per_split=1).orderBy("uid")
    b = _read(spark, zarr_store, chunks_per_split=100).orderBy("uid")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_uid_pushdown_prunes(spark, zarr_store):
    df = _read(spark, zarr_store, chunks_per_split=1)  # split = 256 rows
    sel = df.filter((F.col("uid") >= 600) & (F.col("uid") < 700))
    assert sorted(r.uid for r in sel.collect()) == list(range(600, 700))
    assert sel.rdd.getNumPartitions() <= 2


def test_missing_chunk_is_fill_value(spark, tmp_path):
    import os

    d = tmp_path / "sparse"
    write_zarr_array(str(d / "x"), np.ones(300, dtype=np.float64), chunks=100,
                     fill_value=0)
    os.remove(str(d / "x" / "1"))  # drop the middle chunk
    df = _read(spark, str(d))
    got = [r.x for r in df.orderBy("uid").collect()]
    assert got[:100] == [1.0] * 100
    assert got[100:200] == [0.0] * 100
    assert got[200:] == [1.0] * 100


def test_load_zarr_dataset_facade(spark, tmp_path):
    from scida_spark.sources.zarr import load_zarr_dataset

    grp = tmp_path / "PartType0"
    write_zarr_array(str(grp / "Masses"), np.full(64, 2.5), chunks=16)
    ds = load_zarr_dataset(str(tmp_path), spark)
    got = ds["PartType0"].df.agg(F.sum("Masses")).first()[0]
    assert got == pytest.approx(160.0)


def test_unsupported_features_raise(tmp_path):
    import json

    d = tmp_path / "bad"
    d.mkdir()
    (d / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [10], "chunks": [10], "dtype": "<f8",
        "compressor": {"id": "blosc"}, "fill_value": 0, "order": "C",
        "filters": None,
    }))
    with pytest.raises(ValueError, match="blosc"):
        read_zarray_meta(str(d))


def test_save_load_roundtrip(spark, tmp_path):
    """Distributed zarr sink → source roundtrip (the reference's
    save/load regression, tests/external/test_save_load.py:10-26)."""
    from scida_spark.sources.zarr import save_zarr_container

    rng = np.random.RandomState(5)
    masses = rng.uniform(0.5, 3.0, 500)
    coords = rng.uniform(0, 10, (500, 3))
    rows = [
        (i, float(masses[i]), [float(x) for x in coords[i]]) for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "uid long, Masses double, Coordinates array<double>"
    ).repartition(4)
    out = str(tmp_path / "roundtrip")
    save_zarr_container(df, out, chunks=128)
    back = _read(spark, out).orderBy("uid").collect()
    assert len(back) == 500
    assert [r.uid for r in back] == list(range(500))
    assert back[17].Masses == pytest.approx(masses[17])
    assert list(back[499].Coordinates) == pytest.approx(list(coords[499]))
    got_sum = sum(r.Masses for r in back)
    assert got_sum == pytest.approx(float(masses.sum()))


def test_column_chunked_2d_rejected(tmp_path):
    import json

    d = tmp_path / "colchunk"
    d.mkdir()
    (d / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [10, 8], "chunks": [5, 4], "dtype": "<f8",
        "compressor": None, "fill_value": 0, "order": "C", "filters": None,
    }))
    with pytest.raises(ValueError, match="column-chunked"):
        read_zarray_meta(str(d))


def test_dataset_save_zarr_roundtrip(spark, tmp_path):
    """Dataset.save(format='zarr') → load() detection → same values
    (the reference's zarr sink + reload path)."""
    from scida_spark.dataset import Dataset, load
    from scida_spark.fields import FieldContainer

    df = spark.range(0, 200).select(
        F.col("id").alias("uid"), (F.col("id") * 0.5).alias("Masses")
    )
    root = FieldContainer(name="snap")
    cont = FieldContainer(df, name="PartType0")
    cont.field_units["Masses"] = "code_mass"
    root["PartType0"] = cont
    ds = Dataset(path="mem", data=root, metadata={"redshift": 1.5})
    out = str(tmp_path / "zsave")
    ds.save(out, format="zarr")
    back = load(out, spark=spark)
    bdf = back["PartType0"].df
    assert bdf.count() == 200
    assert bdf.agg(F.sum("Masses")).first()[0] == pytest.approx(sum(i * 0.5 for i in range(200)))
    import json as _json, os as _os
    attrs = _json.load(open(_os.path.join(out, "PartType0", ".zattrs")))
    assert attrs["units"]["Masses"] == "code_mass"


def test_unsigned_zarr_arrays_widen_to_long(spark, tmp_path):
    d = tmp_path / "u"
    write_zarr_array(str(d / "Flags"), np.array([9, 8, 7], dtype=np.uint32), chunks=2)
    write_zarr_array(str(d / "IDs"), np.array([2**40, 1, 2], dtype=np.uint64), chunks=2,
                     compressor=None)
    df = _read(spark, str(d))
    rows = df.orderBy("uid").collect()
    assert [r.Flags for r in rows] == [9, 8, 7]
    assert rows[0].IDs == 2**40


def test_save_zarr_rejects_gapped_uid(spark, tmp_path):
    from scida_spark.sources.zarr import save_zarr_container

    df = spark.range(0, 100).select(
        (F.col("id") * 2).alias("uid"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(ValueError, match="dense uid"):
        save_zarr_container(df, str(tmp_path / "gap"), chunks=32)


def test_zarr_units_survive_reload(spark, tmp_path):
    """Unit strings written to each container's .zattrs by save() must be
    read back into FieldContainer.field_units on load (they previously
    survived only the parquet round-trip)."""
    from scida_spark.dataset import Dataset, load
    from scida_spark.fields import FieldContainer

    df = spark.range(0, 50).select(
        F.col("id").alias("uid"), (F.col("id") * 2.0).alias("Masses")
    )
    root = FieldContainer(name="snap")
    cont = FieldContainer(df, name="PartType0")
    cont.field_units["Masses"] = "code_mass"
    root["PartType0"] = cont
    out = str(tmp_path / "zunits")
    Dataset(path="mem", data=root, metadata={}).save(out, format="zarr")
    back = load(out, spark=spark)
    assert back["PartType0"].field_units["Masses"] == "code_mass"


def test_load_metadata_over_zarr_store(spark, tmp_path):
    """.zgroup is a marker FILE — load_metadata on a store not named
    *.zarr must still detect zarr (regression: isdir vs isfile sniff)."""
    from scida_spark.dataset import Dataset, load_metadata
    from scida_spark.fields import FieldContainer

    df = spark.range(0, 20).select(
        F.col("id").alias("uid"), (F.col("id") * 1.0).alias("Masses")
    )
    root = FieldContainer(name="snap")
    root["PartType0"] = FieldContainer(df, name="PartType0")
    out = str(tmp_path / "plainname")
    Dataset(path="mem", data=root, metadata={"boxsize": 100.0}).save(out, format="zarr")
    meta = load_metadata(out, spark=spark)
    assert meta["format"] == "zarr"
