"""Unit tests: zoom-target selector, Temperature field, metadata-only
scan, 2-D vector field split bridge."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scida_spark.functions.physics import K_B, M_P, temperature
from scida_spark.operators import catalog as C


def test_select_zoom_target_union_of_ranges(spark):
    parts = spark.range(0, 1000).select(F.col("id").alias("uid"))
    targets = spark.createDataFrame(
        [(0, 100, 50, 800, 20), (1, 300, 10, 0, 0)],
        "target_id long, offset long, length long, fuzz_offset long, fuzz_length long",
    )
    got = sorted(r.uid for r in C.select_zoom_target(parts, targets, 0).collect())
    assert got == list(range(100, 150)) + list(range(800, 820))
    # fuzz_length=0 → main range only; with_fuzz=False ignores fuzz.
    got1 = sorted(r.uid for r in C.select_zoom_target(parts, targets, 1).collect())
    assert got1 == list(range(300, 310))
    got0 = sorted(
        r.uid for r in C.select_zoom_target(parts, targets, 0, with_fuzz=False).collect()
    )
    assert got0 == list(range(100, 150))
    with pytest.raises(KeyError):
        C.select_zoom_target(parts, targets, 99)


def test_temperature_matches_reference_formula(spark):
    """Golden values from the reference formula evaluated in numpy
    (extra_fields.py:36-66)."""
    xe = np.array([0.0, 0.5, 1.0, 1.2])
    u = np.array([100.0, 1000.0, 5000.0, 1e4])
    mu = 4.0 / (1.0 + 3 * 0.76 + 4 * 0.76 * xe) * M_P
    expect = 1e10 * (5.0 / 3.0 - 1.0) * u / K_B * mu
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xe, u)], "xe double, u double"
    )
    got = [r.t for r in df.select(temperature(F.col("xe"), F.col("u")).alias("t")).collect()]
    assert got == pytest.approx(list(expect), rel=1e-12)


def test_load_metadata_parquet_dir(spark, tmp_path):
    from scida_spark.dataset import Dataset, load_metadata
    from scida_spark.fields import FieldContainer

    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    root = FieldContainer(name="x")
    root["c1"] = FieldContainer(df, name="c1")
    ds = Dataset(path="x", data=root, metadata={"redshift": 2.0})
    out = str(tmp_path / "saved")
    ds.save(out)
    meta = load_metadata(out, spark)
    assert meta["format"] == "parquet_dir"
    assert meta["attrs"]["redshift"] == 2.0
    assert meta["containers"]["c1"]["b"] == "double"


def test_load_metadata_npy_dir(spark, tmp_path):
    from scida_spark.dataset import load_metadata

    sub = tmp_path / "PartType1"
    sub.mkdir()
    np.save(sub / "Masses.npy", np.ones(7))
    meta = load_metadata(str(tmp_path), spark)
    assert meta["containers"]["PartType1"]["nrows"] == 7
    assert meta["containers"]["PartType1"]["Masses"] == "double"


def test_split_vector_field(spark):
    from scida_spark.fields import FieldContainer

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])], "uid long, Coordinates array<double>"
    )
    cont = FieldContainer(df, name="gas")
    names = cont.split_vector_field("Coordinates")
    assert names == ["Coordinates0", "Coordinates1", "Coordinates2"]
    row = cont.df.filter(F.col("uid") == 1).first()
    assert (row.Coordinates0, row.Coordinates1, row.Coordinates2) == (4.0, 5.0, 6.0)
    with pytest.raises(TypeError):
        cont.split_vector_field("uid")
