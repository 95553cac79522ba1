"""HDF5 source end-to-end through the shim backend: the identical read
kernel, split planning, uid bookkeeping, and multi-file concatenation
that run with h5py — only the imported module differs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scida_spark.sources.hdf5 import (
    load_hdf5_dataset,
    plan_splits,
    read_splits_arrow,
    walk_container,
)

SHIM = "scida_spark.sources.h5_shim"


def _make_snapshot(root, n, seed, with_pt1=True):
    rng = np.random.RandomState(seed)
    pt0 = root / "PartType0"
    pt0.mkdir(parents=True)
    np.save(pt0 / "Masses.npy", rng.uniform(0.1, 2.0, n))
    np.save(pt0 / "Coordinates.npy", rng.uniform(0, 100, (n, 3)))
    if with_pt1:
        pt1 = root / "PartType1"
        pt1.mkdir()
        np.save(pt1 / "Masses.npy", np.full(n // 2, 0.5))
    return root


def test_walk_container_shapes(tmp_path):
    import importlib

    _make_snapshot(tmp_path / "snap", 100, 1)
    shim = importlib.import_module(SHIM)
    with shim.File(str(tmp_path / "snap"), "r") as fh:
        infos = walk_container(fh, "PartType0")
    assert [(i.name, i.rows, i.width, i.dtype) for i in infos] == [
        ("Coordinates", 100, 3, "float64"),
        ("Masses", 100, 1, "float64"),
    ]


def test_single_file_load_values(spark, tmp_path):
    snap = _make_snapshot(tmp_path / "snap", 300, 2)
    ds = load_hdf5_dataset(str(snap), spark, backend=SHIM)
    pt0 = ds["PartType0"].df
    assert pt0.count() == 300
    masses = np.load(snap / "PartType0" / "Masses.npy")
    got = pt0.agg(F.sum("Masses")).first()[0]
    assert got == pytest.approx(float(masses.sum()))
    r = pt0.filter(F.col("uid") == 42).first()
    coords = np.load(snap / "PartType0" / "Coordinates.npy")
    assert list(r.Coordinates) == pytest.approx(list(coords[42]))
    assert ds["PartType1"].df.count() == 150


def test_multi_file_series_concat_uid(spark, tmp_path):
    """prefix.N file series: per-file rows → cumulative offsets →
    global uid (replaces the reference's virtual-HDF5 merge)."""
    series = tmp_path / "series"
    series.mkdir()
    sizes = [120, 80, 50]
    all_masses = []
    for i, n in enumerate(sizes):
        snap = _make_snapshot(series / f"snap.{i}.h5dir", n, 10 + i, with_pt1=False)
        all_masses.append(np.load(snap / "PartType0" / "Masses.npy"))
    ds = load_hdf5_dataset(str(series), spark, backend=SHIM)
    pt0 = ds["PartType0"].df
    rows = pt0.orderBy("uid").collect()
    assert len(rows) == sum(sizes)
    assert [r.uid for r in rows] == list(range(sum(sizes)))
    ref = np.concatenate(all_masses)
    # Spot-check file-boundary rows: last of file 0, first of file 1.
    assert rows[119].Masses == pytest.approx(ref[119])
    assert rows[120].Masses == pytest.approx(ref[120])
    assert rows[249].Masses == pytest.approx(ref[249])


def test_split_count_invariance(spark, tmp_path):
    snap = _make_snapshot(tmp_path / "snap", 200, 5, with_pt1=False)
    a = load_hdf5_dataset(str(snap), spark, rows_per_split=37, backend=SHIM)
    b = load_hdf5_dataset(str(snap), spark, rows_per_split=1000, backend=SHIM)
    da = a["PartType0"].df.select("uid", "Masses")
    db = b["PartType0"].df.select("uid", "Masses")
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0


def test_projection_reads_only_requested(spark, tmp_path):
    import importlib

    snap = _make_snapshot(tmp_path / "snap", 64, 7, with_pt1=False)
    shim = importlib.import_module(SHIM)
    with shim.File(str(snap), "r") as fh:
        infos = walk_container(fh, "PartType0")
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [StructField("uid", LongType(), False), StructField("Masses", DoubleType(), False)]
    )
    splits = plan_splits([(str(snap), 64)], "PartType0", 32)
    df = read_splits_arrow(spark, splits, ["Masses"], schema, backend=SHIM)
    assert df.columns == ["uid", "Masses"]
    assert df.count() == 64


def test_gate_message_without_h5py():
    from scida_spark.sources.hdf5 import HAS_H5PY, _require_backend

    if HAS_H5PY:
        pytest.skip("h5py available")
    with pytest.raises(ImportError, match="h5py"):
        _require_backend()
