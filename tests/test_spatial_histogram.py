"""PBC spatial cutouts and histograms vs numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scida_spark.operators import histogram as H
from scida_spark.operators import spatial as S


@pytest.fixture(scope="module")
def coords_df(spark):
    rng = np.random.RandomState(11)
    pts = rng.uniform(0, 100, size=(500, 3))
    rows = [([float(x) for x in p],) for p in pts]
    return spark.createDataFrame(rows, "Coordinates array<double>"), pts


def _pbc_mask_np(pts, center, widths, box):
    d = np.abs(pts - np.asarray(center))
    d = np.where(d > box / 2, box - d, d)
    return np.all(d < np.asarray(widths) / 2, axis=1)


@pytest.mark.parametrize(
    "center,widths",
    [([50.0, 50.0, 50.0], [20.0, 30.0, 40.0]), ([2.0, 98.0, 50.0], [10.0, 10.0, 90.0])],
)
def test_rect_cutout_pbc(spark, coords_df, center, widths):
    df, pts = coords_df
    got = S.rect_cutout(df, "Coordinates", center, widths, 100.0).count()
    expect = int(_pbc_mask_np(pts, center, widths, 100.0).sum())
    assert got == expect
    # the second center wraps across the boundary — assert wrap actually matters
    naive = int(np.all(np.abs(pts - np.asarray(center)) < np.asarray(widths) / 2, axis=1).sum())
    if center[0] == 2.0:
        assert got > naive


def test_pbc_radial_distance(spark):
    df = spark.createDataFrame([([1.0, 99.0],)], "c array<double>")
    d = df.select(
        S.pbc_radial_distance([F.col("c")[0], F.col("c")[1]], [99.0, 1.0], 100.0).alias("d")
    ).collect()[0]["d"]
    assert d == pytest.approx(np.sqrt(2**2 + 2**2))


def test_histogram1d_matches_numpy(spark):
    rng = np.random.RandomState(3)
    x = rng.uniform(0, 10, 1000)
    df = spark.createDataFrame([(float(v),) for v in x], "x double")
    got = {r["bin"]: r["count"] for r in H.histogram1d(df, "x", 0.0, 10.0, 20).collect()}
    expect, _ = np.histogram(x, bins=20, range=(0.0, 10.0))
    for i, n in enumerate(expect):
        assert got.get(i, 0) == n


def test_histogram2d_matches_numpy(spark):
    rng = np.random.RandomState(5)
    xy = rng.uniform(0, 1, size=(2000, 2))
    df = spark.createDataFrame([(float(a), float(b)) for a, b in xy], "x double, y double")
    got = {
        (r["xbin"], r["ybin"]): r["count"]
        for r in H.histogram2d(df, "x", "y", (0.0, 1.0), (0.0, 1.0), (8, 5)).collect()
    }
    expect, _, _ = np.histogram2d(xy[:, 0], xy[:, 1], bins=(8, 5), range=((0, 1), (0, 1)))
    for i in range(8):
        for j in range(5):
            assert got.get((i, j), 0) == expect[i, j]


def test_histogram_weighted(spark):
    df = spark.createDataFrame([(0.5, 2.0), (0.6, 3.0), (1.5, 5.0)], "x double, w double")
    got = {r["bin"]: r["weight_sum"] for r in H.histogram1d(df, "x", 0.0, 2.0, 2, "w").collect()}
    assert got == {0: 5.0, 1: 5.0}
