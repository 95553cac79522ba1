"""Path resolution (download+extract), sibling-catalog discovery, and
dependency-checked default field registration."""

from __future__ import annotations

import os
import tarfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from scida_spark.dataset import (
    discover_catalog_path,
    register_default_fields,
    resolve_path,
)
from scida_spark.fields import FieldContainer


def test_resolve_local_passthrough(tmp_path):
    assert resolve_path(str(tmp_path)) == str(tmp_path)


def test_resolve_url_download_and_extract(tmp_path):
    # Build a .tar.gz of an npy dataset, serve it via file:// URL.
    src = tmp_path / "snapdata"
    src.mkdir()
    np.save(src / "Masses.npy", np.ones(10))
    archive = tmp_path / "snap.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(src, arcname="snapdata")
    cache = str(tmp_path / "cache")
    url = "file://" + str(archive)
    out = resolve_path(url, cache_dir=cache)
    assert os.path.isfile(os.path.join(out, "Masses.npy"))
    # Second resolve hits the cache (marker short-circuit) — same result.
    again = resolve_path(url, cache_dir=cache)
    assert again == out


def test_discover_catalog_sibling(tmp_path):
    (tmp_path / "snapdir_099").mkdir()
    (tmp_path / "groups_099").mkdir()
    (tmp_path / "groups_042").mkdir()
    got = discover_catalog_path(str(tmp_path / "snapdir_099"))
    assert got == str(tmp_path / "groups_099")  # number-matched sibling wins
    assert discover_catalog_path(str(tmp_path / "snapdir_077")) in (
        str(tmp_path / "groups_042"),  # fallback: first pattern match
        str(tmp_path / "groups_099"),
    )


def test_discover_catalog_none(tmp_path):
    (tmp_path / "snapdir_001").mkdir()
    assert discover_catalog_path(str(tmp_path / "snapdir_001")) is None


def test_register_default_fields_dependency_check(spark):
    with_deps = FieldContainer(
        spark.createDataFrame(
            [(0.5, 1000.0)], "ElectronAbundance double, InternalEnergy double"
        ),
        name="gas",
    )
    assert register_default_fields(with_deps) == ["Temperature"]
    t = with_deps.df.withColumn("T", with_deps["Temperature"]).first()["T"]
    from scida_spark.functions.physics import K_B, M_P

    mu = 4.0 / (1.0 + 3 * 0.76 + 4 * 0.76 * 0.5) * M_P
    assert t == pytest.approx(1e10 * (5.0 / 3.0 - 1.0) * 1000.0 / K_B * mu, rel=1e-12)
    assert with_deps.field_units["Temperature"] == "K"

    without_deps = FieldContainer(
        spark.createDataFrame([(1.0,)], "Masses double"), name="dm"
    )
    assert register_default_fields(without_deps) == []
