"""Streaming data-quality gate: per-batch reports, admit/quarantine
routing, batch-mode agreement, idempotent replay."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("etype", StringType()),
        StructField("v", DoubleType()),
    ]
)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("input", "admit", "quarantine", "reports", "ckpt")
    }
    os.makedirs(d["input"])
    return d


def _checks():
    from scida_spark.functions.expectations import accepted, not_null

    return [not_null("v", 0.9), accepted("etype", ["a", "b"], 1.0)]


def _run(spark, dirs):
    from scida_spark.streaming.gate import gated_ingest

    q = gated_ingest(
        spark,
        dirs["input"],
        SCHEMA,
        checks=_checks(),
        admit_dir=dirs["admit"],
        quarantine_dir=dirs["quarantine"],
        report_dir=dirs["reports"],
        checkpoint_dir=dirs["ckpt"],
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_gate_routes_and_reports(spark, dirs):
    """Wave 1 clean -> admitted; wave 2 with a banned etype ->
    quarantined whole; reports match batch-mode expect_report on each
    wave exactly (same code path, so row-for-row)."""
    from scida_spark.functions.expectations import expect_report
    from scida_spark.streaming.gate import read_reports

    good = [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)]
    bad = [(4, "a", 4.0), (5, "zzz", None)]
    pd.DataFrame(good, columns=["id", "etype", "v"]).to_parquet(
        os.path.join(dirs["input"], "w1.parquet")
    )
    pd.DataFrame(bad, columns=["id", "etype", "v"]).to_parquet(
        os.path.join(dirs["input"], "w2.parquet")
    )
    _run(spark, dirs)

    admitted = spark.read.option("basePath", dirs["admit"]).parquet(dirs["admit"])
    quarantined = spark.read.option("basePath", dirs["quarantine"]).parquet(
        dirs["quarantine"]
    )
    assert sorted(r["id"] for r in admitted.collect()) == [1, 2, 3]
    assert sorted(r["id"] for r in quarantined.collect()) == [4, 5]

    reports = read_reports(spark, dirs["reports"])
    by_batch = {
        (r["batch_id"], r["check"]): r for r in reports.collect()
    }
    assert len(by_batch) == 4  # 2 batches x 2 checks
    # per-batch report equals batch-mode expect_report on that wave
    for rows, bid in ((good, 0), (bad, 1)):
        ref = expect_report(
            spark.createDataFrame(rows, SCHEMA), _checks()
        ).collect()
        for r in ref:
            got = by_batch[(bid, r["check"])]
            assert got["observed"] == r["observed"]
            assert got["passed"] == r["passed"]
            assert got["n"] == r["n"]
    assert by_batch[(0, "not_null:v")]["admitted"] is True
    assert by_batch[(1, "not_null:v")]["admitted"] is False


def test_gate_replay_idempotent(spark, dirs):
    """Re-running the whole pipeline from a fresh checkpoint over the
    same input rewrites identical batch_id partitions (overwrite, not
    append): no duplicate rows, no duplicate report lines."""
    rows = [(1, "a", 1.0), (2, "b", 2.0)]
    pd.DataFrame(rows, columns=["id", "etype", "v"]).to_parquet(
        os.path.join(dirs["input"], "w1.parquet")
    )
    _run(spark, dirs)
    import shutil

    shutil.rmtree(dirs["ckpt"])  # simulate a checkpoint loss -> full replay
    _run(spark, dirs)
    admitted = spark.read.option("basePath", dirs["admit"]).parquet(dirs["admit"])
    assert admitted.count() == 2
    from scida_spark.streaming.gate import read_reports

    assert read_reports(spark, dirs["reports"]).count() == 2  # 1 batch x 2 checks
