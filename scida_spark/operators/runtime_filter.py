"""Semi-join reduction via Catalyst's runtime bloom filters.

The 100 TB fact-fact pattern: a selective predicate on one join side
(e.g. "urgent orders only") should prune the OTHER side's scan before
the shuffle — ship a bloom filter of the selective side's join keys to
the big side's scan, not the big side's rows to the shuffle. Spark's
``InjectRuntimeFilter`` rule does exactly this (an
``Aggregate [bloom_filter_agg(xxhash64(key))]`` subquery feeding a
``might_contain`` predicate on the application side); our job is to
hold the preconditions and pin the plan, not to reimplement it:

* creation side estimated < ``runtime.bloomFilter.creationSideThreshold``
  (10 MB default) after its selective filter;
* application side scan > ``applicationSideScanSizeThreshold``
  (10 GB default — ALREADY met at the scale this matters; lowered
  only in tests, where tables are KB-sized);
* the join is a shuffle join — a broadcast-hash join subsumes the
  bloom filter (the build side IS the filter), so Catalyst correctly
  refuses to inject one.

The filter is applied post-scan (membership on hashed keys), so it
does not replace predicate pushdown — it removes the non-matching
rows before they pay the shuffle write, which is the expensive part.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_APP_THRESHOLD = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"


@contextmanager
def runtime_bloom_for_tests(spark: SparkSession, app_side_min_bytes: int = 0):
    """Temporarily lower the application-side size gate so KB-scale
    test tables exercise the same InjectRuntimeFilter path a 100 TB
    scan takes by default. Production code should NOT call this — the
    default 10 GB gate is the right guard against paying a bloom
    build for a scan too small to care."""
    old_app = spark.conf.get(_APP_THRESHOLD)
    old_en = spark.conf.get(_ENABLED)
    spark.conf.set(_APP_THRESHOLD, str(int(app_side_min_bytes)))
    spark.conf.set(_ENABLED, "true")
    try:
        yield
    finally:
        spark.conf.set(_APP_THRESHOLD, old_app)
        spark.conf.set(_ENABLED, old_en)


def has_runtime_bloom(df) -> bool:
    """True if Catalyst injected a bloom-filter runtime filter into
    this DataFrame's optimized plan."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "bloom_filter_agg" in plan
