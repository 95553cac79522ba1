"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (plus the
pipeline operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible query (others get rows-only checks).

Implementations live in ``scida_spark.queries*`` — this module is the
thin driver-facing facade.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    from scida_spark.queries import registry

    return registry()["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scida_spark.queries import registry

    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    from scida_spark.queries import registry

    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
