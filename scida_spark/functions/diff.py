"""Dataset diff — what changed between two versions of a corpus.

The data-ops question every re-crawl / re-ingest raises: which records
were added, which disappeared, which changed content, and where (which
language, source, shard) did the churn concentrate. One FULL OUTER
join on the record id, content compared by digest (so "changed" means
bytes, not object identity), then a facet rollup of the four statuses.

Scale: the join shuffles both sides on the id — co-locate via
bucketing when diffing the same table lineage repeatedly
(operators/layout.py); the digest is computed map-side, so the
shuffled payload is (id, 16-byte digest, facet), never the content.
The summary is one groupBy over the statused rows. Deterministic:
status is a pure function of the two versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def _digest(cols) -> Column:
    # md5 over an INJECTIVE encoding of the content tuple: each column
    # is length-prefixed ("<len>:<value>"), NULL encodes as the bare
    # token "N" (which no length-prefixed value can produce, ":" always
    # follows the digits). Concatenating length-prefixed tokens is
    # injective, so unlike a bare concat_ws (which SKIPS NULLs and
    # cannot tell ('a',NULL,'b') from ('a','b',NULL), or a value
    # containing the separator from the same bytes split across
    # columns), two tuples digest equal iff they are equal.
    # Engine-reproducible: DuckDB twin is
    #   md5(concat(CASE WHEN c IS NULL THEN 'N'
    #              ELSE concat(CAST(length(c) AS VARCHAR), ':', c) END, ...))
    # (both engines count characters in length()).
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("N")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat(*parts))


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols,
    keep_cols=(),
) -> DataFrame:
    """Row-level diff: one row per id present in either version with
    ``status`` in added / removed / changed / unchanged. ``keep_cols``
    (taken from the NEW side when present, else the old) ride along
    for facet rollups."""
    content_cols = list(content_cols)
    keep_cols = list(keep_cols)
    o = old.select(
        F.col(id_col).alias("__id"),
        _digest(content_cols).alias("__ho"),
        *[F.col(c).alias(f"__o_{c}") for c in keep_cols],
    )
    n = new.select(
        F.col(id_col).alias("__idn"),
        _digest(content_cols).alias("__hn"),
        *[F.col(c).alias(f"__n_{c}") for c in keep_cols],
    )
    j = o.join(n, F.col("__id") == F.col("__idn"), "full_outer")
    status = (
        F.when(F.col("__id").isNull(), F.lit("added"))
        .when(F.col("__idn").isNull(), F.lit("removed"))
        .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    sel = [
        F.coalesce(F.col("__id"), F.col("__idn")).alias(id_col),
        status.alias("status"),
    ]
    for c in keep_cols:
        sel.append(F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c))
    return j.select(*sel)


def diff_summary(
    diff: DataFrame, facet_cols=(), id_col: str | None = None
) -> DataFrame:
    """Per-facet churn rollup: (facets..., status, n) — one groupBy.
    ``id_col`` is unused (kept for call-site readability)."""
    return diff.groupBy(*list(facet_cols), "status").agg(
        F.count("*").alias("n")
    )
