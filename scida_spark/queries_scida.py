"""Scida-semantics queries: uid / offsets / catalog-ID machinery exercised
over the driver's relational tables, each with a DuckDB oracle.

Mapping used throughout: ``lineitem`` rows = particles (ordered by
(l_orderkey, l_linenumber) → uid), ``orders`` = halo catalog (GroupLen =
number of lineitems). The real engine kernels from
``scida_spark.operators`` run on the Spark side; the oracle recomputes
the *semantics* (window functions / range logic) in ANSI SQL — so a
hash match validates the kernels, not a reimplementation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scida_spark.operators import catalog as C
from scida_spark.operators import histogram as H
from scida_spark.operators import spatial as S
from scida_spark.operators.uid import with_uid_by_order
from scida_spark.queries import DEC, dsum, query
from scida_spark.queries_pipeline import _memo_slot
from scida_spark.tables import table
from scida_spark.session import local_df

SENT = C.SENTINEL
GROUP_CUTOFF = 1000  # orders with key < cutoff are "halos"; the rest is the unbound tail


def _particles(spark, sf_dir):
    """lineitem with uid in (l_orderkey, l_linenumber) order.

    Deliberately NOT cached: a .cache() here materializes all 12
    lineitem columns and defeats parquet column pruning for every
    downstream query (measured 3-8x slower). In the real engine uid
    comes free from ingest split bookkeeping (sources/*); recomputing
    the two-phase ordering per query keeps each plan's scan minimal.
    """
    li = table(spark, sf_dir, "lineitem")
    # key = l_orderkey, tie-break within key = l_linenumber. The bucket
    # width keeps phase 1 parallel once distinct orderkeys outgrow one
    # task (×100 set: 15M keys — see SCALE.md); at driver SFs it only
    # adds a few-row bucket table.
    return with_uid_by_order(
        li, "l_orderkey", "l_linenumber", key_bucket_width=8192
    )


def _group_catalog(spark, sf_dir):
    """orders (< cutoff) as halo catalog with GroupLen = lineitem count.

    Left join keeps zero-length halos (orders with no lineitems) —
    searchsorted(side='right') skips them correctly.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < GROUP_CUTOFF)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < GROUP_CUTOFF)
    counts = li.groupBy("l_orderkey").agg(F.count("*").alias("GroupLen"))
    return (
        o.select(F.col("o_orderkey").alias("GroupID"))
        .join(counts, F.col("GroupID") == F.col("l_orderkey"), "left")
        .select("GroupID", F.coalesce("GroupLen", F.lit(0)).cast("long").alias("GroupLen"))
    )


@query(
    "scida_offsets_cumsum",
    f"""
    WITH counts AS (
      SELECT o.o_orderkey AS group_id,
             CAST(COALESCE(COUNT(l.l_orderkey), 0) AS BIGINT) AS group_len
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey < {GROUP_CUTOFF}
      GROUP BY o.o_orderkey)
    SELECT group_id, group_len,
           CAST(COALESCE(SUM(group_len) OVER (ORDER BY group_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset
    FROM counts
    """,
)
def scida_offsets_cumsum(spark, sf_dir):
    """GroupOffsets = concat([0], cumsum(GroupLen))[:-1] — the reference's
    offsets primitive (arepo/dataset.py:342-352) via window prefix-sum."""
    cat = _group_catalog(spark, sf_dir)
    return C.group_offsets(cat, "GroupLen", "GroupID").select(
        F.col("GroupID").alias("group_id"),
        F.col("GroupLen").alias("group_len"),
        F.col("offset"),
    )


_GROUPID_ORACLE = f"""
    WITH li AS (
      SELECT l_orderkey,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS uid
      FROM lineitem)
    SELECT CAST(uid AS BIGINT) AS uid,
           CAST(CASE WHEN l_orderkey < {GROUP_CUTOFF} THEN l_orderkey
                     ELSE 9223372036854775807 END AS BIGINT) AS group_id
    FROM li
    """


def scida_groupid_searchsorted(spark, sf_dir):
    """Particle→halo ID via broadcast-searchsorted Pandas UDF — the Spark
    form of the reference's ``get_hidx`` kernel (arepo/dataset.py:
    1064-1103); unbound tail → int64-max sentinel (:323-324).

    Scale: the big side maps once over a broadcast boundary array — no
    shuffle of particles at all.
    """
    parts = _particles(spark, sf_dir)
    cat = _group_catalog(spark, sf_dir)
    out = C.add_group_ids(parts, cat, length_col="GroupLen", group_order_col="GroupID")
    return out.select("uid", F.col("GroupID").alias("group_id"))


def scida_groupid_rangejoin(spark, sf_dir):
    """Same assignment as a range join (uid ∈ [offset, offset+len)) —
    the fallback when the catalog exceeds broadcast size (SURVEY §2.4)."""
    parts = _particles(spark, sf_dir)
    cat = C.group_offsets(_group_catalog(spark, sf_dir), "GroupLen", "GroupID")
    out = C.add_group_ids_rangejoin(parts, cat, length_col="GroupLen")
    return out.select("uid", F.col("GroupID").alias("group_id"))


@query(
    "scida_groupid_assign",
    f"""
    WITH li AS (
      SELECT l_orderkey,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS uid
      FROM lineitem),
    ids AS (
      SELECT CAST(uid AS BIGINT) AS uid,
             CAST(CASE WHEN l_orderkey < {GROUP_CUTOFF} THEN l_orderkey
                       ELSE 9223372036854775807 END AS BIGINT) AS group_id
      FROM li)
    SELECT 'searchsorted' AS method, uid, group_id FROM ids
    UNION ALL
    SELECT 'rangejoin' AS method, uid, group_id FROM ids
    """,
)
# r16 (closes the r15 ADVICE item): fingerprint BOTH inputs — the
# memoized plan embeds a driver-collected boundary array and a bucket
# width derived from orders via _group_catalog, so regenerating orders
# without touching lineitem must invalidate the memo too.
@_memo_slot("lineitem", "orders")
def scida_groupid_assign(spark, sf_dir):
    """BOTH particle→halo assignment paths in one driver-attested result
    (merged r6 slots scida_groupid_searchsorted + scida_groupid_rangejoin,
    distinguished by ``method`` — consolidation keeps the registry inside
    the driver's 50-query correctness window): the broadcast-searchsorted
    kernel (the default while the catalog fits a broadcast array) and the
    range-join fallback (uid ∈ [offset, offset+len), for catalogs past
    broadcast size). The oracle emits the window-SQL ground truth once
    per method, so a hash match proves the two physical strategies agree
    row-for-row with the semantics AND each other."""
    a = scida_groupid_searchsorted(spark, sf_dir).select(
        F.lit("searchsorted").alias("method"), "uid", "group_id"
    )
    b = scida_groupid_rangejoin(spark, sf_dir).select(
        F.lit("rangejoin").alias("method"), "uid", "group_id"
    )
    return a.unionAll(b)


@query(
    "scida_subhalo_ids",
    f"""
    WITH li AS (
      SELECT l_orderkey,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS uid,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS r,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n
      FROM lineitem WHERE l_orderkey < {GROUP_CUTOFF}),
    g AS (
      SELECT l_orderkey, COUNT(*) AS n,
             CASE WHEN COUNT(*) > 1 THEN 2 ELSE 1 END AS nsubs
      FROM lineitem WHERE l_orderkey < {GROUP_CUTOFF} GROUP BY l_orderkey),
    g2 AS (
      SELECT l_orderkey, nsubs,
             COALESCE(SUM(nsubs) OVER (ORDER BY l_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS firstsub
      FROM g),
    bound AS (
      SELECT li.uid,
             CAST(CASE WHEN li.r < CEIL(li.n / 2.0) THEN 0 ELSE 1 END AS BIGINT)
               AS local_subhalo_id,
             CAST(g2.firstsub + CASE WHEN li.r < CEIL(li.n / 2.0) THEN 0 ELSE 1 END AS BIGINT)
               AS subhalo_id
      FROM li JOIN g2 USING (l_orderkey)),
    tail AS (
      SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1
               + (SELECT COUNT(*) FROM lineitem WHERE l_orderkey < {GROUP_CUTOFF}) AS uid,
             CAST(9223372036854775807 AS BIGINT) AS local_subhalo_id,
             CAST(9223372036854775807 AS BIGINT) AS subhalo_id
      FROM lineitem WHERE l_orderkey >= {GROUP_CUTOFF})
    SELECT CAST(uid AS BIGINT) AS uid, local_subhalo_id, subhalo_id FROM bound
    UNION ALL SELECT CAST(uid AS BIGINT), local_subhalo_id, subhalo_id FROM tail
    """,
)
def scida_subhalo_ids(spark, sf_dir):
    """LocalSubhaloID/SubhaloID via the nested searchsorted kernel
    (reference ``get_localshidx`` arepo/dataset.py:1164-1258 and
    SubhaloID = GroupFirstSub + local, :445-449).

    Synthetic subhalo structure: each order (halo) splits its lineitems
    into subhalo 0 = first ceil(n/2) rows, subhalo 1 = rest (orders with
    one item have a single subhalo). The oracle recomputes this with
    window SQL; the Spark side builds the catalog and runs the kernel.
    """
    parts = _particles(spark, sf_dir)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < GROUP_CUTOFF)
    counts = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < GROUP_CUTOFF)
        .join(counts, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            F.col("o_orderkey").alias("GroupID"),
            F.coalesce("n", F.lit(0)).cast("long").alias("GroupLen"),
            F.when(F.coalesce("n", F.lit(0)) > 1, 2)
            .when(F.coalesce("n", F.lit(0)) == 1, 1)
            .otherwise(0)
            .cast("long")
            .alias("GroupNsubs"),
        )
    )
    # GroupFirstSub = exclusive prefix of GroupNsubs over GroupID —
    # exactly the group_offsets computation, so it inherits the r15
    # two-phase auto-switch (no single-task window past 1e7 groups)
    groups = C.group_offsets(
        o, "GroupNsubs", "GroupID", offset_col="GroupFirstSub"
    )
    # The catalog derives from a join + global window; checkpoint it so
    # the auto dispatcher's size probe and the kernel's catalog reads
    # share ONE materialization instead of re-running the pipeline.
    groups = groups.localCheckpoint(eager=True)
    # Subhalo catalog: lengths [ceil(n/2), floor(n/2)] per halo with n>0.
    sub0 = groups.filter(F.col("GroupLen") > 0).select(
        F.col("GroupFirstSub").alias("SubhaloID"),
        F.ceil(F.col("GroupLen") / 2.0).cast("long").alias("SubhaloLen"),
    )
    sub1 = groups.filter(F.col("GroupLen") > 1).select(
        (F.col("GroupFirstSub") + 1).alias("SubhaloID"),
        F.floor(F.col("GroupLen") / 2.0).cast("long").alias("SubhaloLen"),
    )
    subs = sub0.unionAll(sub1)
    out = C.add_subhalo_ids_auto(
        parts,
        groups,
        subs,
        group_length_col="GroupLen",
        group_order_col="GroupID",
        group_firstsub_col="GroupFirstSub",
        group_nsubs_col="GroupNsubs",
        sub_length_col="SubhaloLen",
        sub_order_col="SubhaloID",
    )
    return out.select(
        "uid",
        F.col("LocalSubhaloID").alias("local_subhalo_id"),
        F.col("SubhaloID").alias("subhalo_id"),
    )


@query(
    "scida_group_quantity_broadcast",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_group_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_returnflag
    """,
)
def scida_group_quantity_broadcast(spark, sf_dir):
    """Per-particle copy of a halo attribute — the reference's
    ``add_groupquantity_to_particles`` (arepo/dataset.py:519-553) as a
    broadcast equi-join, then an aggregate consuming the copied column."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("GroupID"), "o_totalprice"
    )
    parts = li.withColumn("GroupID", F.col("l_orderkey"))
    out = C.add_group_quantity(parts, o, ["o_totalprice"])
    return out.groupBy("l_returnflag").agg(
        dsum(F.col("o_totalprice"), "sum_group_price"), F.count("*").alias("n")
    )


def scida_grouped_apply(spark, sf_dir):
    """Arbitrary per-group pandas function — the reference's
    ``map_group_operation`` (arepo/dataset.py:1448-1674) — executed as
    ``segmented_apply``: group-loop-within-block over key-repartitioned
    sorted data (the reference's own execution shape,
    ``wrap_func_scalar`` :1019-1061). Measured 4x faster than
    per-group applyInPandas on many-tiny-groups input; the fluent
    ``grouped().apply().evaluate()`` chain remains available."""
    import pandas as pd

    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 2000)
        .withColumn("GroupID", F.col("l_orderkey"))
    )

    def price_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "GroupID": [pdf["GroupID"].iloc[0]],
                "n": [len(pdf)],
                "price_range": [pdf["l_extendedprice"].max() - pdf["l_extendedprice"].min()],
            }
        )

    return C.segmented_apply(
        li.select("GroupID", "l_extendedprice"),
        "GroupID",
        price_stats,
        schema="GroupID long, n long, price_range double",
    )


@query(
    "scida_selector_uid_range",
    """
    WITH li AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS uid
      FROM lineitem)
    SELECT CAST(uid AS BIGINT) AS uid, l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM li WHERE uid >= 1000 AND uid < 1200
    """,
)
def scida_selector_uid_range(spark, sf_dir):
    """Positional slice ``field[offset:offset+length]`` — the selector
    primitive (reference interface.py:421-503) as a uid-range filter.

    Runs through ``uid_range_filter``'s offset-table pruning: only keys
    whose uid span overlaps [1000, 1200) are ranked, so the selector
    costs one counts aggregate + a broadcast-pruned scan instead of
    ranking the corpus (the on-the-fly analog of the sources' uid-
    pushdown split pruning). Same rows and uid values as filtering
    ``_particles`` — the oracle pins it."""
    from scida_spark.operators.uid import uid_range_filter

    li = table(spark, sf_dir, "lineitem")
    out = uid_range_filter(
        li,
        "l_orderkey",
        "l_linenumber",
        ranges=[(1000, 1200)],
        key_bucket_width=8192,
    )
    return out.select(
        "uid", "l_orderkey", "l_linenumber", F.col("l_quantity").cast("double").alias("l_quantity")
    )


def scida_pbc_cutout(spark, sf_dir):
    """Rectangular cutout with periodic-boundary wrap (reference
    src/scida/misc.py:181-231): |x-c| folded at box/2. Coordinates are
    synthesized deterministically from lineitem columns; the filter is
    pure Column arithmetic → whole-stage codegen, pushdown-friendly.

    Registry slot retired in r7 in favor of ``scida_pbc_cutout_pruned``
    (identical oracle — the pruned layout variant is the 100 TB path and
    its hash match subsumes this full scan); kept as the full-scan
    comparison baseline for tests/test_spatial_layout.py."""
    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        (F.col("l_extendedprice") % 100.0).alias("x"),
        ((F.col("l_quantity") * 7.0) % 100.0).alias("y"),
    )
    mask = S.box_mask([F.col("x"), F.col("y")], [10.0, 50.0], [30.0, 40.0], 100.0)
    return pts.filter(mask).agg(
        F.count("*").alias("n_inside"), dsum(F.col("x"), "sum_x"), dsum(F.col("y"), "sum_y")
    )


_PBC_ORACLE = """
    WITH pts AS (
      SELECT l_orderkey,
             fmod(l_extendedprice, 100.0) AS x,
             fmod(l_quantity * 7.0, 100.0) AS y
      FROM lineitem),
    d AS (
      SELECT l_orderkey, x, y,
             CASE WHEN ABS(x - 10.0) > 50.0 THEN 100.0 - ABS(x - 10.0) ELSE ABS(x - 10.0) END AS dx,
             CASE WHEN ABS(y - 50.0) > 50.0 THEN 100.0 - ABS(y - 50.0) ELSE ABS(y - 50.0) END AS dy
      FROM pts)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_inside,
           CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sum_x,
           CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sum_y
    FROM d WHERE dx < 15.0 AND dy < 20.0
    """


def _spatial_partitioned_pts(spark, sf_dir, ncells=10):
    """Cell-partitioned copy of the synthetic (x, y) point table, built
    once per (sf_dir, source-mtime) and reused — the ingest-time layout
    a spatial workload would pay for once (save_spatial_partitioned).
    The cache key includes the source parquet's mtime so a regenerated
    testdata dir invalidates the copy instead of serving stale cells.
    """
    import hashlib
    import os
    import tempfile

    src = f"{sf_dir.rstrip('/')}/lineitem.parquet"
    try:
        mtime = int(os.stat(src).st_mtime)
    except OSError:
        mtime = 0
    key = f"{os.path.abspath(sf_dir)}|{mtime}|{ncells}"
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"scida_spark_cells_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = table(spark, sf_dir, "lineitem")
        pts = li.select(
            "l_orderkey",
            (F.col("l_extendedprice") % 100.0).alias("x"),
            ((F.col("l_quantity") * 7.0) % 100.0).alias("y"),
        )
        S.save_spatial_partitioned(pts, ["x", "y"], 100.0, ncells, path)
    return path


@query(
    "scida_grouped_bucketed",
    """
    SELECT CAST(l_orderkey AS BIGINT) AS groupid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_linenumber) AS BIGINT) AS min_line,
           CAST(ANY_VALUE(o.o_totalprice) AS DOUBLE) AS order_total
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l_orderkey
    """,
)
def scida_grouped_bucketed(spark, sf_dir):
    """Per-group aggregation AND fact-fact join over the BUCKETED
    ingest layout (operators/layout.py::save_bucketed — the Spark form
    of the reference's contiguous-by-halo file layout): lineitem and
    orders are each written once clustered by orderkey, after which
    BOTH the groupBy and the lineitem⋈orders join run with NO shuffle
    exchange (bucketing metadata proves co-location to the planner;
    plan-pinned in tests/test_layout.py, including with broadcast
    disabled so the zero-exchange sort-merge path itself is attested).
    The oracle recomputes the same agg+join from the unbucketed tables,
    so the hash match proves the layout path loses nothing. Write cost
    is paid once at ingest and amortized over every later group
    operation or co-keyed join — the 100 TB posture for catalog-keyed
    analytics, where the orders-side shuffle of a repeated fact-fact
    join is the dominant avoidable cost."""
    from scida_spark.operators.layout import read_bucketed

    ltbl = _bucketed_cached(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity"],
        "l_orderkey", ["l_orderkey", "l_linenumber"],
    )
    otbl = _bucketed_cached(
        spark, sf_dir, "orders", ["o_orderkey", "o_totalprice"],
        "o_orderkey", ["o_orderkey"],
    )
    b = read_bucketed(spark, ltbl)
    agg = b.groupBy(F.col("l_orderkey").alias("groupid")).agg(
        F.count("*").alias("n"),
        dsum(F.col("l_quantity"), "sum_qty"),
        F.min("l_linenumber").alias("min_line"),
    )
    o = read_bucketed(spark, otbl)
    return agg.join(
        o, agg["groupid"] == o["o_orderkey"], "inner"
    ).select(
        "groupid", "n", "sum_qty", "min_line",
        F.col("o_totalprice").cast("double").alias("order_total"),
    )


def _bucketed_cached(
    spark, sf_dir: str, name: str, cols: list, bucket_col: str, sort_cols: list,
    num_buckets: int = 16,
) -> str:
    """Build (or reuse) a saveAsTable bucketed copy of ``name`` keyed by
    source path+mtime, returning the table name. A fresh session doesn't
    know tables a previous one wrote, but the warehouse directory
    persists — stale locations are cleared and rebuilt (it's a derived
    cache; rebuilding is the correct recovery)."""
    import hashlib
    import os

    from scida_spark.operators.layout import save_bucketed

    src = f"{sf_dir.rstrip('/')}/{name}.parquet"
    try:
        mtime = int(os.stat(src).st_mtime)
    except OSError:
        mtime = 0
    tag = hashlib.md5(f"{os.path.abspath(sf_dir)}|{mtime}".encode()).hexdigest()[:10]
    tbl = f"{name}_bucketed_{tag}"
    if not spark.catalog.tableExists(tbl):
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
        loc = os.path.join(wh.path or wh.netloc or "spark-warehouse", tbl)
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
        df = table(spark, sf_dir, name).select(*cols)
        save_bucketed(df, tbl, bucket_col, num_buckets=num_buckets,
                      sort_cols=sort_cols)
    return tbl


def scida_pbc_cutout_pruned(spark, sf_dir):
    """The same PBC cutout as ``scida_pbc_cutout``, but over the
    cell-partitioned layout via ``rect_cutout_pruned`` — the predicate
    on the cell columns becomes ``PartitionFilters`` so non-overlapping
    cells are never read (plan-pinned in tests/test_plans.py). The
    oracle SQL is identical to the full-scan query's: a hash match
    proves partition pruning loses no rows.
    """
    path = _spatial_partitioned_pts(spark, sf_dir)
    cut = S.rect_cutout_pruned(
        spark, path, ["x", "y"], [10.0, 50.0], [30.0, 40.0], 100.0, 10
    )
    return cut.agg(
        F.count("*").alias("n_inside"), dsum(F.col("x"), "sum_x"), dsum(F.col("y"), "sum_y")
    )


def _spatial_zordered_pts(spark, sf_dir, ncells=10):
    """Z-ordered cell-partitioned copy of the synthetic point table
    (``save_spatial_partitioned_zordered``), built once per
    (sf_dir, source-mtime) like ``_spatial_partitioned_pts``."""
    import hashlib
    import os
    import tempfile

    src = f"{sf_dir.rstrip('/')}/lineitem.parquet"
    try:
        mtime = int(os.stat(src).st_mtime)
    except OSError:
        mtime = 0
    key = f"{os.path.abspath(sf_dir)}|{mtime}|{ncells}|z"
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"scida_spark_zcells_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = table(spark, sf_dir, "lineitem")
        pts = li.select(
            "l_orderkey",
            (F.col("l_extendedprice") % 100.0).alias("x"),
            ((F.col("l_quantity") * 7.0) % 100.0).alias("y"),
        )
        S.save_spatial_partitioned_zordered(pts, ["x", "y"], 100.0, ncells, path)
    return path


def scida_zorder_cutout(spark, sf_dir):
    """The PBC cutout over the Z-ORDERED cell-partitioned layout
    (``save_spatial_partitioned_zordered``): directory-level partition
    pruning from the coarse cells PLUS within-file Morton clustering so
    the coordinate predicates skip parquet row groups via min/max stats
    — the second tier of the spatial layout story. Within-file monotone
    Morton order is separately pinned in tests/test_spatial_layout.py."""
    path = _spatial_zordered_pts(spark, sf_dir)
    cut = S.rect_cutout_pruned(
        spark, path, ["x", "y"], [10.0, 50.0], [30.0, 40.0], 100.0, 10
    )
    return cut.agg(
        F.count("*").alias("n_inside"), dsum(F.col("x"), "sum_x"), dsum(F.col("y"), "sum_y")
    )


_PBC_LAYOUT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{layout}' AS layout, n_inside, sum_x, sum_y FROM ({_PBC_ORACLE})"
    for layout in ("cells", "zorder")
)


@query("scida_pbc_cutout_layouts", _PBC_LAYOUT_ORACLE)
def scida_pbc_cutout_layouts(spark, sf_dir):
    """The PBC cutout over BOTH ingest-time spatial layouts in one
    driver-attested result (merged r7 slots scida_pbc_cutout_pruned +
    scida_zorder_cutout, distinguished by ``layout`` — they share the
    full-scan oracle, so one row set certifies both):

    * ``cells``: cell-partitioned layout — the cutout box becomes
      ``PartitionFilters`` on the cell directories (plan-pinned in
      tests/test_plans.py via the pruned half).
    * ``zorder``: the same cells with within-file Morton clustering —
      row-group min/max skipping on the coordinates inside each
      surviving cell (monotone order pinned in
      tests/test_spatial_layout.py).

    The oracle recomputes the cutout from the UNPARTITIONED table once
    per layout label, so a hash match proves neither layout transform
    (partitioned write resp. repartition + Morton sort + write) loses
    or duplicates rows."""
    cells = scida_pbc_cutout_pruned(spark, sf_dir).select(
        F.lit("cells").alias("layout"), "n_inside", "sum_x", "sum_y"
    )
    zorder = scida_zorder_cutout(spark, sf_dir).select(
        F.lit("zorder").alias("layout"), "n_inside", "sum_x", "sum_y"
    )
    return cells.unionAll(zorder)


@query(
    "scida_histograms",
    """
    SELECT '2d' AS kind,
           CAST(CASE WHEN value = 100.0 THEN 19 ELSE FLOOR((value - 0.0) / 5.0) END AS BIGINT) AS xbin,
           CAST(CASE WHEN user_id = 150 THEN 14 ELSE FLOOR((user_id - 0.0) / 10.0) END AS BIGINT) AS ybin,
           CAST(COUNT(*) AS BIGINT) AS count,
           CAST(0.0 AS DOUBLE) AS weight_sum
    FROM events
    WHERE value >= 0.0 AND value <= 100.0 AND user_id >= 0 AND user_id <= 150
    GROUP BY 2, 3
    UNION ALL
    SELECT '1d' AS kind,
           CAST(CASE WHEN value = 100 THEN 19 ELSE FLOOR(value / 5.0) END AS BIGINT) AS xbin,
           CAST(-1 AS BIGINT) AS ybin,
           CAST(COUNT(*) AS BIGINT) AS count,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS weight_sum
    FROM events WHERE value >= 0 AND value <= 100
    GROUP BY 2
    """,
)
def scida_histograms(spark, sf_dir):
    """Histogram operators in one driver-attested result (merged r6
    slots scida_histogram2d + scida_histogram1d_weighted, distinguished
    by ``kind`` — registry consolidation for the driver's 50-query
    correctness window):

    * ``2d``: 2-D histogram (reference da.histogram2d usage,
      docs/visualization.md:41-55) — bucketed groupBy, numpy edge
      rules; weight_sum = 0.0 pad.
    * ``1d``: weighted 1-D histogram (reference da.histogram with
      weights, docs/tutorial/observations.md:120-141) — ybin = -1 pad;
      numpy edge convention: value == hi lands in the last bin.
    """
    ev = table(spark, sf_dir, "events")
    h2 = H.histogram2d(
        ev, "value", "user_id", (0.0, 100.0), (0.0, 150.0), (20, 15)
    ).select(
        F.lit("2d").alias("kind"),
        "xbin",
        "ybin",
        F.col("count"),
        F.lit(0.0).alias("weight_sum"),
    )
    h1 = H.histogram1d(
        ev.withColumn("value_dec", F.col("value").cast(DEC)),
        "value", 0.0, 100.0, 20, weight_col="value_dec",
    ).select(
        F.lit("1d").alias("kind"),
        F.col("bin").alias("xbin"),
        F.lit(-1).cast("bigint").alias("ybin"),
        F.col("count"),
        F.col("weight_sum").cast("double").alias("weight_sum"),
    )
    return h2.unionAll(h1)


def _code_mass_to_msun() -> float:
    """The exact double the unit layer produces for code_mass → Msun
    (1e10/h through the curated YAML's scale chain) — computed once at
    import so the oracle SQL embeds the bit-identical literal."""
    from scida_spark.config import apply_unitfile
    from scida_spark.units import UnitRegistry

    ureg = UnitRegistry()
    ureg.define("h", 0.6774)
    ureg.define("a", 1.0)
    apply_unitfile(ureg, "units/gadget_cosmological.yaml")
    return ureg["code_mass"].conversion_factor(ureg["Msun"])


_MSUN_FACTOR = _code_mass_to_msun()


@query(
    "scida_sum_masses",
    f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total_mass,
           CAST(SUM(CAST(l_quantity * {_MSUN_FACTOR!r} / 1e10 AS DECIMAL(38,6))) AS DOUBLE)
             AS total_mass_1e10msun,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    """,
)
def scida_sum_masses(spark, sf_dir):
    """The reference's flagship demo: one-column scan-reduce
    (``Masses.sum()``, docs/largedatasets.md:36-46; 1e10 rows / 80 GB),
    PLUS the curated-unit conversion folded into the same scan (merged
    r6 slot scida_units_mass — registry consolidation for the driver's
    50-query correctness window): l_quantity as Masses in ``code_mass``
    (units/gadget_cosmological.yaml, h = 0.6774 — reference
    mixins/units.py:122-203) converted via ``UnitColumn.to("Msun")``,
    the multiply-by-exact-factor path (docs/units.md:69-80). The oracle
    embeds the factor the unit layer computed, so a hash match proves
    the YAML parse → registry → conversion_factor chain end-to-end.

    Totals reported in 1e10 Msun: at Msun scale (~1e12) a
    DECIMAL(38,6) cast needs >17 significant digits where Spark and
    DuckDB legitimately differ in the last ulp; scaling keeps the
    decimal inside the exact-agreement range of IEEE doubles.

    Scale: parquet column pruning reads only the two columns; the unit
    conversion is one Column multiply inside whole-stage codegen —
    units never touch Catalyst. Plan pinned scan-plus-agg-only in
    tests/test_plans.py."""
    from scida_spark.config import apply_unitfile
    from scida_spark.units import UnitColumn, UnitRegistry

    ureg = UnitRegistry()
    ureg.define("h", 0.6774)
    ureg.define("a", 1.0)
    apply_unitfile(ureg, "units/gadget_cosmological.yaml")
    li = table(spark, sf_dir, "lineitem")
    mass_msun = UnitColumn(F.col("l_quantity"), ureg["code_mass"], ureg).to("Msun")
    m_1e10 = mass_msun.magnitude / F.lit(1e10)
    return li.agg(
        dsum(F.col("l_extendedprice"), "total_mass"),
        dsum(m_1e10, "total_mass_1e10msun"),
        F.count("*").alias("n"),
    )


@query(
    "scida_radial_profile",
    """
    SELECT l_returnflag,
           CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS rbin,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             / NULLIF(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 0.0)
             AS weighted_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1, 2
    """,
)
def scida_radial_profile(spark, sf_dir):
    """Per-group binned statistic — the reference's per-halo radial
    profile pattern (docs/halocatalogs.md:113-168): groupBy(key, bin)
    with a weighted mean; one shuffle, map-side partials."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            "l_returnflag", F.floor(F.col("l_quantity") / 10.0).cast("bigint").alias("rbin")
        )
        .agg(
            (
                F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC)).cast("double")
                / F.nullif(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), F.lit(0.0))
            ).alias("weighted_price"),
            F.count("*").alias("n"),
        )
    )


@query(
    "scida_zoom_selector",
    """
    WITH li AS (
      SELECT l_quantity,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS uid
      FROM lineitem)
    SELECT CAST(uid AS BIGINT) AS uid, CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM li WHERE (uid >= 100 AND uid < 300) OR (uid >= 1000 AND uid < 1100)
    """,
)
def scida_zoom_selector(spark, sf_dir):
    """Zoom-target selection (TNG-Cluster): main uid range ∪ fuzz range
    (reference TNGcluster/dataset.py:82-112). The recipe-rewrite
    machinery of the reference (:114-170) is unnecessary — Catalyst
    pushes the uid predicates through any derived column, and the
    custom sources prune non-overlapping splits."""
    li = table(spark, sf_dir, "lineitem")
    targets = local_df(spark, 
        [(0, 100, 200, 1000, 100)],
        "target_id long, offset long, length long, fuzz_offset long, fuzz_length long",
    )
    # Pruned form: the target's main ∪ fuzz windows become offset-table
    # key predicates (uid_range_filter) — the corpus is never ranked.
    out = C.select_zoom_target_pruned(
        li, targets, 0, "l_orderkey", "l_linenumber", key_bucket_width=8192
    )
    return out.select("uid", F.col("l_quantity").cast("double").alias("l_quantity"))


# Constants formatted through Python repr so both engines parse the
# bit-identical double (e.g. 3*0.76 = 2.2800000000000002, not 2.28).
_T_XH3 = repr(3.0 * 0.76)
_T_XH4 = repr(4.0 * 0.76)
_T_GM1 = repr(5.0 / 3.0 - 1.0)

@query(
    "scida_temperature_field",
    f"""
    WITH g AS (
      SELECT event_id, value / 330.0 AS xe, (value + 1.0) * 100.0 AS u
      FROM events WHERE event_id < 2000)
    SELECT CAST(event_id AS BIGINT) AS event_id,
           ROUND(1e10 * {_T_GM1} * u / 1.380650e-16 *
             (4.0 / (1.0 + {_T_XH3} + {_T_XH4} * xe) * 1.672622e-24), 4) AS temperature
    FROM g
    """,
)
def scida_temperature_field(spark, sf_dir):
    """The reference's bundled Temperature derived field
    (extra_fields.py:36-66) as pure Column arithmetic — no UDF, stays in
    whole-stage codegen. Inputs are synthesized from the events table
    (xe = value/330 ∈ [0,1], u = (value+1)*100); the oracle evaluates
    the identical expression tree, so doubles match bit-for-bit."""
    from scida_spark.functions.physics import temperature

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    xe = (F.col("value") / F.lit(330.0)).alias("xe")
    u = ((F.col("value") + F.lit(1.0)) * F.lit(100.0)).alias("u")
    g = ev.select("event_id", xe, u)
    # Engines constant-fold the literal products differently (1-2 ULP);
    # round well above ULP but far below physical precision.
    return g.select(
        "event_id",
        F.round(temperature(F.col("xe"), F.col("u")), 4).alias("temperature"),
    )


def scida_grouped_fluent(spark, sf_dir):
    """The fluent segmented-aggregation chain:
    ``grouped(df, fields).sum().min().max().evaluate(nmax=500)`` —
    reference GroupAwareOperation (arepo/dataset.py:826-1016) with the
    nmax first-n-groups filter (:1499-1527). Compiles to ONE
    groupBy().agg() — chained reductions share a single shuffle with
    map-side combine (merged r1 queries scida_grouped_agg +
    scida_grouped_fluent into one registry slot: same API, same plan
    shape)."""
    li = table(spark, sf_dir, "lineitem").withColumn("GroupID", F.col("l_orderkey"))
    out = (
        C.grouped(li, ["l_quantity"])
        .sum()
        .min()
        .max()
        .evaluate(nmax=500)
    )
    return out.select(
        F.col("GroupID").cast("bigint").alias("GroupID"),
        F.col("sum_l_quantity").cast("double").alias("sum_l_quantity"),
        F.col("min_l_quantity").cast("double").alias("min_l_quantity"),
        F.col("max_l_quantity").cast("double").alias("max_l_quantity"),
    )


@query(
    "scida_grouped",
    f"""
    SELECT 'fluent' AS variant, CAST(l_orderkey AS BIGINT) AS GroupID,
           CAST(SUM(l_quantity) AS DOUBLE) AS agg1,
           CAST(MIN(l_quantity) AS DOUBLE) AS agg2,
           CAST(MAX(l_quantity) AS DOUBLE) AS agg3
    FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey
    UNION ALL
    SELECT 'apply' AS variant, CAST(l_orderkey AS BIGINT) AS GroupID,
           CAST(COUNT(*) AS DOUBLE) AS agg1,
           CAST(MAX(l_extendedprice) - MIN(l_extendedprice) AS DOUBLE) AS agg2,
           CAST(0.0 AS DOUBLE) AS agg3
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_orderkey
    """,
)
def scida_grouped(spark, sf_dir):
    """Both grouped-operation execution paths in one driver-attested
    result (merged r6 slots scida_grouped_fluent + scida_grouped_apply,
    distinguished by ``variant`` — registry consolidation for the
    driver's 50-query correctness window):

    * ``fluent``: the chained ``grouped().sum().min().max().evaluate()``
      API compiling to ONE groupBy().agg() — (agg1, agg2, agg3) =
      (sum, min, max) of l_quantity.
    * ``apply``: arbitrary per-group pandas via ``segmented_apply`` —
      (agg1, agg2, agg3) = (n, price_range, 0.0 pad).
    """
    fl = scida_grouped_fluent(spark, sf_dir).select(
        F.lit("fluent").alias("variant"),
        "GroupID",
        F.col("sum_l_quantity").alias("agg1"),
        F.col("min_l_quantity").alias("agg2"),
        F.col("max_l_quantity").alias("agg3"),
    )
    ap = scida_grouped_apply(spark, sf_dir).select(
        F.lit("apply").alias("variant"),
        F.col("GroupID").cast("bigint").alias("GroupID"),
        F.col("n").cast("double").alias("agg1"),
        F.col("price_range").cast("double").alias("agg2"),
        F.lit(0.0).alias("agg3"),
    )
    return fl.unionAll(ap)


@query(
    "scida_global_running_sum",
    """
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                OVER (ORDER BY l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def scida_global_running_sum(spark, sf_dir):
    """GLOBAL running total under a total ordering via the two-phase
    prefix-sum operator (operators/prefix_sum.py) — never a single-task
    window over the data. The oracle is the naive global window, so a
    hash match proves the two-phase plan computes identical values."""
    from scida_spark.operators.prefix_sum import global_running_sum

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    # key_bucket_width exercises the BUCKETED phase 1 (exclusive_key_
    # prefix two-level recursion) in the driver gate: the oracle's
    # naive window pins that bucketing changes no value.
    out = global_running_sum(
        li, "l_quantity", "l_orderkey", "l_linenumber", key_bucket_width=64
    )
    return out.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.col("running").cast("double").alias("running"),
    )


@query(
    "scida_shcounts",
    f"""
    WITH subs AS (
      SELECT l_orderkey AS grnr,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS subhalo_id
      FROM lineitem WHERE l_orderkey < {GROUP_CUTOFF})
    SELECT CAST(grnr AS BIGINT) AS grnr,
           CAST(COUNT(*) AS BIGINT) AS n_subhalos,
           CAST(MIN(subhalo_id) AS BIGINT) AS first_subhalo
    FROM subs GROUP BY grnr
    """,
)
def scida_shcounts(spark, sf_dir):
    """Reverse-FK build: per halo, subhalo count + first subhalo index —
    the reference's ``get_shcounts_shcells`` numba kernel
    (arepo/dataset.py:1317-1349) as one groupBy (SURVEY §2.4). The
    subhalo table is synthesized from lineitems with a global index."""
    subs = _particles(spark, sf_dir).filter(
        F.col("l_orderkey") < GROUP_CUTOFF
    ).select(F.col("l_orderkey").alias("grnr"), F.col("uid").alias("subhalo_id"))
    return subs.groupBy("grnr").agg(
        F.count("*").alias("n_subhalos"),
        F.min("subhalo_id").alias("first_subhalo"),
    ).select(
        F.col("grnr").cast("bigint").alias("grnr"), "n_subhalos", "first_subhalo"
    )
