"""Build a synthetic scaled-up testdata directory by replicating an
existing SF with per-replica key offsets — a ×N stress set for
measuring how query plans SCALE, without touching /root/testdata.

Referential integrity is preserved per replica (order/customer/part/
supplier/lineitem key offsets move together), dims that are fixed in
TPC-H (region, nation) stay fixed, and per-row payloads are perturbed
where verbatim duplication would distort the workload's shape:

* documents.text is left VERBATIM — a ×N-replicated corpus is a
  heavily-duplicated corpus, exactly the regime dedup operators must
  survive (each source doc becomes an N-clique of near-dups).
* embeddings are rotated by deterministic per-replica noise (~0.2
  relative) so ANN/near-dup candidate structure grows like a larger
  corpus instead of N-cliques of identical vectors.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [out_dir] [N]
Defaults: /root/testdata/sf0.1 /tmp/scida_spark_sfx1 10
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFF = 10_000_000  # per-replica key offset, beyond every base key range


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scida_spark_sfx1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {rows} rows")

    reps = f"(SELECT unnest(range({n})) AS r)"

    # fixed dims: verbatim copy
    for name in ("region", "nation"):
        write(name, f"SELECT * FROM {t(name)}")

    write(
        "customer",
        f"""SELECT c_custkey + r * {OFF} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {t('customer')}, {reps}""",
    )
    write(
        "supplier",
        f"""SELECT s_suppkey + r * {OFF} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM {t('supplier')}, {reps}""",
    )
    write(
        "part",
        f"""SELECT p_partkey + r * {OFF} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {t('part')}, {reps}""",
    )
    write(
        "orders",
        f"""SELECT o_orderkey + r * {OFF} AS o_orderkey,
                   o_custkey + r * {OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {t('orders')}, {reps}""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey + r * {OFF} AS l_orderkey,
                   l_partkey + r * {OFF} AS l_partkey,
                   l_suppkey + r * {OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {t('lineitem')}, {reps}""",
    )
    write(
        "events",
        f"""SELECT event_id + r * {OFF} AS event_id, ts,
                   user_id + r * {OFF} AS user_id, event_type, value, props
            FROM {t('events')}, {reps}""",
    )
    write(
        "documents",
        f"""SELECT doc_id + r * {OFF} AS doc_id, text, lang, source, n_chars
            FROM {t('documents')}, {reps}""",
    )

    # embeddings: replicate with deterministic per-replica rotation
    base = pq.read_table(f"{src}/embeddings.parquet")
    ids = base.column("vec_id").to_numpy()
    labels = base.column("label").to_numpy()
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for r in range(n):
        rng = np.random.default_rng(1234 + r)
        noise = (
            rng.standard_normal(vecs.shape).astype(np.float32)
            * 0.2
            * np.linalg.norm(vecs, axis=1, keepdims=True)
            / np.sqrt(dim)
        )
        out_ids.append(ids + r * OFF)
        out_vecs.append(vecs if r == 0 else vecs + noise)
        out_labels.append(labels)
    emb = pa.table(
        {
            "vec_id": np.concatenate(out_ids),
            "embedding": pa.array(
                [v.tolist() for v in np.vstack(out_vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": np.concatenate(out_labels),
        }
    )
    pq.write_table(emb, f"{out}/embeddings.parquet")
    print(f"embeddings: {emb.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
