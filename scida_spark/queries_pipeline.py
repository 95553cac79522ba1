"""Training-data-pipeline queries (dedup / similarity / text / multimodal /
streaming-batch-equivalents) with DuckDB oracles where SQL can express
the semantics; probabilistic/LSH operators are rows-only checked and
additionally pytest-verified against exact ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scida_spark.functions import dedup as D
from scida_spark.functions import multimodal as M
from scida_spark.functions import similarity as SIM
from scida_spark.functions import text as TX
from scida_spark.queries import DEC, dsum, query
from scida_spark.tables import table

# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------


@query(
    "dedup_exact_clusters",
    """
    SELECT md5(text) AS digest, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_clusters(spark, sf_dir):
    """Exact dedup via content digest: one shuffle on md5, map-side
    combine; canonical row = min id (stable at any scale)."""
    return D.exact_dedup_clusters(table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(
               generate_series(1, len(string_split(trim(text), ' ')) - 2),
               i -> string_split(trim(text), ' ')[i] || ' ' ||
                    string_split(trim(text), ' ')[i+1] || ' ' ||
                    string_split(trim(text), ' ')[i+2])) AS grams
      FROM documents),
    sizes AS (SELECT doc, len(grams) AS nsh FROM sh),
    ex AS (SELECT doc, unnest(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc < b.doc
      GROUP BY a.doc, b.doc)
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           CAST(n_inter AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_inter AS DOUBLE) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
    WHERE CAST(n_inter AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_inter AS DOUBLE) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram-shingle Jaccard near-dup pairs via inverted-index
    self-join. At 100 TB the candidate generation moves to MinHash LSH
    (``dedup_minhash_lsh``); this exact form is the oracle-able baseline."""
    return D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.2
    )


@query("dedup_minhash_lsh", None)  # probabilistic candidates → rows-only check
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64 perms) + LSH(16 bands) candidates, exact-Jaccard
    verified at ≥0.2 — the scale path for near-dedup. Deterministic
    (seeded permutations) but not SQL-expressible (xxhash64 shingle
    hashing); pytest cross-checks against the exact all-pairs result."""
    return D.minhash_dedup_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_perm=64, bands=16,
        threshold=0.2,
    ).select("doc_a", "doc_b", "jaccard")


@query("dedup_simhash", None)  # bit-level signature → rows-only check
def dedup_simhash(spark, sf_dir):
    """SimHash-64 signatures + banded Hamming-distance near-pairs
    (pigeonhole blocking on 16-bit chunks — equi-joins only)."""
    docs = table(spark, sf_dir, "documents")
    sigs = D.simhash_signatures(docs, "doc_id", "text")
    return D.simhash_near_pairs(sigs, max_hamming=8)


@query(
    "dedup_first_event",
    """
    SELECT user_id, event_type, CAST(MIN(event_id) AS BIGINT) AS first_event_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM events GROUP BY user_id, event_type
    """,
)
def dedup_first_event(spark, sf_dir):
    """Keyed dedup keep-first (batch analog of streaming dropDuplicates):
    min-id per (user, type) — one shuffle, no window needed."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count("*").alias("n_dups")
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_COSINE_ORACLE = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS cand_id,
             list_reduce(list_transform(generate_series(1, len(e.v)),
                         i -> e.v[i] * q.qv[i]), (acc, x) -> acc + x)
             / (SQRT(list_reduce(list_transform(e.v, x -> x * x), (acc, x) -> acc + x))
                * SQRT(list_reduce(list_transform(q.qv, x -> x * x), (acc, x) -> acc + x)))
               AS sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, cand_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, cand_id) AS INT) AS rank
      FROM scored)
    SELECT query_id, cand_id, ROUND(sim, 6) AS sim_r, rank
    FROM ranked WHERE rank <= 10
    """


@query("sim_cosine_topk", _COSINE_ORACLE)
def sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vectors (vec_id < 5):
    broadcast queries × streamed candidates, JVM-side fold for the dot
    product (zip_with + aggregate — no Python in the hot path)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    res = SIM.cosine_topk_bruteforce(emb, q, k=10)
    return res.select("query_id", "cand_id", F.round("sim", 6).alias("sim_r"), "rank")


@query(
    "sim_neardup_pairs",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_transform(generate_series(1, len(a.v)),
                         i -> a.v[i] * b.v[i]), (acc, x) -> acc + x)
             / (SQRT(list_reduce(list_transform(a.v, x -> x * x), (acc, x) -> acc + x))
                * SQRT(list_reduce(list_transform(b.v, x -> x * x), (acc, x) -> acc + x)))
               AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, ROUND(sim, 6) AS sim_r FROM pairs WHERE sim >= 0.35
    """,
)
def sim_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via spherical-cell blocking
    — exact above threshold (triangle-inequality cell pruning + exact
    cosine verify), no cartesian product in the plan. The oracle is the
    naive all-pairs SQL, so a hash match proves the blocked plan loses
    no pair."""
    emb = table(spark, sf_dir, "embeddings")
    res = SIM.embedding_neardup_pairs_blocked(emb, threshold=0.35, ncells=64)
    return res.select("id_a", "id_b", F.round("sim", 6).alias("sim_r"))


@query("sim_lsh_topk", None)  # approximate → rows-only + pytest recall check
def sim_lsh_topk(spark, sf_dir):
    """ANN top-k via random-hyperplane LSH with multi-probe: equi-join on
    bucket signature replaces the cross-join at scale."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return SIM.lsh_topk(emb, q, k=10, nbits=12)


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@query(
    "text_token_stats",
    """
    WITH t AS (
      SELECT lang, len(string_split(trim(text), ' ')) AS n_tok,
             len(list_distinct(string_split(trim(text), ' '))) AS n_distinct
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_distinct) AS BIGINT) AS total_distinct,
           CAST(MAX(n_tok) AS BIGINT) AS max_tokens
    FROM t GROUP BY lang
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer) aggregated per language —
    all JVM-side split/size, no UDF."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("lang", TX.tokens(F.col("text")).alias("_t"))
    t = toks.select(
        "lang",
        F.size("_t").alias("n_tok"),
        F.size(F.array_distinct("_t")).alias("n_distinct"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.sum("n_distinct").cast("bigint").alias("total_distinct"),
        F.max("n_tok").cast("bigint").alias("max_tokens"),
    )


@query(
    "text_quality_scores",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS n,
             CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE) AS nd,
             CAST(list_reduce(list_transform(string_split(trim(text), ' '),
                  x -> CAST(length(x) AS BIGINT)), (acc, x) -> acc + x) AS DOUBLE) AS totlen
      FROM documents),
    s AS (
      SELECT doc_id,
             LEAST(LOG10(n + 1) / 3.0, 1.0) + (nd / n) * 0.5 +
             CASE WHEN totlen / n >= 3 AND totlen / n <= 8 THEN 0.5 ELSE 0.0 END AS score
      FROM t)
    SELECT CAST(FLOOR(score * 10) AS BIGINT) AS score_decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(score AS DECIMAL(38,6))) AS DOUBLE) AS sum_score
    FROM s GROUP BY 1
    """,
)
def text_quality_scores(spark, sf_dir):
    """Quality scoring (length/diversity/token-length heuristic),
    histogrammed into deciles. Pure Column arithmetic."""
    docs = table(spark, sf_dir, "documents")
    # Tokens → stats → score as separate projections: Catalyst does not
    # CSE a repeated split within one projection (see functions/dedup.py).
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("_t"))
    stats = toks.select(
        "doc_id",
        F.size("_t").alias("n"),
        F.size(F.array_distinct("_t")).alias("nd"),
        (
            F.aggregate("_t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            .cast("double") / F.size("_t")
        ).alias("mean_len"),
    )
    s = stats.select(
        "doc_id",
        TX.quality_score_from_stats(
            F.col("n"), F.col("nd"), F.col("mean_len")
        ).alias("score"),
    )
    return s.groupBy(
        F.floor(F.col("score") * 10).cast("bigint").alias("score_decile")
    ).agg(F.count("*").alias("n_docs"), dsum(F.col("score"), "sum_score"))


@query(
    "text_lang_id",
    """
    WITH sc AS (
      SELECT doc_id, lang AS actual_lang,
             len(list_filter(string_split(trim(text), ' '),
                 x -> x IN ('the','a','of','and'))) AS c_en,
             len(list_filter(string_split(trim(text), ' '),
                 x -> x IN ('der','die','und','das'))) AS c_de,
             len(list_filter(string_split(trim(text), ' '),
                 x -> x IN ('el','la','los','que'))) AS c_es,
             len(list_filter(string_split(trim(text), ' '),
                 x -> x IN ('le','la','les','et'))) AS c_fr,
             len(list_filter(string_split(trim(text), ' '),
                 x -> x IN ('de','shi','zai','le'))) AS c_zh
      FROM documents),
    pred AS (
      SELECT actual_lang,
             CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                  WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                  WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                  WHEN c_fr >= c_zh THEN 'fr'
                  ELSE 'zh' END AS pred_lang
      FROM sc)
    SELECT actual_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
)
def text_lang_id(spark, sf_dir):
    """Language-ID heuristic: stopword-set hit counts, argmax with fixed
    tie-break (en>de>es>fr>zh) — confusion matrix vs the labeled lang."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("lang", TX.tokens(F.col("text")).alias("_t"))
    scored = toks.select(
        "lang",
        *[
            TX.stopword_hits_from_tokens(F.col("_t"), sw).alias(f"c_{lg}")
            for lg, sw in TX.LANG_STOPWORDS.items()
        ],
    )
    pred = scored.select(
        F.col("lang").alias("actual_lang"),
        TX.lang_id_from_scores(
            {lg: F.col(f"c_{lg}") for lg in TX.LANG_STOPWORDS}
        ).alias("pred_lang"),
    )
    return pred.groupBy("actual_lang", "pred_lang").agg(F.count("*").alias("n"))


@query(
    "text_fingerprint",
    """
    SELECT substr(md5(text), 1, 16) AS fingerprint, CAST(doc_id AS BIGINT) AS doc_id
    FROM documents WHERE doc_id < 100
    """,
)
def text_fingerprint(spark, sf_dir):
    """Portable content fingerprint (md5 prefix). The rolling-hash
    (Karp-Rabin) variant is pytest-verified (not SQL-portable)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        TX.md5_fingerprint(F.col("text")).alias("fingerprint"), F.col("doc_id")
    )


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------


@query(
    "multimodal_features",
    """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction via mapInPandas (schema /
    Arrow-batch plumbing is real; image decode itself is stubbed —
    see functions/multimodal.py). sha256 over the payload is the
    oracle-able part; the deterministic fake decode is pytest-covered."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = M.to_media_table(docs, "doc_id", "text")
    feats = M.extract_features(media)
    return feats.select("media_id", "n_bytes", "sha256")


# --------------------------------------------------------------------------
# Streaming batch-equivalents (the streaming module itself is
# scida_spark/streaming — these oracle the same window semantics in batch)
# --------------------------------------------------------------------------


@query(
    "stream_tumbling_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark, sf_dir):
    """Tumbling 1-hour window aggregation — identical semantics to the
    Structured Streaming version in scida_spark.streaming (same
    F.window call), run here on the bounded table for the oracle."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_sliding_counts",
    """
    WITH w AS (
      SELECT unnest([
               make_timestamp(CAST(FLOOR(epoch(ts) / 1800) * 1800 * 1000000 AS BIGINT)),
               make_timestamp(CAST((FLOOR(epoch(ts) / 1800) * 1800 - 1800) * 1000000 AS BIGINT))
             ]) AS window_start,
             value
      FROM events)
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1
    """,
)
def stream_sliding_counts(spark, sf_dir):
    """Sliding window (1 h length, 30 min slide): every event lands in
    exactly two epoch-aligned windows — matches Spark's window()
    alignment; the oracle materializes both starts per event."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "stream_session_windows",
    """
    WITH g AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM s GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark, sf_dir):
    """Session windows (30-min gap) in batch — semantics mirror
    streaming ``session_window(ts, '30 minutes')``; computed via
    lag + gap-flag prefix sum so the oracle is exact."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    g = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    )
    ws = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = g.withColumn("session_id", F.sum("new_session").over(ws))
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


@query("sim_ivf_topk", None)  # approximate → rows-only + pytest recall check
def sim_ivf_topk(spark, sf_dir):
    """ANN top-k via IVF (coarse k-means quantization → inverted lists →
    nprobe-list search): the bucketed alternative to sim_lsh_topk.
    Candidates get one list id in a narrow pass; the search is an
    equi-join on list id — no cross-join at any scale."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return SIM.ivf_topk(emb, q, k=10, nlist=16, nprobe=4)


@query(
    "dedup_cc_clusters",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(
               generate_series(1, len(string_split(trim(text), ' ')) - 2),
               i -> string_split(trim(text), ' ')[i] || ' ' ||
                    string_split(trim(text), ' ')[i+1] || ' ' ||
                    string_split(trim(text), ' ')[i+2])) AS grams
      FROM documents),
    sizes AS (SELECT doc, len(grams) AS nsh FROM sh),
    ex AS (SELECT doc, unnest(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc < b.doc
      GROUP BY a.doc, b.doc),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
      WHERE CAST(n_inter AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_inter AS DOUBLE) >= 0.2),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node)
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(label) AS BIGINT) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def dedup_cc_clusters(spark, sf_dir):
    """Dedup cluster assignment: exact near-dup pairs (3-gram Jaccard
    ≥0.2) → connected components via iterative min-label propagation.
    The DuckDB oracle computes the same transitive closure with a
    recursive CTE, so the distributed loop is value-checked exactly."""
    pairs = D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.2
    )
    cc = D.connected_components(pairs)
    return cc.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
    )


@query(
    "text_bpe_token_count",
    r"""
    WITH t AS (
      SELECT lang,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]') AS toks
      FROM documents),
    s AS (
      SELECT lang, len(toks) AS n_tok,
             len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]$'))) AS n_punct
      FROM t)
    SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_punct) AS BIGINT) AS total_punct,
           CAST(MAX(n_tok) AS BIGINT) AS max_bpe_tokens
    FROM s GROUP BY lang
    """,
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish tokenization (letter runs / single digits / punctuation —
    the GPT-style pre-tokenizer split) + punctuation counts per
    language. Identical regex engine semantics both sides (verified)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("lang", TX.bpe_tokens(F.col("text")).alias("toks"))
    s = toks.select(
        "lang",
        F.size("toks").alias("n_tok"),
        F.size(F.filter("toks", lambda t: t.rlike(r"^[^A-Za-z0-9]$"))).alias("n_punct"),
    )
    return s.groupBy("lang").agg(
        F.sum("n_tok").cast("bigint").alias("total_bpe_tokens"),
        F.sum("n_punct").cast("bigint").alias("total_punct"),
        F.max("n_tok").cast("bigint").alias("max_bpe_tokens"),
    )


@query(
    "dedup_keep_latest",
    """
    SELECT user_id, event_type, CAST(event_id AS BIGINT) AS event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_keep_latest(spark, sf_dir):
    """Keyed dedup keep-LATEST (the mirror of dedup_first_event's
    keep-first): rank window with a total tie-break, keep rank 1 —
    the standard newest-version-wins pattern for revisioned corpora."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


@query(
    "text_stopword_ratio",
    """
    WITH t AS (
      SELECT lang,
             len(string_split(trim(text), ' ')) AS n,
             len(list_filter(string_split(trim(text), ' '),
                 x -> x IN ('the','a','of','and','der','die','und','das',
                            'el','la','los','que','le','les','et'))) AS n_stop
      FROM documents)
    SELECT lang,
           CAST(SUM(n_stop) AS BIGINT) AS total_stopwords,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(n_stop) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS stopword_ratio
    FROM t GROUP BY lang
    """,
)
def text_stopword_ratio(spark, sf_dir):
    """Stopword-ratio quality signal per language (the third classic
    quality component besides length and lexical diversity) — exact
    integer ratio, engine-independent."""
    all_sw = [w for sws in TX.LANG_STOPWORDS.values() for w in sws]
    # de-dup while preserving membership semantics
    sw = list(dict.fromkeys(all_sw))
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("lang", TX.tokens(F.col("text")).alias("_t"))
    t = toks.select(
        "lang",
        F.size("_t").alias("n"),
        F.size(F.filter("_t", lambda x: x.isin(sw))).alias("n_stop"),
    )
    return t.groupBy("lang").agg(
        F.sum("n_stop").cast("bigint").alias("total_stopwords"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        (F.sum("n_stop").cast("double") / F.sum("n").cast("double")).alias("stopword_ratio"),
    )
