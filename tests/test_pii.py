"""PII detection/redaction (functions/pii.py): per-family counts, the
sequential redaction order contract, idempotence, a Python-re
cross-check, and the map-only plan contract."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from scida_spark.functions.pii import (
    PII_PATTERNS,
    REDACTIONS,
    pii_report,
    redact_pii,
)

_CASES = [
    # (text, {kind: count}, redacted)
    (
        "mail bob@corp.io and eve.adams+x@sub.example.org now",
        {"email": 2},
        "mail <EMAIL> and <EMAIL> now",
    ),
    (
        "hosts 10.0.0.1 and 255.255.255.0 up",
        {"ipv4": 2},
        "hosts <IPV4> and <IPV4> up",
    ),
    (
        "dial +44 20 7946 0958 or 555-0100-4242",
        {"phone": 2},
        "dial <PHONE> or <PHONE>",
    ),
    (
        "oops sk-abcdefghijklmnop123 in repo",
        {"key": 1},
        "oops <KEY> in repo",
    ),
    ("nothing secret here", {}, "nothing secret here"),
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )


def test_counts_and_redaction(spark):
    rows = pii_report(_df(spark, [c[0] for c in _CASES]), "id", "text").collect()
    for (text, counts, redacted), r in zip(_CASES, sorted(rows, key=lambda x: x.id)):
        for kind in PII_PATTERNS:
            assert r[f"n_{kind}"] == counts.get(kind, 0), (text, kind)
        assert r["redacted"] == redacted, text


def test_counts_match_python_re(spark):
    """Spark's Java-regex counts == Python re counts for every family
    (both are backtracking Perl-style engines; the oracle gate covers
    the RE2 side)."""
    texts = [c[0] for c in _CASES] + [
        "a@b.co 1.2.3.4 sk-ABCDEFGHIJKLMNOPQ +1 234 567 8901",
        "edge 999.999.999.999 and 1.2.3.4.5 and x@y.z",
    ]
    rows = pii_report(_df(spark, texts), "id", "text").collect()
    for r, text in zip(sorted(rows, key=lambda x: x.id), texts):
        for kind, pat in PII_PATTERNS.items():
            assert r[f"n_{kind}"] == len(re.findall(pat, text)), (text, kind)


def test_redaction_order_protects_key_digits(spark):
    """A key with a >= 9-digit run would be half-eaten by the phone
    pattern if phone ran first; the sequential order contract redacts
    the key whole."""
    text = "token sk-12345678901234567890 found"
    out = (
        _df(spark, [text])
        .select(redact_pii(F.col("text")).alias("r"))
        .collect()[0]["r"]
    )
    assert out == "token <KEY> found"
    assert "<PHONE>" not in out


def test_redaction_idempotent(spark):
    texts = [c[0] for c in _CASES]
    once = _df(spark, texts).select(
        "id", redact_pii(F.col("text")).alias("text")
    )
    twice = once.select("id", redact_pii(F.col("text")).alias("text"))
    assert sorted(once.collect()) == sorted(twice.collect())
    assert all("<" not in tok or tok in REDACTIONS.values() for tok in [])


def test_plan_is_map_only(spark):
    """Zero shuffle, zero Python UDF: the report is a single project
    over the scan."""
    plan = pii_report(_df(spark, ["x"]), "id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
