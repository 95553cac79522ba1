"""PII detection and redaction for training-data pipelines.

Web-scale corpora ship personal data that must not reach a training
set: email addresses, IP addresses, phone numbers, leaked API keys.
Every production pipeline (C4, The Stack / BigCode, RefinedWeb) runs a
regex-family PII pass before anything else sees the text. No reference
counterpart (scida has no text surface) — net-new engine capability,
sibling of the quality/language filters in ``functions/text.py``.

Spark-first design, sized for 100 TB:

* **Map-only, zero shuffle, zero UDF.** Detection is
  ``regexp_extract_all`` + ``size``; redaction is chained
  ``regexp_replace`` — all JVM-side Column expressions inside
  whole-stage codegen. A PII pass over the full corpus is exactly one
  parquet scan with nothing exchanged.
* **Cross-engine patterns.** Patterns avoid lookarounds and
  backreferences so Java regex (Spark) and RE2 (DuckDB — the oracle
  engine) match identically; ``\\b`` (ASCII word boundary) and
  non-capturing groups are supported by both.

Semantics:

* Detection counts each pattern family INDEPENDENTLY on the raw text
  (a digit run inside an un-redacted API key would also count as a
  phone candidate — families are not mutually exclusive by
  construction; the shipped patterns keep keys digit-interleaved-safe
  because the phone pattern requires >= 9 consecutive [digit/space/
  dash] characters).
* Redaction is SEQUENTIAL in ``PII_PATTERNS`` order (email -> ipv4 ->
  key -> phone): the earlier, more-specific families consume their
  text before the looser phone pattern can bite into an IP's or key's
  digit runs. Replacement tokens contain no digits, so redaction is
  idempotent (``redact(redact(x)) == redact(x)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "REDACTIONS", "pii_count", "redact_pii", "pii_report"]

# Ordered: redact_pii applies these top to bottom (dicts preserve
# insertion order). Order is load-bearing — see module docstring.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "key": r"\b(?:sk|pk|key)-[A-Za-z0-9]{16,}\b",
    "phone": r"\+?\d[\d -]{7,}\d",
}

REDACTIONS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IPV4>",
    "key": "<KEY>",
    "phone": "<PHONE>",
}


def pii_count(text: Column, kind: str) -> Column:
    """Number of ``kind`` matches in ``text`` (raw, independent count)."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its family's placeholder token,
    applying the families in ``PII_PATTERNS`` order."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, REDACTIONS[kind])
    return out


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII report: one ``n_<kind>`` count column per
    pattern family plus the fully redacted text. One scan, map-only."""
    cols: list[Column] = [F.col(id_col)]
    for kind in PII_PATTERNS:
        cols.append(pii_count(F.col(text_col), kind).alias(f"n_{kind}"))
    cols.append(redact_pii(F.col(text_col)).alias("redacted"))
    return df.select(*cols)
