"""PII redaction — the scrubbing pass a training-data pipeline runs before
any text leaves the corpus.

Pattern-based (emails, IPv4 addresses, phone numbers) with placeholder
tokens, entirely in built-in ``regexp_replace`` chains: whole-stage
codegen, zero Python, zero shuffle — the operator adds nothing to a scan
but CPU, so it composes freely with extraction or quality filtering in the
same stage at 100 TB.

The patterns are deliberately restricted to syntax with IDENTICAL
semantics in Java regex (Spark) and RE2 (DuckDB) — char classes, ``\\b``,
bounded repetition; no lookaround, no backreferences — so the driver
oracle replays the exact rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: emails first (their local part may contain digits), then IPs
# (dotted quads would otherwise partially feed the phone pattern), then
# phones over whatever digits remain
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace every match of every PII pattern with its placeholder."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<kind>`` count column per pattern, applied in the same
    cascade order as redact_pii (each count sees the previous kinds
    already redacted, so an IP never double-counts as a phone)."""
    cols = []
    cur = text
    for name, pat, token in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return cols


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row redacted text + per-kind match counts (a pure projection)."""
    t = F.col(text_col)
    return df.select(
        "*",
        redact_pii(t).alias("redacted"),
        *pii_counts(t),
    )
