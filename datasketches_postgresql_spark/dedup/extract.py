"""Deterministic HTML -> text extraction.

The pipeline's canonical extraction config (SURVEY.md §7.2 S3): the per-row
invariant is BYTE-IDENTICAL extracted text per url across runs, parallelism
levels, and resume (BASELINE.json input_hint). Everything is a fixed
regex/entity pipeline — no heuristics, no library drift.

Runs as ``mapInPandas`` (Arrow batches); the string work is pandas
``.str.replace`` (C regex loop over the batch), not per-row Python.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def _strip_html(html: pd.Series, tag_repl) -> pd.Series:
    """The ONE decode/script/comment/tag/entity pipeline both extraction
    flavors share — only what a _TAG_RE match becomes differs (space for
    the canonical text, block-aware separator for the line-structured
    text). Keeping a single copy is what makes the byte-identity between
    the two flavors structural rather than hand-synchronized."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, tag_repl, regex=True)
    for ent, rep in _ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    return s


def extract_text_series(html: pd.Series) -> pd.Series:
    """bytes -> canonical extracted text (vectorized pandas str ops)."""
    return _strip_html(html, " ").str.replace(_WS_RE, " ", regex=True).str.strip()


EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
        StructField("n_chars", LongType()),
    ]
)


# block-level elements end a visual line; used by the opt-in line-dedup
# cleaning tier to recover line structure the whitespace collapse erases.
# Tag BOUNDARIES must be decided by the exact same _TAG_RE scan as the
# canonical path — a separate block-tag pre-pass can split a malformed
# run like "<<div>" differently (canonical eats it as ONE tag; the
# pre-pass matched the inner <div> and left a stray "<" behind, found by
# the hypothesis fuzz) — so the block pass reuses _TAG_RE and only the
# REPLACEMENT differs per match: newline for block tags, space otherwise.
_BLOCK_NAME_RE = re.compile(
    r"(?is)^</?(p|div|br|li|ul|ol|h[1-6]|tr|table|td|th|section|article|"
    r"header|footer|nav|blockquote|pre|form|dl|dt|dd|figure|aside|main)\b"
)
_INLINE_WS_RE = re.compile(r"[^\S\n]+")  # any whitespace except newline
_NL_RE = re.compile(r"[^\S\n]*\n\s*")  # newline + surrounding ws -> one \n


def _tag_separator(m: "re.Match[str]") -> str:
    return "\n" if _BLOCK_NAME_RE.match(m.group(0)) else " "


def extract_block_series(html: pd.Series) -> pd.Series:
    """bytes -> extracted text with ONE newline between block elements.

    Identical to :func:`extract_text_series` except block-level tags become
    newlines instead of spaces (same tag boundaries, different separator),
    so collapsing every whitespace run of the result to a single space
    reproduces the canonical text byte-for-byte (pinned by unit + property
    tests) — the pipeline derives BOTH the canonical ``extracted`` table
    and the line-structured ``blocks`` table from one html decode."""
    s = _strip_html(html, _tag_separator)
    s = s.str.replace(_INLINE_WS_RE, " ", regex=True)
    s = s.str.replace(_NL_RE, "\n", regex=True)
    return s.str.strip()


BLOCKS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
    ]
)


def extract_blocks_stage(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, text, lang) -> (doc_id, url, lang, text) where
    text keeps one newline per block boundary. Same doc_id contract as
    :func:`extract_stage`."""
    proj = pages.select(F.xxhash64("url").alias("doc_id"), "url", "lang", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "text": extract_block_series(pdf["html"]),
                }
            )

    return proj.mapInPandas(run, schema=BLOCKS_SCHEMA)


def canonicalize_stage(blocks: DataFrame) -> DataFrame:
    """(doc_id, url, lang, text-with-newlines) -> EXTRACTED_SCHEMA by
    collapsing every whitespace run to one space. Runs the SAME Python
    ``\\s`` collapse as extract_text_series (unicode-aware — Java regex
    ``\\s`` is ASCII-only, so this stays a pandas pass on purpose):
    canonicalize_stage(extract_blocks_stage(p)) == extract_stage(p)
    byte-for-byte, which keeps the extracted checkpoint invariant when the
    line-dedup tier derives it from the blocks table instead of re-decoding
    html."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            text = pdf["text"].str.replace(_WS_RE, " ", regex=True).str.strip()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "text": text,
                    "n_chars": text.str.len().astype("int64"),
                }
            )

    return blocks.mapInPandas(run, schema=EXTRACTED_SCHEMA)


def extract_stage(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, text, lang) -> (doc_id, url, lang, text, n_chars).

    doc_id = xxhash64(url): stable across runs/parallelism (required for
    deterministic cluster ids); at 10^12 docs the 64-bit birthday bound
    implies ~a few dozen collisions — acceptable for dedup edges (a collision
    merges two clusters); a 128-bit (two-seed xxhash) variant is the
    documented upgrade path.
    """
    proj = pages.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        "lang",
        "html",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            text = extract_text_series(pdf["html"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "text": text,
                    "n_chars": text.str.len().astype("int64"),
                }
            )

    return proj.mapInPandas(run, schema=EXTRACTED_SCHEMA)
