"""Text analysis operators — all JVM-side built-in expressions (no Python in
the hot path; every one of these runs inside whole-stage codegen and scales
linearly with input splits).

- token_count      whitespace tokenization
- quality metrics  punctuation ratio / mean word length / stopword ratio
- language-ID      marker-stopword argmax heuristic over {en,de,fr,es}
- repetition       Gopher-style word-level repetition signals (dup-word /
                   top-2-gram / dup-n-gram fractions) — zero shuffle: every
                   signal folds over the row's own token array
- fingerprint      min-shingle rolling-hash document fingerprint (winnowing
                   style; pandas UDF — the one Python kernel here)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# disjoint marker sets so the argmax is well-defined in SQL and Spark alike
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "les", "et"],
    "es": ["el", "los", "y"],
}
_PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


# GPT-2-style pre-tokenizer, restricted to RE2-safe syntax (no lookahead,
# which the canonical pattern uses only to split trailing whitespace):
# contractions, then letter runs, digit runs, and symbol runs, each
# consuming one optional leading space. Runs of extra whitespace are not
# tokens. Both Java regex (Spark) and RE2 (DuckDB) read this identically.
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2 pre-tokenizer split rule.
    An upper proxy for post-merge BPE length (merges only shrink it) — the
    budget number a training-mix planner wants per document."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_RE))


def punct_ratio(text: Column) -> Column:
    clean = F.regexp_replace(text, _PUNCT_CLASS, "")
    return (F.length(text) - F.length(clean)) / F.greatest(F.length(text), F.lit(1))


def mean_word_len(text: Column) -> Column:
    nosp = F.regexp_replace(text, r"\s+", "")
    return F.length(nosp) / F.greatest(token_count(text), F.lit(1))


def _marker_count(text: Column, words: list[str]) -> Column:
    toks = tokens(F.lower(text))
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return _marker_count(text, LANG_MARKERS[lang]) / F.greatest(
        token_count(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, word-like lengths,
    not punctuation-soaked. Deterministic closed form (also SQL-expressible
    for the oracle)."""
    length_ok = F.least(token_count(text) / F.lit(100.0), F.lit(1.0))
    word_ok = F.when(
        (mean_word_len(text) >= 3) & (mean_word_len(text) <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round((length_ok + word_ok + punct_ok) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """Marker-stopword argmax; ties resolve in en > de > fr > es order
    (strictly-greater comparisons in declaration order)."""
    scores = {lang: _marker_count(text, words) for lang, words in LANG_MARKERS.items()}
    expr = F.lit("en")
    best = scores["en"]
    for lang in ["de", "fr", "es"]:
        cond = scores[lang] > best
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
        best = F.when(cond, scores[lang]).otherwise(best)
    return expr


def _strict_word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams with NO short-doc fallback: a doc with < n tokens yields
    an empty array (unlike dedupe.word_ngrams, whose whole-text gram exists
    so verbatim short-doc copies still collide — here a partial window would
    fabricate repetition that isn't there)."""
    toks = tokens(text)
    gram = lambda i: F.array_join(F.slice(toks, i + 1, n), " ")  # noqa: E731
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram)
    )


def dup_word_frac(text: Column) -> Column:
    """Fraction of word occurrences that repeat an earlier word
    (1 - distinct/total; the MassiveText duplicate-line-fraction rule at
    word granularity, since this corpus has no line structure)."""
    toks = tokens(text)
    return (F.size(toks) - F.size(F.array_distinct(toks))) / F.greatest(
        F.size(toks), F.lit(1)
    )


def top_ngram_frac(text: Column, n: int = 2) -> Column:
    """Fraction of words covered by the single most frequent word n-gram
    (count * n / n_words, the Gopher top-n-gram character-fraction rule at
    word granularity). The mode count is the longest equal-run in the SORTED
    gram array — a pure fold, no shuffle, no UDF."""
    grams = F.array_sort(_strict_word_ngrams(text, n))
    run = F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("best")
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )["best"]
    return run * n / F.greatest(F.size(tokens(text)), F.lit(1))


def dup_ngram_frac(text: Column, n: int = 5) -> Column:
    """Fraction of word n-gram occurrences that are repeats of an
    already-seen n-gram (Gopher duplicate-n-gram rule, n in 5..10)."""
    grams = _strict_word_ngrams(text, n)
    return (F.size(grams) - F.size(F.array_distinct(grams))) / F.greatest(
        F.size(grams), F.lit(1)
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_dup_word_frac: float = 0.5,
    max_top_2gram_frac: float = 0.20,
    max_dup_5gram_frac: float = 0.15,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Gopher-rules composite quality filter: one boolean predicate over
    the per-doc signals above (length window, word-length window,
    repetition caps, optional stopword floor), with defaults tracking the
    published MassiveText thresholds where a word-level analogue exists.
    Adds ``keep`` (boolean); callers ``.where("keep")`` — keeping the
    column lets a pipeline audit WHY a doc dropped by re-deriving the
    individual signals, all in the same zero-shuffle projection."""
    t = F.col(text_col)
    nw = token_count(t)
    mwl = mean_word_len(t)
    keep = (
        (nw >= min_words)
        & (nw <= max_words)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (dup_word_frac(t) <= max_dup_word_frac)
        & (top_ngram_frac(t, 2) <= max_top_2gram_frac)
        & (dup_ngram_frac(t, 5) <= max_dup_5gram_frac)
        & (stopword_ratio(t) >= min_stopword_ratio)
    )
    return df.withColumn("keep", keep)


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc repetition filter signals. All four columns are folds over the
    row itself — the plan is a projection (zero shuffle, whole-stage codegen),
    so the operator scans 100 TB at parquet-read speed."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_words"),
        F.round(dup_word_frac(t), 6).alias("dup_word_frac"),
        F.round(top_ngram_frac(t, 2), 6).alias("top_2gram_frac"),
        F.round(dup_ngram_frac(t, 5), 6).alias("dup_5gram_frac"),
    )


@F.pandas_udf(LongType())
def doc_fingerprint(text: pd.Series) -> pd.Series:
    """Winnowing-style document fingerprint: min of the 9-gram rolling
    hashes (same shingle kernel as the dedup pipeline). Deterministic across
    runs/parallelism; not SQL-expressible (rows-only correctness check)."""
    from ..dedup.shingle import shingle_hash_batch

    sh = shingle_hash_batch(text.fillna(""), n=9)
    return pd.Series(
        [int(np.min(s).view(np.int64)) if s.size else 0 for s in sh], dtype="int64"
    )


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop text-analysis projection."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("token_count"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(mean_word_len(t), 6).alias("mean_word_len"),
        quality_score(t).alias("quality_score"),
        lang_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )
