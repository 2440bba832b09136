"""Corpus-level line deduplication (CCNet / RefinedWeb-style).

Web text repeats whole lines across pages — navigation bars, cookie
banners, footers, boilerplate headers. Removing every line whose
(whitespace-trimmed) form appears in >= ``min_docs`` DISTINCT documents
is the classic pre-training cleanup tier between URL-level collapse and
document-level near-dup: it edits documents instead of dropping them.

Scale shape (the whole point — this runs over the full corpus):
- lines are keyed by ``xxhash64(trim(line))`` so the frequency groupBy
  and the drop-join shuffle 8 bytes per line, never line text; the cost
  is a false-collapse probability of ~L^2/2^64 over L distinct lines
  (at 10^12 lines that is ~3%: acceptable for boilerplate removal, and
  the alternative of shuffling full text dominates the stage cost),
- the frequent-line table is tiny relative to the corpus (only lines
  seen in >= min_docs docs), so AQE broadcasts the drop-join,
- reassembly is ONE groupBy(doc) over (pos, line, dup) structs — the
  only pass that shuffles line text, and it shuffles each line once.

Blank lines (trim = '') are never counted and never dropped: they carry
document structure, and "appears everywhere" is vacuously true for them.

Reference analogue: none — the reference engine (datasketches-postgresql)
has no text pipeline; this extends the training-data surface the same way
textops/dedupe.py does, following the published CCNet (Wenzek et al. 2020)
and RefinedWeb (Penedo et al. 2023) recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exploded_lines(
    df: DataFrame, id_col: str, text_col: str, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """One row per (doc, position, line). split(.., -1) keeps trailing
    empties so reassembly is byte-exact for untouched documents; docs with
    NULL text produce no rows (null-in, absent-out, matching SQL unnest)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        *carry_cols,
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    )


def frequent_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_docs: int = 2
) -> DataFrame:
    """The boilerplate table: (line_hash, n_docs) for every non-blank
    trimmed line present in >= min_docs distinct documents. Exposed
    separately so a pipeline can compute it once per crawl snapshot and
    reuse it across incremental batches."""
    lines = _exploded_lines(df, id_col, text_col)
    norm = F.trim(F.col("line"))
    return (
        lines.where(norm != "")
        .select(F.xxhash64(norm).alias("line_hash"), "doc_id")
        .groupBy("line_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    freq: DataFrame | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Remove corpus-frequent lines from every document.

    Precondition: one input row per ``id_col`` value — reassembly groups
    by it, so two rows sharing an id would interleave into one garbled
    document (DedupPipeline guards this; direct callers must too).

    Returns one row per input document that had text:
    (doc_id, text_deduped, n_lines, n_dropped). Line order and blank
    lines are preserved; a document none of whose lines are frequent
    comes back byte-identical.

    Pass a precomputed ``freq`` (from :func:`frequent_lines`, possibly
    built on a larger snapshot) to decouple the boilerplate statistics
    from the batch being cleaned — the incremental-crawl path.

    ``carry_cols`` are per-document constant columns (url, lang, ...)
    threaded through the single reassembly groupBy via first(), so a
    caller replacing text in a wider table pays no doc_id re-join.
    """
    lines = _exploded_lines(df, id_col, text_col, carry_cols)
    if freq is None:
        freq = frequent_lines(df, id_col, text_col, min_docs)
    norm = F.trim(F.col("line"))
    flagged = (
        lines.withColumn("line_hash", F.xxhash64(norm))
        .withColumn("__blank", norm == "")
        .join(freq.select("line_hash", F.lit(True).alias("__dup")), "line_hash", "left")
        .select(
            "doc_id",
            *carry_cols,
            "pos",
            "line",
            # blank lines are structural, never boilerplate-dropped
            (F.coalesce(F.col("__dup"), F.lit(False)) & ~F.col("__blank")).alias("dup"),
        )
    )
    rows = F.array_sort(F.collect_list(F.struct("pos", "line", "dup")))
    kept = F.filter(rows, lambda x: ~x["dup"])
    return (
        flagged.groupBy("doc_id")
        .agg(
            *[F.first(c).alias(c) for c in carry_cols],
            F.array_join(F.transform(kept, lambda x: x["line"]), "\n").alias("text_deduped"),
            F.count("*").alias("n_lines"),
            F.sum(F.col("dup").cast("long")).alias("n_dropped"),
        )
    )
