"""Benchmark decontamination: flag training documents that share a word
n-gram with an evaluation/benchmark set (the GPT-3 / Pile-style 13-gram
overlap rule an LLM-training pipeline runs before every training mix).

Reference analogue: the reference engine answers "does this row's set
intersect that set" with theta intersections over stored sketches
(/root/reference/sql/datasketches_theta_sketch.sql:155-171); here the
contract is exact, so the intersection runs as an inverted-index equi-join
on hashed n-grams instead of a sketch estimate.

Scale shape (the whole point at 100 TB):
- the benchmark side is small (eval suites are MBs, not TBs) — its distinct
  gram-hash table is built once and BROADCAST, so the corpus-side scan joins
  against an in-memory hash relation with NO shuffle of the corpus at all;
- the corpus side explodes to (doc_id, gram_hash) pairs of 16 bytes — grams
  travel as xxhash64 longs, never as strings;
- the only aggregation is the per-doc hit count, which re-uses the scan's
  partitioning (map-side partial agg on doc_id).
With broadcast_benchmark=False the same plan degrades gracefully to a
shuffled hash join for a pathologically large benchmark side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedupe import word_ngrams


def gram_hashes(text: Column, n: int) -> Column:
    """Distinct xxhash64 hashes of the word n-grams of ``text``."""
    return F.transform(
        F.array_distinct(word_ngrams(text, n)), lambda g: F.xxhash64(g)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "text",
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Contaminated training docs: (doc_id, bench_docs_hit, grams_hit) for
    every doc in ``docs`` sharing at least one word ``n``-gram with any doc
    in ``benchmark``. Docs with zero overlap are absent (they are clean).

    A doc shorter than ``n`` tokens contributes its whole token sequence as
    its single gram (word_ngrams' short-doc rule), so a verbatim copy of a
    short benchmark doc is still caught.
    """
    bench = benchmark.select(
        F.col(bench_id).alias("__bid"),
        F.explode(gram_hashes(F.col(bench_text), n)).alias("gh"),
    ).distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    corpus = docs.select(
        F.col(doc_id).alias(doc_id),
        F.explode(gram_hashes(F.col(doc_text), n)).alias("gh"),
    )
    return corpus.join(bench, "gh").groupBy(doc_id).agg(
        F.countDistinct("__bid").alias("bench_docs_hit"),
        F.countDistinct("gh").alias("grams_hit"),
    )
