"""Candidate-edge verification — 100% JVM-side expressions.

- MinHash Jaccard estimate: fraction of equal signature components
  (``zip_with`` + ``aggregate`` over the two array<bigint> columns);
- SimHash verification: Hamming distance via ``bit_count(a ^ b)`` (built-in
  popcount — the numpy bit-twiddling of SURVEY.md §7.2 S5 turned out to be
  expressible natively, which is strictly better: whole-stage codegen).

An edge survives iff jaccard_est >= threshold AND hamming <= max_hamming.
For J~0.9 near-dups the observed Hamming tail reaches ~12 while unrelated
docs concentrate near 32, so 16 separates cleanly
(precision gate: the shared-boilerplate negatives fail both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_JACCARD = 0.8
DEFAULT_MAX_HAMMING = 16


def _eq_frac(sa, sb):
    eq = F.zip_with(sa, sb, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size(sa)


def verify_edges(
    edges: DataFrame,
    signatures: DataFrame,
    jaccard_threshold: float = DEFAULT_JACCARD,
    max_hamming: int = DEFAULT_MAX_HAMMING,
) -> DataFrame:
    """(a, b) x signatures -> verified (a, b, jaccard_est, hamming)."""
    sig = signatures.select("doc_id", "minhash", "simhash")
    sa = sig.select(
        F.col("doc_id").alias("a"),
        F.col("minhash").alias("mh_a"),
        F.col("simhash").alias("sh_a"),
    )
    sb = sig.select(
        F.col("doc_id").alias("b"),
        F.col("minhash").alias("mh_b"),
        F.col("simhash").alias("sh_b"),
    )
    joined = edges.join(sa, "a").join(sb, "b")
    scored = joined.select(
        "a",
        "b",
        _eq_frac(F.col("mh_a"), F.col("mh_b")).alias("jaccard_est"),
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    )
    return scored.where(
        (F.col("jaccard_est") >= F.lit(jaccard_threshold))
        & (F.col("hamming") <= F.lit(max_hamming))
    )
