"""LSH banding -> candidate edges, JVM-side end to end.

Banding: the (num_perm) signature splits into ``bands`` bands of ``rows``
rows; a band's hash is xxhash64 over its slice. Docs sharing any
(band, band_hash) bucket become candidates.

Scale design (the part that must survive 100 TB):
- band hashes are computed with built-in expressions (slice + xxhash64) and
  exploded via posexplode — whole-stage codegen, no Python;
- candidate PAIRS are NEVER materialized quadratically: each bucket emits
  STAR EDGES to its minimum doc_id (O(bucket) instead of O(bucket^2)). A
  100k-page exact-dup cluster costs 100k edges per band, not 5 x 10^9. The
  connected-components stage recovers the full cluster, which is the level
  dup-pair recall is defined at (SURVEY.md §6);
- bucket minima come from a partial-aggregating groupBy (map-side combine),
  then a join back on (band, band_hash) — skewed buckets are split by AQE
  skew-join handling (enabled in session.py);
- ``distinct()`` on edges collapses the (up to #bands) duplicate edges per
  pair before verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BANDS = 32
DEFAULT_ROWS = 4


def band_hashes(signatures: DataFrame, bands: int = DEFAULT_BANDS, rows: int = DEFAULT_ROWS) -> DataFrame:
    """(doc_id, minhash) -> (doc_id, band, band_hash). JVM-side only."""
    band_arr = F.array(
        *[F.xxhash64(F.slice("minhash", i * rows + 1, rows)) for i in range(bands)]
    )
    return signatures.select(
        "doc_id", F.posexplode(band_arr).alias("band", "band_hash")
    )


def candidate_edges(
    signatures: DataFrame,
    bands: int = DEFAULT_BANDS,
    rows: int = DEFAULT_ROWS,
    mode: str = "star",
    max_pair_bucket: int = 1000,
) -> DataFrame:
    """-> (a, b) candidate edges, a < b.

    mode="star" (pipeline default): O(bucket) star edges to the bucket
    minimum; the CC stage recovers full clusters. mode="pairs": all
    within-bucket pairs for buckets <= max_pair_bucket (direct pair
    semantics, for the standalone near-dup-pairs operator), with star edges
    for oversized buckets so connectivity is never lost."""
    bh = band_hashes(signatures, bands, rows)
    mins = (
        bh.groupBy("band", "band_hash")
        .agg(F.min("doc_id").alias("a"), F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
    )
    star = (
        bh.join(mins, ["band", "band_hash"])
        .where(F.col("doc_id") != F.col("a"))
        .select("a", F.col("doc_id").alias("b"))
        .distinct()
    )
    if mode == "star":
        return star
    small = mins.where(F.col("cnt") <= max_pair_bucket).select("band", "band_hash")
    in_small = bh.join(small, ["band", "band_hash"])
    pairs = (
        in_small.alias("l")
        .join(in_small.alias("r"), ["band", "band_hash"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )
    big_star = (
        bh.join(mins.where(F.col("cnt") > max_pair_bucket), ["band", "band_hash"])
        .where(F.col("doc_id") != F.col("a"))
        .select("a", F.col("doc_id").alias("b"))
    )
    return pairs.union(big_star).distinct()
