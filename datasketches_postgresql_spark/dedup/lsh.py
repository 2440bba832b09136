"""LSH banding -> candidate edges, JVM-side end to end.

Banding: the (num_perm) signature splits into ``bands`` bands of ``rows``
rows; a band's hash is xxhash64 over its slice. Docs sharing any band-hash bucket become candidates (the band index is
salted INTO the hash at the signature stage, so the 8-byte hash alone is
the bucket key — one less shuffle column).

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

from ..plans.materialize import materialize

DEFAULT_BANDS = 32
DEFAULT_ROWS = 4


def band_hashes(signatures: DataFrame, bands: int = DEFAULT_BANDS, rows: int = DEFAULT_ROWS) -> DataFrame:
    """(doc_id, ...) -> (doc_id, sig_hash, band_hash).

    Uses the band_hashes/sig_hash columns PRECOMPUTED by the signature stage
    (numpy-vectorized there; the JVM slice+xxhash64 formulation costs
    ~130us/row in codegen and re-evaluates per plan use) — but only when the
    precomputed banding matches the requested ``bands`` (schema-level check:
    the stage emits exactly one hash per band). Falls back to the JVM
    expression over ``minhash`` otherwise, so a caller requesting different
    banding than the signature stage used gets correct hashes, not silently
    reused ones."""
    if "band_hashes" in signatures.columns:
        pre = (
            signatures.schema["band_hashes"].metadata.get("bands")
            if signatures.schema["band_hashes"].metadata
            else None
        )
        if pre is None or int(pre) == bands:
            return signatures.select(
                "doc_id",
                "sig_hash",
                F.explode("band_hashes").alias("band_hash"),
            )
    band_arr = F.array(
        *[
            F.xxhash64(F.lit(i + 1), F.slice("minhash", i * rows + 1, rows))
            for i in range(bands)
        ]
    )
    return signatures.select(
        "doc_id",
        F.xxhash64("minhash").alias("sig_hash"),
        F.explode(band_arr).alias("band_hash"),
    )


def candidate_edges(
    signatures: DataFrame,
    bands: int = DEFAULT_BANDS,
    rows: int = DEFAULT_ROWS,
    mode: str = "hybrid",
    max_pair_bucket: int = 32,
    bucket_stats: str = "window",
) -> DataFrame:
    """-> (a, b) candidate edges, a < b.

    Buckets <= max_pair_bucket emit ALL within-bucket pairs (each pair gets
    its own downstream verification — a hub doc failing verification can
    never disconnect a true pair). Larger buckets stay O(bucket):
      - members sub-group by full-signature hash; signature-identical docs
        star to their sub-minimum (such edges verify trivially: identical
        signatures => jaccard_est 1.0), so exact-dup mega-clusters cost
        O(cluster) edges and never lose connectivity;
      - sub-minima star to the bucket minimum (near-dup links across
        sub-groups; verification decides).
    This bounds edges at O(min(bucket, cap)^2 + bucket) per bucket — the
    100 TB guarantee — while making pair loss impossible for
    signature-identical dups and cap^2-bounded otherwise.

    mode="pairs" gives direct pair semantics for the standalone
    near-dup-pairs operator; its ``max_pair_bucket`` is the caller's
    explicit O(cap^2) blast-radius budget (see
    textops.dedupe.minhash_lsh_pairs)."""
    if mode == "pairs" and max_pair_bucket == 32:
        max_pair_bucket = 1000  # pair-listing default when caller kept the hybrid default
    return candidate_edges_from_bands(
        band_hashes(signatures, bands, rows),
        max_pair_bucket=max_pair_bucket,
        bucket_stats=bucket_stats,
    )


def candidate_edges_from_bands(
    bh: DataFrame,
    max_pair_bucket: int = 32,
    bucket_stats: str = "window",
) -> DataFrame:
    """The hybrid bucket logic of :func:`candidate_edges` over an arbitrary
    banded table (doc_id, sig_hash, band_hash). Separated out so the
    incremental pipeline can feed it a union of the new batch's bands with
    the OLD corpus's bands restricted (left-semi) to touched buckets —
    bucket membership then matches a full run's, so per-bucket edges are
    identical to what a full run over old+new would emit."""
    if bucket_stats == "window":
        # ONE shuffle: bucket count/min as window aggregates over
        # (band, band_hash). Faster than groupBy + join-back at moderate
        # skew; a pathological bucket (boilerplate shared by ~10^8 docs)
        # buffers its partition group through WindowExec's spill path,
        # where the "groupby" variant keeps map-side partial aggregation —
        # choose that for adversarially-skewed inputs.
        from pyspark.sql import Window

        w = Window.partitionBy("band_hash")
        bhj = (
            bh.withColumn("cnt", F.count("*").over(w))
            .withColumn("root", F.min("doc_id").over(w))
            .where(F.col("cnt") > 1)
        )
    else:
        buckets = (
            bh.groupBy("band_hash")
            .agg(F.min("doc_id").alias("root"), F.count("*").alias("cnt"))
            .where(F.col("cnt") > 1)
        )
        bhj = bh.join(buckets, "band_hash")
    # bhj feeds THREE consumers (small-bucket pairs x2 sides, big-bucket
    # sub-grouping); without materialization each consumer re-runs the
    # explode + bucket stats (measured 50s -> 8s on a 53k-doc corpus).
    # Strategy via plans.materialize: localCheckpoint locally, persist /
    # reliable checkpoint on clusters (executor-loss safety); rows kept are
    # only bucket members (cnt > 1), a small fraction of the banded rows.
    bhj = materialize(bhj)

    small = bhj.where(F.col("cnt") <= max_pair_bucket).select("band_hash", "doc_id")
    pairs = (
        small.alias("l")
        .join(small.alias("r"), "band_hash")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )

    big = bhj.where(F.col("cnt") > max_pair_bucket)
    sub = big.groupBy("band_hash", "sig_hash").agg(
        F.min("doc_id").alias("sm"), F.min("root").alias("root")
    )
    within_sub = (
        big.join(sub.select("band_hash", "sig_hash", "sm"), ["band_hash", "sig_hash"])
        .where(F.col("doc_id") != F.col("sm"))
        .select(F.col("sm").alias("a"), F.col("doc_id").alias("b"))
    )
    across_sub = (
        sub.where(F.col("sm") != F.col("root"))
        .select(F.col("root").alias("a"), F.col("sm").alias("b"))
    )
    return pairs.union(within_sub).union(across_sub).distinct()
