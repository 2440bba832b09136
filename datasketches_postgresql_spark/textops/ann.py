"""Approximate nearest neighbor search over an embedding column.

- cosine_topk: brute-force baseline — broadcast the (small) query set
  against the corpus, native dot-product expressions, Window rank. The
  corpus side streams: no shuffle of the corpus at all when queries
  broadcast.
- lsh_bucketed_neighbors: the scale path — random-hyperplane LSH buckets
  (sign bits of fixed seeded projections) with multi-probe via several
  independent tables; search only joins within buckets, so cost is
  O(corpus x tables / 2^bits) instead of O(corpus x queries).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedupe import cosine_sim


def _plane_lits(dim: int, n_planes: int, seed: int) -> list[Column]:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [F.array(*[F.lit(float(x)) for x in p]) for p in planes]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine: (qid, id, cos, rank). Queries are broadcast —
    the corpus never shuffles."""
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("cv"))
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("id")).select(
        "qid", "id", cosine_sim(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "id", F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 11) -> Column:
    """Random-hyperplane bucket id: n_planes sign bits packed into a long.
    Pure native expressions (the seeded planes are literal arrays)."""
    planes = _plane_lits(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(F.zip_with(vec, p, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    n_probes: int = 1,
    query_id_col: str | None = None,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing an LSH bucket with the
    query in ANY of n_tables independent hyperplane tables, with MULTI-PROBE
    on the query side (n_probes=1 also probes every bucket one bit-flip
    away — the standard trick to buy recall without more tables). Exact
    cosine + rank within candidates. The bucket join shuffles only
    (id, bucket) pairs; the corpus is hashed once per table."""
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("cv"))
    # Bucket join carries ONLY (id, table, bucket); vectors rejoin to the
    # deduped (qid, id) candidate set — keying distinct() on full vectors
    # shuffled dim x 8 bytes per table hit at scale.
    q_b = q.select(
        "qid",
        F.posexplode(F.array(*[lsh_bucket(F.col("qv"), dim, n_planes, seed=11 + t) for t in range(n_tables)])).alias("table", "bucket"),
    )
    if n_probes >= 1:
        flips = F.array(F.lit(0), *[F.lit(1 << i) for i in range(n_planes)])
        q_b = q_b.select(
            "qid", "table",
            F.explode(F.transform(flips, lambda m: F.col("bucket").bitwiseXOR(m))).alias("bucket"),
        )
    c_b = c.select(
        "id",
        F.posexplode(F.array(*[lsh_bucket(F.col("cv"), dim, n_planes, seed=11 + t) for t in range(n_tables)])).alias("table", "bucket"),
    )
    cand = (
        q_b.join(c_b, ["table", "bucket"])
        .where(F.col("qid") != F.col("id"))
        .select("qid", "id")
        .distinct()
        .join(F.broadcast(q), "qid")  # query side is small by construction
        .join(c, "id")
    )
    scored = cand.select("qid", "id", cosine_sim(F.col("qv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "id", F.round("cos", 6).alias("cos"), "rank")
    )
