"""Approximate nearest neighbor search over an embedding column.

- cosine_topk: brute-force baseline — broadcast the (small) query set
  against the corpus, native dot-product expressions, Window rank. The
  corpus side streams: no shuffle of the corpus at all when queries
  broadcast.
- lsh_bucketed_neighbors: a scale path — random-hyperplane LSH buckets
  (sign bits of fixed seeded projections) with multi-probe via several
  independent tables; search only joins within buckets, so cost is
  O(corpus x tables / 2^bits) instead of O(corpus x queries).
- ivf_assign / ivf_topk: the other standard scale path (inverted-file
  index): a coarse k-means quantizer trained on a bounded driver-side
  sample partitions the corpus into cells ONCE (vectorized pandas-UDF
  argmin — one (batch, dim) x (dim, cells) matmul per Arrow batch); a
  query then scans only its n_probe nearest cells. Search cost is
  O(corpus x n_probe / n_cells); the cell assignment is a plain long
  column, so the search join shuffles ids + one long, never vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# -- IVF (inverted-file) ANN --------------------------------------------------


def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    n_cells: int = 64,
    max_train: int = 65536,
    iters: int = 10,
    seed: int = 17,
) -> np.ndarray:
    """(n_cells, dim) float64 k-means centroids over L2-NORMALIZED vectors
    (so nearest-centroid-by-L2 == nearest-by-cosine), trained on a bounded
    deterministic sample. Driver-side numpy on <= max_train vectors is the
    standard IVF shape — at any corpus scale the coarse quantizer trains on
    a sample, never the full data; only the ASSIGNMENT pass (distributed,
    one matmul per Arrow batch) touches every row. Deterministic given the
    same collected sample SET (fixed seed + iteration count + a canonical
    lexsort of the sample, so the arrival ORDER — which varies with
    partition layout — cannot change the result); ``limit`` takes Spark's
    first rows, so bit-reproducible training across cluster layouts still
    needs the sample SET itself to be stable (whole-corpus when
    n <= max_train, else a sorted/bucketed source) — the SEARCH results
    for a FIXED centroid set are always deterministic."""
    rows = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(max_train)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    if x.shape[0]:
        x = x[np.lexsort(x.T[::-1])]  # canonical row order: layout-invariant
    n = x.shape[0]
    k = min(n_cells, max(1, n))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        # nearest centroid by dot product (all unit vectors)
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0:
                    cent[c] = m / nm
            else:
                # re-seed an empty cell deterministically from the point
                # farthest from its centroid (standard empty-cluster fix)
                far = int(np.argmin((x * cent[assign]).sum(axis=1)))
                cent[c] = x[far]
    return cent


def _ivf_cells_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: array<double> vector -> array<int> of the n_probe nearest
    cell ids (one (batch, dim) x (dim, cells) matmul per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    cent = centroids  # closed over; shipped once per worker in the pickled UDF

    @pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        x = np.array([np.asarray(e, dtype=np.float64) for e in v])
        if x.ndim != 2 or x.size == 0:
            return pd.Series([[0]] * len(v))
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        sims = (x / norms[:, None]) @ cent.T
        p = min(n_probe, cent.shape[0])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        # order probes best-first (argpartition is unordered)
        order = np.take_along_axis(sims, top, axis=1).argsort(axis=1)[:, ::-1]
        top = np.take_along_axis(top, order, axis=1)
        return pd.Series([row.astype(np.int32) for row in top])

    return cells


def ivf_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
) -> DataFrame:
    """(id, v, cell): every corpus vector tagged with its nearest cell —
    the inverted file. One distributed pass; at scale this is the column
    you'd bucket/partition the stored table by so each query's probe reads
    only its cells (partition pruning on `cell`)."""
    cells = _ivf_cells_udf(centroids, n_probe=1)
    return corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        cells(F.col(vec_col).cast("array<double>"))[0].alias("cell"),
    )


def ivf_topk(
    assigned: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str | None = None,
) -> DataFrame:
    """ANN top-k over an ivf_assign output: each query probes its n_probe
    nearest cells, candidates are the corpus vectors filed under those
    cells, exact cosine + rank within candidates. (qid, id, cos, rank).

    The probe join's build side is (qid, cell) — tiny, broadcast — so the
    corpus-side inverted file streams with no shuffle at all; recall is
    tunable via n_probe exactly as in a FAISS-style IVF-Flat."""
    qid = query_id_col or id_col
    cells = _ivf_cells_udf(centroids, n_probe)
    q = queries.select(
        F.col(qid).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        cells(F.col(vec_col).cast("array<double>")).alias("probe_cells"),
    )
    probes = q.select("qid", "qv", F.explode("probe_cells").alias("cell"))
    cand = assigned.join(F.broadcast(probes), "cell").where(F.col("qid") != F.col("id"))
    scored = cand.select("qid", "id", cosine_sim(F.col("qv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "id", F.round("cos", 6).alias("cos"), "rank")
    )
