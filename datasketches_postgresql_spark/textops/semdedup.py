"""SemDeDup — semantic deduplication via embedding-space clustering
(Abbas et al. 2023, arXiv:2303.09540): k-means-partition the embedding
space, find duplicate GROUPS only within each cluster, and keep one
representative per group — the member LEAST similar to its cluster
centroid (the paper's keep-the-outlier rule; prototypical redundancy is
what gets pruned). This is the semantic tier above the engine's lexical
layers (MinHash/SimHash/substring): it removes re-phrasings and
template-generated spam that share no shingles.

Reference heritage: the reference stores mergeable sketch aggregates so
re-aggregation never rescans history (/root/reference/sql/
datasketches_theta_sketch.sql merge aggregates); the same
partition-then-combine shape drives this operator's clustering and
group resolution.

Scale shape at 10^12 docs:

- the coarse quantizer trains on a BOUNDED deterministic sample (reuses
  the IVF trainer, textops/ann.py:ivf_train_centroids) — the full corpus
  is never collected;
- cluster assignment is one (batch, dim) x (dim, k) matmul per Arrow
  batch (vectorized pandas UDF — no per-row Python), emitting a plain
  int column;
- centroid similarity is computed JVM-side (broadcast centroid table +
  native cosine expression), so the keep-rule ranking is row-local and
  deterministic across any batch/partition layout — a BLAS matmul's
  blocking may differ per batch shape, so the UDF result is not relied
  on for ordering;
- the candidate self-join is keyed ONLY on (cluster, salt): expected
  cluster size is n/k, and an explicit ``max_cluster`` cap sub-splits
  oversized clusters by id hash, bounding the worst cell at ~cap^2
  comparisons (the documented trade: recall holds within a sub-bucket,
  exactly the SemDeDup within-cluster-only compromise);
- duplicate groups resolve with the engine's hybrid connected
  components (dedup/cc.py), so chains of pairwise-similar docs collapse
  to ONE kept representative rather than one per pair.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.cc import connected_components
from .ann import _ivf_cells_udf, ivf_train_centroids
from .dedupe import cosine_sim

DEFAULT_THRESHOLD = 0.95


def semdedup_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int = 64,
    max_train: int = 65536,
    iters: int = 10,
    seed: int = 17,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(id, v, cluster, ccos): each row's nearest spherical-k-means
    centroid and its cosine similarity to it. Pass ``centroids`` to reuse
    a trained quantizer (e.g. for incremental batches against a frozen
    clustering)."""
    if centroids is None:
        centroids = ivf_train_centroids(
            df, vec_col, dim, n_cells=n_clusters, max_train=max_train, iters=iters, seed=seed
        )
    cells = _ivf_cells_udf(centroids, n_probe=1)
    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    assigned = v.withColumn("cluster", F.element_at(cells(F.col("v")), 1).cast("int"))
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    cent_df = df.sparkSession.createDataFrame(
        cent_rows, "cluster int, centroid array<double>"
    )
    return assigned.join(F.broadcast(cent_df), "cluster").select(
        "id", "v", "cluster", cosine_sim(F.col("v"), F.col("centroid")).alias("ccos")
    )


def _id_salted(assigned: DataFrame, max_cluster: int) -> DataFrame:
    """LEGACY over-cap sub-split (round 3): id-hash salt so no join cell
    exceeds ~max_cluster rows. Forfeits cross-salt pairs — kept only as
    the dim-less fallback and as the comparison baseline in tests; the
    LSH sub-split in semdedup_pairs is the real path."""
    if max_cluster <= 0:
        return assigned.withColumn("salt", F.lit(0))
    size = F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    nsplit = F.greatest(F.lit(1), F.ceil(size / F.lit(max_cluster))).cast("long")
    return assigned.withColumn("salt", F.pmod(F.xxhash64(F.col("id")), nsplit).cast("int"))


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    max_cluster: int = 100_000,
    dim: int | None = None,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """(a, b, cos) semantic-duplicate candidate pairs, exact-cosine scored.

    Clusters at or under ``max_cluster`` members: one within-cluster
    self-join; each pair appears exactly once (a < b), so vectors cross
    the join shuffle once per side.

    Clusters ABOVE the cap — a spam template or mirror flood, exactly
    where the dups live — are routed through the engine's own
    random-hyperplane LSH (the dedupe.embedding_neardup_pairs shape)
    WITHIN the cluster: near-identical vectors co-bucket with probability
    (1 - theta/pi)^n_planes per table across ``n_tables`` independent
    tables, so near-pairs survive the sub-split (the round-3 id-hash salt
    forfeited 1 - 1/nsplit of them). Candidate dedup across tables
    carries only (a, b) ids; vectors rejoin the far smaller pair set.
    A residual id-salt backstop bounds the worst cell (a flood of
    IDENTICAL vectors lands in ONE bucket) at ~max_cluster rows — within
    such a cell members are interchangeable, so the cost of a salt split
    there is a few extra kept representatives, never a missed cluster
    merge across distinct content.

    ``max_cluster <= 0`` disables the cap (single self-join per cluster).
    ``dim`` (embedding width) drives the LSH sub-split; when None the
    over-cap fallback is the round-3 id-hash salt (legacy callers), which
    forfeits cross-salt pairs — pass dim (semdedup() always does)."""
    if max_cluster <= 0:
        left = assigned.select(
            F.col("id").alias("a"), F.col("v").alias("va"), "cluster"
        )
        right = assigned.select(
            F.col("id").alias("b"), F.col("v").alias("vb"), "cluster"
        )
        return (
            left.join(right, ["cluster"])
            .where(F.col("a") < F.col("b"))
            .select(
                "a", "b", F.round(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cos")
            )
            .where(F.col("cos") >= threshold)
        )
    if dim is None:
        s = _id_salted(assigned, max_cluster)
        left = s.select(F.col("id").alias("a"), F.col("v").alias("va"), "cluster", "salt")
        right = s.select(F.col("id").alias("b"), F.col("v").alias("vb"), "cluster", "salt")
        return (
            left.join(right, ["cluster", "salt"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b", F.round(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cos"))
            .where(F.col("cos") >= threshold)
        )
    from .ann import lsh_bucket

    # over-cap clusters via agg + BROADCAST of only the over-cap ids (a
    # window count would sort the full assignment; the over-cap table is
    # tiny by construction — same shape as cap_per_domain's hash mode)
    over_ids = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("__cn"))
        .where(F.col("__cn") > max_cluster)
        .select("cluster", F.lit(True).alias("__over"))
    )
    sized = assigned.join(F.broadcast(over_ids), "cluster", "left").withColumn(
        "__over", F.coalesce(F.col("__over"), F.lit(False))
    )
    under = sized.where(~F.col("__over"))
    over = sized.where(F.col("__over"))

    u_left = under.select(F.col("id").alias("a"), F.col("v").alias("va"), "cluster")
    u_right = under.select(F.col("id").alias("b"), F.col("v").alias("vb"), "cluster")
    under_pairs = (
        u_left.join(u_right, ["cluster"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )

    buckets = over.select(
        "id",
        "cluster",
        F.posexplode(
            F.array(
                *[lsh_bucket(F.col("v"), dim, n_planes, seed=23 + t) for t in range(n_tables)]
            )
        ).alias("table", "bucket"),
    )
    # backstop: an identical-vector flood concentrates in one bucket per
    # table — salt such cells back under the cap (bounded cell, see above).
    # The salt is seeded by the TABLE, so the nsplit partitions are
    # independent across tables: a pair split in one table co-salts in
    # another with prob 1 - (1 - 1/nsplit)^n_tables, instead of being
    # forfeited identically everywhere. Cell sizes again via agg +
    # broadcast of only the over-cap cells (absent -> nsplit 1).
    hot_cells = (
        buckets.groupBy("cluster", "table", "bucket")
        .agg(F.count(F.lit(1)).alias("__cell"))
        .where(F.col("__cell") > max_cluster)
    )
    nsplit = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.coalesce(F.col("__cell"), F.lit(0)) / F.lit(max_cluster)).cast("long"),
    )
    ids = (
        buckets.join(F.broadcast(hot_cells), ["cluster", "table", "bucket"], "left")
        .withColumn(
            "salt", F.pmod(F.xxhash64(F.col("id"), F.col("table")), nsplit).cast("int")
        )
        .select("id", "cluster", "table", "bucket", "salt")
    )
    keys = ["cluster", "table", "bucket", "salt"]
    cand_ids = (
        ids.select(F.col("id").alias("a"), *keys)
        .join(ids.select(F.col("id").alias("b"), *keys), keys)
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    vec = assigned.select("id", "v")
    over_pairs = (
        cand_ids.join(vec.select(F.col("id").alias("a"), F.col("v").alias("va")), "a")
        .join(vec.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b")
        .select("a", "b", F.round(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
    return under_pairs.unionByName(over_pairs)


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int = 64,
    threshold: float = DEFAULT_THRESHOLD,
    max_train: int = 65536,
    iters: int = 10,
    seed: int = 17,
    max_cluster: int = 100_000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Full SemDeDup decision table: (id, cluster, ccos, group_id, keep).

    group_id = the connected component over cos>=threshold within-cluster
    edges (min member id); docs in no duplicate group are their own group
    and kept. Within a group exactly one doc survives: the member with the
    LOWEST centroid similarity (rounded to 6 decimals for layout-stable
    ordering), ties broken by id — so re-running on a repartitioned input
    keeps the same representatives."""
    assigned = semdedup_assign(
        df, id_col, vec_col, dim,
        n_clusters=n_clusters, max_train=max_train, iters=iters, seed=seed,
        centroids=centroids,
    )
    edges = semdedup_pairs(
        assigned, threshold=threshold, max_cluster=max_cluster, dim=dim
    )
    comp = connected_components(edges.select("a", "b")).select(
        F.col("doc_id").alias("id"), F.col("cluster_id").alias("group_id")
    )
    decided = (
        assigned.join(comp, "id", "left")
        .withColumn("group_id", F.coalesce("group_id", "id"))
        .withColumn("ccos", F.round("ccos", 6))
    )
    w = Window.partitionBy("group_id").orderBy(F.asc("ccos"), F.asc("id"))
    return decided.select(
        "id", "cluster", "ccos", "group_id",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def semdedup_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    **kwargs,
) -> DataFrame:
    """The original rows minus pruned semantic duplicates (what a training
    pipeline feeds downstream). The decision table joins back on id, so
    the wide document payload never enters the clustering shuffles."""
    decision = semdedup(df, id_col, vec_col, dim, **kwargs)
    kept = decision.where("keep").select(F.col("id").alias(id_col))
    return df.join(kept, id_col, "left_semi")


def semdedup_metrics(decision: DataFrame) -> DataFrame:
    """One-row lineage summary (n_docs, n_groups, n_kept, n_pruned,
    dup_rate) from a semdedup() decision table — the per-checkpoint
    metric row the pipeline's lineage pass records for other tiers."""
    return decision.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("group_id").alias("n_groups"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_pruned"),
        F.round(F.avg((~F.col("keep")).cast("double")), 6).alias("dup_rate"),
    )
