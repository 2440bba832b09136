"""Connected components over edge DataFrames — alternating
large-star / small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond"), the O(log n)-round DataFrame-join formulation the
north rule names.

Each round:
  large-star: every node u links each STRICTLY LARGER neighbor to the
      minimum of its neighborhood (including u);
  small-star: every node u links each neighbor <= u (and itself) to that
      minimum.
Convergence: the edge set is a fixed point (checked via count + order-
insensitive xxhash64 checksum — no collect of edges). Every iteration is
localCheckpoint()-ed to cut the lineage/plan blowup that kills iterative
Spark jobs (SURVEY.md §7.2 S6).

At the fixed point edges form stars rooted at each component's minimum
node: (node, root) IS the cluster assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 50


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u > v) ordered pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    joined = sym.join(m, "u")
    return (
        joined.where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # edges already canonical: u > v
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    joined = edges.join(m, "u")
    moved = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_link = m.select("u", F.col("m").alias("v"))
    return (
        moved.union(self_link)
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _local_union_find(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Driver-side DSU with path compression; roots normalized to the
    component minimum."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            # attach larger root under smaller -> root is component min
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return [(n, find(n)) for n in parent]


def connected_components(
    edges: DataFrame,
    max_iterations: int = MAX_ITERATIONS,
    local_threshold: int = 5_000_000,
) -> DataFrame:
    """edges (a, b) -> assignments (doc_id, cluster_id); cluster_id = the
    component's minimum doc_id. Nodes not present in any edge are not
    returned (singletons are their own cluster implicitly).

    Hybrid strategy (what production graph layers do): an edge set that fits
    the driver comfortably (< local_threshold, ~16 B/edge) is solved with a
    single collect + union-find — one job instead of ~6 per large-star/
    small-star round. Bigger graphs run the distributed O(log n)-round loop;
    both paths produce identical assignments (tested)."""
    canon = _canonical(edges)
    n_edges = canon.count()
    if n_edges <= local_threshold:
        spark = edges.sparkSession
        pairs = [(int(r["u"]), int(r["v"])) for r in canon.collect()]
        assign = _local_union_find(pairs)
        if not assign:
            return spark.createDataFrame([], "doc_id long, cluster_id long")
        return spark.createDataFrame(assign, "doc_id long, cluster_id long")
    cur = canon.localCheckpoint()
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        # exact fixed-point check: same count and no edge not already present
        if nxt.count() == cur.count() and nxt.exceptAll(cur).isEmpty():
            cur = nxt
            break
        cur = nxt
    # fixed point: stars (u -> root v). Roots map to themselves.
    nodes = cur.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = cur.select(F.col("v").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    return nodes.union(roots).groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
