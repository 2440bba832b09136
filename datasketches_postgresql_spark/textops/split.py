"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is the trap here: it samples per-partition with a seeded
RNG, so the assignment of a given document changes whenever the input's
partitioning changes — re-running after a repartition (or at a different
cluster size) silently moves documents between train and validation,
leaking eval data into training. A web-scale pipeline needs the split to
be a pure function of the document identity.

``hash_split`` assigns each row by ``xxhash64(id, seed)`` bucketed into
[0, 1): the split is stable across runs, parallelism, partitioning, and
incremental batches (a new crawl batch lands each doc in the same split
it would get in a full run). 100% JVM expression — no shuffle, no UDF:
the assignment is a projection, so it composes with any downstream scan
and survives predicate pushdown on the split column after a write
partitioned by it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def split_bucket(id_col: Column, seed: int = 0) -> Column:
    """Uniform [0, 1) bucket, a pure function of (id, seed). Changing the
    seed reshuffles every assignment; keeping it pins them forever."""
    return (F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(_BUCKETS))) / F.lit(
        float(_BUCKETS)
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    col_name: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one named fraction.

    ``weights`` maps split name -> fraction; fractions must sum to ~1.
    Assignment boundaries are cumulative in the given dict order, so
    ``{"train": .98, "val": .01, "test": .01}`` puts bucket [0, .98) in
    train, [.98, .99) in val, [.99, 1) in test.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("every split weight must be > 0")
    b = split_bucket(F.col(id_col), seed)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name]
        expr = F.when(b < hi, name) if expr is None else expr.when(b < hi, name)
    # the last split takes the remainder, immune to float boundary dust
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(col_name, expr)
