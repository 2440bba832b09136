"""Materialization strategy for multi-consumer / iterative DataFrames.

``localCheckpoint()`` is the local-mode fast path (eager, lineage-cut,
ContextCleaner-managed) but stores NON-replicated executor-local blocks: on a
real cluster, executor loss or dynamic deallocation makes the blocks
unrecoverable and fails the job. A cluster deployment should select a
fault-tolerant strategy instead:

    SPARK_GRAFT_MATERIALIZE=local_checkpoint  (default; local-mode fast path)
    SPARK_GRAFT_MATERIALIZE=persist           (MEMORY_AND_DISK, recomputable
                                               from lineage on block loss)
    SPARK_GRAFT_MATERIALIZE=checkpoint        (reliable checkpoint to
                                               spark.checkpoint.dir — survives
                                               executor loss AND cuts lineage;
                                               the right choice for the
                                               iterative CC loop at 100 TB)

All strategies are eager (the returned frame is computed), so callers can
rely on single-evaluation semantics for nondeterministic upstreams.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize(df: DataFrame, strategy: str | None = None) -> DataFrame:
    """Eagerly materialize ``df`` for multi-consumer fan-out or iteration.

    Strategy from the argument, else $SPARK_GRAFT_MATERIALIZE, else
    ``local_checkpoint``."""
    strategy = strategy or os.environ.get("SPARK_GRAFT_MATERIALIZE", "local_checkpoint")
    if strategy == "local_checkpoint":
        return df.localCheckpoint()
    if strategy == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # eager, like localCheckpoint
        return out
    if strategy == "checkpoint":
        return df.checkpoint()
    raise ValueError(
        f"unknown materialization strategy {strategy!r} "
        "(expected local_checkpoint | persist | checkpoint)"
    )
