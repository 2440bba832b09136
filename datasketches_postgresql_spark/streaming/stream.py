"""Structured Streaming operators.

- streaming_exact_dedup: watermarked dropDuplicates on a key (url / text
  hash) — the streaming ingestion front of the dedup pipeline: late
  arrivals within the watermark dedup exactly; state is bounded by it.
- sketch_metrics_sink: foreachBatch adapter that folds every micro-batch
  into mergeable sketch lineage rows (theta distinct + KLL quantiles),
  appended to a metrics table — the streaming analogue of the batch
  pipeline's per-checkpoint lineage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketches import kll as _kll
from ..sketches import theta as _theta


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once key dedup within the watermark horizon; state size is
    bounded by the watermark (Spark drops expired keys)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def sketch_metrics_foreach_batch(metrics_path: str, id_col: str, value_col: str | None = None):
    """Returns a foreachBatch(fn) that appends one lineage row per
    micro-batch: batch id, row count, theta distinct estimate of ``id_col``
    (and a KLL median of ``value_col`` if given). Sketch bytes are also
    stored so downstream can UNION them across batches — mergeability is the
    point."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        pdf = batch_df.select(
            F.xxhash64(id_col).alias("__h"),
            *( [F.col(value_col).cast("double").alias("__v")] if value_col else [] ),
        ).toPandas()
        hashes = pdf["__h"].to_numpy(dtype=np.int64).astype(np.uint64)
        th = _theta.build(hashes)
        row = {
            "batch_id": int(batch_id),
            "rows": int(len(pdf)),
            "distinct_est": float(_theta.get_estimate(th)),
            "theta_sketch": th,
        }
        if value_col:
            k = _kll.build(pdf["__v"].to_numpy(dtype=np.float64))
            row["median_est"] = float(_kll.KllState.deserialize(k).get_quantile(0.5))
            row["kll_sketch"] = k
        spark.createDataFrame(pd.DataFrame([row])).write.mode("append").parquet(metrics_path)

    return fn
