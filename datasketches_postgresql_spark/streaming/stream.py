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


def _pack_envelope(rows: int, th: bytes, kl: bytes | None) -> bytes:
    import struct

    kl = kl or b""
    return struct.pack("<QII", rows, len(th), len(kl)) + th + kl


def _unpack_envelope(buf: bytes) -> tuple[int, bytes, bytes | None]:
    import struct

    rows, lt, lk = struct.unpack_from("<QII", buf, 0)
    off = struct.calcsize("<QII")
    th = buf[off : off + lt]
    kl = buf[off + lt : off + lt + lk] if lk else None
    return rows, th, kl


def sketch_metrics_foreach_batch(metrics_path: str, id_col: str, value_col: str | None = None):
    """Returns a foreachBatch(fn) that appends one lineage row per
    micro-batch: batch id, row count, theta distinct estimate of ``id_col``
    (and a KLL median of ``value_col`` if given). Sketch bytes are also
    stored so downstream can UNION them across batches — mergeability is the
    point.

    Scale shape: the micro-batch is folded DISTRIBUTED-side through the same
    two-phase protocol as the batch aggregates (mapInPandas partial
    envelopes -> tiny-state merge) and the one-row result is written without
    ever collecting batch data to the driver — batch-size-independent,
    unlike a per-batch toPandas."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.types import (
            BinaryType,
            DoubleType,
            LongType,
            StructField,
        )

        from ..operators.agg import sketch_groupby_agg

        cols = [F.xxhash64(id_col).alias("__h")]
        in_cols = ["__h"]
        if value_col:
            cols.append(F.col(value_col).cast("double").alias("__v"))
            in_cols.append("__v")
        proj = batch_df.select(*cols)

        def partial(pdf: pd.DataFrame) -> bytes:
            hashes = pdf["__h"].to_numpy(dtype=np.int64).astype(np.uint64)
            th = _theta.build(hashes)
            kl = (
                _kll.build(pdf["__v"].to_numpy(dtype=np.float64)) if value_col else None
            )
            return _pack_envelope(len(pdf), th, kl)

        def merge(states: list[bytes]) -> bytes:
            parts = [_unpack_envelope(bytes(s)) for s in states if s is not None]
            rows = sum(p[0] for p in parts)
            th = _theta.union([p[1] for p in parts])
            kls = [p[2] for p in parts if p[2]]
            kl = _kll.merge(kls) if kls else None
            return _pack_envelope(rows, th, kl)

        def finalize(buf: bytes) -> dict:
            rows, th, kl = _unpack_envelope(buf)
            out = {
                "rows": rows,
                "distinct_est": float(_theta.get_estimate(th)),
                "theta_sketch": th,
                "median_est": (
                    float(_kll.KllState.deserialize(kl).get_quantile(0.5)) if kl else None
                ),
                "kll_sketch": kl,
            }
            return out

        result = sketch_groupby_agg(
            proj,
            [],
            in_cols,
            partial_fn=partial,
            merge_fn=merge,
            finalize_fn=finalize,
            out_fields=[
                StructField("rows", LongType()),
                StructField("distinct_est", DoubleType()),
                StructField("theta_sketch", BinaryType()),
                StructField("median_est", DoubleType()),
                StructField("kll_sketch", BinaryType()),
            ],
        ).withColumn("batch_id", F.lit(int(batch_id)))
        result.write.mode("append").parquet(metrics_path)

    return fn
