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


def streaming_lsh_candidates(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    shingle_n: int = 9,
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    seed: int = 7,
    max_bucket: int = 64,
    state_timeout_minutes: int = 30,
) -> DataFrame:
    """Custom STATEFUL streaming operator: near-duplicate candidate pairs
    over an unbounded document stream, state bounded per LSH bucket.

    The batch pipeline's LSH banding (dedup/lsh.py) assumes it can self-join
    a materialized signature table; a stream cannot. Instead, each arriving
    document's band hashes probe per-bucket state held by
    ``applyInPandasWithState`` (the PySpark arbitrary-stateful-processing
    operator): the state for one ``band_hash`` group is the ring of the last
    ``max_bucket`` (doc_id, sig_hash) members, and every arrival emits
    candidate pairs against current members (sig_hash equality short-circuit
    = the whole-signature collision check, mirroring
    dedup/verify.py's cheap pre-filter). State is dropped after
    ``state_timeout_minutes`` of bucket inactivity (ProcessingTimeTimeout),
    so total state is O(active buckets x max_bucket) regardless of stream
    length — the same bounded-state discipline as the watermarked exact
    dedup above. ``state_timeout_minutes=0`` disables the timeout
    (GroupStateTimeout.NoTimeout): state lives for the query's lifetime,
    and — the property finite replays need — a Trigger.AvailableNow run
    TERMINATES once the backlog is drained, instead of idling on empty
    timer-service micro-batches until every processing-time timer fires.

    Input: (doc_id long, url string, text string, ``ts_col`` timestamp).
    Output (append mode): (band_hash, a, b, exact_sig_match) with a < b;
    pairs may repeat across bands — downstream dropDuplicates(["a","b"])
    within its own watermark, or feed the batch verifier on sink.

    Scale shape: the signature kernels are the SAME vectorized numpy ones
    the batch pipeline uses (one mapInPandas, no per-row Python); the
    stateful shuffle is keyed by band_hash (8 bytes) so a hot bucket is one
    group — the ``max_bucket`` ring caps both its state and its per-batch
    pair fan-out, exactly like the batch path's bucket cap."""
    from collections.abc import Iterator

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from ..dedup.minhash import (
        band_hash_matrix,
        minhash_signatures,
        sig_hash_vector,
    )
    from ..dedup.shingle import shingle_hash_batch

    proj = stream.select("doc_id", F.col(ts_col).alias("__ts"), "text")

    sig_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("__ts", TimestampType()),
            StructField("band_hash", LongType()),
            StructField("sig_hash", LongType()),
        ]
    )

    def signatures(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sh = shingle_hash_batch(pdf["text"], n=shingle_n)
            sig = minhash_signatures(sh, num_perm=num_perm, seed=seed)
            band_h = band_hash_matrix(sig, bands, rows)  # (n_docs, bands) i64
            sig_h = sig_hash_vector(band_h)
            n, b = band_h.shape
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), b),
                    "__ts": np.repeat(pdf["__ts"].to_numpy(), b),
                    "band_hash": band_h.reshape(-1),
                    "sig_hash": np.repeat(sig_h, b),
                }
            )

    sigs = proj.mapInPandas(signatures, schema=sig_schema).withWatermark(
        "__ts", watermark
    )

    out_schema = StructType(
        [
            StructField("band_hash", LongType()),
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("exact_sig_match", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("sigs", ArrayType(LongType())),
        ]
    )

    def probe_bucket(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (band,) = key
        ids, sigs = state.get if state.exists else ([], [])
        ids, sigs = list(ids), list(sigs)
        out_a, out_b, out_m = [], [], []
        for pdf in pdfs:
            for did, sh in zip(
                pdf["doc_id"].to_numpy().tolist(), pdf["sig_hash"].to_numpy().tolist()
            ):
                for mid, msh in zip(ids, sigs):
                    if mid == did:
                        continue
                    lo, hi = (did, mid) if did < mid else (mid, did)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_m.append(sh == msh)
                ids.append(did)
                sigs.append(sh)
                if len(ids) > max_bucket:  # ring: keep the freshest members
                    ids, sigs = ids[-max_bucket:], sigs[-max_bucket:]
        state.update((ids, sigs))
        if state_timeout_minutes > 0:
            state.setTimeoutDuration(state_timeout_minutes * 60 * 1000)
        if out_a:
            yield pd.DataFrame(
                {
                    "band_hash": np.full(len(out_a), band, dtype=np.int64),
                    "a": np.array(out_a, dtype=np.int64),
                    "b": np.array(out_b, dtype=np.int64),
                    "exact_sig_match": np.array(out_m, dtype=bool),
                }
            )

    return sigs.groupBy("band_hash").applyInPandasWithState(
        probe_bucket,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_timeout_minutes > 0
            else GroupStateTimeout.NoTimeout
        ),
    )


def line_dedup_foreach_batch(
    freq: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
):
    """foreachBatch adapter: clean each streaming micro-batch against a
    STATIC boilerplate snapshot (``frequent_lines`` output, e.g. the batch
    pipeline's ``line_freq`` checkpoint) and append the cleaned rows.

    This is the streaming face of the incremental-crawl contract: line
    frequency statistics come from the last full snapshot, never from the
    stream (a micro-batch is far too small to define "frequent", and
    recomputing frequencies per batch would make cleaning depend on
    batch boundaries). foreachBatch is the idiomatic shape — inside it
    the micro-batch is a plain DataFrame, so the same hash-keyed
    broadcast drop-join the batch tier uses runs unchanged, with none of
    streaming's aggregation-mode restrictions."""
    from ..textops.linededup import dedup_lines

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = dedup_lines(
            batch_df, id_col=id_col, text_col=text_col, freq=freq, carry_cols=carry_cols
        ).withColumn("batch_id", F.lit(batch_id))
        cleaned.write.mode("append").parquet(out_path)

    return fn
