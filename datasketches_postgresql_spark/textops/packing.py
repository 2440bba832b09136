"""Sequence packing — grouping variable-length documents into fixed token
budgets, the batch-prep step between a cleaned corpus and a pretraining
dataloader (T5's pack_examples, GPT-style concat-and-chunk). Two modes:

- ``pack_documents``: best-fit-decreasing bin packing. Docs never split;
  each bin's total stays <= budget (oversize docs get a flagged singleton
  bin). Decreasing-fit packing is inherently sequential, so it runs per
  PARTITION after a deterministic hash repartition — the standard
  distributed-packing compromise: quality is within a whisker of global at any
  realistic scale (each partition sees thousands of docs), wall-clock is
  one shuffle + an embarrassingly parallel pass, and the result is
  REPRODUCIBLE across cluster layouts because the partitioner, the
  within-partition order, and the tie-breaks are all derived from the
  data (id hash), never from arrival order.
- ``concat_chunks``: concatenate per partition (fixed separator) and cut
  exact ``chunk_len``-unit windows, recording each document's span so
  attention masking / provenance survives. Emits full chunks plus the
  partition's tail remainder (kept, flagged) — document bytes are never
  silently dropped.

Scale shape at 10^12 docs: one hash shuffle of (id, length) — lengths are
8 bytes, text does NOT move for pack_documents (the assignment joins back
by id); concat_chunks moves text once into its packing partition. Bin ids
are (partition << 32 | local), collision-free without coordination."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_PART = "__pack_part"


def _parted(df: DataFrame, id_col: str, num_partitions: int) -> DataFrame:
    p = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_partitions)).cast("int")
    return df.withColumn(_PART, p).repartition(num_partitions, F.col(_PART))


def pack_documents(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    num_partitions: int = 64,
) -> DataFrame:
    """(id, bin_id, bin_fill, oversize): best-fit-decreasing assignment of
    every input doc to a bin with sum(len) <= budget. Deterministic for a
    given (ids, lengths) set regardless of input partitioning. ``bin_fill``
    is the bin's total length (same value on each member row); docs with
    len > budget come back as oversize=true singleton bins (the caller
    chooses truncate/split policy — packing never drops or cuts)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if budget > 1 << 26:
        raise ValueError(
            "budget > 2^26: the per-partition capacity index is sized by the "
            "budget — quantize lengths (e.g. pack in KiB units) first"
        )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("bin_id", LongType()),
            StructField("bin_fill", LongType()),
            StructField("oversize", BooleanType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf[_PART].iloc[0])
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        lens = pdf["__len"].to_numpy(dtype=np.int64)
        # BFD: length desc, id asc tie-break — layout-independent order.
        # Best-fit via a Fenwick tree over remaining-capacity counts:
        # O(n log budget) per partition (a naive first-fit bin scan is
        # O(n x bins) — hours at millions of docs per partition), same
        # 11/9-OPT guarantee class as first-fit-decreasing.
        order = np.lexsort((ids, -lens))
        size = budget + 1
        tree = np.zeros(size + 1, dtype=np.int64)  # Fenwick over capacity counts

        def tree_add(cap: int, delta: int) -> None:
            i = cap + 1
            while i <= size:
                tree[i] += delta
                i += i & (-i)

        def tree_rank(cap: int) -> int:
            # count of open bins with remaining capacity <= cap
            i = cap + 1
            s = 0
            while i > 0:
                s += tree[i]
                i -= i & (-i)
            return int(s)

        def find_best(ln: int) -> int:
            """Smallest remaining capacity >= ln (best fit), or -1."""
            below = tree_rank(ln - 1)
            if tree_rank(size - 1) == below:
                return -1
            # binary search the Fenwick for the (below+1)-th capacity
            target = below + 1
            pos = 0
            bit = 1 << (size.bit_length())
            while bit:
                nxt = pos + bit
                if nxt <= size and tree[nxt] < target:
                    pos = nxt
                    target -= tree[pos]
                bit >>= 1
            return pos  # capacity value (pos is 0-based cap after the walk)

        by_cap: dict[int, list[int]] = {}
        fills = np.zeros(max(16, len(ids)), dtype=np.int64)
        n_bins = 0
        assign = np.empty(len(ids), dtype=np.int64)
        over = np.zeros(len(ids), dtype=bool)
        for idx in order:
            ln = int(lens[idx])
            if n_bins == len(fills):
                fills = np.concatenate([fills, np.zeros_like(fills)])
            if ln > budget:
                assign[idx] = n_bins
                fills[n_bins] = ln
                over[idx] = True
                n_bins += 1
                continue
            cap = find_best(ln)
            if cap < 0:
                b = n_bins
                n_bins += 1
            else:
                stack = by_cap[cap]
                b = stack.pop()
                if not stack:
                    del by_cap[cap]
                tree_add(cap, -1)
            assign[idx] = b
            fills[b] += ln
            rem = budget - int(fills[b])
            by_cap.setdefault(rem, []).append(b)
            tree_add(rem, 1)
        fills = fills[: max(n_bins, 1)]
        return pd.DataFrame(
            {
                "id": ids,
                "bin_id": (np.int64(part) << np.int64(32)) | assign,
                "bin_fill": fills[assign],
                "oversize": over,
            }
        )

    keyed = _parted(
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(len_col).cast("long").alias("__len"),
        ),
        "__id",
        num_partitions,
    )
    return keyed.groupBy(_PART).applyInPandas(pack, schema)


def concat_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_len: int,
    sep: str = "\n\n",
    num_partitions: int = 64,
) -> DataFrame:
    """GPT-style concat-and-chunk: per packing partition, concatenate docs
    (deterministic id-hash order, ``sep``-joined) and emit exact
    ``chunk_len``-character windows. Output rows: (chunk_id, text, n_chars,
    spans, is_tail) where spans = array of "doc_id:start:end" provenance
    entries covering every char of the chunk that came from a document
    (separator gaps carry no span). The final partial window per partition
    is emitted with is_tail=true — nothing is dropped."""
    if chunk_len <= 0:
        raise ValueError("chunk_len must be positive")
    schema = StructType(
        [
            StructField("chunk_id", LongType()),
            StructField("text", StringType()),
            StructField("n_chars", IntegerType()),
            StructField("spans", ArrayType(StringType())),
            StructField("is_tail", BooleanType()),
        ]
    )

    def chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf[_PART].iloc[0])
        # deterministic concatenation order: id-hash asc then id
        h = pdf["__h"].to_numpy(dtype=np.int64)
        order = np.lexsort((pdf["__id"].to_numpy(dtype=np.int64), h))
        pieces: list[str] = []
        doc_pos: list[tuple[int, int, int]] = []  # (doc_id, start, end) in stream
        pos = 0
        for i in order:
            t = pdf["__text"].iloc[i]
            if t is None:
                continue
            if pieces:
                pos += len(sep)
                pieces.append(sep)
            did = int(pdf["__id"].iloc[i])
            pieces.append(t)
            doc_pos.append((did, pos, pos + len(t)))
            pos += len(t)
        stream = "".join(pieces)
        rows = []
        n_full = len(stream) // chunk_len
        spans_arr = np.array([(s, e) for _, s, e in doc_pos], dtype=np.int64).reshape(-1, 2)
        dids = np.array([d for d, _, _ in doc_pos], dtype=np.int64)

        def spans_for(lo: int, hi: int) -> list[str]:
            if spans_arr.size == 0:
                return []
            sel = (spans_arr[:, 1] > lo) & (spans_arr[:, 0] < hi)
            out = []
            for d, (s, e) in zip(dids[sel], spans_arr[sel]):
                cs, ce = max(int(s), lo) - lo, min(int(e), hi) - lo
                out.append(f"{d}:{cs}:{ce}")
            return out

        for ci in range(n_full):
            lo = ci * chunk_len
            rows.append(
                (
                    (part << 32) | ci,
                    stream[lo : lo + chunk_len],
                    chunk_len,
                    spans_for(lo, lo + chunk_len),
                    False,
                )
            )
        tail = stream[n_full * chunk_len :]
        if tail:
            lo = n_full * chunk_len
            rows.append(
                ((part << 32) | n_full, tail, len(tail), spans_for(lo, lo + len(tail)), True)
            )
        return pd.DataFrame(
            rows, columns=["chunk_id", "text", "n_chars", "spans", "is_tail"]
        )

    keyed = _parted(
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(text_col).alias("__text"),
        ).withColumn("__h", F.xxhash64(F.col("__id"))),
        "__id",
        num_partitions,
    )
    return keyed.groupBy(_PART).applyInPandas(chunk, schema)


def packing_stats(assignment: DataFrame, budget: int) -> DataFrame:
    """One-row packing summary: n_docs, n_bins, utilization (packed length
    over bin capacity, oversize bins excluded), n_oversize."""
    bins = assignment.groupBy("bin_id").agg(
        F.first("bin_fill").alias("fill"), F.max(F.col("oversize").cast("int")).alias("over")
    )
    return bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("over").cast("long").alias("n_oversize"),
        # try_divide: an all-oversize assignment (every doc beyond budget,
        # e.g. a mis-sized budget probe) has NO regular bins — utilization
        # is NULL then, not a crash
        F.round(
            F.try_divide(
                F.sum(F.when(F.col("over") == 0, F.col("fill")).otherwise(F.lit(0))),
                F.sum((F.col("over") == 0).cast("long")) * F.lit(budget),
            ),
            6,
        ).alias("utilization"),
    ).crossJoin(assignment.agg(F.count(F.lit(1)).alias("n_docs")))
