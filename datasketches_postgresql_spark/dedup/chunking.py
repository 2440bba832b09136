"""Content-defined chunking (CDC) for distributed exact-substring candidate
generation.

Why: a suffix array per host group has an inherent straggler (the largest
host) and misses cross-host containment. CDC removes both: cut every
document at positions where the 9-char rolling hash satisfies
``roll % divisor == 0`` (content-defined, so two copies of the same text cut
at the same content positions), hash each chunk's FULL content, and join on
chunk hashes — any two documents sharing a verbatim region spanning at least
one interior chunk land in the same bucket. O(total chars) work, perfectly
parallel, shuffle volume ~ 16 bytes per ~divisor chars of text.

The suffix-array layer then runs only on the tiny candidate groups
(suffix.sa_verify_pairs), turning it from a per-host monolith into a
per-pair check — "suffix-array-based exact-substring dedup" with CDC doing
the map-side pruning.

Chunk content hashes are computed with an invertible-power prefix polynomial
(mod 2^64): S[i] = sum c_j * Binv^j, hash(l, r) = (S[r] - S[l]) * B^r, all
vectorized; no per-chunk Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .shingle import _BASE, _codepoints, splitmix64

DEFAULT_DIVISOR = 64
DEFAULT_MIN_CHUNK = 32
_BINV = pow(int(_BASE), -1, 1 << 64)  # modular inverse of the odd base


def _prefix_powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """B^i and B^-i mod 2^64 for i in [0, n] via wraparound cumprod."""
    with np.errstate(over="ignore"):
        pows = np.empty(n + 1, dtype=np.uint64)
        pows[0] = 1
        np.cumprod(np.full(n, _BASE, dtype=np.uint64), out=pows[1:])
        ipows = np.empty(n + 1, dtype=np.uint64)
        ipows[0] = 1
        np.cumprod(np.full(n, np.uint64(_BINV), dtype=np.uint64), out=ipows[1:])
    return pows, ipows


def chunk_hashes_batch(
    texts: pd.Series,
    divisor: int = DEFAULT_DIVISOR,
    min_chunk: int = DEFAULT_MIN_CHUNK,
    shingle_n: int = 9,
) -> list[np.ndarray]:
    """Per-doc arrays of content hashes for CDC chunks >= min_chunk chars.
    Deterministic per document (independent of batching/neighbors)."""
    codes, offsets = _codepoints(texts)
    total = codes.size
    out: list[np.ndarray] = []
    if total == 0:
        return [np.empty(0, dtype=np.uint64) for _ in range(len(texts))]
    # rolling 9-gram hash over the concatenation (same kernel as shingling)
    m = max(total - shingle_n + 1, 0)
    roll = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(shingle_n):
            roll = roll * _BASE + codes[j : j + m]
    roll = splitmix64(roll)
    is_cut = (roll % np.uint64(divisor)) == 0

    # prefix polynomial sums for O(1) substring hashes
    pows, ipows = _prefix_powers(total)
    with np.errstate(over="ignore"):
        weighted = codes * ipows[:total]
        prefix = np.concatenate([[np.uint64(0)], np.cumsum(weighted, dtype=np.uint64)])

    for d in range(len(texts)):
        start, end = int(offsets[d]), int(offsets[d + 1])
        ln = end - start
        if ln < min_chunk:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        # cut positions strictly inside the doc (a cut at i ends a chunk at i)
        lo, hi = start, max(start, end - shingle_n + 1)
        local_cuts = start + np.flatnonzero(is_cut[lo:hi])
        bounds = np.concatenate([[start], local_cuts, [end]]).astype(np.int64)
        ls, rs = bounds[:-1], bounds[1:]
        keep = (rs - ls) >= min_chunk
        ls, rs = ls[keep], rs[keep]
        if ls.size == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        with np.errstate(over="ignore"):
            h = (prefix[rs] - prefix[ls]) * pows[rs]
            h = splitmix64(h ^ (rs - ls).astype(np.uint64))
        out.append(np.unique(h))
    return out


CHUNK_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("chunk_hash", LongType())]
)


def chunk_stage(
    extracted: DataFrame,
    divisor: int = DEFAULT_DIVISOR,
    min_chunk: int = DEFAULT_MIN_CHUNK,
) -> DataFrame:
    """(doc_id, text) -> exploded (doc_id, chunk_hash) rows."""
    proj = extracted.select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ch = chunk_hashes_batch(pdf["text"], divisor, min_chunk)
            lens = np.array([c.size for c in ch], dtype=np.int64)
            if lens.sum() == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), lens),
                    "chunk_hash": np.concatenate(ch).view(np.int64),
                }
            )

    return proj.mapInPandas(run, schema=CHUNK_SCHEMA)


def substring_candidates(
    extracted: DataFrame,
    divisor: int = DEFAULT_DIVISOR,
    min_chunk: int = DEFAULT_MIN_CHUNK,
    max_bucket: int = 512,
) -> DataFrame:
    """Candidate substring-dup edges (a, b): docs sharing any CDC chunk.
    Star edges per chunk bucket (O(bucket)); buckets larger than
    ``max_bucket`` (mass boilerplate) are dropped — they represent content
    shared by hundreds of documents, which the near-dup LSH layer already
    handles; the cap is a documented precision/size guard."""
    ch = chunk_stage(extracted, divisor, min_chunk)
    buckets = (
        ch.groupBy("chunk_hash")
        .agg(F.min("doc_id").alias("root"), F.count("*").alias("cnt"))
        .where((F.col("cnt") > 1) & (F.col("cnt") <= max_bucket))
    )
    chj = ch.join(buckets, "chunk_hash")
    # all pairs for small buckets (each pair gets its own SA verification —
    # a star hub failing verification must never disconnect a true pair);
    # star edges keep big buckets O(bucket)
    pair_cap = 16
    small = chj.where(F.col("cnt") <= pair_cap).select("chunk_hash", "doc_id")
    pairs = (
        small.alias("l")
        .join(small.alias("r"), "chunk_hash")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )
    star = (
        chj.where(F.col("cnt") > pair_cap)
        .where(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("a"), F.col("doc_id").alias("b"))
    )
    return pairs.union(star).distinct()
