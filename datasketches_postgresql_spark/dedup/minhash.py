"""MinHash signatures + SimHash fingerprints, vectorized across whole Arrow
batches (north_rule: "vectorized MinHash signatures (k permutations over
character n-gram shingles via pandas/Arrow UDFs)").

MinHash permutations: x -> a*x + b (mod 2^64) with odd ``a`` — a GENUINE
bijection of the u64 hash universe (multiply-add group), so taking the min
per permutation is a textbook MinHash. All k permutations of all shingles of
all docs in a batch are evaluated as one (k, M) numpy broadcast followed by
``np.minimum.reduceat`` at doc offsets — no per-doc loop in the hot path.

SimHash: 64-bit sign hash over the same shingle set; per-bit majority via
one ``np.add.reduceat`` over the unpacked bit matrix.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .shingle import DEFAULT_SHINGLE_N, shingle_hash_batch, splitmix64

DEFAULT_NUM_PERM = 128
_CHUNK_ELEMS = 32_000_000  # cap the (k, M) broadcast at ~256 MB per chunk


def _perm_coeffs(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    shingles: list[np.ndarray], num_perm: int = DEFAULT_NUM_PERM, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signature matrix. Empty docs -> u64 max."""
    a, b = _perm_coeffs(num_perm, seed)
    n_docs = len(shingles)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_docs == 0:
        return sig
    lens = np.array([s.size for s in shingles], dtype=np.int64)
    nonempty = np.flatnonzero(lens)
    if nonempty.size == 0:
        return sig
    # chunk docs so the (num_perm, M) matrix stays bounded
    max_m = max(_CHUNK_ELEMS // num_perm, int(lens.max()))
    start = 0
    while start < nonempty.size:
        end = start
        m = 0
        while end < nonempty.size and (m == 0 or m + lens[nonempty[end]] <= max_m):
            m += lens[nonempty[end]]
            end += 1
        idx = nonempty[start:end]
        concat = np.concatenate([shingles[i] for i in idx])
        offs = np.zeros(idx.size, dtype=np.int64)
        np.cumsum(lens[idx][:-1], out=offs[1:])
        with np.errstate(over="ignore"):
            proj = concat[None, :] * a[:, None] + b[:, None]  # (k, M)
        mins = np.minimum.reduceat(proj, offs, axis=1)  # (k, n_chunk)
        sig[idx] = mins.T
        start = end
    return sig


def simhash(shingles: list[np.ndarray]) -> np.ndarray:
    """(n_docs,) int64 simhash (bit b set iff majority of shingle hashes have
    bit b set). Empty docs -> 0."""
    n_docs = len(shingles)
    out = np.zeros(n_docs, dtype=np.uint64)
    lens = np.array([s.size for s in shingles], dtype=np.int64)
    nonempty = np.flatnonzero(lens)
    if nonempty.size == 0:
        return out.view(np.int64)
    concat = np.concatenate([shingles[i] for i in nonempty])
    bits = (
        (concat[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int32)  # (M, 64)
    offs = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offs[1:])
    sums = np.add.reduceat(bits, offs, axis=0)  # (n_nonempty, 64)
    half = (lens[nonempty] / 2.0)[:, None]
    sim_bits = (sums * 2 > 2 * half).astype(np.uint64)
    vals = (sim_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = vals
    return out.view(np.int64)


SIGNATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("n_shingles", LongType()),
        StructField("minhash", ArrayType(LongType())),
        StructField("simhash", LongType()),
        # per-batch theta partial over the shingle hash space: the
        # distinct-shingle lineage metric (one non-null row per Arrow batch;
        # the pipeline unions them — mergeable partial aggregation exactly
        # like the reference's COMBINEFUNC protocol)
        StructField("shingle_theta", BinaryType()),
    ]
)


def signature_stage(
    extracted: DataFrame,
    shingle_n: int = DEFAULT_SHINGLE_N,
    num_perm: int = DEFAULT_NUM_PERM,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, url, text, ...) -> (doc_id, url, n_shingles, minhash, simhash)."""
    proj = extracted.select("doc_id", "url", "text")
    from ..sketches import theta as _theta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sh = shingle_hash_batch(pdf["text"], n=shingle_n)
            sig = minhash_signatures(sh, num_perm=num_perm, seed=seed)
            sim = simhash(sh)
            all_sh = np.concatenate(sh) if sh else np.empty(0, dtype=np.uint64)
            theta_partial = [None] * len(pdf)
            theta_partial[0] = _theta.build(all_sh)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "url": pdf["url"].to_numpy(),
                    "n_shingles": np.array([s.size for s in sh], dtype=np.int64),
                    "minhash": list(sig.view(np.int64)),
                    "simhash": sim,
                    "shingle_theta": theta_partial,
                }
            )

    return proj.mapInPandas(run, schema=SIGNATURE_SCHEMA)
