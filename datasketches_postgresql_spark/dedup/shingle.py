"""Character n-gram shingling — fully vectorized rolling polynomial hash.

All texts of an Arrow batch are concatenated into ONE codepoint array; the
rolling hash is computed over the whole concatenation in n numpy passes
(n = shingle length, so 9 passes for the default config — no per-row Python,
no per-shingle loop). Windows crossing document boundaries are discarded via
offset slicing. A splitmix64 finalizer de-correlates the polynomial
structure so shingle hashes are uniform in u64 (required by the multiply-add
MinHash permutations downstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_SHINGLE_N = 9
_BASE = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _codepoints(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate all texts -> (uint64 codepoint array, doc offsets).
    offsets[i]:offsets[i+1] is doc i's slice."""
    joined = "".join(texts.fillna(""))
    lens = texts.fillna("").str.len().to_numpy(dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    return codes, offsets


def shingle_hash_batch(
    texts: pd.Series, n: int = DEFAULT_SHINGLE_N, unique: bool = True
) -> list[np.ndarray]:
    """Per-doc arrays of shingle hashes (uint64). Docs shorter than n chars
    contribute a single whole-text hash (so short docs still dedup exactly)."""
    codes, offsets = _codepoints(texts)
    total = codes.size
    if total == 0:
        return [np.empty(0, dtype=np.uint64) for _ in range(len(texts))]
    # rolling polynomial over the whole concatenation: n vectorized passes
    m = max(total - n + 1, 0)
    roll = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            roll = roll * _BASE + codes[j : j + m]
    roll = splitmix64(roll)

    out: list[np.ndarray] = []
    for i in range(len(texts)):
        start, end = offsets[i], offsets[i + 1]
        ln = end - start
        if ln == 0:
            out.append(np.empty(0, dtype=np.uint64))
        elif ln < n:
            # whole-short-doc hash: polynomial over its codes
            with np.errstate(over="ignore"):
                h = np.uint64(0)
                for c in codes[start:end]:
                    h = h * _BASE + c
            out.append(splitmix64(np.array([h], dtype=np.uint64)))
        else:
            sl = roll[start : end - n + 1]
            out.append(np.unique(sl) if unique else sl)
    return out
