"""MurmurHash3 x64-128 (Austin Appleby's public-domain algorithm) — the hash
the Apache DataSketches ecosystem keys theta sketches with (the reference
links the same core library; seed handling per
/root/reference/src/theta_sketch_c_adapter.cpp which delegates to the core's
update path).

Two implementations, cross-checked in tests:
- ``hash128_u64``: numpy-vectorized over arrays of 8-byte little-endian keys
  (the fixed-length tail branch of the algorithm — no 16-byte blocks, so the
  whole hash is a handful of u64 multiplies/rotates per lane);
- ``hash128_bytes``: scalar reference for arbitrary byte strings (strings,
  seed-hash computation).
"""

from __future__ import annotations

import numpy as np

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def hash128_bytes(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3_x64_128 of a byte string -> (h1, h2) as unsigned ints."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = seed & _M
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def hash128_u64(keys: np.ndarray, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized MurmurHash3_x64_128 of 8-byte little-endian keys
    (len == 8: one tail block, no body) -> (h1, h2) uint64 arrays."""
    c1 = np.uint64(_C1)
    c2 = np.uint64(_C2)
    k = np.asarray(keys, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h1 = np.full(k.shape, np.uint64(seed), dtype=np.uint64)
        h2 = h1.copy()
        k1 = k * c1
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 = k1 * c2
        h1 = h1 ^ k1
        h1 = h1 ^ np.uint64(8)
        h2 = h2 ^ np.uint64(8)
        h1 = h1 + h2
        h2 = h2 + h1
        for h in (h1, h2):
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
        h1 = h1 + h2
        h2 = h2 + h1
    return h1, h2
