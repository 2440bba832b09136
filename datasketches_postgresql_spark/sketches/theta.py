"""Theta (KMV) distinct-count sketch with full set algebra.

Re-expresses the semantics of the reference's theta family
(/root/reference/src/theta_sketch_pg_functions.c,
 /root/reference/src/theta_sketch_c_adapter.cpp,
 /root/reference/sql/datasketches_theta_sketch.sql) as a numpy kernel:

- build(values[, lg_k[, p]])  -> sketch  (sql/datasketches_theta_sketch.sql:105-133)
- union / intersection / a_not_b, both aggregate and pairwise
  (sql:135-163,181-195)
- get_estimate / get_estimate_and_bounds / to_string (sql:165-179)

Semantics preserved (SURVEY.md §2.1):
- default lg_k = 12 (k = 4096 nominal entries), optional sampling p;
- EXACT below k retained entries (theta == 1.0), which the reference's tests
  rely on (/root/reference/test/theta_sketch_test.sql:24-33);
- union keeps min theta, trims to k; intersection keeps min theta;
- results are compact images (sorted hash arrays).

Hash space: unsigned 64-bit. Inputs to the kernel are ALREADY hashed 64-bit
values — hashing raw columns happens JVM-side via ``F.xxhash64`` (Spark-first:
the only work crossing into Python is uint64 arrays, not raw strings).

Serialized layout (little-endian):
    [u8 lg_k][u64 theta][u64 x retained, sorted ascending]
"""

from __future__ import annotations

import numpy as np

DEFAULT_LG_K = 12
_MAX_THETA = np.uint64(0xFFFFFFFFFFFFFFFF)  # theta == 1.0 (exact mode)
_U64 = np.dtype("<u8")


def _k(lg_k: int) -> int:
    return 1 << lg_k


def empty(lg_k: int = DEFAULT_LG_K) -> bytes:
    return serialize(lg_k, _MAX_THETA, np.empty(0, dtype=_U64))


def serialize(lg_k: int, theta: np.uint64, hashes: np.ndarray) -> bytes:
    head = bytes([lg_k]) + np.uint64(theta).tobytes()
    return head + np.ascontiguousarray(hashes, dtype=_U64).tobytes()


def deserialize(buf: bytes) -> tuple[int, np.uint64, np.ndarray]:
    lg_k = buf[0]
    theta = np.frombuffer(buf, dtype=_U64, count=1, offset=1)[0]
    hashes = np.frombuffer(buf, dtype=_U64, offset=9)
    return lg_k, theta, hashes


def _trim(lg_k: int, theta: np.uint64, hashes: np.ndarray) -> tuple[np.uint64, np.ndarray]:
    """Keep only hashes < theta; if more than k retained, raise theta to the
    (k+1)-th smallest hash and keep the k below it (standard KMV/theta trim).
    Exact mode (theta == MAX) covers the FULL 64-bit hash space, so the hash
    value 2^64-1 itself is retained — `< theta` would silently drop it."""
    k = _k(lg_k)
    if theta != _MAX_THETA:
        hashes = hashes[hashes < theta]
    if hashes.size > k:
        hashes = np.sort(hashes)
        theta = hashes[k]
        hashes = hashes[:k]
    return theta, hashes


def _smallest_unique(v: np.ndarray, want: int) -> np.ndarray:
    """Sorted unique values of ``v``, truncated: guaranteed to contain the
    min(want, n_unique) smallest unique values (possibly more, never fewer).

    Selection by THRESHOLD FILTER, not ``np.partition``: sketch inputs are
    64-bit hash values (uniform by contract — the kernel receives xxhash64/
    splitmix output), so the want-th smallest sits near ``(want/n)*2^64`` and
    one vectorized compare-and-compress pass isolates ~c*want candidates.
    That pass is memory-streaming O(n); on this class of hardware both
    ``np.sort`` and ``np.partition`` on 10^7 u64 cost 10-26 s while the
    filter pass costs ~0.1 s, and only the k+1 smallest unique hashes can
    survive the trim anyway. Escalates the threshold (handles duplication /
    mild non-uniformity) and degrades to the full unique only for
    adversarial non-hash inputs."""
    n = v.size
    c = 8.0
    while True:
        frac = c * want / n
        if frac >= 1.0:
            return np.unique(v)
        thresh = np.uint64(int(frac * float(2**64)))
        head = v[v < thresh]
        if head.size == n:
            return np.unique(head)
        if head.size:
            uniq = np.unique(head)
            if uniq.size >= want:
                return uniq
        c *= 16.0


def build(values: np.ndarray, lg_k: int = DEFAULT_LG_K, p: float = 1.0) -> bytes:
    """Build from pre-hashed uint64 values (dedups internally)."""
    theta = _MAX_THETA if p >= 1.0 else np.uint64(int(p * float(2**64 - 1)))
    v = np.asarray(values, dtype=_U64)
    k = _k(lg_k)
    if v.size > 4 * k:
        # only the k+1 smallest unique hashes can survive _trim
        hashes = _smallest_unique(v, k + 1)
    else:
        hashes = np.unique(v)
    theta, hashes = _trim(lg_k, theta, hashes)
    return serialize(lg_k, theta, np.sort(hashes))


def union(sketches: list[bytes], lg_k: int | None = None) -> bytes:
    parts = [deserialize(s) for s in sketches if s is not None]
    if not parts:
        return empty(lg_k or DEFAULT_LG_K)
    out_lg_k = lg_k if lg_k is not None else min(p[0] for p in parts)
    theta = min(p[1] for p in parts)
    concat = np.concatenate([p[2] for p in parts])
    k = _k(out_lg_k)
    hashes = _smallest_unique(concat, k + 1) if concat.size > 4 * k else np.unique(concat)
    theta, hashes = _trim(out_lg_k, theta, hashes)
    return serialize(out_lg_k, theta, np.sort(hashes))


def intersection(sketches: list[bytes]) -> bytes:
    """Intersection over >=1 sketches; keeps min theta, intersects retained
    sets filtered below it (src/theta_sketch_c_adapter.cpp:215-239 semantics)."""
    parts = [deserialize(s) for s in sketches if s is not None]
    if not parts:
        return empty()
    lg_k = min(p[0] for p in parts)
    theta = min(p[1] for p in parts)
    acc = parts[0][2]
    for _, _, h in parts[1:]:
        acc = np.intersect1d(acc, h, assume_unique=True)
    if theta != _MAX_THETA:
        acc = acc[acc < theta]
    return serialize(lg_k, theta, np.sort(acc))


def a_not_b(a: bytes, b: bytes) -> bytes:
    """Set difference A \\ B (src/theta_sketch_c_adapter.cpp:253-264)."""
    lg_a, th_a, ha = deserialize(a)
    _, th_b, hb = deserialize(b)
    theta = min(th_a, th_b)
    out = np.setdiff1d(ha, hb, assume_unique=True)
    if theta != _MAX_THETA:
        out = out[out < theta]
    return serialize(lg_a, theta, np.sort(out))


def get_estimate(sketch: bytes) -> float:
    _, theta, hashes = deserialize(sketch)
    if theta == _MAX_THETA:
        return float(hashes.size)
    return float(hashes.size) / (float(theta) / float(2**64))


def get_estimate_and_bounds(sketch: bytes, num_std_devs: int = 1) -> tuple[float, float, float]:
    """(estimate, lower, upper). Exact mode -> all equal. Estimation mode uses
    the normal approximation of the KMV estimator: var ~= r(1-theta)/theta^2."""
    _, theta, hashes = deserialize(sketch)
    r = float(hashes.size)
    if theta == _MAX_THETA:
        return r, r, r
    th = float(theta) / float(2**64)
    est = r / th
    sd = np.sqrt(r * (1.0 - th)) / th
    lb = max(r, est - num_std_devs * sd)
    ub = est + num_std_devs * sd
    return est, lb, ub


def to_string(sketch: bytes) -> str:
    lg_k, theta, hashes = deserialize(sketch)
    exact = theta == _MAX_THETA
    return (
        "### Theta sketch summary:\n"
        f"   lg_k            : {lg_k}\n"
        f"   retained entries: {hashes.size}\n"
        f"   theta (fraction): {float(theta) / float(2**64):.6f}\n"
        f"   estimation mode : {not exact}\n"
        f"   estimate        : {get_estimate(sketch):.1f}\n"
    )
