"""Classic quantiles DoublesSketch (Agarwal et al. "Mergeable Summaries";
the legacy family the reference keeps "to support legacy sketch data",
META.json:50-53, surface /root/reference/sql/datasketches_quantiles_double_sketch.sql,
core delegation src/quantiles_double_sketch_c_adapter.cpp).

Round 2 aliased this family to KLL; this is the REAL sketch: base buffer of
2k raw items plus a ladder of levels where level i is either empty or holds
exactly k sorted items of weight 2^(i+1). The occupied-level bit pattern is
ALWAYS n // (2k) and the base-buffer count n % (2k) — compaction is binary
addition with carries — which the canonical wire format depends on (readers
reconstruct the layout from n alone).

Canonical DataSketches wire format (serial version 3, family 8, publicly
documented at datasketches.apache.org and in the Apache-2.0 core libraries),
little-endian, compact+ordered variant:

    byte 0   preamble longs (1 empty, 2 non-empty)
    byte 1   serial version (3)
    byte 2   family (8 = QUANTILES)
    byte 3   flags (1=big-endian, 2=read-only, 4=empty, 8=compact, 16=ordered)
    bytes 4-5  k (u16)   bytes 6-7 unused
    non-empty: long 1 = n (u64); f64 min_item; f64 max_item;
               base buffer (n % 2k items, sorted — ordered flag);
               each occupied level (bit i of n // (2k)), ascending, k items.

Compaction offset: deterministic per-sketch counter (same policy as the KLL
kernel — reproducible across parallelism levels) instead of a random bit;
the image stays canonical because the format does not encode the offsets.

Query semantics (rank/quantile/pmf/cdf/histogram) are shared with KLL via
QuantileQueriesMixin — the reference implements both families against the
same core query code.
"""

from __future__ import annotations

import struct

import numpy as np

from .kll import QuantileQueriesMixin

DEFAULT_K = 128  # src/quantiles_double_sketch_c_adapter.h:29
_SER_VER = 3
_FAMILY = 8
_F_READ_ONLY, _F_EMPTY, _F_COMPACT, _F_ORDERED = 2, 4, 8, 16


def _total_order_sort(arr: np.ndarray) -> np.ndarray:
    """Sort doubles by IEEE-754 total order so the wire image is a canonical
    function of the multiset: plain np.sort orders tied -0.0/0.0 arbitrarily
    (quicksort, unstable), making serialize->deserialize->serialize flip sign
    bits between equal keys."""
    bits = np.ascontiguousarray(arr, dtype=np.float64).view(np.uint64)
    key = np.where(
        bits >> np.uint64(63),
        ~bits,
        bits | np.uint64(0x8000000000000000),
    )
    return arr[np.argsort(key, kind="stable")]


class QuantilesState(QuantileQueriesMixin):
    __slots__ = ("k", "n", "cc", "min", "max", "bb", "levels")

    def __init__(self, k: int = DEFAULT_K):
        k = int(k)
        if k < 2 or (k & (k - 1)):
            raise ValueError(f"quantiles k must be a power of two >= 2, got {k}")
        self.k = k
        self.n = 0
        self.cc = 0  # compaction counter -> deterministic zip offset
        self.min = np.inf
        self.max = -np.inf
        self.bb = np.empty(0, dtype=np.float64)  # base buffer, weight-1 items
        self.levels: dict[int, np.ndarray] = {}  # level -> k sorted items

    # -- updates -------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.n += int(v.size)
        cap = 2 * self.k
        pos = 0
        while pos < v.size:
            take = min(cap - self.bb.size, v.size - pos)
            self.bb = np.concatenate([self.bb, v[pos : pos + take]])
            pos += take
            if self.bb.size == cap:
                self._promote(np.sort(self.bb), 0)
                self.bb = np.empty(0, dtype=np.float64)

    def _zip(self, sorted_2k: np.ndarray) -> np.ndarray:
        off = self.cc & 1
        self.cc += 1
        return sorted_2k[off::2]

    def _promote(self, sorted_2k: np.ndarray, level: int) -> None:
        """Carry-propagate a sorted 2k-item buffer into the level ladder
        (binary addition: zip to k, place or merge upward)."""
        carry = self._zip(sorted_2k)
        while level in self.levels:
            existing = self.levels.pop(level)
            merged = np.sort(np.concatenate([existing, carry]))
            carry = self._zip(merged)
            level += 1
        self.levels[level] = carry

    def merge(self, other: "QuantilesState") -> None:
        if other.n == 0:
            return
        if other.k < self.k:
            raise ValueError(
                f"cannot merge quantiles sketch with smaller k ({other.k} < {self.k})"
            )
        self.update(other.bb)
        for lvl in sorted(other.levels):
            carry = other.levels[lvl]
            self.n += other.k << (lvl + 1)  # total items this level represents
            level = lvl
            # downsample a larger-k level: each zip halves the item count and
            # doubles per-item weight (k_other/k_self is a power of two), so
            # total weight is preserved and the carry lands k_self-sized
            while carry.size > self.k:
                carry = self._zip(carry)
                level += 1
            while level in self.levels:
                existing = self.levels.pop(level)
                merged = np.sort(np.concatenate([existing, carry]))
                carry = self._zip(merged)
                level += 1
            self.levels[level] = carry
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)

    # -- queries (QuantileQueriesMixin needs this view) ------------------------
    def _sorted_view(self) -> tuple[np.ndarray, np.ndarray]:
        parts = [self.bb]
        weights = [np.ones(self.bb.size, dtype=np.int64)]
        for lvl, arr in self.levels.items():
            parts.append(arr)
            weights.append(np.full(arr.size, 1 << (lvl + 1), dtype=np.int64))
        items = np.concatenate(parts)
        w = np.concatenate(weights)
        order = np.argsort(items, kind="stable")
        return items[order], w[order]

    def _retained(self) -> int:
        return self.bb.size + sum(a.size for a in self.levels.values())

    # -- canonical wire format -------------------------------------------------
    def serialize(self) -> bytes:
        if self.n == 0:
            flags = _F_READ_ONLY | _F_EMPTY | _F_COMPACT | _F_ORDERED
            return struct.pack("<BBBBHH", 1, _SER_VER, _FAMILY, flags, self.k, 0)
        assert self.bb.size == self.n % (2 * self.k), "base-buffer invariant"
        bit_pattern = self.n // (2 * self.k)
        assert all(
            ((bit_pattern >> i) & 1) == (i in self.levels)
            for i in range(max(self.levels, default=-1) + 1)
        ), "level bit-pattern invariant"
        flags = _F_READ_ONLY | _F_COMPACT | _F_ORDERED
        head = struct.pack("<BBBBHH", 2, _SER_VER, _FAMILY, flags, self.k, 0)
        head += struct.pack("<Q", self.n) + struct.pack("<dd", self.min, self.max)
        body = _total_order_sort(self.bb).astype("<f8").tobytes()
        for lvl in sorted(self.levels):
            body += self.levels[lvl].astype("<f8").tobytes()
        return head + body

    @classmethod
    def deserialize(cls, buf: bytes) -> "QuantilesState":
        pre, ser, fam, flags, k, _ = struct.unpack_from("<BBBBHH", buf, 0)
        if ser != _SER_VER:
            raise ValueError(f"unsupported quantiles serial version {ser}")
        if fam != _FAMILY:
            raise ValueError(f"not a quantiles sketch image (family {fam})")
        st = cls(k)
        if flags & _F_EMPTY:
            return st
        (st.n,) = struct.unpack_from("<Q", buf, 8)
        st.min, st.max = struct.unpack_from("<dd", buf, 16)
        off = 32
        bb_count = st.n % (2 * k)
        st.bb = np.frombuffer(buf, dtype="<f8", count=bb_count, offset=off).copy()
        off += 8 * bb_count
        bit_pattern = st.n // (2 * k)
        lvl = 0
        while bit_pattern:
            if bit_pattern & 1:
                arr = np.frombuffer(buf, dtype="<f8", count=k, offset=off)
                # levels must be kept sorted (serialize writes them under the
                # ORDERED flag); an unordered legacy image needs the sort here
                st.levels[lvl] = (
                    arr.copy() if flags & _F_ORDERED else np.sort(arr)
                )
                off += 8 * k
            bit_pattern >>= 1
            lvl += 1
        return st

    def to_string(self) -> str:
        return (
            "### Quantiles sketch summary:\n"
            f"   k        : {self.k}\n"
            f"   n        : {self.n}\n"
            f"   levels   : {len(self.levels)}\n"
            f"   retained : {self._retained()}\n"
            f"   min,max  : {self.min},{self.max}\n"
        )


def build(values: np.ndarray, k: int = DEFAULT_K) -> bytes:
    st = QuantilesState(k)
    st.update(np.asarray(values, dtype=np.float64))
    return st.serialize()


def merge(sketches: list[bytes], k: int | None = None) -> bytes:
    states = [QuantilesState.deserialize(bytes(s)) for s in sketches if s is not None]
    if not states:
        return QuantilesState(k or DEFAULT_K).serialize()
    # union semantics: the gadget k is the smallest seen (a larger requested
    # k cannot be honored once a smaller-k input exists)
    target_k = min(s.k for s in states)
    if k:
        target_k = min(target_k, int(k))
    acc = QuantilesState(target_k)
    for s in states:
        acc.merge(s)
    return acc.serialize()
