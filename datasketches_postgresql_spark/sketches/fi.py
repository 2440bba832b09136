"""Frequent-items (heavy hitters) sketch for strings — Misra-Gries with
median-purge and a global error offset, matching the reference's
frequent_strings surface
(/root/reference/src/frequent_strings_sketch_pg_functions.c,
 /root/reference/sql/datasketches_frequent_strings_sketch.sql):

- build(lg_k, values[, weights])     (sql:65-83; weight default 1 at
  src/frequent_strings_sketch_pg_functions.c:83)
- merge(lg_k, sketches)              (sql:85-93)
- result_no_false_positives / result_no_false_negatives ([threshold]) ->
  rows (str, estimate, lower_bound, upper_bound) sorted by estimate desc
  (sql:103-123; error-policy switch at
  src/frequent_strings_sketch_c_adapter.cpp:164-169)
- to_string                          (sql:95-101)

Invariant (classic Misra-Gries): for every tracked item the stored count c
satisfies  c <= true_count <= c + offset  where ``offset`` is the cumulative
weight subtracted by purges. Hence lower_bound = c, upper_bound = estimate =
c + offset (DataSketches reports the upper bound as the estimate). While no
purge has occurred the sketch is EXACT with lb == est == ub — the regime the
reference's tests use (test/fi_sketch_test.sql:7-19).

Capacity: 0.75 * 2^lg_k tracked items (DataSketches load factor).

Serialized layout: [u8 lg_k][u64 offset][u32 num] then per item
[u32 len][utf8 bytes][i64 count].
"""

from __future__ import annotations

import struct

import numpy as np

NO_FALSE_POSITIVES = "NO_FALSE_POSITIVES"
NO_FALSE_NEGATIVES = "NO_FALSE_NEGATIVES"


class FiState:
    __slots__ = ("lg_k", "offset", "items")

    def __init__(self, lg_k: int):
        self.lg_k = int(lg_k)
        self.offset = 0  # cumulative purged weight (max undercount of counts)
        self.items: dict[str, int] = {}  # str -> lower-bound count

    @property
    def cap(self) -> int:
        return max(1, (3 * (1 << self.lg_k)) // 4)

    def update(self, values, weights=None) -> None:
        if weights is None:
            uniq, counts = np.unique(np.asarray(values, dtype=object), return_counts=True)
            agg = zip(uniq.tolist(), counts.tolist())
        else:
            import pandas as pd

            agg = (
                pd.Series(np.asarray(weights, dtype=np.int64), index=values)
                .groupby(level=0)
                .sum()
                .items()
            )
        for s, w in agg:
            if s is None:
                continue
            self.items[s] = self.items.get(s, 0) + int(w)
        self._purge_if_needed()

    def _purge_if_needed(self) -> None:
        while len(self.items) > self.cap:
            counts = np.fromiter(self.items.values(), dtype=np.int64)
            m = max(int(np.median(counts)), 1)
            self.offset += m
            self.items = {s: c - m for s, c in self.items.items() if c - m > 0}

    def merge(self, other: "FiState") -> None:
        for s, c in other.items.items():
            self.items[s] = self.items.get(s, 0) + c
        self.offset += other.offset
        self._purge_if_needed()

    def result(self, policy: str = NO_FALSE_NEGATIVES, threshold: int = 0):
        """Rows (str, estimate, lower_bound, upper_bound) sorted by estimate
        desc (ties: lexicographic for determinism)."""
        rows = []
        for s, c in self.items.items():
            lb, ub = c, c + self.offset
            keep = (lb > threshold) if policy == NO_FALSE_POSITIVES else (ub > threshold)
            if keep:
                rows.append((s, ub, lb, ub))
        rows.sort(key=lambda t: (-t[1], t[0]))
        return rows

    def to_string(self, print_items: bool = False) -> str:
        out = (
            "### Frequent strings sketch summary:\n"
            f"   lg_k   : {self.lg_k}\n"
            f"   items  : {len(self.items)}\n"
            f"   offset : {self.offset}\n"
        )
        if print_items:
            for s, e, lb, ub in self.result(NO_FALSE_NEGATIVES, 0):
                out += f"   {s}: est={e} lb={lb} ub={ub}\n"
        return out

    def serialize(self) -> bytes:
        parts = [struct.pack("<BQI", self.lg_k, self.offset, len(self.items))]
        for s, c in self.items.items():
            b = s.encode("utf-8")
            parts.append(struct.pack("<I", len(b)) + b + struct.pack("<q", c))
        return b"".join(parts)

    @classmethod
    def deserialize(cls, buf: bytes) -> "FiState":
        lg_k, offset, num = struct.unpack_from("<BQI", buf, 0)
        st = cls(lg_k)
        st.offset = offset
        pos = 13
        for _ in range(num):
            (ln,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            s = buf[pos : pos + ln].decode("utf-8")
            pos += ln
            (c,) = struct.unpack_from("<q", buf, pos)
            pos += 8
            st.items[s] = c
        return st


def build(lg_k: int, values, weights=None) -> bytes:
    st = FiState(lg_k)
    st.update(values, weights)
    return st.serialize()


def merge(lg_k: int, sketches: list[bytes]) -> bytes:
    acc = FiState(lg_k)
    for s in sketches:
        if s is not None:
            acc.merge(FiState.deserialize(s))
    return acc.serialize()
