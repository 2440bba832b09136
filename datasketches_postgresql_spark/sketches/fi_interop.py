"""Canonical Apache DataSketches frequent-items (strings) wire format.

The reference's `frequent_strings_sketch` type is a bytea holding exactly
what datasketches-cpp `frequent_items_sketch<std::string>::serialize()`
emits (built at /root/reference/src/frequent_strings_sketch_c_adapter.cpp,
cast in/out at /root/reference/sql/datasketches_frequent_strings_sketch.sql:31-42),
so images interop with Druid/Hive/datasketches-{java,cpp,py}. These adapters
give the Spark engine's FI family the same property.

Publicly documented layout (datasketches-cpp frequent_items_sketch_impl.hpp
/ java PreambleUtil), little-endian:

  Empty (8 bytes):
    [u8 preamble_longs=1][u8 serial_version=1][u8 family=10]
    [u8 lg_max_map_size][u8 lg_cur_map_size][u8 flags=EMPTY][u16 unused]
  Non-empty (preamble_longs=4):
    [... flags=0 ...]
    [u32 num_active][u32 unused]
    [u64 total_weight][u64 offset]
    [u64 weights[num_active]]
    [items: per string, u32 utf8-length + bytes]

Semantics mapping (documented, not silent): the internal state tracks a
per-item error (tighter bounds than the wire format can carry); export
stores each item's upper-bound counter as the canonical weight and the
global ``offset`` as max(evicted counter, per-item errors) so the standard
lower bound (weight - offset) remains VALID, merely looser. Import assigns
every item the global offset as its error — exactly the standard model.
"""

from __future__ import annotations

import struct

import numpy as np

from . import fi as _fi

FAMILY_FI = 10
_SERIAL_VERSION = 1
_PRE_EMPTY, _PRE_FULL = 1, 4
_F_EMPTY = 1
_LG_MIN_MAP_SIZE = 3
_LOAD_FACTOR = 0.75


def _lg_cur_map_size(num_active: int) -> int:
    lg = _LG_MIN_MAP_SIZE
    while num_active > int(_LOAD_FACTOR * (1 << lg)):
        lg += 1
    return lg


def serialize(sketch: bytes) -> bytes:
    """Internal FI state -> canonical DataSketches frequent-strings image."""
    st = _fi.FiState.deserialize(sketch)
    if not st.items and st.total == 0:
        return struct.pack(
            "<BBBBBBH", _PRE_EMPTY, _SERIAL_VERSION, FAMILY_FI,
            st.lg_k, _LG_MIN_MAP_SIZE, _F_EMPTY, 0,
        )
    # keep the standard lower bound (weight - offset) valid for every item
    offset = st.offset
    for _ub, err in st.items.values():
        offset = max(offset, err)
    rows = sorted(st.items.items())  # deterministic image
    head = struct.pack(
        "<BBBBBBH", _PRE_FULL, _SERIAL_VERSION, FAMILY_FI,
        st.lg_k, _lg_cur_map_size(len(rows)), 0, 0,
    )
    mid = struct.pack("<IIQQ", len(rows), 0, st.total, offset)
    weights = np.array([ub for _, (ub, _e) in rows], dtype="<u8").tobytes()
    items = b"".join(
        struct.pack("<I", len(b)) + b for b in (s.encode("utf-8") for s, _ in rows)
    )
    return head + mid + weights + items


def deserialize(image: bytes) -> bytes:
    """Canonical DataSketches frequent-strings image -> internal state."""
    if len(image) < 8:
        raise ValueError("frequent-strings image too short")
    pre, ser, fam, lg_max, _lg_cur, flags, _ = struct.unpack_from("<BBBBBBH", image, 0)
    if fam != FAMILY_FI:
        raise ValueError(f"not a frequent-items image (family {fam}, expected {FAMILY_FI})")
    if ser != _SERIAL_VERSION:
        raise ValueError(f"unsupported frequent-items serial version {ser}")
    st = _fi.FiState(lg_max)
    if flags & _F_EMPTY or pre == _PRE_EMPTY:
        return st.serialize()
    num, _, total, offset = struct.unpack_from("<IIQQ", image, 8)
    weights = np.frombuffer(image, dtype="<u8", count=num, offset=32)
    pos = 32 + 8 * num
    st.total, st.offset = int(total), int(offset)
    for i in range(num):
        (ln,) = struct.unpack_from("<I", image, pos)
        pos += 4
        s = image[pos: pos + ln].decode("utf-8")
        pos += ln
        st.items[s] = [int(weights[i]), int(offset)]
    return st.serialize()
