"""Apache DataSketches REQ (Relative Error Quantiles, float) wire format.

The reference stores REQ sketches as the standard datasketches-cpp
``req_sketch<float>::serialize()`` image
(/root/reference/src/req_float_sketch_c_adapter.cpp, cast in/out at
/root/reference/sql/datasketches_req_float_sketch.sql) — cross-readable
with datasketches-{java,cpp,py} (java's ReqSerDe documents the same
binary layout). This module reconstructs that publicly documented layout
(little-endian; serial version 1, family 17):

  Header (8 bytes = 2 preamble ints):
    byte 0:   preamble ints (2 = empty/raw-items/exact, 4 = estimation)
    byte 1:   serial version (1)
    byte 2:   family (17 = REQ)
    byte 3:   flags (bit2 EMPTY, bit3 HIGH_RANK_ACCURACY, bit4 RAW_ITEMS,
              bit5 LEVEL_ZERO_SORTED — two reserved low bits, the theta-
              style convention)
    bytes 4-5: k (u16)
    byte 6:   num compactors (0 when empty)
    byte 7:   num raw items (RAW_ITEMS form only)
  ESTIMATION form (>1 level) appends: [u64 n][f32 min][f32 max]
  then one 20-byte record per compactor, bottom level first:
    [u64 state (compaction counter)][f32 section_size_raw]
    [u8 lg_weight][u8 num_sections][u16 pad][u32 item count]
    [count x f32 items, each level ascending]
  EXACT form (1 compactor): header + the single compactor record;
  n/min/max derive from the items. RAW_ITEMS (read support only; this
  writer emits tiny sketches in the EXACT form, which readers equally
  accept): header + num_raw_items x f32.

Ground truth: verified live against the datasketches-java 6.2.0 bundled
in Spark's jars (tests/test_jvm_groundtruth.py) — images emitted here
heapify in org.apache.datasketches.req.ReqSketch with matching
n/quantiles, and ReqSketch.toByteArray() images parse here, in both the
exact and estimation regimes. (This cross-check caught a wrong
compactor-record field order in the first structural-only version.)
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import req as _r

FAMILY_REQ = 17
_SERIAL_VERSION = 1
_F_EMPTY, _F_HRA, _F_RAW_ITEMS, _F_LZS = 4, 8, 16, 32
_HDR = struct.Struct("<BBBBHBB")
_CREC = struct.Struct("<QfBBxxI")  # state, section_size_raw, lg_weight, num_sections, pad, count


def serialize_canonical(sketch: bytes) -> bytes:
    """Internal REQ state -> canonical DataSketches REQ image."""
    st = _r.ReqState.deserialize(sketch)
    flags = _F_HRA if st.hra else 0
    if st.n == 0:
        return _HDR.pack(2, _SERIAL_VERSION, FAMILY_REQ, flags | _F_EMPTY, st.k, 0, 0)
    num_levels = len(st.levels)
    estimation = num_levels > 1
    parts = []
    for h, lvl in enumerate(st.levels):
        items = np.sort(lvl.buf).astype("<f4") if h == 0 else np.ascontiguousarray(lvl.buf, dtype="<f4")
        parts.append(
            _CREC.pack(lvl.counter, lvl.section_size_raw, h, lvl.num_sections, items.size)
            + items.tobytes()
        )
    flags |= _F_LZS  # level zero written ascending above
    head = _HDR.pack(
        4 if estimation else 2, _SERIAL_VERSION, FAMILY_REQ, flags, st.k, num_levels, 0
    )
    if estimation:
        head += struct.pack("<Qff", st.n, np.float32(st.min), np.float32(st.max))
    return head + b"".join(parts)


def deserialize_canonical(image: bytes) -> bytes:
    """Canonical DataSketches REQ image -> internal state bytes, usable with
    every req_* function. Validates serial version and family."""
    if len(image) < 8:
        raise ValueError("truncated REQ image")
    pre, ser, fam, flags, k, num_levels, num_raw = _HDR.unpack_from(image, 0)
    if ser != _SERIAL_VERSION:
        raise ValueError(f"unsupported REQ serial version {ser} (expected 1)")
    if fam != FAMILY_REQ:
        raise ValueError(f"not a REQ image (family {fam}, expected 17)")
    hra = bool(flags & _F_HRA)
    st = _r.ReqState(max(k, 4), hra)
    st.k = k if k >= 4 else st.k  # preserve the stored k exactly
    if flags & _F_EMPTY:
        return st.serialize()
    if flags & _F_RAW_ITEMS:
        items = np.frombuffer(image, dtype="<f4", count=num_raw, offset=8).astype(np.float32)
        st.n = int(items.size)
        st.min, st.max = float(items.min()), float(items.max())
        st.levels[0].buf = items.copy()
        return st.serialize()
    off = 8
    if pre == 4:
        n, mn, mx = struct.unpack_from("<Qff", image, off)
        off += 16
    elif pre != 2:
        raise ValueError(f"unsupported REQ preamble length {pre}")
    st.levels = []
    for _ in range(max(num_levels, 1)):
        state, ssr, _lg_weight, num_sections, count = _CREC.unpack_from(image, off)
        off += _CREC.size
        lvl = _r._Compactor(st.k)
        lvl.counter = int(state)
        lvl.section_size_raw = float(ssr)
        lvl.num_sections = int(num_sections)
        lvl.buf = np.frombuffer(image, dtype="<f4", count=count, offset=off).copy()
        off += 4 * count
        st.levels.append(lvl)
    if pre == 4:
        st.n, st.min, st.max = int(n), float(mn), float(mx)
    else:
        items = st.levels[0].buf
        st.n = int(items.size)
        st.min = float(items.min()) if items.size else math.inf
        st.max = float(items.max()) if items.size else -math.inf
    return st.serialize()
