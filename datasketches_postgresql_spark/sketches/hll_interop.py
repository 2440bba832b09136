"""Apache DataSketches HLL wire-format interop (all tgt types).

The reference stores the standard DataSketches HLL image for EVERY tgt_type
(src/hll_sketch_c_adapter.cpp:38-48 serializes via the core library); round 2
emitted a private packed format for HLL_4/HLL_6 (magic 0x48). This module
emits and reads the canonical image (serial version 1, family 7, publicly
documented at datasketches.apache.org and in the Apache-2.0 core libraries),
so narrow sketches are binary-compatible with Druid / Hive /
datasketches-{java,cpp,py} — and with Spark's own native hll_* functions,
which wrap datasketches-java (the in-sandbox ground truth our tests verify
against).

HLL-mode layout (little-endian; preamble 40 bytes = 10 ints):
    byte 0  preInts (LIST=2, SET=3, HLL=10)
    byte 1  serVer (1)
    byte 2  famId (7 = HLL)
    byte 3  lgK
    byte 4  lgArr (coupon/aux hash-table size; compact readers recompute)
    byte 5  flags (1=bigEndian, 2=readOnly, 4=empty, 8=compact, 16=outOfOrder)
    byte 6  curMin
    byte 7  modeByte: curMode bits 0-1 (0=LIST,1=SET,2=HLL),
                      tgtHllType bits 2-3 (0=HLL_4,1=HLL_6,2=HLL_8)
    bytes  8-15  hipAccum (f64)     bytes 16-23  kxq0 (f64)
    bytes 24-31  kxq1 (f64)         bytes 32-35  numAtCurMin (u32)
    bytes 36-39  auxCount (u32)
    byte 40+     register array: HLL_8 k bytes; HLL_6 3k/4+1 bytes (6-bit LE
                 bit stream); HLL_4 k/2 bytes (nibbles = value - curMin,
                 15 = AUX token) + auxCount ints ((value << 26) | slot)
LIST mode: 8-byte preamble (byte 6 = coupon count) + coupon ints.
SET mode: 12-byte preamble (bytes 8-11 = coupon count) + coupon ints.
Coupon int: (value << 26) | (low 26 bits of murmur h1); value =
min(nlz(h2), 62) + 1 — the ecosystem's register mapping, which
registers_murmur reproduces (vectorized) for cross-system mergeability.

We serialize with the OUT_OF_ORDER flag (what any union result carries), so
readers use the composite estimator from (kxq0, kxq1, curMin, numAtCurMin) —
all computed exactly from the register array here; no HIP state is faked.
"""

from __future__ import annotations

import struct

import numpy as np

from .hll import _bit_length_u64

_SER_VER = 1
_FAM_HLL = 7
_F_READ_ONLY, _F_EMPTY, _F_COMPACT, _F_OOO = 2, 4, 8, 16
_MODE_LIST, _MODE_SET, _MODE_HLL = 0, 1, 2
_TGT = {4: 0, 6: 1, 8: 2}
_TGT_INV = {0: 4, 1: 6, 2: 8}
_KEY_BITS = 26
_KEY_MASK = (1 << 26) - 1
_AUX_TOKEN = 15


def registers_murmur(h1: np.ndarray, h2: np.ndarray, lg_k: int) -> np.ndarray:
    """DataSketches coupon mapping -> k uint8 registers: slot = low lg_k bits
    of h1, value = min(nlz(h2), 62) + 1. A sketch built this way over the
    same keys (murmur3 seed 9001, UTF-8 / 8-byte-LE canonicalization) has
    IDENTICAL registers to one built by datasketches-java, so unions across
    systems are exact."""
    k = 1 << lg_k
    regs = np.zeros(k, dtype=np.uint8)
    if h1.size == 0:
        return regs
    slot = (h1 & np.uint64(k - 1)).astype(np.int64)
    nlz = np.uint64(64) - _bit_length_u64(h2).astype(np.uint64)
    value = (np.minimum(nlz, np.uint64(62)) + np.uint64(1)).astype(np.uint8)
    np.maximum.at(regs, slot, value)
    return regs


def _kxq(regs: np.ndarray) -> tuple[float, float]:
    """Exact (kxq0, kxq1): sum of 2^-value split at value 32 (the
    ecosystem's split of the harmonic sum across two accumulators)."""
    v = regs.astype(np.int64)
    lo = v < 32
    kxq0 = float(np.sum(np.ldexp(1.0, -v[lo])))
    kxq1 = float(np.sum(np.ldexp(1.0, -v[~lo])))
    return kxq0, kxq1


def _pack6_ds(regs: np.ndarray) -> bytes:
    """6-bit little-endian bit stream, ((3k/4)+1)-byte array (the +1 pad
    byte mirrors the ecosystem's short-aligned accessor)."""
    k = regs.size
    nbytes = ((k * 3) >> 2) + 1
    bits = np.zeros(nbytes * 8, dtype=np.uint8)
    v = regs.astype(np.uint16)
    pos = np.arange(k) * 6
    for b in range(6):
        bits[pos + b] = (v >> b) & 1
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack6_ds(data: bytes, k: int) -> np.ndarray:
    raw = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(raw, bitorder="little")
    out = np.zeros(k, dtype=np.uint8)
    pos = np.arange(k) * 6
    for b in range(6):
        out |= (bits[pos + b] << b).astype(np.uint8)
    return out


def serialize_hll(lg_k: int, regs: np.ndarray, width: int) -> bytes:
    """Registers -> canonical compact DataSketches HLL image (HLL mode; an
    all-zero register array serializes as the canonical empty LIST image)."""
    if width not in _TGT:
        raise ValueError(f"invalid tgt width {width}")
    regs = np.asarray(regs, dtype=np.uint8)
    k = 1 << lg_k
    if regs.size != k:
        raise ValueError(f"expected {k} registers, got {regs.size}")
    mode_byte = _MODE_HLL | (_TGT[width] << 2)
    if not regs.any():
        # canonical empty: LIST mode, zero coupons
        flags = _F_READ_ONLY | _F_EMPTY | _F_COMPACT
        return struct.pack(
            "<BBBBBBBB", 2, _SER_VER, _FAM_HLL, lg_k, 0, flags, 0,
            _MODE_LIST | (_TGT[width] << 2),
        )
    cur_min = int(regs.min())
    num_at_min = int(np.count_nonzero(regs == cur_min))
    kxq0, kxq1 = _kxq(regs)
    flags = _F_READ_ONLY | _F_COMPACT | _F_OOO
    aux = b""
    aux_count = 0
    lg_arr = 0
    if width == 8:
        body = regs.tobytes()
    elif width == 6:
        body = _pack6_ds(regs)
    else:
        delta = regs.astype(np.int64) - cur_min
        exc = np.flatnonzero(delta >= _AUX_TOKEN)
        nib = np.where(delta >= _AUX_TOKEN, _AUX_TOKEN, delta).astype(np.uint8)
        body = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8).tobytes()
        if exc.size:
            pairs = (regs[exc].astype(np.uint32).astype("<u4") << np.uint32(_KEY_BITS)) | exc.astype(
                "<u4"
            )
            aux = pairs.astype("<u4").tobytes()
            aux_count = int(exc.size)
            lg_arr = max(2, int(np.ceil(np.log2(aux_count * 4 / 3))) + 1)
    head = struct.pack(
        "<BBBBBBBB", 10, _SER_VER, _FAM_HLL, lg_k, lg_arr, flags, cur_min, mode_byte
    )
    head += struct.pack("<ddd", 0.0, kxq0, kxq1)
    head += struct.pack("<II", num_at_min, aux_count)
    return head + body + aux


def deserialize_hll(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Canonical DataSketches HLL image (LIST / SET / HLL mode; compact or
    updatable; any tgt type) -> (lg_k, tgt_width, k uint8 registers)."""
    if len(buf) < 8:
        raise ValueError("truncated HLL image")
    pre_ints, ser_ver, fam, lg_k, lg_arr, flags, b6, mode_byte = struct.unpack_from(
        "<BBBBBBBB", buf, 0
    )
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported HLL serial version {ser_ver}")
    if fam != _FAM_HLL:
        raise ValueError(f"not an HLL image (family {fam})")
    cur_mode = mode_byte & 3
    width = _TGT_INV[(mode_byte >> 2) & 3]
    k = 1 << lg_k
    regs = np.zeros(k, dtype=np.uint8)
    compact = bool(flags & _F_COMPACT)
    if flags & _F_EMPTY:
        return lg_k, width, regs
    if cur_mode in (_MODE_LIST, _MODE_SET):
        if cur_mode == _MODE_LIST:
            count, off = b6, 8
        else:
            (count,) = struct.unpack_from("<I", buf, 8)
            off = 12
        n_ints = count if compact else (1 << lg_arr)
        coupons = np.frombuffer(buf, dtype="<u4", count=n_ints, offset=off)
        coupons = coupons[coupons != 0]
        slot = (coupons & np.uint32(_KEY_MASK)).astype(np.int64) & (k - 1)
        value = (coupons >> np.uint32(_KEY_BITS)).astype(np.uint8)
        np.maximum.at(regs, slot, value)
        return lg_k, width, regs
    if pre_ints != 10:
        raise ValueError(f"unexpected HLL-mode preamble {pre_ints}")
    cur_min = b6
    (num_at_min, aux_count) = struct.unpack_from("<II", buf, 32)
    off = 40
    if width == 8:
        regs = np.frombuffer(buf, dtype=np.uint8, count=k, offset=off).copy()
    elif width == 6:
        nbytes = ((k * 3) >> 2) + 1
        regs = _unpack6_ds(buf[off : off + nbytes], k)
    else:
        packed = np.frombuffer(buf, dtype=np.uint8, count=k >> 1, offset=off)
        nib = np.empty(k, dtype=np.uint8)
        nib[0::2] = packed & 0x0F
        nib[1::2] = packed >> 4
        regs = np.where(nib == _AUX_TOKEN, 0, nib + np.uint8(cur_min)).astype(np.uint8)
        off += k >> 1
        n_ints = aux_count if compact else ((1 << lg_arr) if aux_count else 0)
        if n_ints:
            pairs = np.frombuffer(buf, dtype="<u4", count=n_ints, offset=off)
            pairs = pairs[pairs != 0]
            slot = (pairs & np.uint32(_KEY_MASK)).astype(np.int64)
            value = (pairs >> np.uint32(_KEY_BITS)).astype(np.uint8)
            regs[slot] = value
    return lg_k, width, regs


def union_images(states, width: int, lg_k_default: int = 12) -> bytes:
    """Union canonical HLL images (register-wise max) and re-emit at
    ``width`` — the narrow-type-preserving merge the reference's
    hll_sketch_union(tgt_type) performs."""
    parts = [deserialize_hll(bytes(s)) for s in states if s is not None]
    if not parts:
        return serialize_hll(lg_k_default, np.zeros(1 << lg_k_default, np.uint8), width)
    lg_k = min(p[0] for p in parts)
    k = 1 << lg_k
    acc = np.zeros(k, dtype=np.uint8)
    for p_lg_k, _, regs in parts:
        if p_lg_k != lg_k:
            # fold a larger-k register array down: slot j contributes to j mod k.
            # Exact only for sketches built from the same coupon stream; the
            # ecosystem's union performs the same low-bits fold.
            regs = regs.reshape(-1, k).max(axis=0)
        acc = np.maximum(acc, regs)
    return serialize_hll(lg_k, acc, width)


def get_estimate(image: bytes) -> float:
    """Offline estimator for canonical images (classic bias-corrected
    harmonic mean + linear counting; Spark-side code prefers the native
    JVM hll_sketch_estimate on the same bytes)."""
    from .hll import estimate_from_registers

    _, _, regs = deserialize_hll(image)
    return estimate_from_registers(regs)
