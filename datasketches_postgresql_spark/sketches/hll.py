"""HLL kernel for non-HLL_8 target types (HLL_4 / HLL_6 register packing).

The Spark-native DataSketches bridge (functions.hll) always emits HLL_8
images; the reference accepts tgt_type in {HLL_4, HLL_6, HLL_8}
(src/hll_sketch_pg_functions.c:94-99) — the point of the narrower types is
storage size (4/6 bits per register instead of 8). This kernel provides
those images: classic HyperLogLog (Flajolet et al.) with

- k = 2^lg_k registers over pre-hashed u64 values: index = top lg_k bits,
  register = rank (position of the first set bit) of the remaining bits;
- union = element-wise max (order-independent, idempotent);
- estimator: bias-corrected harmonic mean (alpha_m m^2 / sum 2^-reg) with
  the linear-counting small-range correction — RSE ~= 1.04/sqrt(k);
- HLL_4 images store a per-sketch base offset (the minimum register) plus
  4-bit deltas, with an explicit exception list for deltas > 15 (the same
  idea as the DataSketches HLL_4 curMin+exceptions scheme), so narrow
  packing introduces NO estimation bias;
- HLL_6 packs 4 registers into 3 bytes.

Serialized layout (little-endian):
    [u8 magic=0x48][u8 lg_k][u8 width(4|6|8)]
    width 8: [u8 * k]
    width 6: [packed 6-bit * k, 3 bytes per 4 registers]
    width 4: [u8 base][u16 n_exceptions][(u32 idx, u8 val) * n_exc]
             [packed 4-bit deltas, k/2 bytes]
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0x48
DEFAULT_LG_K = 12


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    out = np.zeros(w.shape, dtype=np.uint32)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        out[mask] += shift
        v[mask] >>= np.uint64(shift)
    out[w != 0] += 1
    return out


def registers_from_hashes(values: np.ndarray, lg_k: int) -> np.ndarray:
    """uint64 hashes -> k uint8 registers."""
    h = np.asarray(values, dtype=np.uint64)
    k = 1 << lg_k
    regs = np.zeros(k, dtype=np.uint8)
    if h.size == 0:
        return regs
    idx = (h >> np.uint64(64 - lg_k)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(64 - lg_k)) - np.uint64(1))
    # rank: 1 + number of leading zeros within the (64-lg_k)-bit window
    rank = (64 - lg_k + 1 - _bit_length_u64(w)).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def estimate_from_registers(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / float(np.sum(np.ldexp(1.0, -regs.astype(np.int64))))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)  # linear counting
    return float(raw)


def _pack6(regs: np.ndarray) -> bytes:
    r = regs.astype(np.uint32)
    if r.size % 4:
        r = np.concatenate([r, np.zeros(4 - r.size % 4, dtype=np.uint32)])
    quads = r.reshape(-1, 4)
    b0 = (quads[:, 0] | (quads[:, 1] << 6)) & 0xFF
    b1 = ((quads[:, 1] >> 2) | (quads[:, 2] << 4)) & 0xFF
    b2 = ((quads[:, 2] >> 4) | (quads[:, 3] << 2)) & 0xFF
    return np.stack([b0, b1, b2], axis=1).astype(np.uint8).tobytes()


def _unpack6(data: bytes, k: int) -> np.ndarray:
    raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
    q0 = raw[:, 0] & 0x3F
    q1 = ((raw[:, 0] >> 6) | (raw[:, 1] << 2)) & 0x3F
    q2 = ((raw[:, 1] >> 4) | (raw[:, 2] << 4)) & 0x3F
    q3 = raw[:, 2] >> 2
    return np.stack([q0, q1, q2, q3], axis=1).reshape(-1)[:k].astype(np.uint8)


def serialize(lg_k: int, regs: np.ndarray, width: int = 8) -> bytes:
    head = struct.pack("<BBB", _MAGIC, lg_k, width)
    if width == 8:
        return head + regs.astype(np.uint8).tobytes()
    if width == 6:
        if regs.max(initial=0) > 63:
            raise ValueError("register exceeds 6-bit range")  # n > ~2^57: not reachable
        return head + _pack6(regs)
    if width == 4:
        base = int(regs.min()) if regs.size else 0
        delta = regs.astype(np.int64) - base
        exc_idx = np.nonzero(delta > 15)[0]
        exc = b"".join(
            struct.pack("<IB", int(i), int(regs[i])) for i in exc_idx
        )
        d = np.clip(delta, 0, 15).astype(np.uint8)
        if d.size % 2:
            d = np.concatenate([d, np.zeros(1, dtype=np.uint8)])
        packed = (d[0::2] | (d[1::2] << 4)).astype(np.uint8).tobytes()
        return head + struct.pack("<BH", base, len(exc_idx)) + exc + packed
    raise ValueError(f"invalid register width {width}")


def deserialize(buf: bytes) -> tuple[int, int, np.ndarray]:
    """-> (lg_k, width, registers as uint8)."""
    magic, lg_k, width = struct.unpack_from("<BBB", buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an hll kernel image")
    k = 1 << lg_k
    off = 3
    if width == 8:
        return lg_k, width, np.frombuffer(buf, dtype=np.uint8, count=k, offset=off).copy()
    if width == 6:
        return lg_k, width, _unpack6(buf[off:], k)
    base, n_exc = struct.unpack_from("<BH", buf, off)
    off += 3
    exceptions = []
    for _ in range(n_exc):
        i, v = struct.unpack_from("<IB", buf, off)
        exceptions.append((i, v))
        off += 5
    packed = np.frombuffer(buf, dtype=np.uint8, count=(k + 1) // 2, offset=off)
    regs = np.empty(((k + 1) // 2) * 2, dtype=np.uint8)
    regs[0::2] = packed & 0x0F
    regs[1::2] = packed >> 4
    # base = min(regs): if any register is 0, base is 0, so delta + base can
    # never turn an empty register into a false positive
    regs = regs[:k] + np.uint8(base)
    for i, v in exceptions:
        regs[i] = v
    return lg_k, width, regs


def build(values: np.ndarray, lg_k: int = DEFAULT_LG_K, width: int = 8) -> bytes:
    return serialize(lg_k, registers_from_hashes(values, lg_k), width)


def union(sketches: list[bytes], width: int | None = None) -> bytes:
    parts = [deserialize(s) for s in sketches if s is not None]
    if not parts:
        return build(np.empty(0, dtype=np.uint64), DEFAULT_LG_K, width or 8)
    lg_k = min(p[0] for p in parts)
    out_width = width if width is not None else max(p[1] for p in parts)
    k = 1 << lg_k
    acc = np.zeros(k, dtype=np.uint8)
    for p_lg_k, _, regs in parts:
        if p_lg_k != lg_k:
            raise ValueError("hll union requires matching lg_k")
        acc = np.maximum(acc, regs)
    return serialize(lg_k, acc, out_width)


def get_estimate(sketch: bytes) -> float:
    _, _, regs = deserialize(sketch)
    return estimate_from_registers(regs)


def to_string(sketch: bytes) -> str:
    lg_k, width, regs = deserialize(sketch)
    return (
        "### HLL sketch summary:\n"
        f"   lg_k    : {lg_k}\n"
        f"   tgt_type: HLL_{width}\n"
        f"   nonzero : {int(np.count_nonzero(regs))}\n"
        f"   estimate: {estimate_from_registers(regs):.1f}\n"
    )
