"""Spark-compatible XXH64 rendered as ANSI/DuckDB SQL — the oracle key
for every xxhash64-derived operator (hash_split, weighted_sample,
mix_sources; textops/split.py).

Spark's ``xxhash64(col, ...)`` drives the engine's deterministic
splitting and dataset-mixing primitives, but no other engine ships a
compatible function, so those operators were pytest-only. XXH64 is a
public algorithm (Yann Collet's xxHash spec; Spark's XXH64 implements
hashLong/hashInt over it with chained seeds), and for a BIGINT column it
is a short fixed sequence of 64-bit multiplies, rotates, and xors — all
expressible in SQL with HUGEINT arithmetic mod 2^64:

- 64x64-bit multiply mod 2^64 splits into 32-bit limbs (the product of
  two full 64-bit values would overflow signed 128-bit HUGEINT);
- rotl is a shift-add (the two shifted fields never overlap, so the OR
  is a plain +);
- xor splits into two 32-bit BIGINT limbs for DuckDB's xor().

The generator emits a chain of MATERIALIZED CTEs — one per hash step —
so the oracle SQL stays one statement. MATERIALIZED is load-bearing, not
style: each step's expression references the previous step's column ~4
times, and DuckDB's projection-merging optimizer inlines plain CTEs and
nested subqueries, substituting expressions into their uses — a 20-step
chain flattens to ~4^20 expression nodes (measured: >100 GB RSS and no
answer; the materialized form answers in milliseconds). The CTE fence
caps the plan at one real projection per step. The Python mirror
(``xxhash64_long_int``) is the test fixture: Spark, DuckDB, and Python
must agree bit-for-bit.

Scale note: this module generates ORACLE SQL only — the Spark side keeps
using the native JVM xxhash64; nothing here runs in a job's hot path.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_TWO32 = 1 << 32
_TWO64 = 1 << 64


# -- Python mirror (tests + driver-side expected values) ---------------------


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64 one-long block — Spark's XXH64.hashLong (unsigned result)."""
    value &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 one-int block — Spark's XXH64.hashInt (unsigned result)."""
    value &= 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (value * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxhash64_long_int(long_value: int, int_literal: int, seed: int = 42) -> int:
    """Spark ``xxhash64(bigint_col, lit(int))``: columns chain left to
    right, each block's output seeding the next. Returns the SIGNED
    64-bit value Spark's expression yields."""
    h = hash_long(long_value, seed)
    h = hash_int(int_literal, h)
    return h - _TWO64 if h >= (1 << 63) else h


def xxhash64_long(long_value: int, seed: int = 42) -> int:
    """Spark ``xxhash64(bigint_col)`` (signed result)."""
    h = hash_long(long_value, seed)
    return h - _TWO64 if h >= (1 << 63) else h


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte string — Spark's XXH64.hashUnsafeBytes (what
    ``xxhash64(string_col)`` applies to the UTF-8 bytes). Full spec,
    including the 32-byte four-lane stripes (unsigned result)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while length - i >= 32:
            w1, w2, w3, w4 = (
                int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                for j in range(4)
            )
            v1 = (_rotl((v1 + w1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + w2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + w3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + w4 * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + length) & _M
    while length - i >= 8:
        w = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if length - i >= 4:
        w = int.from_bytes(data[i : i + 4], "little")
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < length:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxhash64_string(s: str, seed: int = 42) -> int:
    """Spark ``xxhash64(string_col)`` (signed result)."""
    h = hash_bytes(s.encode("utf-8"), seed)
    return h - _TWO64 if h >= (1 << 63) else h


# -- SQL generation ----------------------------------------------------------


def _sql_mul64_const(x: str, c: int) -> str:
    """(x * c) mod 2^64 for unsigned-hugeint x and a Python-known constant:
    32-bit limb split so no intermediate exceeds HUGEINT range."""
    c_lo, c_hi = c % _TWO32, c // _TWO32
    return (
        f"((({x}) % {_TWO32}) * {c_lo} + "
        f"(((({x}) % {_TWO32}) * {c_hi} + (({x}) // {_TWO32}) * {c_lo}) "
        f"% {_TWO32}) * {_TWO32}) % {_TWO64}"
    )


def _sql_rotl(x: str, r: int) -> str:
    # the wrapped-in low field and the carried-out high field occupy
    # disjoint bit ranges, so + IS the bitwise OR here
    return f"((({x}) * {1 << r}) % {_TWO64} + (({x}) // {1 << (64 - r)}))"


def _sql_xor64(a: str, b: str) -> str:
    """xor of two unsigned-hugeint 64-bit values via 32-bit BIGINT limbs."""
    return (
        f"(CAST(xor(CAST(({a}) // {_TWO32} AS BIGINT), "
        f"CAST(({b}) // {_TWO32} AS BIGINT)) AS HUGEINT) * {_TWO32} + "
        f"CAST(xor(CAST(({a}) % {_TWO32} AS BIGINT), "
        f"CAST(({b}) % {_TWO32} AS BIGINT)) AS HUGEINT))"
    )


def xxhash64_long_int_sql(
    id_expr: str, int_literal: int, from_sql: str, prefix: str = "xx", seed: int = 42
) -> tuple[str, str]:
    """Materialized-CTE-chain SQL computing Spark's ``xxhash64(id_expr,
    lit(n))`` over ``from_sql`` (a table name or parenthesized subquery).

    Returns ``(sql, signed_alias)``: ``sql`` is one statement whose
    output is every column of ``from_sql`` plus the intermediate steps
    and the SIGNED 64-bit hash in ``signed_alias``. One MATERIALIZED CTE
    per step — each intermediate is a REAL materialized column, never an
    inlined expression (plain CTEs/subqueries get merged by the
    optimizer, and a 20-step chain whose steps each reference their
    input ~4 times blows up exponentially at that substitution; see the
    module docstring). ``id_expr`` must be a non-negative BIGINT
    expression (doc ids; negatives would need an extra mod-normalization
    this generator omits for readability)."""
    names = iter(f"{prefix}{i}" for i in range(32))
    ctes: list[str] = []
    src = from_sql

    def step(expr: str) -> str:
        nonlocal src
        n = next(names)
        ctes.append(f"{n}_t AS MATERIALIZED (SELECT *, {expr} AS {n} FROM {src})")
        src = f"{n}_t"
        return n

    x = step(f"CAST({id_expr} AS HUGEINT)")
    # hashLong(x, seed)
    a = step(_sql_mul64_const(x, _P2))
    a = step(_sql_rotl(a, 31))
    a = step(_sql_mul64_const(a, _P1))
    a = step(_sql_xor64(str((seed + _P5 + 8) & _M), a))
    a = step(_sql_rotl(a, 27))
    a = step(f"({_sql_mul64_const(a, _P1)} + {_P4}) % {_TWO64}")
    # fmix
    a = step(_sql_xor64(a, f"({a}) // {1 << 33}"))
    a = step(_sql_mul64_const(a, _P2))
    a = step(_sql_xor64(a, f"({a}) // {1 << 29}"))
    a = step(_sql_mul64_const(a, _P3))
    a = step(_sql_xor64(a, f"({a}) // {1 << 32}"))
    # hashInt(int_literal, seed=a): the literal's multiply is a constant
    k = (int_literal & 0xFFFFFFFF) * _P1 & _M
    b = step(f"(({a}) + {(_P5 + 4) & _M}) % {_TWO64}")
    b = step(_sql_xor64(b, str(k)))
    b = step(_sql_rotl(b, 23))
    b = step(f"({_sql_mul64_const(b, _P2)} + {_P3}) % {_TWO64}")
    # fmix
    b = step(_sql_xor64(b, f"({b}) // {1 << 33}"))
    b = step(_sql_mul64_const(b, _P2))
    b = step(_sql_xor64(b, f"({b}) // {1 << 29}"))
    b = step(_sql_mul64_const(b, _P3))
    b = step(_sql_xor64(b, f"({b}) // {1 << 32}"))
    signed = step(
        f"CASE WHEN ({b}) >= {1 << 63} THEN ({b}) - {_TWO64} ELSE ({b}) END"
    )
    sql = "WITH " + ", ".join(ctes) + f" SELECT * FROM {src}"
    return sql, signed


def xxhash64_short_ascii_sql(
    tok_expr: str,
    from_sql: str,
    prefix: str = "xs",
    seed: int = 42,
) -> tuple[str, str]:
    """Materialized-CTE-chain SQL computing Spark's ``xxhash64(tok)`` for
    an ASCII string column of at most 31 bytes — the token regime of the
    quality classifier's hashed mode ([a-z]+ runs; the engine's gate
    corpora top out at ~12). Returns ``(sql, signed_alias)`` like
    :func:`xxhash64_long_int_sql`.

    Under 32 bytes XXH64 never enters the four-lane stripe loop, so the
    whole hash is: h = seed + P5 + len, then up to three guarded 8-byte
    word rounds, one guarded 4-byte round, up to three guarded single-
    byte rounds, then the final avalanche — each round a CASE-guarded
    materialized step. Little-endian words assemble from ``ascii(substr)``
    (ASCII only: chars == bytes; DuckDB's ascii() past the end is 0, so
    unguarded word assembly is safe — the guard on the h-update decides).
    """
    names = iter(f"{prefix}{i}" for i in range(64))
    ctes: list[str] = []
    src = from_sql

    def step(expr: str) -> str:
        nonlocal src
        n = next(names)
        ctes.append(f"{n}_t AS MATERIALIZED (SELECT *, {expr} AS {n} FROM {src})")
        src = f"{n}_t"
        return n

    tok = step(f"CAST({tok_expr} AS VARCHAR)")
    ln = step(f"CAST(strlen({tok}) AS HUGEINT)")
    # fail LOUDLY outside the documented regime: >= 32 bytes enters
    # XXH64's four-lane stripe loop, which this renderer deliberately does
    # not implement — without this guard the tail rounds would compute a
    # wrong-but-plausible hash and a gate could silently verify it
    ln = step(
        f"CASE WHEN ({ln}) >= 32 THEN CAST(error("
        f"'xxhash64_short_ascii_sql: token of 32+ bytes is outside the "
        f"short-string regime') AS HUGEINT) ELSE ({ln}) END"
    )
    # tail geometry: rem bytes after the full words; r single bytes after
    # the optional 4-byte round; the byte rounds start at position st+1
    rem = step(f"({ln}) % 8")
    r = step(f"CASE WHEN ({rem}) >= 4 THEN ({rem}) - 4 ELSE ({rem}) END")
    st = step(f"({ln}) - ({r})")

    def byte(pos_expr: str) -> str:
        return f"CAST(ascii(substr({tok}, CAST({pos_expr} AS INT), 1)) AS HUGEINT)"

    h = step(f"({(seed + _P5) & _M} + ({ln})) % {_TWO64}")
    for j in range(3):  # full 8-byte words at offsets 0, 8, 16
        w = step(
            "(" + " + ".join(f"{byte(str(8 * j + b + 1))} * {1 << (8 * b)}" for b in range(8)) + ")"
        )
        k1 = step(_sql_mul64_const(w, _P2))
        k1 = step(_sql_rotl(k1, 31))
        k1 = step(_sql_mul64_const(k1, _P1))
        guard = f"({ln}) >= {8 * (j + 1)}"
        h2 = step(f"CASE WHEN {guard} THEN {_sql_xor64(h, k1)} ELSE ({h}) END")
        h = step(
            f"CASE WHEN {guard} THEN "
            f"({_sql_mul64_const(_sql_rotl(h2, 27), _P1)} + {_P4}) % {_TWO64} "
            f"ELSE ({h2}) END"
        )
    # guarded 4-byte round at offset len - rem (position (len//8)*8 + 1)
    w4 = step(
        "(" + " + ".join(
            f"{byte(f'({ln}) - ({rem}) + {b + 1}')} * {1 << (8 * b)}" for b in range(4)
        ) + ")"
    )
    k4 = step(_sql_mul64_const(w4, _P1))
    g4 = f"({rem}) >= 4"
    h2 = step(f"CASE WHEN {g4} THEN {_sql_xor64(h, k4)} ELSE ({h}) END")
    h = step(
        f"CASE WHEN {g4} THEN "
        f"({_sql_mul64_const(_sql_rotl(h2, 23), _P2)} + {_P3}) % {_TWO64} "
        f"ELSE ({h2}) END"
    )
    for k in range(3):  # trailing single bytes
        bb = step(f"({byte(f'({st}) + {k + 1}')} * {_P5}) % {_TWO64}")
        gk = f"({r}) > {k}"
        h2 = step(f"CASE WHEN {gk} THEN {_sql_xor64(h, bb)} ELSE ({h}) END")
        h = step(
            f"CASE WHEN {gk} THEN {_sql_mul64_const(_sql_rotl(h2, 11), _P1)} "
            f"ELSE ({h2}) END"
        )
    # final avalanche
    h = step(_sql_xor64(h, f"({h}) // {1 << 33}"))
    h = step(_sql_mul64_const(h, _P2))
    h = step(_sql_xor64(h, f"({h}) // {1 << 29}"))
    h = step(_sql_mul64_const(h, _P3))
    h = step(_sql_xor64(h, f"({h}) // {1 << 32}"))
    signed = step(
        f"CASE WHEN ({h}) >= {1 << 63} THEN ({h}) - {_TWO64} ELSE ({h}) END"
    )
    sql = "WITH " + ", ".join(ctes) + f" SELECT * FROM {src}"
    return sql, signed


def split_bucket_sql(
    id_expr: str,
    seed: int,
    from_sql: str,
    buckets: int = 1_000_000,
    prefix: str = "xx",
) -> tuple[str, str]:
    """Nested-subquery SQL for textops.split.split_bucket's INTEGER
    bucket: ``pmod(xxhash64(id, lit(seed)), buckets)`` as a BIGINT column
    named ``<prefix>_bucket`` (plus every column of ``from_sql``). Divide
    by ``buckets * 1.0`` to get the [0, 1) double the Spark side compares
    (the quotient is exact in float64 for buckets <= 2^52)."""
    sql, signed = xxhash64_long_int_sql(id_expr, seed, from_sql, prefix=prefix)
    n = f"{prefix}_bucket"
    sql = (
        f"SELECT *, CAST(((({signed}) % {buckets}) + {buckets}) % {buckets} "
        f"AS BIGINT) AS {n} FROM ({sql})"
    )
    return sql, n
