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
