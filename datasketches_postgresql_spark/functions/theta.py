"""Theta sketch family (/root/reference/sql/datasketches_theta_sketch.sql).

Build aggregates hash JVM-side with ``F.xxhash64`` — only uint64 arrays cross
the Arrow boundary, never raw values (Spark-first; SURVEY.md §1.2: the
reference canonicalizes any element type to bytes before hashing,
src/theta_sketch_pg_functions.c:103-115 — xxhash64 plays that role here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType, StringType, StructField

from ..operators.agg import keep_group_keys, sketch_groupby_agg, sketch_merge_agg
from ..sketches import theta as _t

_H, _V = "__h", "__v"


_NULL_SENTINEL = np.uint64(42)  # Spark xxhash64(NULL) == the seed, 42


def _hash_proj(df: DataFrame, group_cols: list[str], col: str) -> DataFrame:
    """NULL inputs are skipped (the reference's sfunc skips NULL rows,
    src/theta_sketch_pg_functions.c:78-82) WITHOUT a JVM-side row filter:
    filtering would erase groups whose values are all NULL, but the
    reference's ffunc still emits a row per group (empty sketch). Spark's
    xxhash64 returns its seed (42) for NULL, so null rows survive the
    single-column Arrow projection (no 10x null-indicator column cost) and
    the kernel drops the sentinel — at the price of a 2^-64 per-value blind
    spot, the same order as theta's inherent hash-collision conflation."""
    return df.select(*group_cols, F.xxhash64(col).alias(_H))


def _hashed_values(pdf: pd.DataFrame) -> np.ndarray:
    h = pdf[_H].to_numpy(dtype=np.int64).astype(np.uint64)
    return h[h != _NULL_SENTINEL]


def theta_sketch_build(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lg_k: int = _t.DEFAULT_LG_K,
    p: float = 1.0,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: theta_sketch_build(anyelement[,lg_k[,p]]) (sql:105-133).

    Groups whose values are ALL NULL still emit a row (empty sketch) — the
    reference's ffunc runs even when every input was skipped; see
    _hash_proj's sentinel scheme."""
    return sketch_groupby_agg(
        _hash_proj(df, group_cols, col),
        group_cols,
        [_H],
        partial_fn=lambda pdf: _t.build(_hashed_values(pdf), lg_k, p),
        merge_fn=lambda states: _t.union(states, lg_k),
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )


def theta_sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lg_k: int = _t.DEFAULT_LG_K,
    out_col: str = "distinct_est",
) -> DataFrame:
    """Aggregate: theta_sketch_distinct(anyelement[,lg_k]) -> double (sql:85-103).
    All-NULL groups emit 0.0 (the sentinel scheme in _hash_proj)."""
    return sketch_groupby_agg(
        _hash_proj(df, group_cols, col),
        group_cols,
        [_H],
        partial_fn=lambda pdf: _t.build(_hashed_values(pdf), lg_k),
        merge_fn=lambda states: _t.union(states, lg_k),
        finalize_fn=lambda b: {out_col: _t.get_estimate(b)},
        out_fields=[StructField(out_col, DoubleType())],
    )


def theta_sketch_union_agg(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str,
    lg_k: int | None = None,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: theta_sketch_union(theta_sketch[,lg_k]) (sql:135-153)."""
    return sketch_merge_agg(
        df,
        group_cols,
        sketch_col,
        merge_fn=lambda states: _t.union(states, lg_k),
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )


def theta_sketch_intersection_agg(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: theta_sketch_intersection(theta_sketch) (sql:155-163)."""
    return sketch_merge_agg(
        df,
        group_cols,
        sketch_col,
        merge_fn=_t.intersection,
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )


# ---- scalar functions (pandas UDFs over BinaryType) -----------------------


def _map_opt(series: pd.Series, fn) -> pd.Series:
    return pd.Series([None if b is None else fn(b) for b in series], dtype=object)


@F.pandas_udf(DoubleType())
def theta_sketch_get_estimate(s: pd.Series) -> pd.Series:
    """theta_sketch_get_estimate(sketch) (sql:165-167)."""
    return pd.Series([np.nan if b is None else _t.get_estimate(b) for b in s])


@F.pandas_udf(ArrayType(DoubleType()))
def _bounds_udf(s: pd.Series, nsd: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if b is None else list(_t.get_estimate_and_bounds(b, int(n)))
            for b, n in zip(s, nsd)
        ]
    )


def theta_sketch_get_estimate_and_bounds(sketch: Column, num_std_devs: int = 1) -> Column:
    """-> array<double>[estimate, lower, upper] (sql:169-175)."""
    return _bounds_udf(sketch, F.lit(num_std_devs))


@F.pandas_udf(BinaryType())
def _union_pair_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_t.union([x for x in (xa, xb) if x is not None]) for xa, xb in zip(a, b)],
        dtype=object,
    )


def theta_sketch_union(a: Column, b: Column) -> Column:
    """Pairwise union (sql:181-187)."""
    return _union_pair_udf(a, b)


@F.pandas_udf(BinaryType())
def _intersect_pair_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if xa is None or xb is None else _t.intersection([xa, xb])
            for xa, xb in zip(a, b)
        ],
        dtype=object,
    )


def theta_sketch_intersection(a: Column, b: Column) -> Column:
    """Pairwise intersection (sql:189-191)."""
    return _intersect_pair_udf(a, b)


@F.pandas_udf(BinaryType())
def _a_not_b_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if xa is None or xb is None else _t.a_not_b(xa, xb)
            for xa, xb in zip(a, b)
        ],
        dtype=object,
    )


def theta_sketch_a_not_b(a: Column, b: Column) -> Column:
    """Set difference A \\ B (sql:193-195)."""
    return _a_not_b_udf(a, b)


@F.pandas_udf(StringType())
def theta_sketch_to_string(s: pd.Series) -> pd.Series:
    """Debug summary (sql:177-179)."""
    return _map_opt(s, _t.to_string)


# ---- DataSketches wire-format interop --------------------------------------


def theta_sketch_build_compat(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lg_k: int = _t.DEFAULT_LG_K,
    p: float = 1.0,
    out_col: str = "sketch",
) -> DataFrame:
    """theta_sketch_build in the DataSketches hash space (murmur3_x64_128,
    seed 9001, 63-bit — the hashing the reference's storage format implies,
    src/theta_sketch_c_adapter.cpp:195-205): sketches built here export via
    ``theta_sketch_to_datasketches`` as canonical compact images readable by
    Druid / Hive / datasketches-{java,cpp,py}, and combine correctly with
    imported ecosystem sketches. Integral keys canonicalize to 8-byte LE
    (vectorized murmur); strings to UTF-8 bytes."""
    from pyspark.sql.types import LongType as _Long
    from pyspark.sql.types import IntegerType as _Int
    from pyspark.sql.types import ShortType as _Short

    from ..sketches import interop as _i

    dtype = df.schema[col].dataType
    numeric = isinstance(dtype, (_Long, _Int, _Short))
    val = F.col(col).cast("long") if numeric else F.col(col).cast("string")
    proj = df.where(F.col(col).isNotNull()).select(*group_cols, val.alias(_H))

    if numeric:
        def partial(pdf: pd.DataFrame) -> bytes:
            keys = pdf[_H].to_numpy(dtype=np.int64).astype(np.uint64)
            return _i.build_murmur(keys, lg_k, p)
    else:
        def partial(pdf: pd.DataFrame) -> bytes:
            return _i.build_murmur_strings(pdf[_H], lg_k, p)

    agg = sketch_groupby_agg(
        proj,
        group_cols,
        [_H],
        partial_fn=partial,
        merge_fn=lambda states: _t.union(states, lg_k),
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )
    from ..sketches import interop as _interop

    empty = _interop.build_murmur(np.empty(0, dtype=np.uint64), lg_k, p)
    return keep_group_keys(df, group_cols, agg, {out_col: empty})


@F.pandas_udf(BinaryType())
def theta_sketch_to_datasketches(s: pd.Series) -> pd.Series:
    """Internal sketch -> canonical Apache DataSketches compact theta image
    (serial v3; see sketches.interop). Only murmur-built/imported sketches
    export — xxhash64-built ones raise (their hash values would be
    meaningless to an ecosystem reader)."""
    from ..sketches.interop import serialize_compact

    return pd.Series(
        [None if b is None else serialize_compact(bytes(b)) for b in s], dtype=object
    )


@F.pandas_udf(BinaryType())
def theta_sketch_from_datasketches(s: pd.Series) -> pd.Series:
    """Canonical compact theta image (e.g. produced by Druid / Hive /
    datasketches-java) -> internal sketch usable with every theta function
    here."""
    from ..sketches.interop import deserialize_compact

    return pd.Series(
        [None if b is None else deserialize_compact(bytes(b)) for b in s], dtype=object
    )
