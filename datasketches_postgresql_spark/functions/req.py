"""REQ (relative-error quantiles) float family
(/root/reference/sql/datasketches_req_float_sketch.sql), backed by the REAL
relative-compactor kernel (sketches.req — accuracy RELATIVE to the distance
from the accurate end, HRA/LRA honored; src/req_float_sketch_pg_functions.c:83
passes hra, :119-121 k), not a KLL alias. Default k=12
(src/req_float_sketch_c_adapter.h:29); every query function takes the
``inclusive`` boolean defaulting to false (sql:137-193). Results are
FloatType (the reference family is float-typed, sql:73)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
)

from ..operators.agg import sketch_groupby_agg, sketch_merge_agg
from ..sketches import req as _r

DEFAULT_K = _r.DEFAULT_K
_X = "__x"


def req_float_sketch_build(
    df: DataFrame, group_cols: list[str], col: str, k: int = DEFAULT_K,
    hra: bool = True, out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: req_float_sketch_build(real[,k[,hra]]) (sql:73-105)."""
    # NULLs arrive as NaN through Arrow and are dropped by the kernel
    # (ReqState.update filters NaN), keeping all-NULL groups alive
    proj = df.select(*group_cols, F.col(col).cast("float").alias(_X))
    return sketch_groupby_agg(
        proj,
        group_cols,
        [_X],
        partial_fn=lambda pdf: _r.build(pdf[_X].to_numpy(dtype=np.float32), k, hra),
        merge_fn=lambda states: _r.merge(states, k, hra),
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )


def req_float_sketch_merge(
    df: DataFrame, group_cols: list[str], sketch_col: str, k: int | None = None,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: req_float_sketch_merge(sketch[,k]) (sql:107-125)."""
    return sketch_merge_agg(
        df,
        group_cols,
        sketch_col,
        merge_fn=lambda states: _r.merge(states, k),
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )


# ---- scalar query functions ------------------------------------------------


def _states(s: pd.Series):
    return (None if b is None else _r.ReqState.deserialize(bytes(b)) for b in s)


@F.pandas_udf(FloatType())
def _quantile_udf(s: pd.Series, rank: pd.Series, incl: pd.Series) -> pd.Series:
    return pd.Series(
        [
            np.nan if st is None else st.get_quantile(float(r), bool(i))
            for st, r, i in zip(_states(s), rank, incl)
        ],
        dtype="float32",
    )


@F.pandas_udf(DoubleType())
def _rank_udf(s: pd.Series, value: pd.Series, incl: pd.Series) -> pd.Series:
    return pd.Series(
        [
            np.nan if st is None else st.get_rank(float(v), bool(i))
            for st, v, i in zip(_states(s), value, incl)
        ]
    )


@F.pandas_udf(ArrayType(FloatType()))
def _quantiles_udf(s: pd.Series, ranks: pd.Series, incl: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if st is None else [np.float32(q) for q in st.get_quantiles(list(r), bool(i))]
            for st, r, i in zip(_states(s), ranks, incl)
        ]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _pmf_udf(s: pd.Series, splits: pd.Series, incl: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if st is None else st.get_pmf([float(x) for x in sp], bool(i))
            for st, sp, i in zip(_states(s), splits, incl)
        ]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _cdf_udf(s: pd.Series, splits: pd.Series, incl: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if st is None else st.get_cdf([float(x) for x in sp], bool(i))
            for st, sp, i in zip(_states(s), splits, incl)
        ]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _hist_udf(s: pd.Series, bins: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if st is None else st.get_histogram(int(b))
            for st, b in zip(_states(s), bins)
        ]
    )


@F.pandas_udf(LongType())
def _n_udf(s: pd.Series) -> pd.Series:
    return pd.Series([None if st is None else st.n for st in _states(s)], dtype="Int64")


@F.pandas_udf(FloatType())
def _min_udf(s: pd.Series) -> pd.Series:
    return pd.Series(
        [np.nan if st is None or st.n == 0 else st.min for st in _states(s)],
        dtype="float32",
    )


@F.pandas_udf(FloatType())
def _max_udf(s: pd.Series) -> pd.Series:
    return pd.Series(
        [np.nan if st is None or st.n == 0 else st.max for st in _states(s)],
        dtype="float32",
    )


@F.pandas_udf(StringType())
def req_float_sketch_to_string(s: pd.Series) -> pd.Series:
    """(sql:195-201)."""
    return pd.Series([None if st is None else st.to_string() for st in _states(s)])


def _arr(values) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def req_float_sketch_get_quantile(sketch: Column, rank: float, inclusive: bool = False) -> Column:
    """(sql:145-153)."""
    return _quantile_udf(sketch, F.lit(float(rank)), F.lit(inclusive))


def req_float_sketch_get_quantiles(sketch: Column, ranks, inclusive: bool = False) -> Column:
    return _quantiles_udf(sketch, _arr(ranks), F.lit(inclusive))


def req_float_sketch_get_rank(sketch: Column, value: float, inclusive: bool = False) -> Column:
    """(sql:137-143)."""
    return _rank_udf(sketch, F.lit(float(value)), F.lit(inclusive))


def req_float_sketch_get_pmf(sketch: Column, splits, inclusive: bool = False) -> Column:
    return _pmf_udf(sketch, _arr(splits), F.lit(inclusive))


def req_float_sketch_get_cdf(sketch: Column, splits, inclusive: bool = False) -> Column:
    return _cdf_udf(sketch, _arr(splits), F.lit(inclusive))


def req_float_sketch_get_histogram(sketch: Column, num_bins: int = 10) -> Column:
    return _hist_udf(sketch, F.lit(num_bins))


def req_float_sketch_get_n(sketch: Column) -> Column:
    return _n_udf(sketch)


def req_float_sketch_get_min_item(sketch: Column) -> Column:
    return _min_udf(sketch)


def req_float_sketch_get_max_item(sketch: Column) -> Column:
    return _max_udf(sketch)


# ---- DataSketches wire-format interop --------------------------------------


@F.pandas_udf(BinaryType())
def req_float_sketch_to_datasketches(s: pd.Series) -> pd.Series:
    """Internal REQ state -> canonical DataSketches REQ image (serial v1,
    family 17; see sketches.req_interop — incl. its validation-honesty
    note). Unlike theta/AOD, REQ holds raw float values, not hashes, so
    every sketch exports."""
    from ..sketches.req_interop import serialize_canonical

    return pd.Series(
        [None if b is None else serialize_canonical(bytes(b)) for b in s], dtype=object
    )


@F.pandas_udf(BinaryType())
def req_float_sketch_from_datasketches(s: pd.Series) -> pd.Series:
    """Canonical DataSketches REQ image -> internal state usable with every
    req_* function here."""
    from ..sketches.req_interop import deserialize_canonical

    return pd.Series(
        [None if b is None else deserialize_canonical(bytes(b)) for b in s], dtype=object
    )
