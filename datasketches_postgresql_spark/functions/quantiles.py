"""Classic quantiles double sketch
(/root/reference/sql/datasketches_quantiles_double_sketch.sql) — the REAL
DoublesSketch (base buffer + weighted level ladder, sketches.quantiles),
serialized in the canonical DataSketches wire format (serial v3, family 8),
so legacy sketch data — the reason the reference keeps this family,
META.json:50-53 — imports directly: a bytea produced by
datasketches-{java,cpp,py} IS this engine's sketch column value.

Surface (sql:37-141): build(+k), merge(+k), get_rank, get_quantile,
get_quantiles, get_pmf, get_cdf, get_histogram(+bins), get_n, to_string.
Default k=128 (src/quantiles_double_sketch_c_adapter.h:29).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
)

from ..operators.agg import sketch_groupby_agg, sketch_merge_agg
from ..sketches import quantiles as _q

DEFAULT_K = _q.DEFAULT_K
_X = "__x"


def _nonnull(col: pd.Series) -> np.ndarray:
    v = col.to_numpy(dtype=np.float64)
    return v[~np.isnan(v)]


def quantiles_double_sketch_build(
    df: DataFrame, group_cols: list[str], col: str, k: int = DEFAULT_K,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: quantiles_double_sketch_build(double[,k]) (sql:69-87).
    NULLs pass the single-column Arrow projection as NaN and drop in the
    kernel, so all-NULL groups still emit a row (empty sketch) — the
    reference's ffunc behavior (same pattern as the KLL family)."""
    proj = df.select(*group_cols, F.col(col).cast("double").alias(_X))
    return sketch_groupby_agg(
        proj,
        group_cols,
        [_X],
        partial_fn=lambda pdf: _q.build(_nonnull(pdf[_X]), k),
        merge_fn=lambda states: _q.merge(states, k),
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )


def quantiles_double_sketch_merge(
    df: DataFrame, group_cols: list[str], sketch_col: str, k: int | None = None,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: quantiles_double_sketch_merge(sketch[,k]) (sql:89-107)."""
    return sketch_merge_agg(
        df,
        group_cols,
        sketch_col,
        merge_fn=lambda states: _q.merge(states, k),
        finalize_fn=lambda b: {out_col: b},
        out_fields=[StructField(out_col, BinaryType())],
    )


def _rows(s: pd.Series):
    return (None if b is None else _q.QuantilesState.deserialize(bytes(b)) for b in s)


@F.pandas_udf(DoubleType())
def _quantile_udf(s: pd.Series, rank: pd.Series) -> pd.Series:
    return pd.Series(
        [np.nan if st is None else st.get_quantile(float(r)) for st, r in zip(_rows(s), rank)]
    )


@F.pandas_udf(DoubleType())
def _rank_udf(s: pd.Series, value: pd.Series) -> pd.Series:
    return pd.Series(
        [np.nan if st is None else st.get_rank(float(v)) for st, v in zip(_rows(s), value)]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _quantiles_udf(s: pd.Series, ranks: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if st is None else st.get_quantiles([float(x) for x in r])
            for st, r in zip(_rows(s), ranks)
        ]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _pmf_udf(s: pd.Series, splits: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if st is None else st.get_pmf([float(x) for x in sp])
            for st, sp in zip(_rows(s), splits)
        ]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _cdf_udf(s: pd.Series, splits: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if st is None else st.get_cdf([float(x) for x in sp])
            for st, sp in zip(_rows(s), splits)
        ]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _histogram_udf(s: pd.Series, bins: pd.Series) -> pd.Series:
    return pd.Series(
        [None if st is None else st.get_histogram(int(b)) for st, b in zip(_rows(s), bins)]
    )


@F.pandas_udf(LongType())
def quantiles_double_sketch_get_n(s: pd.Series) -> pd.Series:
    """-> bigint (sql:117-119)."""
    return pd.Series([None if st is None else st.n for st in _rows(s)], dtype="Int64")


@F.pandas_udf(StringType())
def quantiles_double_sketch_to_string(s: pd.Series) -> pd.Series:
    """Debug summary (sql:121-123)."""
    return pd.Series([None if st is None else st.to_string() for st in _rows(s)])


@F.pandas_udf(BinaryType())
def quantiles_double_sketch_roundtrip(s: pd.Series) -> pd.Series:
    """Decode + re-encode the canonical serVer-3/family-8 image — the wire
    pin: the result must be byte-identical to the input (the stored column
    IS the legacy DoublesSketch image the reference persists,
    /root/reference/META.json:50-53), proving the codec reads what it
    writes with no private leniencies."""
    return pd.Series(
        [
            None if b is None else _q.QuantilesState.deserialize(bytes(b)).serialize()
            for b in s
        ]
    )


def _arr(values) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def quantiles_double_sketch_get_quantile(sketch: Column, rank: float) -> Column:
    """(sql:113-115)."""
    return _quantile_udf(sketch, F.lit(float(rank)))


def quantiles_double_sketch_get_quantiles(sketch: Column, ranks) -> Column:
    """-> array<double> (sql:133-135)."""
    return _quantiles_udf(sketch, _arr(ranks))


def quantiles_double_sketch_get_rank(sketch: Column, value: float) -> Column:
    """(sql:109-111)."""
    return _rank_udf(sketch, F.lit(float(value)))


def quantiles_double_sketch_get_pmf(sketch: Column, splits) -> Column:
    """N+1 bins (sql:125-127)."""
    return _pmf_udf(sketch, _arr(splits))


def quantiles_double_sketch_get_cdf(sketch: Column, splits) -> Column:
    """(sql:129-131)."""
    return _cdf_udf(sketch, _arr(splits))


def quantiles_double_sketch_get_histogram(sketch: Column, num_bins: int = 10) -> Column:
    """(sql:137-141)."""
    return _histogram_udf(sketch, F.lit(int(num_bins)))
