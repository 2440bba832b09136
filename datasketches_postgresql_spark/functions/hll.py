"""HLL sketch family (/root/reference/sql/datasketches_hll_sketch.sql),
bridged to Spark's NATIVE DataSketches-compatible HLL functions
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate / hll_union, JVM-side,
whole-stage-codegen friendly — zero Python in the hot path).

Divergence note (documented, SURVEY.md §2.1): the reference accepts
tgt_type in {HLL_4, HLL_6, HLL_8} (src/hll_sketch_pg_functions.c:94-99);
Spark's native implementation always emits HLL_8 images. The parameter is
accepted and validated for API parity; the sketch image is HLL_8.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType

DEFAULT_LG_K = 12  # src/hll_sketch_pg_functions.c:38
_VALID_TGT = {"HLL_4", "HLL_6", "HLL_8", 4, 6, 8}


def _check_tgt(tgt_type) -> None:
    if tgt_type is not None and tgt_type not in _VALID_TGT:
        raise ValueError(f"invalid tgt_type {tgt_type}; must be HLL_4/HLL_6/HLL_8")


def hll_sketch_build(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
    tgt_type=None,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: hll_sketch_build(anyelement[,lg_k[,tgt_type]]) (sql:101-129).
    Catalyst plans partial+final aggregation automatically (the reference's
    COMBINEFUNC, for free)."""
    _check_tgt(tgt_type)
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(F.hll_sketch_agg(col, F.lit(lg_k)).alias(out_col))


def hll_sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
    out_col: str = "distinct_est",
) -> DataFrame:
    """Aggregate: hll_sketch_distinct(anyelement[,lg_k]) -> double (sql:81-99)."""
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(col, F.lit(lg_k)))
        .cast("double")
        .alias(out_col)
    )


def hll_sketch_union_agg(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str,
    lg_k: int | None = None,
    tgt_type=None,
    out_col: str = "sketch",
) -> DataFrame:
    """Aggregate: hll_sketch_union(hll_sketch[,lg_k[,tgt_type]]) (sql:131-159)."""
    _check_tgt(tgt_type)
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(
        F.hll_union_agg(sketch_col, F.lit(True)).alias(out_col)
    )


def hll_sketch_union(a: Column, b: Column) -> Column:
    """Pairwise union (sql:177-187)."""
    return F.hll_union(a, b, True)


def hll_sketch_get_estimate(sketch) -> Column:
    """hll_sketch_get_estimate(sketch) -> double (sql:161-163)."""
    return F.hll_sketch_estimate(sketch).cast("double")


@F.pandas_udf(ArrayType(DoubleType()))
def _hll_bounds_udf(s: pd.Series, est: pd.Series, nsd: pd.Series) -> pd.Series:
    """Bounds from the HLL relative standard error 1.04/sqrt(2^lgK).
    Image layout: byte 3 = lgK, byte 7 bits 0-1 = curMode (0=LIST, 1=SET,
    2=HLL); LIST/SET modes are exact -> bounds collapse to the estimate
    (matches the reference's exact small-n regime,
    src/hll_sketch_c_adapter.cpp:76-87 delegates to the core's bounds)."""
    out = []
    for img, e, n in zip(s, est, nsd):
        if img is None:
            out.append(None)
            continue
        lg_k = img[3]
        mode = img[7] & 3 if len(img) > 7 else 0
        e = float(e)
        if mode < 2:
            out.append([e, e, e])
        else:
            rse = 1.04 / math.sqrt(float(1 << lg_k))
            out.append([e, e / (1.0 + float(n) * rse), e * (1.0 + float(n) * rse)])
    return pd.Series(out)


def hll_sketch_get_estimate_and_bounds(sketch: Column, num_std_devs: int = 1) -> Column:
    """-> array<double>[estimate, lower, upper] (sql:165-171)."""
    est = F.hll_sketch_estimate(sketch).cast("double")
    return _hll_bounds_udf(sketch, est, F.lit(num_std_devs))


@F.pandas_udf(StringType())
def hll_sketch_to_string(s: pd.Series) -> pd.Series:
    """Debug summary (sql:173-175)."""
    out = []
    for img in s:
        if img is None:
            out.append(None)
        else:
            mode = ["LIST", "SET", "HLL", "?"][img[7] & 3 if len(img) > 7 else 0]
            out.append(
                "### HLL sketch summary:\n"
                f"   lg_k : {img[3]}\n"
                f"   mode : {mode}\n"
                f"   bytes: {len(img)}\n"
            )
    return pd.Series(out)
