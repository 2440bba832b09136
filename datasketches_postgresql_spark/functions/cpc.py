"""CPC sketch family (/root/reference/sql/datasketches_cpc_sketch.sql).

Documented substitution (SURVEY.md §2.1): Spark has no native CPC and the
compressed-counting algorithm's value is its wire size, which Parquet page
compression already provides for our KMV images — so this family exposes the
CPC query surface (build/distinct/union/get_estimate[_and_bounds]/to_string,
default lg_k=11 per src/cpc_sketch_pg_functions.c:30) over the theta kernel.
Estimates satisfy the same exact-below-k / mergeable-union contract; images
are theta images, not CPC images.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from . import theta as _theta

DEFAULT_LG_K = 11  # src/cpc_sketch_pg_functions.c:30


def cpc_sketch_build(
    df: DataFrame, group_cols: list[str], col: str, lg_k: int = DEFAULT_LG_K,
    out_col: str = "sketch",
) -> DataFrame:
    """(sql:73-111)."""
    return _theta.theta_sketch_build(df, group_cols, col, lg_k, out_col=out_col)


def cpc_sketch_distinct(
    df: DataFrame, group_cols: list[str], col: str, lg_k: int = DEFAULT_LG_K,
    out_col: str = "distinct_est",
) -> DataFrame:
    """(sql:73-93)."""
    return _theta.theta_sketch_distinct(df, group_cols, col, lg_k, out_col=out_col)


def cpc_sketch_union_agg(
    df: DataFrame, group_cols: list[str], sketch_col: str,
    lg_k: int | None = None, out_col: str = "sketch",
) -> DataFrame:
    """(sql:113-131)."""
    return _theta.theta_sketch_union_agg(df, group_cols, sketch_col, lg_k, out_col)


def cpc_sketch_union(a: Column, b: Column) -> Column:
    """(sql:149-155)."""
    return _theta.theta_sketch_union(a, b)


cpc_sketch_get_estimate = _theta.theta_sketch_get_estimate
cpc_sketch_get_estimate_and_bounds = _theta.theta_sketch_get_estimate_and_bounds
cpc_sketch_to_string = _theta.theta_sketch_to_string
