"""REQ (relative-error quantiles) float family
(/root/reference/sql/datasketches_req_float_sketch.sql).

Shares the KLL kernel at the API level (SURVEY.md §2.1): default k=12
(src/req_float_sketch_c_adapter.h:29), the HRA/LRA flag is accepted for API
parity (sql:97-105), and every query function takes the ``inclusive``
boolean defaulting to false (sql:137-193) — the same exclusive-rank default
the kernel implements. Divergence (documented): rank error is KLL-uniform,
not REQ-relative; the exact-below-capacity regime and the full query surface
are preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from . import kll as _kll

DEFAULT_K = 12  # src/req_float_sketch_c_adapter.h:29


def req_float_sketch_build(
    df: DataFrame, group_cols: list[str], col: str, k: int = DEFAULT_K,
    hra: bool = True, out_col: str = "sketch",
) -> DataFrame:
    """(sql:73-105); ``hra`` (high-rank-accuracy, default true) accepted for
    parity with src/req_float_sketch_pg_functions.c:83."""
    return _kll.kll_float_sketch_build(df, group_cols, col, k, out_col)


def req_float_sketch_merge(
    df: DataFrame, group_cols: list[str], sketch_col: str, k: int | None = None,
    out_col: str = "sketch",
) -> DataFrame:
    return _kll.kll_sketch_merge(df, group_cols, sketch_col, k, out_col)


def req_float_sketch_get_quantile(sketch: Column, rank: float, inclusive: bool = False) -> Column:
    return _kll.kll_sketch_get_quantile(sketch, rank, inclusive)


def req_float_sketch_get_quantiles(sketch: Column, ranks, inclusive: bool = False) -> Column:
    return _kll.kll_sketch_get_quantiles(sketch, ranks, inclusive)


def req_float_sketch_get_rank(sketch: Column, value: float, inclusive: bool = False) -> Column:
    return _kll.kll_sketch_get_rank(sketch, value, inclusive)


def req_float_sketch_get_pmf(sketch: Column, splits, inclusive: bool = False) -> Column:
    return _kll.kll_sketch_get_pmf(sketch, splits, inclusive)


def req_float_sketch_get_cdf(sketch: Column, splits, inclusive: bool = False) -> Column:
    return _kll.kll_sketch_get_cdf(sketch, splits, inclusive)


def req_float_sketch_get_histogram(sketch: Column, num_bins: int = 10) -> Column:
    return _kll.kll_sketch_get_histogram(sketch, num_bins)


req_float_sketch_get_n = _kll.kll_sketch_get_n
req_float_sketch_get_min_item = _kll.kll_sketch_get_min_item
req_float_sketch_get_max_item = _kll.kll_sketch_get_max_item
req_float_sketch_to_string = _kll.kll_sketch_to_string
