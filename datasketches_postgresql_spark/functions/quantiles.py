"""Classic quantiles double sketch
(/root/reference/sql/datasketches_quantiles_double_sketch.sql) — the
reference marks this family legacy, "superseded by KLL, included to support
legacy sketch data" (META.json:50-53), and SURVEY.md §2.1 maps it to a KLL
alias. Default k=128 (src/quantiles_double_sketch_c_adapter.h:29); surface is
KLL-double minus min/max items (sql:109-141)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from . import kll as _kll

DEFAULT_K = 128  # src/quantiles_double_sketch_c_adapter.h:29


def quantiles_double_sketch_build(
    df: DataFrame, group_cols: list[str], col: str, k: int = DEFAULT_K,
    out_col: str = "sketch",
) -> DataFrame:
    return _kll.kll_double_sketch_build(df, group_cols, col, k, out_col)


def quantiles_double_sketch_merge(
    df: DataFrame, group_cols: list[str], sketch_col: str, k: int | None = None,
    out_col: str = "sketch",
) -> DataFrame:
    return _kll.kll_sketch_merge(df, group_cols, sketch_col, k, out_col)


quantiles_double_sketch_get_quantile = _kll.kll_sketch_get_quantile
quantiles_double_sketch_get_quantiles = _kll.kll_sketch_get_quantiles
quantiles_double_sketch_get_rank = _kll.kll_sketch_get_rank
quantiles_double_sketch_get_pmf = _kll.kll_sketch_get_pmf
quantiles_double_sketch_get_cdf = _kll.kll_sketch_get_cdf
quantiles_double_sketch_get_histogram = _kll.kll_sketch_get_histogram
quantiles_double_sketch_get_n = _kll.kll_sketch_get_n
quantiles_double_sketch_to_string = _kll.kll_sketch_to_string
