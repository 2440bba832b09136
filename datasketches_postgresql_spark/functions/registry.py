"""SQL-surface parity: register the reference's function names for use in
``spark.sql`` queries (the reference's DDL registers them in PostgreSQL;
/root/reference/sql/datasketches_*.sql).

Aggregates register as grouped-agg pandas UDFs. Two deliberate deltas from
the reference's SQL, both documented:

1. Build aggregates take an ALREADY-HASHED bigint (wrap the column in the
   built-in ``xxhash64(col)``) — the same canonicalization the DataFrame API
   applies implicitly (the reference's C code canonicalizes anyelement to
   bytes before hashing, src/theta_sketch_pg_functions.c:103-115). This
   keeps the Python boundary numeric/Arrow-fast.
2. Grouped-agg pandas UDFs have no partial-aggregation step (Spark ships
   group values to one task), so this layer is the CONVENIENCE surface; the
   scale path is the two-phase DataFrame API in ``..operators.agg``.

HLL needs no registration: Spark's native hll_sketch_agg / hll_union_agg /
hll_sketch_estimate / hll_union are already SQL functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
)

from ..sketches import aod as _aod
from ..sketches import fi as _fi
from ..sketches import kll as _kll
from ..sketches import theta as _theta
from . import fi as fi_fns
from . import kll as kll_fns
from . import theta as theta_fns


def _hashes(s: pd.Series) -> np.ndarray:
    return s.dropna().to_numpy(dtype=np.int64).astype(np.uint64)


def register_all(spark: SparkSession) -> None:
    """Register every SQL-callable function. Idempotent."""

    # -- theta aggregates ---------------------------------------------------
    @F.pandas_udf(BinaryType())
    def theta_sketch_build(h: pd.Series) -> bytes:  # type: ignore[misc]
        return _theta.build(_hashes(h))

    @F.pandas_udf(DoubleType())
    def theta_sketch_distinct(h: pd.Series) -> float:  # type: ignore[misc]
        return _theta.get_estimate(_theta.build(_hashes(h)))

    @F.pandas_udf(BinaryType())
    def theta_sketch_union_agg(s: pd.Series) -> bytes:  # type: ignore[misc]
        return _theta.union([bytes(b) for b in s if b is not None])

    @F.pandas_udf(BinaryType())
    def theta_sketch_intersection_agg(s: pd.Series) -> bytes:  # type: ignore[misc]
        return _theta.intersection([bytes(b) for b in s if b is not None])

    spark.udf.register("theta_sketch_build", theta_sketch_build)
    spark.udf.register("theta_sketch_distinct", theta_sketch_distinct)
    spark.udf.register("theta_sketch_union_agg", theta_sketch_union_agg)
    spark.udf.register("theta_sketch_intersection_agg", theta_sketch_intersection_agg)

    # -- theta scalars (reuse the module-level pandas UDFs) -------------------
    spark.udf.register("theta_sketch_get_estimate", theta_fns.theta_sketch_get_estimate)
    spark.udf.register("theta_sketch_get_estimate_and_bounds", theta_fns._bounds_udf)
    spark.udf.register("theta_sketch_union", theta_fns._union_pair_udf)
    spark.udf.register("theta_sketch_intersection", theta_fns._intersect_pair_udf)
    spark.udf.register("theta_sketch_a_not_b", theta_fns._a_not_b_udf)
    spark.udf.register("theta_sketch_to_string", theta_fns.theta_sketch_to_string)

    # -- kll ------------------------------------------------------------------
    @F.pandas_udf(BinaryType())
    def kll_float_sketch_build(v: pd.Series, k: pd.Series) -> bytes:  # type: ignore[misc]
        return _kll.build(v.to_numpy(dtype=np.float64), int(k.iloc[0]))

    @F.pandas_udf(BinaryType())
    def kll_float_sketch_merge(s: pd.Series) -> bytes:  # type: ignore[misc]
        return _kll.merge([bytes(b) for b in s if b is not None])

    spark.udf.register("kll_float_sketch_build", kll_float_sketch_build)
    spark.udf.register("kll_double_sketch_build", kll_float_sketch_build)
    spark.udf.register("kll_float_sketch_merge", kll_float_sketch_merge)
    spark.udf.register("kll_double_sketch_merge", kll_float_sketch_merge)
    spark.udf.register("kll_float_sketch_get_quantile", kll_fns._quantile_udf)
    spark.udf.register("kll_float_sketch_get_quantiles", kll_fns._quantiles_udf)
    spark.udf.register("kll_float_sketch_get_rank", kll_fns._rank_udf)
    spark.udf.register("kll_float_sketch_get_pmf", kll_fns._pmf_udf)
    spark.udf.register("kll_float_sketch_get_cdf", kll_fns._cdf_udf)
    spark.udf.register("kll_float_sketch_get_histogram", kll_fns._histogram_udf)
    spark.udf.register("kll_float_sketch_get_n", kll_fns._n_udf)
    spark.udf.register("kll_float_sketch_get_min_item", kll_fns._min_udf)
    spark.udf.register("kll_float_sketch_get_max_item", kll_fns._max_udf)
    spark.udf.register("kll_float_sketch_to_string", kll_fns.kll_sketch_to_string)
    # canonical DataSketches wire format (ecosystem interop, like the
    # reference's bytea casts at sql/datasketches_kll_float_sketch.sql:31-42)
    spark.udf.register("kll_float_sketch_to_datasketches", kll_fns.kll_float_sketch_to_datasketches)
    spark.udf.register("kll_float_sketch_from_datasketches", kll_fns.kll_float_sketch_from_datasketches)
    spark.udf.register("kll_double_sketch_to_datasketches", kll_fns.kll_double_sketch_to_datasketches)
    spark.udf.register("kll_double_sketch_from_datasketches", kll_fns.kll_double_sketch_from_datasketches)

    # -- req (real relative-compactor kernel, sketches.req) ------------------
    from ..sketches import req as _req
    from . import req as req_fns

    @F.pandas_udf(BinaryType())
    def req_float_sketch_build(v: pd.Series, k: pd.Series) -> bytes:  # type: ignore[misc]
        return _req.build(v.dropna().to_numpy(dtype=np.float32), int(k.iloc[0]))

    @F.pandas_udf(BinaryType())
    def req_float_sketch_merge(s: pd.Series) -> bytes:  # type: ignore[misc]
        return _req.merge([bytes(b) for b in s if b is not None])

    spark.udf.register("req_float_sketch_build", req_float_sketch_build)
    spark.udf.register("req_float_sketch_merge", req_float_sketch_merge)
    spark.udf.register("req_float_sketch_get_quantile", req_fns._quantile_udf)
    spark.udf.register("req_float_sketch_get_quantiles", req_fns._quantiles_udf)
    spark.udf.register("req_float_sketch_get_rank", req_fns._rank_udf)
    spark.udf.register("req_float_sketch_get_pmf", req_fns._pmf_udf)
    spark.udf.register("req_float_sketch_get_cdf", req_fns._cdf_udf)
    spark.udf.register("req_float_sketch_get_histogram", req_fns._hist_udf)
    spark.udf.register("req_float_sketch_get_n", req_fns._n_udf)
    spark.udf.register("req_float_sketch_get_min_item", req_fns._min_udf)
    spark.udf.register("req_float_sketch_get_max_item", req_fns._max_udf)
    spark.udf.register("req_float_sketch_to_string", req_fns.req_float_sketch_to_string)
    spark.udf.register("req_float_sketch_to_datasketches", req_fns.req_float_sketch_to_datasketches)
    spark.udf.register("req_float_sketch_from_datasketches", req_fns.req_float_sketch_from_datasketches)

    # -- classic quantiles (real DoublesSketch, canonical wire format) -------
    from ..sketches import quantiles as _qd
    from . import quantiles as qd_fns

    @F.pandas_udf(BinaryType())
    def quantiles_double_sketch_build(v: pd.Series, k: pd.Series) -> bytes:  # type: ignore[misc]
        return _qd.build(v.dropna().to_numpy(dtype=np.float64), int(k.iloc[0]))

    @F.pandas_udf(BinaryType())
    def quantiles_double_sketch_merge(s: pd.Series) -> bytes:  # type: ignore[misc]
        return _qd.merge([bytes(b) for b in s if b is not None])

    spark.udf.register("quantiles_double_sketch_build", quantiles_double_sketch_build)
    spark.udf.register("quantiles_double_sketch_merge", quantiles_double_sketch_merge)
    spark.udf.register("quantiles_double_sketch_get_quantile", qd_fns._quantile_udf)
    spark.udf.register("quantiles_double_sketch_get_quantiles", qd_fns._quantiles_udf)
    spark.udf.register("quantiles_double_sketch_get_rank", qd_fns._rank_udf)
    spark.udf.register("quantiles_double_sketch_get_pmf", qd_fns._pmf_udf)
    spark.udf.register("quantiles_double_sketch_get_cdf", qd_fns._cdf_udf)
    spark.udf.register("quantiles_double_sketch_get_histogram", qd_fns._histogram_udf)
    spark.udf.register("quantiles_double_sketch_get_n", qd_fns.quantiles_double_sketch_get_n)
    spark.udf.register(
        "quantiles_double_sketch_to_string", qd_fns.quantiles_double_sketch_to_string
    )

    # -- theta <-> DataSketches wire format ----------------------------------
    spark.udf.register("theta_sketch_to_datasketches", theta_fns.theta_sketch_to_datasketches)
    spark.udf.register("theta_sketch_from_datasketches", theta_fns.theta_sketch_from_datasketches)

    # -- frequent strings ------------------------------------------------------
    @F.pandas_udf(BinaryType())
    def frequent_strings_sketch_build(lg_k: pd.Series, s: pd.Series) -> bytes:  # type: ignore[misc]
        sub = s.dropna()
        return _fi.build(int(lg_k.iloc[0]), sub.to_numpy(dtype=object))

    @F.pandas_udf(BinaryType())
    def frequent_strings_sketch_merge(lg_k: pd.Series, s: pd.Series) -> bytes:  # type: ignore[misc]
        return _fi.merge(int(lg_k.iloc[0]), [bytes(b) for b in s if b is not None])

    spark.udf.register("frequent_strings_sketch_build", frequent_strings_sketch_build)
    spark.udf.register("frequent_strings_sketch_merge", frequent_strings_sketch_merge)
    spark.udf.register(
        "frequent_strings_sketch_result_no_false_positives", fi_fns._nfp_udf
    )
    spark.udf.register(
        "frequent_strings_sketch_result_no_false_negatives", fi_fns._nfn_udf
    )
    spark.udf.register("frequent_strings_sketch_to_string", fi_fns._to_string_udf)
    spark.udf.register(
        "frequent_strings_sketch_to_datasketches",
        fi_fns.frequent_strings_sketch_to_datasketches,
    )
    spark.udf.register(
        "frequent_strings_sketch_from_datasketches",
        fi_fns.frequent_strings_sketch_from_datasketches,
    )

    # -- aod --------------------------------------------------------------------
    @F.pandas_udf(BinaryType())
    def aod_sketch_build(h: pd.Series, vals: pd.Series) -> bytes:  # type: ignore[misc]
        mask = h.notna() & vals.notna()
        keys = h[mask].to_numpy(dtype=np.int64).astype(np.uint64)
        vl = vals[mask].to_numpy(dtype=object)
        m = (
            np.stack([np.asarray(x, dtype=np.float64) for x in vl])
            if len(vl)
            else np.empty((0, 1))
        )
        return _aod.build(keys, m)

    @F.pandas_udf(BinaryType())
    def aod_sketch_union_agg(s: pd.Series) -> bytes:  # type: ignore[misc]
        return _aod.union([bytes(b) for b in s if b is not None])

    spark.udf.register("aod_sketch_build", aod_sketch_build)
    spark.udf.register("aod_sketch_union_agg", aod_sketch_union_agg)

    from . import aod as aod_fns

    spark.udf.register("aod_sketch_get_estimate", aod_fns.aod_sketch_get_estimate)
    spark.udf.register("aod_sketch_to_means", aod_fns.aod_sketch_to_means)
    spark.udf.register("aod_sketch_to_variances", aod_fns.aod_sketch_to_variances)
    spark.udf.register("aod_sketch_union", aod_fns._union_pair)
    spark.udf.register("aod_sketch_intersection", aod_fns._inter_pair)
    spark.udf.register("aod_sketch_a_not_b", aod_fns._anb_pair)
    spark.udf.register("aod_sketch_students_t_test", aod_fns._ttest_udf)
    spark.udf.register("aod_sketch_to_string", aod_fns._to_string_udf)
    spark.udf.register("aod_sketch_to_datasketches", aod_fns.aod_sketch_to_datasketches)
    spark.udf.register("aod_sketch_from_datasketches", aod_fns.aod_sketch_from_datasketches)

    # -- cpc (real coupon-matrix kernel, sketches.cpc) -----------------------
    from ..sketches import cpc as _cpc
    from . import cpc as cpc_fns

    @F.pandas_udf(BinaryType())
    def cpc_sketch_build(h: pd.Series) -> bytes:  # type: ignore[misc]
        return _cpc.build(_hashes(h))

    @F.pandas_udf(DoubleType())
    def cpc_sketch_distinct(h: pd.Series) -> float:  # type: ignore[misc]
        return _cpc.get_estimate(_cpc.build(_hashes(h)))

    @F.pandas_udf(BinaryType())
    def cpc_sketch_union_agg(s: pd.Series) -> bytes:  # type: ignore[misc]
        return _cpc.union([bytes(b) for b in s if b is not None])

    @F.pandas_udf(BinaryType())
    def cpc_sketch_build_compat(v: pd.Series) -> bytes:  # type: ignore[misc]
        from ..sketches import cpc_interop as _ci

        vals = v.dropna()
        if vals.dtype.kind in "iu":
            return _ci.build_murmur(vals.to_numpy(dtype=np.int64).astype(np.uint64))
        if vals.dtype.kind == "f":
            # Arrow renders a BIGINT column containing NULLs as float64;
            # integral floats are those longs, anything else must be cast
            # by the caller (update(double) canonicalization is not
            # implemented)
            arr = vals.to_numpy(dtype=np.float64)
            if not np.all(arr == np.floor(arr)):
                raise ValueError(
                    "cpc_sketch_build_compat: non-integral numeric keys — "
                    "cast to BIGINT or STRING first"
                )
            # beyond 2^53 a float64 cannot represent every long: the
            # rounded value would still pass the integrality check while
            # the murmur coupons silently diverge from a sketch built on
            # the true keys — refuse rather than betray exact interop.
            # >= (not >): 2^53 itself is reachable by ROUNDING from the
            # unrepresentable 2^53+1, so a value equal to the boundary
            # cannot be trusted either
            if np.any(np.abs(arr) >= 2.0**53):
                raise ValueError(
                    "cpc_sketch_build_compat: integer keys above 2^53 were "
                    "rendered as lossy float64 (nullable BIGINT via Arrow) — "
                    "cast to BIGINT or STRING first"
                )
            return _ci.build_murmur(arr.astype(np.int64).astype(np.uint64))
        return _ci.build_murmur_strings(vals)

    spark.udf.register("cpc_sketch_build", cpc_sketch_build)
    spark.udf.register("cpc_sketch_build_compat", cpc_sketch_build_compat)
    spark.udf.register("cpc_sketch_distinct", cpc_sketch_distinct)
    spark.udf.register("cpc_sketch_union_agg", cpc_sketch_union_agg)
    spark.udf.register("cpc_sketch_get_estimate", cpc_fns.cpc_sketch_get_estimate)
    spark.udf.register("cpc_sketch_to_string", cpc_fns.cpc_sketch_to_string)
    spark.udf.register("cpc_sketch_to_datasketches", cpc_fns.cpc_sketch_to_datasketches)
    spark.udf.register("cpc_sketch_from_datasketches", cpc_fns.cpc_sketch_from_datasketches)
