"""All-NULL groups must still emit a row (empty sketch / 0 estimate) — the
reference's PostgreSQL aggregates skip NULLs in the sfunc but ALWAYS run the
ffunc per group (src/theta_sketch_pg_functions.c:78-82 + FINALFUNC), so a
group never disappears just because every value was NULL."""

import pyspark.sql.functions as F

from datasketches_postgresql_spark.functions import aod as A
from datasketches_postgresql_spark.functions import kll as K
from datasketches_postgresql_spark.functions import theta as T


def _df(spark):
    rows = [("g1", 1), ("g1", 2), ("g2", None), ("g2", None)]
    return spark.createDataFrame(rows, "grp string, value long")


def test_theta_distinct_keeps_all_null_group(spark):
    got = {
        r["grp"]: r["distinct_est"]
        for r in T.theta_sketch_distinct(_df(spark), ["grp"], "value").collect()
    }
    assert got == {"g1": 2.0, "g2": 0.0}


def test_theta_build_keeps_all_null_group(spark):
    sk = T.theta_sketch_build(_df(spark), ["grp"], "value")
    got = {
        r["grp"]: r["e"]
        for r in sk.select(
            "grp", T.theta_sketch_get_estimate("sketch").alias("e")
        ).collect()
    }
    assert got == {"g1": 2.0, "g2": 0.0}


def test_kll_build_keeps_all_null_group(spark):
    sk = K.kll_double_sketch_build(_df(spark), ["grp"], "value")
    got = {
        r["grp"]: r["n"]
        for r in sk.select("grp", K.kll_sketch_get_n(F.col("sketch")).alias("n")).collect()
    }
    assert got == {"g1": 2, "g2": 0}


def test_aod_build_keeps_all_null_group(spark):
    df = _df(spark).select(
        "grp", "value", F.array(F.col("value").cast("double")).alias("vals")
    )
    sk = A.aod_sketch_build(df, ["grp"], "value", "vals")
    got = {
        r["grp"]: r["e"]
        for r in sk.select("grp", A.aod_sketch_get_estimate("sketch").alias("e")).collect()
    }
    assert got == {"g1": 2.0, "g2": 0.0}


def test_global_aggregate_unchanged(spark):
    # global (no group_cols) path must not regress: NULLs skipped, one row out
    est = T.theta_sketch_distinct(_df(spark), [], "value").collect()
    assert len(est) == 1 and est[0]["distinct_est"] == 2.0
