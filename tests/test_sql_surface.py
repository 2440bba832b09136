"""spark.sql parity: replicate the reference's own test scripts
(/root/reference/test/*.sql) through the registered SQL surface — same
queries, same expected values (SURVEY.md §5: tests exploit small-cardinality
exactness)."""

import pytest

from datasketches_postgresql_spark.functions.registry import register_all


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)


class TestThetaSql:
    """Mirrors /root/reference/test/theta_sketch_test.sql."""

    def test_build_estimate(self, spark):
        # reference :9-13 — select theta_sketch_get_estimate(theta_sketch_build(value))
        got = spark.sql(
            "select theta_sketch_get_estimate(theta_sketch_build(xxhash64(value))) as e "
            "from values (1),(2),(3),(4),(5) as t(value)"
        ).collect()[0]["e"]
        assert got == 5.0

    def test_union_intersection_difference(self, spark):
        # reference :24-33 — sketches over {1..5} and {4..8}
        spark.sql(
            "create or replace temp view theta_test as "
            "select grp, theta_sketch_build(xxhash64(value)) as sketch "
            "from values ('a',1),('a',2),('a',3),('a',4),('a',5),"
            "            ('b',4),('b',5),('b',6),('b',7),('b',8) as t(grp, value) "
            "group by grp"
        )
        row = spark.sql(
            "select theta_sketch_get_estimate(theta_sketch_union_agg(sketch)) as u, "
            "       theta_sketch_get_estimate(theta_sketch_intersection_agg(sketch)) as i "
            "from theta_test"
        ).collect()[0]
        assert (row["u"], row["i"]) == (8.0, 2.0)
        row2 = spark.sql(
            "select theta_sketch_get_estimate(theta_sketch_a_not_b(a.sketch, b.sketch)) as d "
            "from theta_test a join theta_test b on a.grp = 'a' and b.grp = 'b'"
        ).collect()[0]
        assert row2["d"] == 3.0


class TestKllSql:
    """Mirrors /root/reference/test/kll_float_sketch_test.sql."""

    def test_quantile_surface(self, spark):
        spark.sql(
            "create or replace temp view kll_test as "
            "select kll_float_sketch_build(cast(value as double), 200) as sketch "
            "from values (1.0),(2.0),(3.0),(4.0),(5.0),(6.0),(7.0),(8.0),(9.0),(10.0) as t(value)"
        )
        row = spark.sql(
            "select kll_float_sketch_get_n(sketch) as n, "
            "       kll_float_sketch_get_rank(sketch, 5.0, false) as r, "
            "       kll_float_sketch_get_quantile(sketch, 0.5, false) as q, "
            "       kll_float_sketch_get_pmf(sketch, array(2.0, 5.0, 7.0), false) as pmf "
            "from kll_test"
        ).collect()[0]
        assert row["n"] == 10
        assert row["r"] == pytest.approx(0.4)
        assert row["q"] in (5.0, 6.0)
        assert row["pmf"] == pytest.approx([0.1, 0.3, 0.2, 0.4])


class TestFiSql:
    """Mirrors /root/reference/test/fi_sketch_test.sql."""

    def test_merge_and_result(self, spark):
        spark.sql(
            "create or replace temp view fi_test as "
            "select batch, frequent_strings_sketch_build(8, str) as sketch "
            "from values (1,'a'),(1,'b'),(1,'a'),(1,'a'),(1,'c'),"
            "            (2,'a'),(2,'c'),(2,'c'),(2,'b'),(2,'a') as t(batch, str) "
            "group by batch"
        )
        rows = spark.sql(
            "select inline(frequent_strings_sketch_result_no_false_negatives(m, 0)) "
            "from (select frequent_strings_sketch_merge(8, sketch) as m from fi_test)"
        ).collect()
        assert [(r["str"], r["estimate"]) for r in rows] == [("a", 5), ("c", 3), ("b", 2)]


class TestAodSql:
    """Mirrors /root/reference/test/aod_sketch_test.sql."""

    def test_build_means(self, spark):
        row = spark.sql(
            "select aod_sketch_get_estimate(s) as e, aod_sketch_to_means(s) as m "
            "from (select aod_sketch_build(xxhash64(key), vals) as s "
            "      from values (1, array(1.0)),(2, array(2.0)),(3, array(3.0)) as t(key, vals))"
        ).collect()[0]
        assert row["e"] == 3.0
        assert row["m"] == [2.0]


class TestCpcSql:
    def test_alias(self, spark):
        got = spark.sql(
            "select cpc_sketch_distinct(xxhash64(value)) as e "
            "from values (1),(2),(3),(4),(5),(6),(7),(8) as t(value)"
        ).collect()[0]["e"]
        assert abs(got - 8.0) / 8.0 < 0.02
