"""Three-way XXH64 agreement: Spark's native xxhash64, the pure-Python
mirror, and the generated DuckDB SQL must produce bit-identical hashes
and split buckets (textops/xxh64_sql.py) — the key that lets the
dataset-mixing/splitting gates be driver-hash-verified against an
independent engine."""

import duckdb
import pytest
from pyspark.sql import functions as F

from datasketches_postgresql_spark.textops import xxh64_sql as X


IDS = [0, 1, 2, 3, 499, 12345, 10**12 + 7, 2**40 + 13, 2**52 + 1]


class TestPythonMirror:
    @pytest.mark.parametrize("seed", [0, 9, 42])
    def test_matches_spark_long_int(self, spark, seed):
        df = spark.createDataFrame([(i,) for i in IDS], "id long")
        rows = df.select("id", F.xxhash64("id", F.lit(seed)).alias("h")).collect()
        for r in rows:
            assert r["h"] == X.xxhash64_long_int(r["id"], seed)

    def test_matches_spark_single_long(self, spark):
        df = spark.createDataFrame([(i,) for i in IDS], "id long")
        rows = df.select("id", F.xxhash64("id").alias("h")).collect()
        for r in rows:
            assert r["h"] == X.xxhash64_long(r["id"])


class TestSqlGeneration:
    @pytest.mark.parametrize("seed", [0, 9, 1234567])
    def test_duckdb_matches_python(self, seed):
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS id", [IDS])
        sql, name = X.xxhash64_long_int_sql("id", seed, "t")
        rows = con.execute(f"SELECT id, {name} FROM ({sql}) ORDER BY id").fetchall()
        assert len(rows) == len(IDS)
        for i, h in rows:
            assert h == X.xxhash64_long_int(i, seed), i

    def test_bucket_matches_spark_split_bucket(self, spark):
        """End to end: the SQL bucket equals Spark's split_bucket * 1e6
        for a real id range — the exact expression the mixing gate uses."""
        from datasketches_postgresql_spark.textops.split import split_bucket

        ids = list(range(200))
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        got = {
            r["id"]: r["b"]
            for r in df.select(
                "id",
                (split_bucket(F.col("id"), seed=9) * 1_000_000)
                .cast("long")
                .alias("b"),
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS id", [ids])
        sql, name = X.split_bucket_sql("id", 9, "t")
        for i, b in con.execute(f"SELECT id, {name} FROM ({sql})").fetchall():
            assert b == got[i], i

    def test_carry_columns_survive(self):
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest([1,2]) AS id, 'x' AS tag")
        sql, name = X.split_bucket_sql("id", 0, "t")
        rows = con.execute(f"SELECT id, tag, {name} FROM ({sql})").fetchall()
        assert {r[1] for r in rows} == {"x"}


class TestStringHash:
    """Round 5: string-key support — the hashed quality-model oracle
    replays Spark's xxhash64(token) bucketing in DuckDB."""

    def _tokens(self):
        import random
        import string

        rng = random.Random(7)
        return [
            "".join(rng.choice(string.ascii_lowercase) for _ in range(n))
            for n in range(0, 32)
            for _ in range(4)
        ]

    def test_python_mirror_matches_spark(self, spark):
        """Every length class: empty, sub-4, sub-8, 8-byte words + tails,
        the >=32 four-lane stripe path, and multibyte UTF-8."""
        toks = self._tokens() + ["x" * 100, "übermäßig", "日本語"]
        df = spark.createDataFrame([(t,) for t in toks], "t string")
        rows = df.select("t", F.xxhash64("t").alias("h")).collect()
        for r in rows:
            assert r["h"] == X.xxhash64_string(r["t"]), repr(r["t"])

    def test_duckdb_short_ascii_matches_python(self):
        toks = self._tokens()
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS tok", [toks])
        sql, name = X.xxhash64_short_ascii_sql("tok", "t")
        rows = con.execute(f"SELECT tok, {name} FROM ({sql})").fetchall()
        assert len(rows) == len(toks)
        for t, h in rows:
            assert h == X.xxhash64_string(t), repr(t)

    def test_bucket_chain_matches_spark_feature_col(self, spark):
        """The exact expression pair the hashed quality gate verifies:
        Spark pmod(xxhash64(tok), n_buckets) vs the DuckDB chain."""
        toks = [t for t in self._tokens() if t]
        nb = 1024
        df = spark.createDataFrame([(t,) for t in toks], "tok string")
        got = {
            r["tok"]: r["b"]
            for r in df.select(
                "tok", F.pmod(F.xxhash64("tok"), F.lit(nb)).alias("b")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS tok", [toks])
        sql, name = X.xxhash64_short_ascii_sql("tok", "t")
        for t, h in con.execute(f"SELECT tok, {name} FROM ({sql})").fetchall():
            assert ((h % nb) + nb) % nb == got[t], repr(t)


def test_short_ascii_sql_rejects_32_byte_tokens():
    """The renderer only implements the <32-byte (no stripe loop) regime;
    a 32+ byte token must error loudly, not hash wrong-but-plausibly."""
    import duckdb
    import pytest

    from datasketches_postgresql_spark.textops.xxh64_sql import (
        xxhash64_short_ascii_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE toks AS SELECT repeat('a', 32) AS tok")
    sql, alias = xxhash64_short_ascii_sql("tok", "toks")
    with pytest.raises(duckdb.Error, match="short-string regime"):
        con.execute(f"SELECT {alias} FROM ({sql})").fetchall()
    # 31 bytes is inside the regime and still matches Spark's xxhash64
    con.execute("CREATE TABLE toks31 AS SELECT repeat('a', 31) AS tok")
    sql31, alias31 = xxhash64_short_ascii_sql("tok", "toks31")
    (got,) = con.execute(f"SELECT {alias31} FROM ({sql31})").fetchone()
    from datasketches_postgresql_spark.textops.xxh64_sql import xxhash64_string

    assert got == xxhash64_string("a" * 31)
