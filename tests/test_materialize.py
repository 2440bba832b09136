"""Materialization strategy (plans.materialize) + LSH band-metadata guard."""

import pyspark.sql.functions as F
import pytest

from datasketches_postgresql_spark.plans.materialize import materialize


class TestMaterialize:
    def test_strategies_same_rows(self, spark, tmp_path):
        df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("m"))
        expected = sorted(r["id"] for r in df.collect())
        for strategy in ("local_checkpoint", "persist"):
            out = materialize(df, strategy)
            assert sorted(r["id"] for r in out.collect()) == expected
        # reliable checkpoint needs a checkpoint dir
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        out = materialize(df, "checkpoint")
        assert sorted(r["id"] for r in out.collect()) == expected

    def test_unknown_strategy_rejected(self, spark):
        with pytest.raises(ValueError, match="materialization strategy"):
            materialize(spark.range(1), "bogus")

    def test_env_override(self, spark, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
        out = materialize(spark.range(10))
        assert out.count() == 10


class TestBandMetadataGuard:
    def test_mismatched_bands_fall_back_to_recompute(self, spark):
        """A frame whose precomputed band_hashes were built for 32 bands must
        NOT be silently reused when the caller asks for 16 bands — the
        schema metadata triggers the JVM recompute path."""
        from datasketches_postgresql_spark.dedup.lsh import band_hashes
        from datasketches_postgresql_spark.dedup.minhash import signature_stage

        docs = spark.createDataFrame(
            [(1, "1", "the quick brown fox jumps over the lazy dog " * 5)],
            "doc_id long, url string, text string",
        )
        sigs = signature_stage(docs, bands=32, rows=4)
        assert sigs.schema["band_hashes"].metadata["bands"] == 32
        bh32 = band_hashes(sigs, bands=32, rows=4)
        assert bh32.groupBy("doc_id").count().collect()[0]["count"] == 32
        bh16 = band_hashes(sigs, bands=16, rows=8)
        assert bh16.groupBy("doc_id").count().collect()[0]["count"] == 16

    def test_metadata_survives_parquet(self, spark, tmp_path):
        from datasketches_postgresql_spark.dedup.minhash import signature_stage

        docs = spark.createDataFrame(
            [(1, "1", "some text for the signature stage " * 8)],
            "doc_id long, url string, text string",
        )
        path = str(tmp_path / "sigs")
        signature_stage(docs, bands=32, rows=4).write.parquet(path)
        back = spark.read.parquet(path)
        assert back.schema["band_hashes"].metadata.get("bands") == 32
