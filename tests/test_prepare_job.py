"""End-to-end training-data preparation job (jobs/prepare_training_data.py):
crawl pages -> dedup -> redact -> filter -> decontaminate -> pack -> split
-> shards, exercised in-process on a small corpus."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def prep_out(spark, tmp_path_factory, capsys_module=None):
    import jobs.prepare_training_data as JOB

    ck = str(tmp_path_factory.mktemp("prep_ck"))
    out = str(tmp_path_factory.mktemp("prep_out"))
    argv = [
        "prepare_training_data.py",
        "--generate", "800",
        "--checkpoint", ck,
        "--output", out,
        "--budget", "1024",
        "--val-frac", "0.05",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        JOB.main()
    finally:
        sys.argv = old
    return out


class TestPrepareTrainingData:
    def test_shards_and_invariants(self, spark, prep_out):
        df = spark.read.parquet(prep_out)
        assert set(df.select("split").distinct().toPandas()["split"]) <= {"train", "val"}
        # schema carries provenance + packing columns
        for c in ("doc_id", "url", "text", "cluster_id", "n_tokens", "bin_id", "bin_fill"):
            assert c in df.columns, c
        # each doc exactly once; bins never straddle splits
        assert df.count() == df.select("doc_id").distinct().count()
        straddle = (
            df.groupBy("bin_id").agg(F.countDistinct("split").alias("k")).where("k > 1")
        )
        assert straddle.count() == 0
        # every non-oversize bin within budget
        bad = (
            df.where(~F.col("oversize"))
            .groupBy("bin_id")
            .agg(F.sum("n_tokens").alias("s"))
            .where(F.col("s") > 1024)
        )
        assert bad.count() == 0
        # PII redaction ran: no raw emails survive
        assert df.where(F.col("text").rlike(r"[\w.+-]+@[\w-]+\.[\w.]+")).count() == 0

    def test_representative_only_one_per_cluster(self, spark, prep_out):
        df = spark.read.parquet(prep_out)
        assert (
            df.groupBy("cluster_id").count().where("count > 1").count() == 0
        )


class TestPrepareWithRealBpe:
    def test_bpe_vocab_budgets(self, spark, tmp_path):
        """--bpe-vocab swaps the packing length column to REAL post-merge
        token counts; bins respect the budget in those units."""
        import jobs.prepare_training_data as JOB
        from datasketches_postgresql_spark.textops.bpe import BpeVocab, learn_bpe

        vocab = learn_bpe(
            {" the": 40, " and": 30, " data": 20, " spark": 10, "the": 25}, 50
        )
        vpath = str(tmp_path / "vocab.json")
        vocab.save(vpath)
        ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
        argv = [
            "prepare_training_data.py",
            "--generate", "400",
            "--checkpoint", ck,
            "--output", out,
            "--budget", "512",
            "--bpe-vocab", vpath,
        ]
        old = sys.argv
        sys.argv = argv
        try:
            JOB.main()
        finally:
            sys.argv = old
        df = spark.read.parquet(out)
        bad = (
            df.where(~F.col("oversize"))
            .groupBy("bin_id")
            .agg(F.sum("n_tokens").alias("s"))
            .where(F.col("s") > 512)
        )
        assert bad.count() == 0
        # n_tokens really is the loaded vocab's count for a sampled row
        row = df.select("text", "n_tokens").first()
        assert row["n_tokens"] == BpeVocab.load(vpath).count_text(row["text"])


class TestPrepareWithQualityModel:
    def test_quality_model_tier_drops_low_scorers(self, spark, tmp_path):
        """--quality-model adds the learned tier: survivors all score at
        or above the threshold under the loaded model."""
        import jobs.prepare_training_data as JOB
        from datasketches_postgresql_spark.textops.quality_model import (
            QualityModel,
            quality_score,
        )

        fx = os.path.join(
            os.path.dirname(__file__), "..",
            "datasketches_postgresql_spark", "textops",
            "quality_model_fixture.json",
        )
        ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
        argv = [
            "prepare_training_data.py",
            "--generate", "400",
            "--checkpoint", ck,
            "--output", out,
            "--quality-model", fx,
            "--quality-threshold", "0.2",
        ]
        old = sys.argv
        sys.argv = argv
        try:
            JOB.main()
        finally:
            sys.argv = old
        df = spark.read.parquet(out)
        m = QualityModel.load(fx)
        scored = quality_score(df, "text", m, "doc_id")
        assert scored.where(F.col("quality_p") < 0.2).count() == 0
        assert df.count() > 0
