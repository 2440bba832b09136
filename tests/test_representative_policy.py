"""Representative selection policy: which cluster member survives dedup.

The reference engine has no notion of a "surviving row" — dedup there is the
user's SQL over sketch estimates — but an LLM-training-data pipeline needs a
deterministic keep-one rule. Two policies:

- "url"     — lexicographic minimum url (round-1/2 behavior, the default)
- "quality" — highest textops quality_score, url tie-break (keep the
              best-written copy of a near-dup cluster)

Both must be deterministic and agree on cluster MEMBERSHIP (the policy only
moves the is_representative bit). The quality policy must also hold on the
incremental path, where the resolve window re-runs only over touched clusters.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from datasketches_postgresql_spark.dedup.pipeline import DedupConfig, DedupPipeline

_TS = datetime.datetime(2024, 1, 1)

# ~2500 chars of clean prose-like words (no [.,!?;:] chars): punct_ratio 0,
# token_count > 100 -> quality_score == 1.0 for the clean copy
_BASE = " ".join(
    f"river{i} meadow{i} copper{i} lantern{i} harbor{i} violet{i} thunder{i}"
    for i in range(60)
)
# noisy copy: same prose plus a punctuation-soaked tail — shingle Jaccard
# stays ~0.93 (>> 0.8 threshold) but punct_ratio drags quality_score down
_NOISY = _BASE + " " + " ".join(["!!! ??? ;;;"] * 20)


def _page(url: str, text: str):
    return (url, _TS, f"<html><body>{text}</body></html>".encode(), text, "en")


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def _filler(i: int) -> str:
    # distinct unrelated docs so the pipeline is non-degenerate
    return " ".join(f"unique{i}word{j} zephyr{i}x{j} granite{j}q{i}" for j in range(80))


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    # the CLEAN copy gets the lexicographically LARGER url, so the two
    # policies must disagree on the representative
    return _pages(
        spark,
        [
            _page("http://h0.test/a-noisy", _NOISY),
            _page("http://h0.test/z-clean", _BASE),
            _page("http://h1.test/filler1", _filler(1)),
            _page("http://h2.test/filler2", _filler(2)),
        ],
    )


def _rep_of_pair_cluster(resolved):
    """url of the representative of the cluster containing the planted pair."""
    pair = resolved.where(F.col("url").like("http://h0.test/%"))
    cids = [r["cluster_id"] for r in pair.select("cluster_id").distinct().collect()]
    assert len(cids) == 1, "planted near-dup pair did not cluster together"
    reps = resolved.where(
        (F.col("cluster_id") == cids[0]) & F.col("is_representative")
    ).collect()
    assert len(reps) == 1
    return reps[0]["url"]


class TestRepresentativePolicy:
    def test_url_policy_keeps_min_url(self, spark, tiny_corpus, tmp_path_factory):
        pipe = DedupPipeline(
            spark,
            str(tmp_path_factory.mktemp("ckpt_url")),
            DedupConfig(representative_policy="url"),
        )
        out = pipe.run(tiny_corpus, resume=False)
        assert _rep_of_pair_cluster(out["resolved"]) == "http://h0.test/a-noisy"

    def test_quality_policy_keeps_best_copy(self, spark, tiny_corpus, tmp_path_factory):
        pipe = DedupPipeline(
            spark,
            str(tmp_path_factory.mktemp("ckpt_q")),
            DedupConfig(representative_policy="quality"),
        )
        out = pipe.run(tiny_corpus, resume=False)
        resolved = out["resolved"]
        assert _rep_of_pair_cluster(resolved) == "http://h0.test/z-clean"
        # schema contract unchanged: no quality column leaks out
        assert resolved.columns == ["doc_id", "url", "cluster_id", "is_representative"]
        # exactly one representative everywhere
        bad = (
            resolved.groupBy("cluster_id")
            .agg(F.sum(F.col("is_representative").cast("int")).alias("reps"))
            .where(F.col("reps") != 1)
        )
        assert bad.count() == 0

    def test_quality_policy_incremental(self, spark, tiny_corpus, tmp_path_factory):
        """The noisy copy arrives in a LATER batch; the touched-cluster
        re-resolve must still hand the representative bit to the clean doc."""
        ckpt = str(tmp_path_factory.mktemp("ckpt_inc_q"))
        pipe = DedupPipeline(
            spark, ckpt, DedupConfig(representative_policy="quality")
        )
        base = tiny_corpus.where(~F.col("url").like("%a-noisy"))
        batch = tiny_corpus.where(F.col("url").like("%a-noisy"))
        pipe.run(base, resume=False)
        out = pipe.run_incremental(batch, batch_id="b1", resume=False)
        assert _rep_of_pair_cluster(out["resolved"]) == "http://h0.test/z-clean"

    def test_invalid_policy_rejected(self, spark, tmp_path_factory):
        with pytest.raises(ValueError, match="representative_policy"):
            DedupPipeline(
                spark,
                str(tmp_path_factory.mktemp("ckpt_bad")),
                DedupConfig(representative_policy="newest"),
            )
