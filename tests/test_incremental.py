"""Incremental (batch-append) dedup: a new crawl batch deduped against a
completed base run must land on EXACTLY the cluster mapping a full run over
old+new produces — the equivalence claim in DedupPipeline.run_incremental.

Reference analogue: the reference engine re-aggregates stored sketches when
new rows arrive rather than rescanning history (mergeability is the whole
point of the sketch column type, /root/reference/sql/*_sketch.sql); here the
"stored partial" is the banded LSH index + cluster mapping, and the merge is
bucket-complete recomputation of only the touched buckets.
"""

import pytest
from pyspark.sql import functions as F

from datasketches_postgresql_spark.dedup.pipeline import (
    DedupConfig,
    DedupPipeline,
)
from datasketches_postgresql_spark.sources.corpus import generate_corpus


def _clusters_set(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def _resolved_set(df):
    return {
        (r["doc_id"], r["url"], r["cluster_id"], r["is_representative"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def split_corpus(spark):
    """One deterministic corpus split into base / b1 / b2 by url hash, so
    planted duplicate pairs straddle the batch boundary (the case an
    increment must get right)."""
    pages, truth = corpus = generate_corpus(spark, n_docs=450, seed=11, partitions=6)
    bucket = F.pmod(F.xxhash64("url"), F.lit(4))
    base = pages.where(bucket <= 1)
    b1 = pages.where(bucket == 2)
    b2 = pages.where(bucket == 3)
    return pages, base, b1, b2, truth


@pytest.fixture(scope="module")
def full_run(spark, split_corpus, tmp_path_factory):
    pages = split_corpus[0]
    pipe = DedupPipeline(
        spark, str(tmp_path_factory.mktemp("ckpt_full")), DedupConfig()
    )
    return pipe.run(pages, resume=False)


@pytest.fixture(scope="module")
def inc_run(spark, split_corpus, tmp_path_factory):
    _, base, b1, b2, _ = split_corpus
    ckpt = str(tmp_path_factory.mktemp("ckpt_inc"))
    pipe = DedupPipeline(spark, ckpt, DedupConfig())
    out_base = pipe.run(base, resume=False)
    out1 = pipe.run_incremental(b1, batch_id="b1")
    out2 = pipe.run_incremental(b2, batch_id="b2")
    return ckpt, pipe, out_base, out1, out2


class TestIncremental:
    def test_single_increment_matches_full(
        self, spark, split_corpus, tmp_path_factory, full_run
    ):
        """base + one increment == full run over the union (cluster-exact)."""
        _, base, b1, b2, _ = split_corpus
        ckpt = str(tmp_path_factory.mktemp("ckpt_one"))
        pipe = DedupPipeline(spark, ckpt, DedupConfig())
        pipe.run(base, resume=False)
        out = pipe.run_incremental(b1.unionByName(b2), batch_id="ball")
        full_one = DedupPipeline(
            spark, str(tmp_path_factory.mktemp("ckpt_full1")), DedupConfig()
        )
        # full_run fixture covers the same union — reuse its mapping
        assert _clusters_set(out["clusters"]) == _clusters_set(full_run["clusters"])
        assert _resolved_set(out["resolved"]) == _resolved_set(full_run["resolved"])

    def test_chained_increments_match_full(self, full_run, inc_run):
        """base + b1 + b2 chained == full run over everything."""
        _, _, _, _, out2 = inc_run
        assert _clusters_set(out2["clusters"]) == _clusters_set(full_run["clusters"])
        assert _resolved_set(out2["resolved"]) == _resolved_set(full_run["resolved"])

    def test_increment_edges_are_cross_or_new_only(self, inc_run, full_run):
        """An increment never re-verifies old intra-cluster structure: every
        verified edge this batch touches at least one new doc OR connects
        docs through a bucket the batch touched — in particular the edge
        count is far below the full run's."""
        _, _, _, out1, _ = inc_run
        inc_edges = out1["verified"].count()
        full_edges = full_run["verified"].count()
        assert inc_edges < full_edges

    def test_increment_resume_exact(self, spark, inc_run):
        """Resuming a recorded increment reads checkpoints (no recompute) and
        reproduces the mapping bit-for-bit — including when a LATER increment
        already ran (the base for b1 stays b1's original base)."""
        ckpt, pipe, _, out1, _ = inc_run
        pipe2 = DedupPipeline(spark, ckpt, pipe.config)
        again = pipe2.run_incremental(_dummy_pages(spark), batch_id="b1")
        # all stages read back from checkpoints: nothing recomputed
        assert pipe2.stage_seconds == {}
        assert _clusters_set(again["clusters"]) == _clusters_set(out1["clusters"])

    def test_state_bookkeeping(self, inc_run):
        ckpt, pipe, _, _, _ = inc_run
        st = pipe.store.state()
        assert st["batches"] == ["b1", "b2"]
        assert st["base_suffix"] == "b2"

    def test_full_rerun_resets_increments(
        self, spark, split_corpus, tmp_path_factory
    ):
        _, base, b1, _, _ = split_corpus
        ckpt = str(tmp_path_factory.mktemp("ckpt_reset"))
        pipe = DedupPipeline(spark, ckpt, DedupConfig())
        pipe.run(base, resume=False)
        pipe.run_incremental(b1, batch_id="b1")
        assert pipe.store.state()["batches"] == ["b1"]
        pipe.run(base.unionByName(b1), resume=False)
        assert pipe.store.state()["batches"] == []

    def test_requires_completed_base(self, spark, split_corpus, tmp_path_factory):
        _, _, b1, _, _ = split_corpus
        pipe = DedupPipeline(
            spark, str(tmp_path_factory.mktemp("ckpt_nobase")), DedupConfig()
        )
        with pytest.raises(ValueError, match="completed base stage"):
            pipe.run_incremental(b1, batch_id="b1")

    def test_recall_holds_across_increments(self, split_corpus, inc_run):
        from datasketches_postgresql_spark.dedup.pipeline import dup_pair_recall

        _, _, _, _, truth = split_corpus
        _, _, _, _, out2 = inc_run
        assert dup_pair_recall(out2["resolved"], truth) >= 0.99


def _dummy_pages(spark):
    """Resume path never evaluates the input (all stages checkpointed)."""
    return spark.createDataFrame(
        [],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


class TestBloomPrefilter:
    """bloom_prefilter=True must change PLANS, never RESULTS: Bloom has no
    false negatives, so pruning definitely-new band hashes from the
    ``touched`` set keeps the candidate edges — and therefore clusters and
    resolved — exactly equal to the unfiltered increment's."""

    @pytest.fixture(scope="class")
    def bloom_inc_run(self, spark, split_corpus, tmp_path_factory):
        _, base, b1, b2, _ = split_corpus
        ckpt = str(tmp_path_factory.mktemp("ckpt_bloom"))
        cfg = DedupConfig(bloom_prefilter=True, bloom_buckets=32,
                          bloom_slice_bits=1 << 16)
        pipe = DedupPipeline(spark, ckpt, cfg)
        pipe.run(base, resume=False)
        pipe.run_incremental(b1, batch_id="b1")
        out2 = pipe.run_incremental(b2, batch_id="b2")
        return ckpt, pipe, out2

    def test_matches_full_run_exactly(self, full_run, bloom_inc_run):
        _, _, out2 = bloom_inc_run
        assert _clusters_set(out2["clusters"]) == _clusters_set(full_run["clusters"])
        assert _resolved_set(out2["resolved"]) == _resolved_set(full_run["resolved"])

    def test_bloom_checkpoints_exist_per_batch(self, bloom_inc_run):
        _, pipe, _ = bloom_inc_run
        h = pipe.config.config_hash()
        for st in ("band_bloom", "band_bloom_b1", "band_bloom_b2"):
            assert pipe.store.completed(st, h), st

    def test_prefilter_actually_prunes(self, spark, split_corpus, bloom_inc_run):
        """The probe must mark a real fraction of b2's band hashes
        definitely-new (the whole point); planted cross-batch dups keep
        some positives too."""
        from datasketches_postgresql_spark.dedup.bloom import bloom_maybe_contains
        from datasketches_postgresql_spark.dedup.lsh import band_hashes

        _, pipe, _ = bloom_inc_run
        cfg = pipe.config
        sig_b2 = pipe.store.read("signatures_b2")
        touched = band_hashes(sig_b2, cfg.bands, cfg.rows).select("band_hash").distinct()
        filt = pipe.store.read("band_bloom").unionByName(pipe.store.read("band_bloom_b1"))
        probed = bloom_maybe_contains(
            touched, "band_hash", filt, n_buckets=cfg.bloom_buckets
        )
        n = probed.count()
        pos = probed.where("maybe_member").count()
        assert 0 < pos < n
