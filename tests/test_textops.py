"""Training-data operator tests over the driver-provided documents and
embeddings tables (+ synthetic cases)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from datasketches_postgresql_spark.textops import analysis as TA
from datasketches_postgresql_spark.textops import ann as ANN
from datasketches_postgresql_spark.textops import dedupe as D


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestAnalysis:
    def test_token_count_matches_python(self, spark, docs):
        rows = (
            docs.limit(20)
            .select("doc_id", "text", TA.token_count(F.col("text")).alias("tc"))
            .collect()
        )
        for r in rows:
            assert r["tc"] == len(r["text"].strip().split())

    def test_quality_and_langid(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog of the house sat on the mat and slept"),
                (2, "der hund und die katze und der vogel und die maus"),
                (3, "le chat et le chien et les oiseaux et les souris"),
                (4, "el gato y los perros y el raton y los pajaros"),
                (5, "!!! ... ;;; ::: ??? ,,,"),
            ],
            "id long, text string",
        )
        out = {r["id"]: r for r in TA.analyze(df).collect()}
        assert out[1]["lang_pred"] == "en"
        assert out[2]["lang_pred"] == "de"
        assert out[3]["lang_pred"] == "fr"
        assert out[4]["lang_pred"] == "es"
        assert out[5]["quality_score"] < out[1]["quality_score"]
        assert out[1]["punct_ratio"] == 0.0

    def test_fingerprint_deterministic(self, spark, docs):
        a = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", TA.doc_fingerprint(F.col("text")).alias("fp")).collect()}
        b = {r["doc_id"]: r["fp"] for r in docs.repartition(7).select("doc_id", TA.doc_fingerprint(F.col("text")).alias("fp")).collect()}
        assert a == b


class TestDedupe:
    def test_exact_dup_groups(self, spark, docs):
        dup = docs.select(F.col("doc_id") + 1_000_000, "text").toDF("doc_id", "text")
        both = docs.select("doc_id", "text").union(dup)
        groups = D.exact_dup_groups(both, "doc_id", "text")
        n_docs = docs.count()
        assert groups.count() == n_docs
        assert groups.agg(F.max("n_dups")).collect()[0][0] == 2
        by_hash = D.exact_dup_groups_by_hash(both, "doc_id", "text")
        assert by_hash.count() == n_docs

    def test_ngram_jaccard_identical_and_disjoint(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
            "id long, text string",
        )
        pairs = {(r["a"], r["b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(df, "id", "text").collect()}
        assert pairs[(1, 2)] == 1.0
        # inverted-index semantics: zero-overlap pairs are omitted entirely
        assert (1, 3) not in pairs

    def test_minhash_lsh_finds_planted_copies(self, spark, docs):
        base = docs.select("doc_id", "text").where("n_chars > 100")
        dup = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        both = base.union(dup)
        pairs = D.minhash_lsh_pairs(both, "doc_id", "text", jaccard_threshold=0.95)
        found = {(r["a"], r["b"]) for r in pairs.collect()}
        expected = {(r["doc_id"], r["doc_id"] + 1_000_000) for r in base.collect()}
        assert expected <= found  # recall 1.0 on exact copies
        # extras must themselves be >= threshold by construction (the tiny
        # synthetic vocab makes some unrelated docs genuinely near-dup);
        # exact copies of DIFFERENT base docs must not pair below threshold
        for a, b in found - expected:
            assert not (a < 1_000_000 and b < 1_000_000 and a == b)

    def test_simhash_pairs_exact(self, spark, docs):
        base = docs.select("doc_id", "text").where("n_chars > 100").limit(50)
        dup = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        pairs = D.simhash_pairs(base.union(dup), "doc_id", "text", max_hamming=3)
        found = {(r["a"], r["b"]) for r in pairs.collect()}
        expected = {(r["doc_id"], r["doc_id"] + 1_000_000) for r in base.collect()}
        assert expected <= found

    def test_embedding_neardup_self_pairs(self, spark, embs):
        shifted = embs.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
        both = embs.select("vec_id", "embedding").union(shifted).where("vec_id % 25 = 0 or vec_id % 25 = 10000 % 25")
        # default LSH-bucketed path: identical vectors always share every
        # bucket, so recall on exact copies is 1.0 by construction
        pairs = D.embedding_neardup_pairs(
            both, "vec_id", "embedding", threshold=0.999999, dim=64
        )
        found = {(r["a"], r["b"]) for r in pairs.collect()}
        base_ids = {r["vec_id"] for r in embs.where("vec_id % 25 = 0").collect()}
        for i in base_ids:
            assert (i, i + 10_000) in found
        # exact audit path agrees on the same planted pairs
        exact = D.embedding_neardup_pairs(
            both, "vec_id", "embedding", threshold=0.999999, method="exact"
        )
        assert {(r["a"], r["b"]) for r in exact.collect()} >= {
            (i, i + 10_000) for i in base_ids
        }


class TestAnn:
    def test_topk_vs_duckdb_style_check(self, spark, embs):
        qs = embs.where("vec_id < 3")
        topk = ANN.cosine_topk(embs, qs, "vec_id", "embedding", k=5)
        rows = topk.collect()
        assert len(rows) == 15
        by_q = {}
        for r in rows:
            by_q.setdefault(r["qid"], []).append((r["rank"], r["cos"]))
        for q, lst in by_q.items():
            lst.sort()
            cos = [c for _, c in lst]
            assert cos == sorted(cos, reverse=True)

    def test_lsh_recall_vs_bruteforce(self, spark, embs):
        qs = embs.where("vec_id < 10")
        exact = ANN.cosine_topk(embs, qs, "vec_id", "embedding", k=5)
        approx = ANN.lsh_bucketed_neighbors(embs, qs, "vec_id", "embedding", dim=64, k=5, n_planes=6, n_tables=8, n_probes=1)
        e = {(r["qid"], r["id"]) for r in exact.collect()}
        a = {(r["qid"], r["id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        # random embeddings are the worst case for sign-LSH (top-5
        # cosines sit at ~0.3); on real near-dup embeddings (cos>=0.9)
        # the same config is ~exact
        assert recall >= 0.7, f"ANN recall {recall} too low"

    def test_ivf_recall_and_determinism(self, spark, embs):
        """IVF-Flat scale path: centroid training is deterministic, every
        corpus row lands in exactly one cell, and n_probe=8 of 16 cells
        recovers most of the brute-force top-5 (random embeddings are the
        worst case for any cosine ANN — half the cells hold half the
        probability mass of a query's true neighbors)."""
        c1 = ANN.ivf_train_centroids(embs, "embedding", dim=64, n_cells=16, iters=8)
        c2 = ANN.ivf_train_centroids(embs, "embedding", dim=64, n_cells=16, iters=8)
        assert np.array_equal(c1, c2)
        assert c1.shape == (16, 64)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

        assigned = ANN.ivf_assign(embs, "vec_id", "embedding", c1)
        n_corpus = embs.count()
        assert assigned.count() == n_corpus  # exactly one cell per row
        cells = assigned.groupBy("cell").count().collect()
        assert all(0 <= r["cell"] < 16 for r in cells)

        qs = embs.where("vec_id < 10")
        exact = ANN.cosine_topk(embs, qs, "vec_id", "embedding", k=5)
        approx = ANN.ivf_topk(assigned, qs, "vec_id", "embedding", c1, k=5, n_probe=8)
        e = {(r["qid"], r["id"]) for r in exact.collect()}
        a = {(r["qid"], r["id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.6, f"IVF recall {recall} too low"
        # a query's own cell is always among its probes: rank-1 self-ish
        # neighbors in the same cell are never missed
        full = ANN.ivf_topk(assigned, qs, "vec_id", "embedding", c1, k=5, n_probe=16)
        f = {(r["qid"], r["id"]) for r in full.collect()}
        assert f == e, "probing every cell must equal brute force"


class TestMultimodal:
    def test_decode_stub_plumbing(self, spark):
        from datasketches_postgresql_spark.multimodal.binary import decode_media, frame_sample

        df = spark.createDataFrame(
            [(1, b"\x89PNG fake image bytes" * 100), (2, b"RIFF fake audio" * 50)],
            "id long, payload binary",
        )
        meta = decode_media(df, "id", "payload").collect()
        assert len(meta) == 2
        for r in meta:
            assert r["n_bytes"] > 0 and len(r["features"]) == 16
            assert abs(sum(r["features"]) - 1.0) < 1e-5
        frames = frame_sample(df, "id", "payload", every_n_bytes=256)
        assert frames.count() > 2

    def test_real_decoder_raises(self, spark):
        from datasketches_postgresql_spark.multimodal.binary import decode_media

        df = spark.createDataFrame([(1, b"x")], "id long, payload binary")
        with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
            decode_media(df, "id", "payload", real_decoder=True).collect()


class TestStreaming:
    def test_watermarked_dedup(self, spark, tmp_path):
        import time

        from datasketches_postgresql_spark.streaming.stream import streaming_exact_dedup

        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "u1", "2025-01-01 00:00:00"), (2, "u1", "2025-01-01 00:00:01"), (3, "u2", "2025-01-01 00:00:02")],
            "id long, url string, ts string",
        ).withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("id long, url string, ts timestamp").parquet(src)
        deduped = streaming_exact_dedup(stream, ["url"], "ts")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("select url from dedup_test").collect()
        assert sorted(r["url"] for r in got) == ["u1", "u2"]


class TestStreamingMetricsSink:
    def test_foreach_batch_sink_distributed(self, spark, tmp_path):
        """The sink must fold each micro-batch distributed-side (two-phase
        envelope merge, no driver collect of batch rows) and append one
        mergeable lineage row; invoking the foreachBatch fn on a static
        frame is exactly what Structured Streaming does per micro-batch."""
        from datasketches_postgresql_spark.sketches import theta as _t
        from datasketches_postgresql_spark.streaming.stream import (
            sketch_metrics_foreach_batch,
        )

        path = str(tmp_path / "metrics")
        fn = sketch_metrics_foreach_batch(path, "id", value_col="v")
        batch = spark.range(1000).select(
            F.col("id"), (F.col("id") % 100).cast("double").alias("v")
        )
        fn(batch, 0)
        fn(batch.where("id < 500"), 1)
        rows = {r["batch_id"]: r for r in spark.read.parquet(path).collect()}
        assert rows[0]["rows"] == 1000 and rows[1]["rows"] == 500
        assert rows[0]["distinct_est"] == 1000.0
        assert abs(rows[0]["median_est"] - 49.0) <= 1.0
        # mergeability across batches: union of stored sketches == union set
        merged = _t.union([bytes(rows[0]["theta_sketch"]), bytes(rows[1]["theta_sketch"])])
        assert _t.get_estimate(merged) == 1000.0


class TestStreamingLshCandidates:
    def test_stateful_near_dup_candidates(self, spark, tmp_path):
        """applyInPandasWithState LSH: two near-identical docs streaming in
        must emit a candidate pair; the unrelated doc must pair with
        neither. Exact copies also carry exact_sig_match=True."""
        from datasketches_postgresql_spark.streaming.stream import (
            streaming_lsh_candidates,
        )

        base = (
            "the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest looking for adventure " * 8
        )
        rows = [
            (1, "u1", base, "2025-01-01 00:00:00"),
            (2, "u2", base, "2025-01-01 00:00:01"),  # exact copy of 1
            (3, "u3", "completely different tiny text about spark plans "
                      "catalyst tungsten shuffles partitions " * 9, "2025-01-01 00:00:02"),
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            rows, "doc_id long, url string, text string, ts string"
        ).withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, url string, text string, ts timestamp"
        ).parquet(src)
        cands = streaming_lsh_candidates(stream, bands=16, rows=8)
        q = (
            cands.writeStream.format("memory")
            .queryName("lsh_cand_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select distinct a, b, max(exact_sig_match) over "
            "(partition by a, b) as m from lsh_cand_test"
        ).collect()
        pairs = {(r["a"], r["b"]): r["m"] for r in got}
        assert (1, 2) in pairs and pairs[(1, 2)]  # exact copies collide fully
        assert all(3 not in p for p in pairs)  # unrelated doc pairs with nothing

    def test_state_bounded_by_ring(self, spark, tmp_path):
        """max_bucket caps per-bucket pair fan-out: N exact copies with a
        small ring emit at most ring-size pairs per arrival, not O(N^2)."""
        from datasketches_postgresql_spark.streaming.stream import (
            streaming_lsh_candidates,
        )

        text = "identical payload for every single document in this bucket " * 10
        rows = [(i, f"u{i}", text, "2025-01-01 00:00:00") for i in range(1, 13)]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            rows, "doc_id long, url string, text string, ts string"
        ).withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, url string, text string, ts timestamp"
        ).parquet(src)
        # state_timeout_minutes=0: no processing-time timers, so the
        # AvailableNow run terminates as soon as the backlog drains instead
        # of idling 120 s on empty timer-service micro-batches (the timeout
        # path itself is covered by test_stateful_near_dup_candidates)
        cands = streaming_lsh_candidates(
            stream, bands=4, rows=32, max_bucket=3, state_timeout_minutes=0
        )
        q = (
            cands.writeStream.format("memory")
            .queryName("lsh_ring_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        per_band = spark.sql(
            "select band_hash, count(*) as c from lsh_ring_test group by band_hash"
        ).collect()
        # 12 docs, ring 3: each arrival pairs against <=3 members -> <=33
        # per band, far below the unbounded 66
        assert per_band and all(r["c"] <= 3 * 11 for r in per_band)
        n_pairs = spark.sql(
            "select count(distinct a, b) as c from lsh_ring_test"
        ).collect()[0]["c"]
        assert n_pairs >= 11  # every doc still linked into the cluster


class TestDecontaminate:
    def _mini(self, spark):
        mk = lambda i, t: (i, t)  # noqa: E731
        train = spark.createDataFrame(
            [
                mk(1, "alpha beta gamma delta epsilon zeta"),   # contains bench 10's 4-gram
                mk(2, "one two three four five six seven"),     # clean
                mk(3, "beta gamma delta epsilon nine ten"),     # same 4-gram window
                mk(4, "alpha beta gamma"),                      # short doc, whole == nothing in bench
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [
                mk(10, "zero beta gamma delta epsilon hundred"),
                mk(11, "completely different benchmark words here"),
            ],
            "bench_id long, text string",
        )
        return train, bench

    def test_overlap_detection(self, spark):
        from datasketches_postgresql_spark.textops.decontaminate import decontaminate

        train, bench = self._mini(spark)
        out = decontaminate(train, bench, n=4)
        got = {r["doc_id"]: (r["bench_docs_hit"], r["grams_hit"]) for r in out.collect()}
        # docs 1 and 3 share the 4-gram "beta gamma delta epsilon" with bench 10
        assert got == {1: (1, 1), 3: (1, 1)}

    def test_short_doc_verbatim_copy_caught(self, spark):
        from datasketches_postgresql_spark.textops.decontaminate import decontaminate

        train = spark.createDataFrame(
            [(1, "tiny bench prompt"), (2, "some other words")],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(10, "tiny bench prompt")], "bench_id long, text string"
        )
        out = decontaminate(train, bench, n=13)
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_benchmark_side_broadcasts(self, spark, docs):
        from datasketches_postgresql_spark.textops.decontaminate import decontaminate

        bench = docs.where(F.col("doc_id") % 11 == 0).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        train = docs.where(F.col("doc_id") % 11 != 0)
        out = decontaminate(train, bench, n=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        # contaminated set is exactly what a string-equality join computes
        from datasketches_postgresql_spark.textops.dedupe import word_ngrams

        tg = train.select("doc_id", F.explode(F.array_distinct(word_ngrams(F.col("text"), 8))).alias("g"))
        bg = bench.select("bench_id", F.explode(F.array_distinct(word_ngrams(F.col("text"), 8))).alias("g")).distinct()
        expect = (
            tg.join(bg, "g")
            .groupBy("doc_id")
            .agg(
                F.countDistinct("bench_id").alias("bench_docs_hit"),
                F.countDistinct("g").alias("grams_hit"),
            )
        )
        got = {(r["doc_id"], r["bench_docs_hit"], r["grams_hit"]) for r in out.collect()}
        want = {(r["doc_id"], r["bench_docs_hit"], r["grams_hit"]) for r in expect.collect()}
        assert got == want and len(want) > 0


class TestRepetitionSignals:
    def test_matches_python_reference(self, spark):
        from collections import Counter

        from datasketches_postgresql_spark.textops.analysis import repetition_signals

        texts = [
            (1, "a b c a b c a b c"),            # heavy 3-cycle repetition
            (2, "one two three four five six"),  # all distinct
            (3, "spam spam spam spam spam"),     # single repeated word
            (4, "x y"),                          # shorter than the 5-gram window
        ]
        out = {
            r["doc_id"]: r
            for r in repetition_signals(
                spark.createDataFrame(texts, "doc_id long, text string")
            ).collect()
        }
        for doc_id, text in texts:
            w = text.split()
            dup_w = round((len(w) - len(set(w))) / len(w), 6)
            g2 = Counter(" ".join(w[i : i + 2]) for i in range(len(w) - 1))
            top2 = round(max(g2.values(), default=0) * 2 / len(w), 6)
            g5 = [" ".join(w[i : i + 5]) for i in range(len(w) - 4)]
            dup5 = round((len(g5) - len(set(g5))) / max(len(g5), 1), 6)
            r = out[doc_id]
            assert r["n_words"] == len(w)
            assert r["dup_word_frac"] == dup_w, (doc_id, r)
            assert r["top_2gram_frac"] == top2, (doc_id, r)
            assert r["dup_5gram_frac"] == dup5, (doc_id, r)

    def test_zero_shuffle_projection(self, spark, docs):
        from datasketches_postgresql_spark.textops.analysis import repetition_signals

        plan = (
            repetition_signals(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan


class TestUrlOps:
    CASES = [
        # (raw, canonical)
        ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("http://example.com:80//a//b/", "http://example.com/a/b"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com", "https://example.com"),
        ("https://example.com/p?gclid=1&fbclid=2&ref=tw&utm_medium=m",
         "https://example.com/p"),
        ("https://example.com:8443/p", "https://example.com:8443/p"),
        ("http://sub.www-like.example.com/p?z=1&y=2",
         "http://sub.www-like.example.com/p?y=2&z=1"),
    ]

    def test_canonical_rules(self, spark):
        from datasketches_postgresql_spark.textops.urlops import canonical_url

        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(self.CASES)], "i long, url string"
        )
        got = {
            r["i"]: r["c"]
            for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
        }
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, (self.CASES[i][0], got[i], want)

    def test_dedup_by_url_keeps_freshest(self, spark):
        import datetime as dt

        from datasketches_postgresql_spark.textops.urlops import dedup_by_url

        t0 = dt.datetime(2026, 1, 1)
        t1 = dt.datetime(2026, 2, 1)
        rows = [
            ("https://example.com/a?utm_source=x", t0, "old"),
            ("https://WWW.example.com/a", t1, "new"),     # same canonical, fresher
            ("https://example.com/b", t0, "only"),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, tag string")
        kept = {r["tag"] for r in dedup_by_url(df, ts_col="warc_ts").collect()}
        assert kept == {"new", "only"}
        # without ts: lexicographically smallest raw url wins
        kept2 = {r["tag"] for r in dedup_by_url(df).collect()}
        assert kept2 == {"new", "only"} or kept2 == {"old", "only"}
        # deterministic: min raw url between the two spellings
        urls = sorted([rows[0][0], rows[1][0]])
        want = "old" if urls[0] == rows[0][0] else "new"
        assert kept2 == {want, "only"}

    def test_canonicalization_is_idempotent(self, spark):
        """canonical(canonical(u)) == canonical(u): re-ingesting an already-
        canonical crawl never reshuffles identities."""
        from datasketches_postgresql_spark.textops.urlops import canonical_url

        nasty = [
            "https://example.com",
            "https://example.com/",
            "HTTP://WWW.EX.COM:80//a///b//?utm_campaign=z&z=9&a=1#x",
            "https://ex.com/p?",
            "https://ex.com/p?&",
            "https://ex.com/p?utm_source=only",
            "https://ex.com:443/p?a=1&a=1&b=",
            "ftp://Files.Ex.com:21/pub/",
            "https://ex.com/p#only-frag",
            "http://ex.com:8080/p/?ref=abc&refresh=keep",  # refresh must SURVIVE
            "https://www.ex.com/trailing///",
            "https://ex.com/%7Euser/Page?b=2&B=1",  # percent + case-sensitive params
        ]
        df = spark.createDataFrame([(i, u) for i, u in enumerate(nasty)], "i long, url string")
        once = df.select("i", canonical_url(F.col("url")).alias("c"))
        twice = once.select("i", canonical_url(F.col("c")).alias("c2"), "c")
        for r in twice.collect():
            assert r["c2"] == r["c"], (nasty[r["i"]], r["c"], r["c2"])
        got = {r["i"]: r["c"] for r in once.collect()}
        assert got[9] == "http://ex.com:8080/p?refresh=keep"  # ref dropped, refresh kept
        assert got[7] == "ftp://files.ex.com:21/pub"          # non-http port kept

    def test_canonical_stage_is_projection(self, spark):
        from datasketches_postgresql_spark.textops.urlops import canonical_url

        df = spark.range(100).select(
            F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                     F.lit(".com/p/"), F.col("id").cast("string")).alias("url")
        )
        plan = (
            df.select(canonical_url(F.col("url")).alias("c"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan


class TestPiiRedact:
    def test_each_kind_redacts_and_counts(self, spark):
        from datasketches_postgresql_spark.textops.pii import scrub

        rows = [
            (1, "mail me at alice.smith+x@mail.example.co today"),
            (2, "call +1 (555) 123-4567 or 020-7946-0958 now"),
            (3, "served from 10.0.0.1 and 192.168.1.77"),
            (4, "no pii here at all"),
            (5, "mixed: bob@ex.org from 8.8.8.8 dial +44 20 7946 0958"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in scrub(df).collect()}
        assert got[1]["redacted"] == "mail me at <EMAIL> today"
        assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 0, 0)
        assert got[2]["redacted"] == "call <PHONE> or <PHONE> now"
        assert got[2]["n_phone"] == 2
        assert got[3]["redacted"] == "served from <IP> and <IP>"
        assert got[3]["n_ipv4"] == 2
        assert got[4]["redacted"] == rows[3][1]
        assert got[5]["redacted"] == "mixed: <EMAIL> from <IP> dial <PHONE>"
        assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_phone"]) == (1, 1, 1)

    def test_zero_shuffle_projection(self, spark, docs):
        from datasketches_postgresql_spark.textops.pii import scrub

        plan = scrub(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestBpeTokensAndGopherFilter:
    def test_bpe_pretokenizer_rule(self, spark):
        import re

        from datasketches_postgresql_spark.textops.analysis import (
            BPE_PRETOKEN_RE,
            bpe_token_count,
        )

        cases = [
            "it's a test",            # contraction splits: it + 's + a + test
            "we've 42 cats!!",        # 've, digit run, symbol run
            "hello   world",          # extra spaces are not tokens
            "a1b2",                   # letter/digit alternation
            "",
        ]
        df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, t string")
        got = {r["i"]: r["n"] for r in df.select("i", bpe_token_count(F.col("t")).alias("n")).collect()}
        # py re lacks \p{...}; all cases are ASCII, so emulate the rule with
        # ASCII classes (kept structurally identical to BPE_PRETOKEN_RE)
        assert r"\p{L}" in BPE_PRETOKEN_RE  # emulation tracks the real rule
        py_pat = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
        for i, c in enumerate(cases):
            assert got[i] == len(re.findall(py_pat, c)), (c, got[i])
        assert got[0] == 4 and got[4] == 0

    def test_gopher_filter_keep_flags(self, spark):
        from datasketches_postgresql_spark.textops.analysis import gopher_filter

        good = "the " + " ".join(f"word{i:03d}" for i in range(60))  # 61 words, varied
        spammy = ("buy now " * 40).strip()                                  # 80 words, all dup 2-gram
        short = "too short to keep"
        df = spark.createDataFrame(
            [(1, good), (2, spammy), (3, short)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["keep"] for r in gopher_filter(df).collect()}
        assert got == {1: True, 2: False, 3: False}

    def test_filter_is_projection(self, spark, docs):
        from datasketches_postgresql_spark.textops.analysis import gopher_filter

        plan = gopher_filter(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestPiiIdempotence:
    def test_redaction_is_idempotent_and_tokens_survive(self, spark):
        """redact(redact(x)) == redact(x): placeholder tokens contain no
        digits or @, so a second pass over already-scrubbed text is a
        no-op — safe to re-run the scrub stage on a resumed pipeline."""
        from datasketches_postgresql_spark.textops.pii import redact_pii

        rows = [
            (1, "bob@ex.org and 10.0.0.1 and +1 (555) 123-4567"),
            (2, "plain text stays plain"),
            (3, "<EMAIL> <IP> <PHONE> already scrubbed"),
        ]
        df = spark.createDataFrame(rows, "i long, t string")
        once = df.select("i", redact_pii(F.col("t")).alias("r"))
        twice = once.select("i", "r", redact_pii(F.col("r")).alias("r2"))
        for row in twice.collect():
            assert row["r2"] == row["r"], row


class TestTextopsEdgeSemantics:
    """Pin null/empty/unicode semantics of the round-3 textops: null text is
    null-in-null-out (SQL-idiomatic; gopher_filter's keep=null drops the doc
    on .where("keep"), the conservative outcome), empty/whitespace text
    yields zero counts, and \\p{L} token runs cover non-ASCII scripts."""

    def _edge(self, spark):
        return spark.createDataFrame(
            [(1, None), (2, ""), (3, "   "), (4, "héllo wörld naïve café")],
            "doc_id long, text string",
        )

    def test_repetition_and_bpe(self, spark):
        from datasketches_postgresql_spark.textops.analysis import (
            bpe_token_count,
            repetition_signals,
        )

        out = {r["doc_id"]: r for r in repetition_signals(self._edge(spark)).collect()}
        assert out[1]["n_words"] is None and out[1]["dup_word_frac"] is None
        assert out[2]["n_words"] == 0 and out[2]["dup_word_frac"] == 0.0
        assert out[3]["n_words"] == 0
        assert out[4]["n_words"] == 4
        bpe = {
            r["doc_id"]: r["n"]
            for r in self._edge(spark)
            .select("doc_id", bpe_token_count(F.col("text")).alias("n"))
            .collect()
        }
        assert bpe == {1: None, 2: 0, 3: 0, 4: 4}  # \p{L} covers é/ö/ï

    def test_scrub_and_gopher_null_passthrough(self, spark):
        from datasketches_postgresql_spark.textops.analysis import gopher_filter
        from datasketches_postgresql_spark.textops.pii import scrub

        sc = {r["doc_id"]: (r["redacted"], r["n_email"]) for r in scrub(self._edge(spark)).collect()}
        assert sc[1] == (None, None)
        assert sc[2] == ("", 0)
        keep = {r["doc_id"]: r["keep"] for r in gopher_filter(self._edge(spark)).collect()}
        assert keep[1] is None  # null text -> null keep -> dropped by where()
        assert keep[2] is False
        n_kept = gopher_filter(self._edge(spark)).where("keep").count()
        assert n_kept == 0

    def test_malformed_url_stays_identity(self, spark):
        from datasketches_postgresql_spark.textops.urlops import canonical_url, dedup_by_url

        df = spark.createDataFrame(
            [(1, "not a url at all"), (2, "also-not-a-url"), (3, ""), (4, "HTTPS://EX.com/")],
            "i long, url string",
        )
        got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
        assert got[1] == "not a url at all"   # identity, NOT "://"
        assert got[2] == "also-not-a-url"
        assert got[3] == ""
        assert got[4] == "https://ex.com"
        # distinct malformed rows must NOT collapse into one dedup group
        assert dedup_by_url(df).count() == 4


class TestLineDedup:
    """Corpus-level repeated-line removal (textops/linededup.py)."""

    def _corpus(self, spark):
        boiler = "Accept cookies to continue"
        footer = "© example.com"
        return spark.createDataFrame(
            [
                (1, f"{boiler}\nunique one\n\n{footer}"),
                (2, f"{boiler}\nunique two\n{footer}"),
                (3, "totally original\n\nno boilerplate here"),
                (4, "self repeat\nself repeat\nself repeat"),  # 1 doc only
                (5, None),
            ],
            "doc_id long, text string",
        )

    def test_drops_frequent_keeps_unique_and_blank(self, spark):
        from datasketches_postgresql_spark.textops.linededup import dedup_lines

        out = {r["doc_id"]: r for r in dedup_lines(self._corpus(spark)).collect()}
        # boilerplate + footer dropped, blank line and order preserved
        assert out[1]["text_deduped"] == "unique one\n"
        assert (out[1]["n_lines"], out[1]["n_dropped"]) == (4, 2)
        assert out[2]["text_deduped"] == "unique two"
        # untouched doc is byte-identical
        assert out[3]["text_deduped"] == "totally original\n\nno boilerplate here"
        assert out[3]["n_dropped"] == 0
        # intra-doc repetition alone is NOT corpus-frequent (count is
        # DISTINCT docs), so doc 4 survives whole
        assert out[4]["text_deduped"] == "self repeat\nself repeat\nself repeat"
        # null text -> no output row (matches SQL unnest semantics)
        assert 5 not in out

    def test_min_docs_threshold(self, spark):
        from datasketches_postgresql_spark.textops.linededup import dedup_lines

        out = {
            r["doc_id"]: r["n_dropped"]
            for r in dedup_lines(self._corpus(spark), min_docs=3).collect()
        }
        # only "Accept cookies..." would need 3 docs; nothing reaches it
        assert all(v == 0 for v in out.values())

    def test_precomputed_snapshot_freq(self, spark):
        from datasketches_postgresql_spark.textops.linededup import (
            dedup_lines,
            frequent_lines,
        )

        snap = frequent_lines(self._corpus(spark))
        batch = spark.createDataFrame(
            [(10, "Accept cookies to continue\nfresh crawl text")],
            "doc_id long, text string",
        )
        # the batch alone has no frequent lines, but the snapshot's
        # boilerplate table still cleans it (incremental-crawl path)
        row = dedup_lines(batch, freq=snap).collect()[0]
        assert row["text_deduped"] == "fresh crawl text"
        assert row["n_dropped"] == 1


class TestHashSplit:
    """Deterministic dataset splitting (textops/split.py)."""

    def test_stable_across_partitioning_and_runs(self, spark, docs):
        from datasketches_postgresql_spark.textops.split import hash_split

        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
        b = {
            r["doc_id"]: r["split"]
            for r in hash_split(docs.repartition(13), w).collect()
        }
        assert a == b  # randomSplit fails exactly this property
        # proportions roughly honored at 500 docs
        from collections import Counter

        c = Counter(a.values())
        assert 0.7 <= c["train"] / len(a) <= 0.9
        assert c["val"] > 0 and c["test"] > 0
        # exhaustive and disjoint by construction: one split per doc
        assert set(c) == {"train", "val", "test"}

    def test_seed_reshuffles_and_weights_validate(self, spark, docs):
        import pytest as _pt

        from datasketches_postgresql_spark.textops.split import hash_split

        w = {"train": 0.5, "val": 0.5}
        a = {r["doc_id"]: r["split"] for r in hash_split(docs, w, seed=1).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(docs, w, seed=2).collect()}
        assert a != b
        with _pt.raises(ValueError, match="sum to 1"):
            hash_split(docs, {"train": 0.5, "val": 0.1})
        with _pt.raises(ValueError, match="> 0"):
            hash_split(docs, {"train": 1.5, "val": -0.5})

    def test_plan_is_pure_projection(self, spark, docs):
        from datasketches_postgresql_spark.textops.split import hash_split

        q = hash_split(docs.select("doc_id"), {"a": 0.5, "b": 0.5})
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle: assignment is a projection
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestStreamingLineDedup:
    def test_stream_cleaned_against_static_snapshot(self, spark, tmp_path):
        """A crawl stream cleaned with foreachBatch against a static
        frequent-line snapshot: boilerplate lines vanish from every
        micro-batch even though no single batch could see them as
        frequent."""
        from datasketches_postgresql_spark.streaming.stream import (
            line_dedup_foreach_batch,
        )
        from datasketches_postgresql_spark.textops.linededup import frequent_lines

        boiler = "Accept cookies to continue"
        snapshot = spark.createDataFrame(
            [(i, f"{boiler}\nsnapshot doc {i}") for i in range(5)],
            "doc_id long, text string",
        )
        freq = frequent_lines(snapshot, min_docs=4)

        src, out = str(tmp_path / "src"), str(tmp_path / "out")
        spark.createDataFrame(
            [(100, f"{boiler}\nstreamed body one"), (101, "no boilerplate at all")],
            "doc_id long, text string",
        ).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = (
            stream.writeStream.foreachBatch(line_dedup_foreach_batch(freq, out))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)
        got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
        assert got[100]["text_deduped"] == "streamed body one"
        assert got[100]["n_dropped"] == 1
        assert got[101]["text_deduped"] == "no boilerplate at all"
        assert got[101]["n_dropped"] == 0


class TestDomainCaps:
    def test_registrable_domain_rules(self, spark):
        from datasketches_postgresql_spark.textops.urlops import registrable_domain

        rows = [
            ("https://a.b.example.com/x", "example.com"),
            ("http://news.example.co.uk/y?z=1", "example.co.uk"),
            ("https://example.org", "example.org"),
            ("https://user@sub.shop.example.com.au:8080/p", "example.com.au"),
            ("http://localhost/x", "localhost"),
        ]
        df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
        got = df.select(registrable_domain(F.col("url")).alias("d")).collect()
        assert [r["d"] for r in got] == [d for _, d in rows]

    def test_full_psl_semantics(self, spark):
        """The embedded FULL Public Suffix List: private-section platform
        suffixes stay distinct publishers, wildcard and exception rules
        follow the spec, punycode and unicode forms both resolve."""
        from datasketches_postgresql_spark.textops.urlops import registrable_domain

        rows = [
            # private section: the round-3 heuristic collapsed these into
            # ONE 'github.io' domain (a per-domain cap would nuke the
            # whole platform); PSL keeps each user a publisher
            ("https://alice.github.io/blog", "alice.github.io"),
            ("https://x.bob.github.io/", "bob.github.io"),
            ("https://github.io/", "github.io"),  # host IS a public suffix
            ("https://a.blogspot.co.id/p", "a.blogspot.co.id"),
            # exact multi-level ICANN entries the heuristic list missed
            ("https://sub.example.co.id/", "example.co.id"),
            ("https://shop.example.com.hk/", "example.com.hk"),
            # wildcard rule *.ck ...
            ("http://bar.foo.ck/", "bar.foo.ck"),
            ("http://foo.ck/", "foo.ck"),
            # ... and its exception !www.ck
            ("http://sub.www.ck/", "www.ck"),
            ("http://a.city.kawasaki.jp/", "city.kawasaki.jp"),
            ("http://x.other.kawasaki.jp/", "x.other.kawasaki.jp"),
            # unicode AND punycode forms of the same TLD
            ("http://пример.рф/x", "пример.рф"),
            ("http://xn--e1afmkfd.xn--p1ai/x", "xn--e1afmkfd.xn--p1ai"),
            # IP literals and the DNS root dot
            ("http://192.168.0.1/admin", "192.168.0.1"),
            ("https://www.example.com./", "example.com"),
        ]
        df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
        got = df.select(registrable_domain(F.col("url")).alias("d")).collect()
        assert [r["d"] for r in got] == [d for _, d in rows]
        # the documented fallback heuristic is still there, and wrong in
        # exactly the way the PSL path fixes
        fb = df.select(
            registrable_domain(F.col("url"), use_psl=False).alias("d")
        ).collect()
        assert fb[0]["d"] == "github.io"  # platform collapse, fallback only

    def test_extra_suffixes_extend_the_psl(self, spark):
        from datasketches_postgresql_spark.textops.urlops import registrable_domain

        df = spark.createDataFrame(
            [("https://team.corp.internal/x",)], "url string"
        )
        base = df.select(registrable_domain(F.col("url")).alias("d")).collect()
        assert base[0]["d"] == "corp.internal"
        ext = df.select(
            registrable_domain(
                F.col("url"), extra_suffixes=["corp.internal"]
            ).alias("d")
        ).collect()
        assert ext[0]["d"] == "team.corp.internal"

    def test_rank_mode_keeps_best_and_caps(self, spark):
        from datasketches_postgresql_spark.textops.urlops import cap_per_domain

        rows = [
            (f"https://spam.example.com/p{i}", float(i % 7)) for i in range(40)
        ] + [(f"https://ok{i}.org/x", 1.0) for i in range(5)]
        df = spark.createDataFrame(rows, "url string, q double")
        out = cap_per_domain(df, "url", max_docs=3, quality_col="q").collect()
        by_dom = {}
        for r in out:
            dom = "example.com" if "spam" in r["url"] else r["url"]
            by_dom.setdefault(dom, []).append(r)
        assert len(by_dom["example.com"]) == 3
        assert all(r["q"] == 6.0 for r in by_dom["example.com"])  # top quality kept
        assert sum(1 for d in by_dom if d != "example.com") == 5  # small domains whole

    def test_hash_mode_caps_without_sort_and_is_stable(self, spark):
        from datasketches_postgresql_spark.textops.urlops import cap_per_domain

        rows = [(f"https://big.example.com/p{i}",) for i in range(2000)] + [
            (f"https://tiny{i}.org/x",) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "url string")
        out = cap_per_domain(df, "url", max_docs=100, mode="hash")
        kept = out.collect()
        big = [r for r in kept if "big.example" in r["url"]]
        # binomial around 100: 3-sigma band
        assert 60 <= len(big) <= 140, len(big)
        assert sum(1 for r in kept if "tiny" in r["url"]) == 10
        again = sorted(r["url"] for r in cap_per_domain(df.repartition(7), "url", max_docs=100, mode="hash").collect())
        assert again == sorted(r["url"] for r in kept)


class TestMixtureSampling:
    def test_weighted_sample_deterministic_and_calibrated(self, spark):
        from datasketches_postgresql_spark.textops.split import weighted_sample

        df = spark.range(20000).select(F.col("id").alias("doc_id"))
        kept = weighted_sample(df, 0.25, seed=3)
        n = kept.count()
        assert abs(n - 5000) < 3 * (20000 * 0.25 * 0.75) ** 0.5  # 3 sigma
        again = weighted_sample(df.repartition(17), 0.25, seed=3)
        assert sorted(r["doc_id"] for r in again.collect()) == sorted(
            r["doc_id"] for r in kept.collect()
        )
        # incremental-batch property: a subset mixes exactly as the whole
        sub = weighted_sample(df.where("doc_id < 1000"), 0.25, seed=3)
        whole = {r["doc_id"] for r in kept.collect() if r["doc_id"] < 1000}
        assert {r["doc_id"] for r in sub.collect()} == whole

    def test_mix_sources_rates_and_default(self, spark):
        from datasketches_postgresql_spark.textops.split import mix_sources

        df = spark.range(30000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "wiki")
            .when(F.col("id") % 3 == 1, "web")
            .otherwise("forum")
            .alias("source"),
        )
        mixed = mix_sources(df, {"wiki": 1.0, "web": 0.2}, seed=5)
        by = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert by["wiki"] == 10000            # rate 1.0 keeps everything
        assert abs(by["web"] - 2000) < 3 * (10000 * 0.2 * 0.8) ** 0.5
        assert "forum" not in by              # default_rate 0 drops unlisted
        # split independence: sampling must not correlate with hash_split
        from datasketches_postgresql_spark.textops.split import hash_split

        sp = hash_split(mixed, {"train": 0.9, "val": 0.1}, seed=0)
        vf = sp.where("split = 'val'").count() / max(1, sp.count())
        assert 0.07 < vf < 0.13

    def test_weighted_sample_rejects_nothing_silently(self, spark):
        from datasketches_postgresql_spark.textops.split import mix_sources

        df = spark.range(10).select(F.col("id").alias("doc_id"), F.lit("x").alias("source"))
        with pytest.raises(ValueError, match="must be in"):
            mix_sources(df, {"x": 1.5})
