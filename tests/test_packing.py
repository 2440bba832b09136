"""Sequence packing (textops/packing.py): every doc lands in exactly one
bin, bins respect the budget, chunks cover every byte with provenance
spans, and both modes are stable across input partition layouts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_postgresql_spark.textops import packing as PK


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(13)
    lens = rng.integers(20, 900, size=400).tolist() + [5000, 4096]  # two oversize
    rows = [(i, int(ln)) for i, ln in enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


class TestPackDocuments:
    BUDGET = 2048

    def test_invariants(self, spark, docs):
        a = PK.pack_documents(docs, "doc_id", "n_tokens", self.BUDGET, num_partitions=8)
        rows = a.collect()
        assert len(rows) == docs.count()  # every doc exactly once
        assert len({r["id"] for r in rows}) == len(rows)
        fills = {}
        for r in rows:
            fills.setdefault(r["bin_id"], [0, r["oversize"], r["bin_fill"]])
            fills[r["bin_id"]][0] += 1
        bins = (
            a.groupBy("bin_id")
            .agg(F.sum(F.lit(0)).alias("z"))
            .count()
        )
        by_bin = a.groupBy("bin_id").agg(
            F.first("bin_fill").alias("fill"),
            F.max(F.col("oversize").cast("int")).alias("over"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        for b in by_bin:
            if b["over"]:
                assert b["n"] == 1  # oversize docs are singleton bins
                assert b["fill"] > self.BUDGET
            else:
                assert b["fill"] <= self.BUDGET
        assert bins == len(by_bin)

    def test_bin_fill_matches_member_sum(self, spark, docs):
        a = PK.pack_documents(docs, "doc_id", "n_tokens", self.BUDGET, num_partitions=8)
        j = a.join(docs, a["id"] == docs["doc_id"])
        chk = j.groupBy("bin_id").agg(
            F.sum("n_tokens").alias("s"), F.first("bin_fill").alias("f")
        )
        assert chk.where("s != f").count() == 0

    def test_utilization_beats_naive_bound(self, spark, docs):
        """BFD must land well above the trivial half-full guarantee; with
        this length mix it packs >85%."""
        a = PK.pack_documents(docs, "doc_id", "n_tokens", self.BUDGET, num_partitions=8)
        m = PK.packing_stats(a, self.BUDGET).collect()[0]
        assert m["n_oversize"] == 2
        assert m["utilization"] > 0.85
        assert m["n_docs"] == docs.count()

    def test_stable_across_layouts(self, spark, docs):
        kw = dict(budget=self.BUDGET, num_partitions=8)
        a = sorted(
            map(tuple, PK.pack_documents(docs, "doc_id", "n_tokens", **kw).collect())
        )
        b = sorted(
            map(
                tuple,
                PK.pack_documents(
                    docs.repartition(13), "doc_id", "n_tokens", **kw
                ).collect(),
            )
        )
        assert a == b


class TestConcatChunks:
    def test_coverage_and_spans(self, spark):
        rows = [(i, f"doc{i}_" + "x" * (17 + 13 * i)) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ch = PK.concat_chunks(df, "doc_id", "text", chunk_len=100, sep="|", num_partitions=4)
        got = ch.collect()
        # every full chunk is exactly chunk_len; tails flagged
        for r in got:
            assert len(r["text"]) == r["n_chars"]
            if not r["is_tail"]:
                assert r["n_chars"] == 100
        # reassemble every doc from its spans — byte-exact provenance
        frag = {}
        for r in got:
            for s in r["spans"]:
                did, lo, hi = map(int, s.split(":"))
                frag.setdefault(did, []).append(r["text"][lo:hi])
        originals = dict(rows)
        for did, parts in frag.items():
            assert "".join(parts) == originals[did]
        assert set(frag) == set(originals)  # nothing dropped

    def test_stable_across_layouts(self, spark):
        rows = [(i, f"t{i}" * (5 + i % 7)) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kw = dict(chunk_len=64, num_partitions=4)
        a = sorted((r["chunk_id"], r["text"]) for r in PK.concat_chunks(df, "doc_id", "text", **kw).collect())
        b = sorted(
            (r["chunk_id"], r["text"])
            for r in PK.concat_chunks(df.repartition(9), "doc_id", "text", **kw).collect()
        )
        assert a == b

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            PK.concat_chunks(df, "doc_id", "text", chunk_len=0)
        with pytest.raises(ValueError):
            PK.pack_documents(df.withColumn("n", F.lit(1)), "doc_id", "n", budget=0)
