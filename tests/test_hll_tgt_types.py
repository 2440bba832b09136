"""HLL_4 / HLL_6 target types: real narrow images from the numpy kernel
(round-1 accepted the parameter but always emitted HLL_8 — now the image IS
4/6-bit packed), with estimates identical across widths (packing is
lossless: HLL_4 uses base offset + exception list)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from datasketches_postgresql_spark.functions import hll as H
from datasketches_postgresql_spark.sketches import hll as hk


class TestHllKernel:
    def test_packing_lossless_all_widths(self):
        vals = np.random.default_rng(7).integers(0, 2**64, size=50_000, dtype=np.uint64)
        regs = hk.registers_from_hashes(vals, 12)
        for w in (4, 6, 8):
            lg_k, width, back = hk.deserialize(hk.serialize(12, regs, w))
            assert (lg_k, width) == (12, w)
            assert np.array_equal(back, regs), w

    def test_hll4_exception_list(self):
        # force a register spread > 15: one register very high, rest low
        regs = np.ones(1 << 10, dtype=np.uint8)
        regs[5] = 40  # delta 39 > 15 -> exception entry
        _, _, back = hk.deserialize(hk.serialize(10, regs, 4))
        assert back[5] == 40 and back[6] == 1

    def test_accuracy_rse(self):
        errs = []
        for t in range(6):
            vals = np.random.default_rng(t).integers(0, 2**64, size=300_000, dtype=np.uint64)
            est = hk.get_estimate(hk.build(vals, 12, 4))
            true = len(np.unique(vals))
            errs.append((est - true) / true)
        assert float(np.std(errs)) < 2 * 1.04 / np.sqrt(4096)

    def test_union_matches_single_build(self):
        vals = np.random.default_rng(9).integers(0, 2**64, size=200_000, dtype=np.uint64)
        parts = [hk.build(c, 12, 6) for c in np.array_split(vals, 8)]
        assert hk.get_estimate(hk.union(parts)) == hk.get_estimate(hk.build(vals, 12, 6))

    def test_image_sizes_are_narrow(self):
        vals = np.random.default_rng(3).integers(0, 2**64, size=100_000, dtype=np.uint64)
        s4, s6, s8 = (len(hk.build(vals, 12, w)) for w in (4, 6, 8))
        assert s4 < s6 < s8
        assert s8 - 3 == 4096 and s6 - 3 == 3072  # exact packed sizes


class TestHllSparkTgtTypes:
    def test_build_estimate_roundtrip(self, spark):
        df = spark.createDataFrame(
            [("g1", v) for v in range(100)] + [("g2", v) for v in range(50, 150)],
            "grp string, value long",
        )
        for tgt in ("HLL_4", "HLL_6", 4, 6):
            sk = H.hll_sketch_build(df, ["grp"], "value", lg_k=12, tgt_type=tgt)
            got = {
                r["grp"]: r["e"]
                for r in sk.select(
                    "grp", H.hll_sketch_get_estimate(F.col("sketch"), tgt_type=tgt).alias("e")
                ).collect()
            }
            # lg_k=12, n=100 -> far below estimation error onset: near-exact
            assert got["g1"] == pytest.approx(100, rel=0.03), (tgt, got)
            assert got["g2"] == pytest.approx(100, rel=0.03), (tgt, got)
            img = bytes(sk.collect()[0]["sketch"])
            width = int(str(tgt).removeprefix("HLL_"))
            assert img[0] == 0x48 and img[2] == width

    def test_union_agg_and_pairwise(self, spark):
        df = spark.createDataFrame(
            [("g1", v) for v in range(100)] + [("g2", v) for v in range(50, 150)],
            "grp string, value long",
        )
        sk = H.hll_sketch_build(df, ["grp"], "value", tgt_type="HLL_4")
        merged = H.hll_sketch_union_agg(sk, [], "sketch", tgt_type="HLL_4")
        est = merged.select(
            H.hll_sketch_get_estimate(F.col("sketch"), tgt_type="HLL_4").alias("e")
        ).collect()[0]["e"]
        assert est == pytest.approx(150, rel=0.04)
        a = sk.where("grp = 'g1'").select(F.col("sketch").alias("a"))
        b = sk.where("grp = 'g2'").select(F.col("sketch").alias("b"))
        pair = a.crossJoin(b).select(
            H.hll_sketch_get_estimate(
                H.hll_sketch_union(F.col("a"), F.col("b"), tgt_type="HLL_4"),
                tgt_type="HLL_4",
            ).alias("e")
        ).collect()[0]["e"]
        assert pair == pytest.approx(150, rel=0.04)

    def test_all_null_group_survives(self, spark):
        df = spark.createDataFrame(
            [("g1", 1), ("g2", None)], "grp string, value long"
        )
        sk = H.hll_sketch_build(df, ["grp"], "value", tgt_type="HLL_6")
        got = {
            r["grp"]: r["e"]
            for r in sk.select(
                "grp", H.hll_sketch_get_estimate(F.col("sketch"), tgt_type=6).alias("e")
            ).collect()
        }
        # linear counting: m*ln(m/(m-1)) ~= 1.00012 for one register hit
        assert got["g1"] == pytest.approx(1.0, abs=0.001)
        assert got["g2"] == 0.0

    def test_invalid_tgt_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "value long")
        with pytest.raises(ValueError, match="tgt_type"):
            H.hll_sketch_build(df, [], "value", tgt_type="HLL_5")
