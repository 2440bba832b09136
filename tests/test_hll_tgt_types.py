"""HLL_4 / HLL_6 target types, round 3: CANONICAL DataSketches narrow images
(sketches.hll_interop). Ground truth is Spark's native hll_* functions
(datasketches-java): our images must estimate correctly there, and registers
built from the same keys must be identical to java's (union == either side).
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from datasketches_postgresql_spark.functions import hll as H
from datasketches_postgresql_spark.sketches import hll_interop as hi
from datasketches_postgresql_spark.sketches.hll import estimate_from_registers
from datasketches_postgresql_spark.sketches.murmur3 import (
    hash128_u64,
    hash128_utf8_batch,
)


def _regs(n, lg_k=12, seed=0):
    keys = np.random.default_rng(seed).integers(0, 2**62, size=n, dtype=np.uint64)
    h1, h2 = hash128_u64(keys, 9001)
    return keys, hi.registers_murmur(h1, h2, lg_k)


class TestHllInteropKernel:
    def test_roundtrip_all_widths(self):
        _, regs = _regs(50_000)
        for w in (4, 6, 8):
            lg_k, width, back = hi.deserialize_hll(hi.serialize_hll(12, regs, w))
            assert (lg_k, width) == (12, w)
            assert np.array_equal(back, regs), w

    def test_hll4_aux_exceptions(self):
        regs = np.ones(1 << 10, dtype=np.uint8)
        regs[5] = 40  # delta 39 > 14 -> aux entry
        _, _, back = hi.deserialize_hll(hi.serialize_hll(10, regs, 4))
        assert back[5] == 40 and back[6] == 1

    def test_empty_is_canonical_list_image(self):
        img = hi.serialize_hll(12, np.zeros(4096, np.uint8), 4)
        assert img[1] == 1 and img[2] == 7  # serVer, family
        assert img[5] & 4  # EMPTY flag
        _, _, back = hi.deserialize_hll(img)
        assert not back.any()

    def test_union_matches_single_build(self):
        keys, _ = _regs(200_000, seed=9)
        parts = [
            hi.serialize_hll(12, hi.registers_murmur(*hash128_u64(c, 9001), 12), 6)
            for c in np.array_split(keys, 8)
        ]
        single = hi.serialize_hll(
            12, hi.registers_murmur(*hash128_u64(keys, 9001), 12), 6
        )
        assert hi.union_images(parts, 6) == single

    def test_image_sizes_are_narrow(self):
        _, regs = _regs(100_000, seed=3)
        s4, s6, s8 = (len(hi.serialize_hll(12, regs, w)) for w in (4, 6, 8))
        assert s4 < s6 < s8
        assert s8 == 40 + 4096 and s6 == 40 + 3073  # canonical packed sizes

    def test_accuracy_rse(self):
        errs = []
        for t in range(6):
            keys, regs = _regs(300_000, seed=t)
            est = estimate_from_registers(regs)
            true = len(np.unique(keys))
            errs.append((est - true) / true)
        assert float(np.std(errs)) < 2 * 1.04 / np.sqrt(4096)


class TestHllCanonicalVsNative:
    def test_native_reads_our_images(self, spark):
        """datasketches-java (Spark native hll_sketch_estimate) must accept
        our HLL_4/6/8 images and estimate within RSE."""
        keys, regs = _regs(50_000, seed=1)
        n = len(np.unique(keys))
        rows = [(w, bytearray(hi.serialize_hll(12, regs, w))) for w in (4, 6, 8)]
        df = spark.createDataFrame(rows, "w int, img binary")
        for r in df.select("w", F.hll_sketch_estimate("img").alias("e")).collect():
            assert r["e"] == pytest.approx(n, rel=0.05), r["w"]

    def test_same_keys_identical_registers(self, spark):
        """Registers from our murmur-coupon kernel == java's for the same
        string keys: native union of the two sketches estimates exactly
        what either side does alone."""
        strs = [f"user_{i}" for i in range(30_000)]
        h1, h2 = hash128_utf8_batch(strs, 9001, with_h2=True)
        ours = hi.serialize_hll(12, hi.registers_murmur(h1, h2, 12), 4)
        sdf = spark.createDataFrame([(s,) for s in strs], "v string")
        r = (
            sdf.agg(F.hll_sketch_agg("v", F.lit(12)).alias("sk"))
            .withColumn("ours", F.lit(bytearray(ours)))
            .select(
                F.hll_sketch_estimate("sk").alias("nat"),
                F.hll_sketch_estimate("ours").alias("our_est"),
                F.hll_sketch_estimate(F.hll_union("sk", "ours", True)).alias("un"),
            )
            .collect()[0]
        )
        assert r["un"] == pytest.approx(r["nat"], abs=1e-9)
        assert r["our_est"] == pytest.approx(r["nat"], abs=1e-9)

    def test_import_native_images(self, spark):
        """Our deserializer reads native LIST-mode (small) and HLL-mode
        (large) images."""
        small = spark.createDataFrame([(f"s{i}",) for i in range(10)], "v string")
        img = bytes(
            small.agg(F.hll_sketch_agg("v", F.lit(12)).alias("sk")).collect()[0]["sk"]
        )
        _, _, regs = hi.deserialize_hll(img)
        assert int((regs > 0).sum()) == 10
        big = spark.createDataFrame([(f"s{i}",) for i in range(20_000)], "v string")
        img2 = bytes(
            big.agg(F.hll_sketch_agg("v", F.lit(12)).alias("sk")).collect()[0]["sk"]
        )
        _, _, regs2 = hi.deserialize_hll(img2)
        assert estimate_from_registers(regs2) == pytest.approx(20_000, rel=0.05)


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
                    "grp",
                    H.hll_sketch_get_estimate(F.col("sketch"), tgt_type=tgt).alias("e"),
                ).collect()
            }
            assert got["g1"] == pytest.approx(100, rel=0.03), (tgt, got)
            assert got["g2"] == pytest.approx(100, rel=0.03), (tgt, got)
            img = bytes(sk.collect()[0]["sketch"])
            width = int(str(tgt).removeprefix("HLL_"))
            assert img[1] == 1 and img[2] == 7  # canonical serVer + family
            assert (img[7] & 3) == 2  # HLL mode
            assert {0: 4, 1: 6, 2: 8}[(img[7] >> 2) & 3] == width

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
        pair = (
            a.crossJoin(b)
            .select(
                H.hll_sketch_get_estimate(
                    H.hll_sketch_union(F.col("a"), F.col("b"), tgt_type="HLL_4"),
                    tgt_type="HLL_4",
                ).alias("e")
            )
            .collect()[0]["e"]
        )
        assert pair == pytest.approx(150, rel=0.04)

    def test_all_null_group_survives(self, spark):
        df = spark.createDataFrame([("g1", 1), ("g2", None)], "grp string, value long")
        sk = H.hll_sketch_build(df, ["grp"], "value", tgt_type="HLL_6")
        got = {
            r["grp"]: r["e"]
            for r in sk.select(
                "grp", H.hll_sketch_get_estimate(F.col("sketch"), tgt_type=6).alias("e")
            ).collect()
        }
        assert got["g1"] == pytest.approx(1.0, abs=0.001)
        assert got["g2"] == 0.0

    def test_invalid_tgt_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "value long")
        with pytest.raises(ValueError, match="tgt_type"):
            H.hll_sketch_build(df, [], "value", tgt_type="HLL_5")
