"""Partitioned Bloom filter (dedup/bloom.py): no false negatives ever,
fp rate near theory, OR-merge == build-on-union bit-for-bit, and results
independent of input partition layout."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_postgresql_spark.dedup import bloom as B

N_BUCKETS = 16
SLICE_BITS = 1 << 14  # 16384 bits/slice; 2000 keys over 16 buckets -> m/n ~ 131


def _keys_df(spark, lo, hi, parts=4):
    return spark.range(lo, hi, 1, parts).select(
        F.xxhash64(F.col("id"), F.lit(99)).alias("key")
    )


@pytest.fixture(scope="module")
def filt(spark):
    df = B.bloom_build(
        _keys_df(spark, 0, 2000), "key", n_buckets=N_BUCKETS, bits_per_slice=SLICE_BITS
    )
    return df.cache()


class TestBloom:
    def test_no_false_negatives(self, spark, filt):
        probed = B.bloom_maybe_contains(
            _keys_df(spark, 0, 2000), "key", filt, n_buckets=N_BUCKETS
        )
        assert probed.where("NOT maybe_member").count() == 0

    def test_fp_rate_near_theory(self, spark, filt):
        fresh = _keys_df(spark, 100_000, 104_000)
        probed = B.bloom_maybe_contains(fresh, "key", filt, n_buckets=N_BUCKETS)
        fp = probed.where("maybe_member").count() / 4000
        n_per = 2000 / N_BUCKETS
        theory = (1 - math.exp(-7 * n_per / SLICE_BITS)) ** 7
        assert fp <= max(3 * theory, 0.01), (fp, theory)

    def test_build_is_layout_invariant(self, spark):
        a = B.bloom_build(
            _keys_df(spark, 0, 500, parts=1), "key",
            n_buckets=N_BUCKETS, bits_per_slice=SLICE_BITS,
        ).collect()
        b = B.bloom_build(
            _keys_df(spark, 0, 500, parts=7).repartition(3), "key",
            n_buckets=N_BUCKETS, bits_per_slice=SLICE_BITS,
        ).collect()
        sa = sorted((r["bucket"], bytes(r["bits"]), r["n_keys"]) for r in a)
        sb = sorted((r["bucket"], bytes(r["bits"]), r["n_keys"]) for r in b)
        assert sa == sb

    def test_merge_equals_union_build(self, spark):
        kw = dict(n_buckets=N_BUCKETS, bits_per_slice=SLICE_BITS)
        f1 = B.bloom_build(_keys_df(spark, 0, 800), "key", **kw)
        f2 = B.bloom_build(_keys_df(spark, 600, 1500), "key", **kw)
        merged = {
            r["bucket"]: bytes(r["bits"]) for r in B.bloom_merge(f1, f2).collect()
        }
        union = {
            r["bucket"]: bytes(r["bits"])
            for r in B.bloom_build(_keys_df(spark, 0, 1500), "key", **kw).collect()
        }
        assert merged == union

    def test_merge_rejects_width_mismatch(self, spark):
        f1 = B.bloom_build(_keys_df(spark, 0, 100), "key", n_buckets=4, bits_per_slice=1 << 10)
        f2 = B.bloom_build(_keys_df(spark, 0, 100), "key", n_buckets=4, bits_per_slice=1 << 11)
        with pytest.raises(Exception, match="bits_per_slice"):
            B.bloom_merge(f1, f2).collect()

    def test_probe_matches_reference_bit_math(self, spark, filt):
        """Cogrouped probe == straight numpy reference on the collected
        slices (same positions, same bits)."""
        rows = {r["bucket"]: np.frombuffer(r["bits"], np.uint8) for r in filt.collect()}
        probes = _keys_df(spark, 1990, 2020).collect()
        got = {
            r["key"]: r["maybe_member"]
            for r in B.bloom_maybe_contains(
                _keys_df(spark, 1990, 2020), "key", filt, n_buckets=N_BUCKETS
            ).collect()
        }
        import pandas as pd  # noqa: F401

        for r in probes:
            k = np.array([r["key"]], dtype=np.int64).view(np.uint64)
            bkt = int(
                spark.range(1).select(
                    F.pmod(F.xxhash64(F.lit(r["key"]).cast("long"), F.lit(3)), F.lit(N_BUCKETS))
                ).collect()[0][0]
            )
            if bkt not in rows:
                expect = False
            else:
                expect = bool(B._test(rows[bkt], k, SLICE_BITS, 7)[0])
            assert got[r["key"]] == expect

    def test_absent_bucket_is_definitely_new(self, spark):
        kw = dict(n_buckets=64, bits_per_slice=1 << 10)
        tiny = B.bloom_build(_keys_df(spark, 0, 3), "key", **kw)
        probed = B.bloom_maybe_contains(
            _keys_df(spark, 50, 250), "key", tiny, n_buckets=64
        )
        # 200 fresh keys over 64 buckets, only <=3 buckets populated:
        # the vast majority must come back definitely-new
        assert probed.where("NOT maybe_member").count() >= 150


    def test_probe_params_self_describing_and_validated(self, spark, filt):
        # defaults read from the filter rows: no params needed
        probed = B.bloom_maybe_contains(_keys_df(spark, 0, 200), "key", filt)
        assert probed.where("NOT maybe_member").count() == 0
        # an explicit mismatch is an error, never a silent false negative
        with pytest.raises(ValueError, match="n_buckets"):
            B.bloom_maybe_contains(_keys_df(spark, 0, 10), "key", filt, n_buckets=4)
        f5 = B.bloom_build(_keys_df(spark, 0, 50), "key", n_buckets=N_BUCKETS,
                           bits_per_slice=SLICE_BITS, n_hashes=5)
        with pytest.raises(ValueError, match="n_hashes"):
            B.bloom_maybe_contains(_keys_df(spark, 0, 10), "key", f5, n_hashes=7)
        with pytest.raises(Exception, match="n_hashes"):
            B.bloom_merge(f5, filt).collect()

    def test_union_of_mixed_params_fails_loudly_at_probe(self, spark, filt):
        """The documented union-append pattern must not probe with one
        arbitrary slice's params: mixed n_hashes in a unioned filter
        raises inside the cogroup even when the caller passes explicit
        (lazy) params."""
        f5 = B.bloom_build(_keys_df(spark, 0, 50), "key", n_buckets=N_BUCKETS,
                           bits_per_slice=SLICE_BITS, n_hashes=5)
        mixed = filt.unionByName(f5)
        probed = B.bloom_maybe_contains(
            _keys_df(spark, 0, 100), "key", mixed,
            n_buckets=N_BUCKETS, n_hashes=7,
        )
        with pytest.raises(Exception, match="n_hashes"):
            probed.collect()

    def test_legacy_filter_without_param_columns(self, spark):
        """Filters checkpointed before the self-describing columns existed
        still probe with explicit params; without them the call refuses."""
        f = B.bloom_build(_keys_df(spark, 0, 300), "key", n_buckets=8,
                          bits_per_slice=1 << 12)
        legacy = f.drop("n_buckets", "n_hashes")
        probed = B.bloom_maybe_contains(
            _keys_df(spark, 0, 300), "key", legacy, n_buckets=8, n_hashes=7
        )
        assert probed.where("NOT maybe_member").count() == 0
        with pytest.raises(ValueError, match="legacy"):
            B.bloom_maybe_contains(_keys_df(spark, 0, 10), "key", legacy)


class TestNullKeys:
    def test_null_keys_build_and_probe(self, spark):
        """NULL keys must neither crash the Arrow int64 view (they arrive
        as NaN in a float64 column) nor count as members: build skips
        them, probes flag them definitely-new."""
        base = spark.createDataFrame(
            [(i,) for i in range(100)] + [(None,)] * 3, "key long"
        )
        filt = B.bloom_build(base, "key", n_buckets=N_BUCKETS,
                             bits_per_slice=SLICE_BITS)
        probe = spark.createDataFrame(
            [(5,), (None,), (10_000,)], "key long"
        )
        got = {r["key"]: r["maybe_member"]
               for r in B.bloom_maybe_contains(probe, "key", filt).collect()}
        assert got[5] is True            # real member
        assert got[None] is False        # no key -> definitely not a member
        # build over the null-bearing df indexed the 100 real keys
        members = B.bloom_maybe_contains(
            spark.createDataFrame([(i,) for i in range(100)], "key long"),
            "key", filt)
        assert members.where("NOT maybe_member").count() == 0
