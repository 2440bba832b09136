"""Property-based (hypothesis) invariants for the sketch kernels and their
canonical DataSketches wire formats. Pure numpy — no Spark session — so the
whole module runs in seconds and fuzzes the seams the example-based tests pin
at single points:

- round-trip identity: internal -> canonical image -> internal preserves
  every query the family answers (and, where the format is canonical-unique,
  the exact bytes);
- estimator sanity under arbitrary inputs (bounds bracket truth in the exact
  regime, n bookkeeping is additive under merge);
- merge algebra: commutativity of union/merge at the image level.

Reference parity anchors (semantics, not code): theta/KLL/FI/AOD/REQ wire
layouts per /root/reference/src/*_c_adapter.cpp storage of the standard
Apache DataSketches images.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

u64s = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=400)
floats = st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=32), max_size=400
)


def _arr_u64(xs):
    return np.asarray(xs, dtype=np.uint64)


class TestThetaProperties:
    @given(u64s, u64s)
    @settings(max_examples=60, deadline=None)
    def test_union_commutative_bytes(self, a, b):
        from datasketches_postgresql_spark.sketches import theta

        sa, sb = theta.build(_arr_u64(a)), theta.build(_arr_u64(b))
        assert theta.union([sa, sb]) == theta.union([sb, sa])

    @given(u64s)
    @settings(max_examples=60, deadline=None)
    def test_exact_regime_is_exact_and_bounds_bracket(self, xs):
        from datasketches_postgresql_spark.sketches import theta

        s = theta.build(_arr_u64(xs))
        true = len(set(xs))
        est, lb, ub = theta.get_estimate_and_bounds(s, 2)
        if true <= (1 << theta.DEFAULT_LG_K):  # exact regime at default lg_k
            assert est == true == lb == ub
        else:
            assert lb <= true <= ub

    @given(u64s)
    @settings(max_examples=40, deadline=None)
    def test_compact_image_roundtrip(self, xs):
        from datasketches_postgresql_spark.sketches import interop, theta

        s = interop.build_murmur(_arr_u64(xs))
        back = interop.deserialize_compact(interop.serialize_compact(s))
        assert back == s
        assert interop.serialize_compact(back) == interop.serialize_compact(s)
        assert theta.get_estimate(back) == theta.get_estimate(s)


class TestKllProperties:
    @given(floats)
    @settings(max_examples=40, deadline=None)
    def test_canonical_image_preserves_queries(self, xs):
        from datasketches_postgresql_spark.sketches import kll, kll_interop

        s = kll.build(np.asarray(xs, dtype=np.float64))
        back = kll_interop.deserialize(kll_interop.serialize(s))
        a, b = kll.KllState.deserialize(s), kll.KllState.deserialize(back)
        assert a.n == b.n == len(xs)
        if xs:
            assert a.min == b.min and a.max == b.max
            for q in (0.0, 0.25, 0.5, 0.75, 1.0):
                assert a.get_quantile(q) == b.get_quantile(q)
            assert a.get_rank(float(np.median(xs))) == b.get_rank(float(np.median(xs)))

    @given(st.lists(floats, min_size=1, max_size=5))
    @settings(max_examples=30, deadline=None)
    def test_merge_n_additive_and_minmax(self, parts):
        from datasketches_postgresql_spark.sketches import kll

        imgs = [kll.build(np.asarray(p, dtype=np.float64)) for p in parts]
        m = kll.KllState.deserialize(kll.merge(imgs))
        total = sum(len(p) for p in parts)
        assert m.n == total
        flat = [v for p in parts for v in p]
        if flat:
            assert m.min == min(flat) and m.max == max(flat)


class TestQuantilesClassicProperties:
    @given(floats)
    @settings(max_examples=40, deadline=None)
    def test_layout_invariants_any_n(self, xs):
        from datasketches_postgresql_spark.sketches.quantiles import (
            QuantilesState,
            build,
        )

        img = build(np.asarray(xs, dtype=np.float64), 16)
        st_ = QuantilesState.deserialize(img)
        n = len(xs)
        assert st_.n == n
        if n:
            assert st_.bb.size == n % 32
            bp = n // 32
            assert all(((bp >> i) & 1) == (i in st_.levels) for i in range(30))
        assert st_.serialize() == img  # canonical-unique round trip

    @given(st.lists(floats, min_size=1, max_size=4))
    @settings(max_examples=30, deadline=None)
    def test_merge_preserves_n_and_rank_monotone(self, parts):
        from datasketches_postgresql_spark.sketches.quantiles import (
            QuantilesState,
            build,
            merge,
        )

        imgs = [build(np.asarray(p, dtype=np.float64), 16) for p in parts]
        m = QuantilesState.deserialize(merge(imgs))
        assert m.n == sum(len(p) for p in parts)
        if m.n:
            qs = [m.get_quantile(q) for q in (0.1, 0.3, 0.5, 0.7, 0.9)]
            assert qs == sorted(qs)


class TestFiProperties:
    @given(
        st.lists(
            st.tuples(st.text(min_size=1, max_size=6), st.integers(1, 1000)),
            max_size=300,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_no_false_negatives_any_stream(self, pairs):
        """The Misra-Gries guarantee fuzzed: every item's upper bound must be
        >= its true weight, and (ub - lb) <= the sketch's max error."""
        from datasketches_postgresql_spark.sketches.fi import FiState

        st_ = FiState(4)
        if pairs:
            st_.update([p[0] for p in pairs], [p[1] for p in pairs])
        truth: dict[str, int] = {}
        for k, w in pairs:
            truth[k] = truth.get(k, 0) + w
        for item, (ub, err) in st_.items.items():
            assert ub >= truth[item]
            assert ub - err <= truth[item]
        # items NOT retained must have true weight <= the global error bound
        retained = set(st_.items)
        for k, w in truth.items():
            if k not in retained:
                assert w <= st_.offset

    @given(
        st.lists(
            st.tuples(st.text(min_size=1, max_size=6), st.integers(1, 1000)),
            max_size=300,
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_canonical_image_roundtrip(self, pairs):
        from datasketches_postgresql_spark.sketches import fi, fi_interop
        from datasketches_postgresql_spark.sketches.fi import FiState

        img = fi.build(4, [p[0] for p in pairs], [p[1] for p in pairs])
        back = fi_interop.deserialize(fi_interop.serialize(img))
        a, b = FiState.deserialize(img), FiState.deserialize(back)
        assert a.total == b.total
        # The canonical format carries ONE global error offset, not per-item
        # errors (fi_interop docstring): estimates (upper-bound counters) are
        # preserved exactly; each item's error widens to the folded offset,
        # which must dominate every per-item error AND the prior global
        # offset, so lower bounds stay valid — merely looser.
        assert set(a.items) == set(b.items)
        folded = max(
            [a.offset, *(err for _ub, err in a.items.values())], default=0
        )
        assert b.offset == folded
        for item, (ub, err) in a.items.items():
            ub_b, err_b = b.items[item]
            assert ub_b == ub
            assert err_b == folded >= err
        # a second round trip is byte-stable (the fold is idempotent)
        again = fi_interop.serialize(back)
        assert fi_interop.deserialize(again) == back


class TestHllProperties:
    @given(
        st.lists(st.integers(0, 62), min_size=1 << 6, max_size=1 << 6),
        st.sampled_from([4, 6, 8]),
    )
    @settings(max_examples=60, deadline=None)
    def test_image_roundtrip_any_registers(self, regs, width):
        from datasketches_postgresql_spark.sketches import hll_interop as hi

        regs = np.asarray(regs, dtype=np.uint8)
        lg_k, w, back = hi.deserialize_hll(hi.serialize_hll(6, regs, width))
        assert lg_k == 6 and w == width
        assert np.array_equal(back, regs)

    @given(
        st.lists(st.integers(0, 40), min_size=1 << 6, max_size=1 << 6),
        st.lists(st.integers(0, 40), min_size=1 << 6, max_size=1 << 6),
    )
    @settings(max_examples=40, deadline=None)
    def test_union_is_registerwise_max(self, ra, rb):
        from datasketches_postgresql_spark.sketches import hll_interop as hi

        a = hi.serialize_hll(6, np.asarray(ra, np.uint8), 8)
        b = hi.serialize_hll(6, np.asarray(rb, np.uint8), 8)
        assert hi.union_images([a, b], 8) == hi.union_images([b, a], 8)
        _, _, u = hi.deserialize_hll(hi.union_images([a, b], 4))
        assert np.array_equal(u, np.maximum(ra, rb))


class TestAodProperties:
    @given(
        st.lists(
            st.tuples(
                st.integers(0, (1 << 64) - 1),
                st.floats(-1e9, 1e9, allow_nan=False),
            ),
            max_size=300,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_compact_image_roundtrip(self, rows):
        from datasketches_postgresql_spark.sketches import aod, aod_interop

        keys = _arr_u64([r[0] for r in rows])
        vals = np.asarray([r[1] for r in rows], dtype=np.float64)
        s = aod_interop.build_murmur(keys, vals)
        back = aod_interop.deserialize_compact(aod_interop.serialize_compact(s))
        assert back == s
        assert aod.get_estimate(back) == aod.get_estimate(s)
        assert aod.to_means(back) == aod.to_means(s)


class TestReqProperties:
    @given(floats)
    @settings(max_examples=30, deadline=None)
    def test_canonical_image_preserves_rank(self, xs):
        from datasketches_postgresql_spark.sketches import req, req_interop
        from datasketches_postgresql_spark.sketches.req import ReqState

        s = req.build(np.asarray(xs, dtype=np.float64))
        back = req_interop.deserialize_canonical(req_interop.serialize_canonical(s))
        a, b = ReqState.deserialize(s), ReqState.deserialize(back)
        assert a.n == b.n == len(xs)
        if xs:
            for probe in (min(xs), max(xs), float(np.median(xs))):
                assert a.get_rank(probe) == b.get_rank(probe)
