"""SemDeDup (textops/semdedup.py): planted semantic-duplicate groups must
collapse to one kept representative each — the member least similar to
its cluster centroid — while unrelated docs survive untouched, stable
across partition layouts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_postgresql_spark.textops import semdedup as SD

DIM = 16


def _mk_vectors(seed=7):
    """3 well-separated anchor directions; per anchor a group of near-
    identical vectors (tiny jitter -> cosine ~0.999) plus lone noise
    vectors that must NOT merge with anything."""
    rng = np.random.default_rng(seed)
    anchors = rng.standard_normal((3, DIM))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows = []
    vid = 0
    groups = []
    for g, a in enumerate(anchors):
        members = []
        for _ in range(4):
            v = a + rng.standard_normal(DIM) * 0.005
            rows.append((vid, [float(x) for x in v]))
            members.append(vid)
            vid += 1
        groups.append(members)
    for _ in range(6):  # singletons: random directions, far from anchors
        v = rng.standard_normal(DIM) * 3.0
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return rows, groups


@pytest.fixture(scope="module")
def vecs(spark):
    rows, groups = _mk_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, groups


class TestSemDedup:
    def test_groups_collapse_to_one_keeper(self, spark, vecs):
        df, groups = vecs
        dec = SD.semdedup(
            df, "vec_id", "embedding", DIM, n_clusters=4, threshold=0.98, seed=3
        ).collect()
        by_id = {r["id"]: r for r in dec}
        for members in groups:
            gids = {by_id[m]["group_id"] for m in members}
            assert len(gids) == 1, f"planted group split: {gids}"
            kept = [m for m in members if by_id[m]["keep"]]
            assert len(kept) == 1
            # the keeper is the least-centroid-similar member (outlier rule)
            ccos = {m: by_id[m]["ccos"] for m in members}
            expect = min(members, key=lambda m: (ccos[m], m))
            assert kept[0] == expect
        singles = [r for r in dec if r["id"] >= 12]
        assert all(r["keep"] for r in singles)
        assert all(r["group_id"] == r["id"] for r in singles)

    def test_stable_across_partitioning(self, spark, vecs):
        df, _ = vecs
        kw = dict(n_clusters=4, threshold=0.98, seed=3)
        a = sorted(
            SD.semdedup(df, "vec_id", "embedding", DIM, **kw).collect(),
            key=lambda r: r["id"],
        )
        b = sorted(
            SD.semdedup(
                df.repartition(7, "vec_id"), "vec_id", "embedding", DIM, **kw
            ).collect(),
            key=lambda r: r["id"],
        )
        assert [(r["id"], r["group_id"], r["keep"]) for r in a] == [
            (r["id"], r["group_id"], r["keep"]) for r in b
        ]

    def test_chain_collapses_via_components(self, spark):
        """a~b and b~c but a!~c: connected components must still place all
        three in ONE group with ONE keeper (the pairwise-only reading
        would keep two)."""
        base = np.zeros(DIM)
        base[0] = 1.0
        rot = np.zeros(DIM)
        rot[1] = 1.0

        def blend(t):
            v = (1 - t) * base + t * rot
            return [float(x) for x in v / np.linalg.norm(v)]

        df = spark.createDataFrame(
            [(0, blend(0.0)), (1, blend(0.12)), (2, blend(0.24))],
            "vec_id long, embedding array<double>",
        )
        dec = SD.semdedup(
            df, "vec_id", "embedding", DIM, n_clusters=1, threshold=0.985, seed=3
        ).collect()
        pairs = SD.semdedup_pairs(
            SD.semdedup_assign(df, "vec_id", "embedding", DIM, n_clusters=1, seed=3),
            threshold=0.985,
        ).collect()
        assert {(p["a"], p["b"]) for p in pairs} == {(0, 1), (1, 2)}
        assert {r["group_id"] for r in dec} == {0}
        assert sum(r["keep"] for r in dec) == 1

    def test_max_cluster_salting_bounds_cells(self, spark, vecs):
        df, groups = vecs
        assigned = SD.semdedup_assign(
            df, "vec_id", "embedding", DIM, n_clusters=2, seed=3
        )
        salted = SD._id_salted(assigned, max_cluster=4)
        cells = (
            salted.groupBy("cluster", "salt").count().agg(F.max("count")).collect()
        )[0][0]
        assert cells <= 8  # ceil splits: no cell much over the cap
        # pairs within one salt bucket still verify exactly
        pairs = SD.semdedup_pairs(assigned, threshold=0.98, max_cluster=0).collect()
        planted = {frozenset(p) for g in groups for i in g for p in [(i, j) for j in g if j > i]}
        got = {frozenset((p["a"], p["b"])) for p in pairs}
        assert planted <= got

    def test_overcap_lsh_beats_id_salt_on_mega_cluster(self, spark):
        """A planted over-cap coarse cluster (60 vectors, max_cluster=10)
        holding 30 DISTINCT near-dup pairs — the scenario the LSH
        sub-split exists for: a wide k-means cell whose members are not
        mutually similar, but whose near-pairs must stay co-bucketed. The
        id-hash salt scatters each pair across ~6 salt cells (recall ~1/6
        by construction); hyperplane buckets respect geometry."""
        rng = np.random.default_rng(7)
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        rows = []
        pair_ids = []
        for i in range(30):
            a = base + rng.normal(size=DIM) * 0.35  # wide cone: one coarse cell
            a /= np.linalg.norm(a)
            b = a + rng.normal(size=DIM) * 0.02  # its near-dup (cos ~ 0.999)
            rows.append((2 * i, [float(x) for x in a]))
            rows.append((2 * i + 1, [float(x) for x in b / np.linalg.norm(b)]))
            pair_ids.append(frozenset((2 * i, 2 * i + 1)))
        # background noise so the quantizer has something else to see
        for i in range(60, 90):
            v = rng.normal(size=DIM)
            rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        assigned = SD.semdedup_assign(
            df, "vec_id", "embedding", DIM, n_clusters=2, seed=3
        ).cache()
        planted = set(pair_ids)

        def recall(pairs):
            got = {
                frozenset((p["a"], p["b"]))
                for p in pairs.collect()
                if p["a"] < 60 and p["b"] < 60
            }
            return len(got & planted) / len(planted)

        r_lsh = recall(
            SD.semdedup_pairs(assigned, threshold=0.99, max_cluster=10, dim=DIM)
        )
        r_salt = recall(
            SD.semdedup_pairs(assigned, threshold=0.99, max_cluster=10, dim=None)
        )
        assert r_salt < 0.5, r_salt  # the forfeit the LSH path removes
        assert r_lsh > 0.95, (r_lsh, r_salt)
        assert r_lsh > r_salt

    def test_overcap_backstop_salts_identical_vector_flood(self, spark):
        """IDENTICAL vectors all land in ONE LSH bucket per table; the
        id-salt backstop must still bound the join cell and the pipeline
        must not lose the flood (each salt cell resolves internally)."""
        v = [0.0] * (DIM - 1) + [1.0]
        rows = [(i, v) for i in range(40)] + [
            (100 + i, [float(x) for x in np.eye(DIM)[i % DIM]]) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        dec = SD.semdedup(
            df, "vec_id", "embedding", DIM,
            n_clusters=2, threshold=0.999, seed=3, max_cluster=8,
        ).collect()
        flood = [r for r in dec if r["id"] < 100]
        kept = sum(1 for r in flood if r["keep"])
        # without a sub-split: 1 keeper; with the backstop each salt cell
        # keeps one -> a handful, never the whole flood
        assert kept <= 8, kept
        assert sum(1 for r in flood if not r["keep"]) >= 32

    def test_prune_and_metrics(self, spark, vecs):
        df, groups = vecs
        kw = dict(n_clusters=4, threshold=0.98, seed=3)
        pruned = SD.semdedup_prune(df, "vec_id", "embedding", DIM, **kw)
        assert pruned.count() == len(groups) * 1 + 6
        m = SD.semdedup_metrics(
            SD.semdedup(df, "vec_id", "embedding", DIM, **kw)
        ).collect()[0]
        assert m["n_docs"] == 18 and m["n_kept"] == 9 and m["n_pruned"] == 9
        assert m["n_groups"] == 9
        assert abs(m["dup_rate"] - 0.5) < 1e-9

    def test_frozen_centroids_reusable_for_increments(self, spark, vecs):
        """Incremental shape: train once, assign a new batch against the
        frozen quantizer — same clusters for same vectors."""
        df, _ = vecs
        from datasketches_postgresql_spark.textops.ann import ivf_train_centroids

        cent = ivf_train_centroids(df, "embedding", DIM, n_cells=4, seed=3)
        a1 = SD.semdedup_assign(
            df, "vec_id", "embedding", DIM, centroids=cent
        ).select("id", "cluster")
        a2 = SD.semdedup_assign(
            df.repartition(5), "vec_id", "embedding", DIM, centroids=cent
        ).select("id", "cluster")
        assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
