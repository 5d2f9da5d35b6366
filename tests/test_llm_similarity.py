from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.similarity import (
    cosine_similarity_expr,
    cosine_topk,
    lsh_cosine_topk,
)
from tests.conftest import assert_matches_oracle


def test_cosine_expr_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([1.0, 0.0], [-1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    vals = [r[0] for r in df.select(cosine_similarity_expr("a", "b")).collect()]
    assert abs(vals[0] - 0.0) < 1e-12
    assert abs(vals[1] - 1.0) < 1e-12
    assert abs(vals[2] + 1.0) < 1e-12


def test_cosine_topk_self_is_nearest(tables):
    emb = tables["embeddings"]
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    got = cosine_topk(emb, queries, k=3, include_self=True)
    top1 = {r["query_id"]: r["vec_id"] for r in got.filter("rank = 1").collect()}
    for qid, vid in top1.items():
        assert qid == vid  # self-similarity 1.0 wins


def test_cosine_topk_matches_numpy(tables):
    # cross-check the distributed top-k against local numpy brute force
    import numpy as np

    emb = tables["embeddings"]
    local = emb.toPandas()
    E = np.array(local["embedding"].tolist(), dtype=np.float64)
    ids = local["vec_id"].to_numpy()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    got = cosine_topk(emb, queries, k=3)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for qid, rows in by_q.items():
        qi = int(np.where(ids == qid)[0][0])
        sims = S[qi].copy()
        sims[qi] = -2  # exclude self
        order = np.argsort(-sims, kind="stable")[:3]
        want = [int(ids[j]) for j in order]
        rows.sort()
        assert [v for _, v, _ in rows] == want, (qid, rows, want)
        for (rank, vid, cos), j in zip(rows, order):
            assert abs(cos - sims[j]) < 1e-6


def test_cosine_topk_oracle(tables, duck):
    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    got = cosine_topk(emb, queries, k=5).select(
        "query_id", "vec_id", "rank", F.round(F.col("cosine") + 1.234567e-7, 4).alias("cosine")
    )
    sql = """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(e.embedding, q.qe) AS cosine
            FROM embeddings e, q
            WHERE e.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, rank, ROUND(cosine + 1.234567e-7, 4) AS cosine
        FROM ranked WHERE rank <= 5
    """
    assert_matches_oracle(got, duck, sql, round_floats=4)


def test_lsh_topk_recall(tables):
    emb = tables["embeddings"]
    queries = emb.limit(20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = cosine_topk(emb, queries, k=1)
    approx = lsh_cosine_topk(emb, queries, k=1, n_planes=4, n_tables=8)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # random 64-dim corpus: single-table sign-LSH recall is (1-θ/π)^4
    # ≈ 0.15; with 8 OR'd tables expected ≈ 1-(1-.15)^8 ≈ 0.73
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # approx results must be deterministic across runs
    a2 = {
        (r["query_id"], r["vec_id"])
        for r in lsh_cosine_topk(emb, queries, k=1, n_planes=4, n_tables=8).collect()
    }
    assert a == a2


# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs (§2.10)
# ---------------------------------------------------------------------------

def _planted_neardups(spark):
    """8 base vectors + near-copies (cosine ≈ 0.999) + unrelated noise."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for b in range(8):
        base = rng.standard_normal(16)
        rows.append((vid, [float(x) for x in base])); vid += 1
        # near-duplicate: tiny perturbation
        rows.append((vid, [float(x) for x in base + 0.01 * rng.standard_normal(16)]))
        vid += 1
    for _ in range(30):
        rows.append((vid, [float(x) for x in rng.standard_normal(16)])); vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dups_exact_finds_planted(spark):
    from temporal_retriever_spark.llm.similarity import embedding_near_dup_pairs

    df = _planted_neardups(spark)
    pairs = embedding_near_dup_pairs(df, threshold=0.95, method="exact").collect()
    got = {(r["left_id"], r["right_id"]) for r in pairs}
    want = {(2 * b, 2 * b + 1) for b in range(8)}
    assert got == want
    assert all(r["cosine"] >= 0.95 for r in pairs)


def test_embedding_near_dups_lsh_matches_exact_on_planted(spark):
    from temporal_retriever_spark.llm.similarity import embedding_near_dup_pairs

    df = _planted_neardups(spark)
    exact = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs(
            df, threshold=0.95, method="exact"
        ).collect()
    }
    lsh = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs(
            df, threshold=0.95, method="lsh", n_planes=6, n_tables=8, dim=16
        ).collect()
    }
    # precision 1.0 by construction (verified), and at cosine≈0.999 the
    # per-pair collision probability is ~1 − 1e-6 — recall 1.0 here
    assert lsh == exact


def test_embedding_near_dups_lsh_probe_path_equals_full_lsh(spark):
    # The r9 packed-signature probe path ("shares any bucket" evaluated
    # as zip_with/exists inside the broadcast stage, no candidate
    # shuffle) must emit EXACTLY the pairs the per-table bucket
    # self-join emits, restricted to pairs touching the probe set —
    # same tables, planes, seed, so identical candidate predicate.
    # Threshold is LOW so candidates that collide in only some tables
    # (partial signature matches) are exercised, not just near-1 pairs.
    from temporal_retriever_spark.llm.similarity import embedding_near_dup_pairs

    df = _planted_neardups(spark)
    kw = dict(threshold=0.2, method="lsh", n_planes=3, n_tables=5, dim=16)
    probes = spark.createDataFrame([(1,), (6,), (11,)], "vec_id long")
    pids = {1, 6, 11}
    full = {
        (r["left_id"], r["right_id"], round(r["cosine"], 9))
        for r in embedding_near_dup_pairs(df, **kw).collect()
        if r["left_id"] in pids or r["right_id"] in pids
    }
    probe = {
        (r["left_id"], r["right_id"], round(r["cosine"], 9))
        for r in embedding_near_dup_pairs(df, probe_ids=probes, **kw).collect()
    }
    assert probe == full
    assert probe, "degenerate test: no pairs touched the probe set"


def test_embedding_near_dups_feeds_duplicate_clusters(spark):
    from temporal_retriever_spark.llm.dedup import duplicate_clusters
    from temporal_retriever_spark.llm.similarity import embedding_near_dup_pairs
    from pyspark.sql import functions as F

    df = _planted_neardups(spark)
    pairs = embedding_near_dup_pairs(df, threshold=0.95, method="exact").select(
        F.col("left_id").cast("string").alias("id_a"),
        F.col("right_id").cast("string").alias("id_b"),
    )
    clusters = duplicate_clusters(pairs).collect()
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    assert len(by_cluster) == 8
    assert all(len(v) == 2 for v in by_cluster.values())


def test_embedding_near_dups_bad_method(spark):
    import pytest
    from temporal_retriever_spark.llm.similarity import embedding_near_dup_pairs

    with pytest.raises(ValueError):
        embedding_near_dup_pairs(_planted_neardups(spark), method="bogus").collect()


def test_embedding_group_outliers_finds_planted_outlier(spark):
    import numpy as np

    from temporal_retriever_spark.llm.similarity import embedding_group_outliers

    rng = np.random.default_rng(4)
    rows = []
    for lbl, center in ((0, np.array([1.0, 0.0, 0.0])), (1, np.array([0.0, 1.0, 0.0]))):
        for i in range(20):
            v = center + rng.normal(scale=0.05, size=3)
            rows.append((lbl * 100 + i, [float(x) for x in v], lbl))
    # planted outliers: opposite direction vectors
    rows.append((99, [-1.0, 0.05, 0.0], 0))
    rows.append((199, [0.05, -1.0, 0.0], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = embedding_group_outliers(df, k=1).toPandas()
    assert set(out.vec_id) == {99, 199}
    assert (out.outlier_rank == 1).all()
    assert (out.centroid_cos < 0).all()


def test_embedding_group_outliers_rank_and_validation(spark):
    from temporal_retriever_spark.llm.similarity import embedding_group_outliers

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = embedding_group_outliers(df, k=3).toPandas().sort_values("outlier_rank")
    # farthest-first: the orthogonal vector ranks 1
    assert list(out.vec_id)[0] == 3
    assert list(out.outlier_rank) == [1, 2, 3]
    with pytest.raises(ValueError, match="k"):
        embedding_group_outliers(df, k=0)


def test_pool_embeddings_modes_and_normalize(spark):
    import numpy as np

    from temporal_retriever_spark.llm.similarity import pool_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0]), (1, [3.0, 4.0, 0.0]), (2, [5.0, 5.0, 5.0])],
        "doc_id long, embedding array<double>",
    )
    mean = pool_embeddings(df, mode="mean").toPandas().set_index("doc_id")
    assert list(mean.loc[1].pooled) == [2.0, 2.0, 1.0]
    assert mean.loc[1].n_vectors == 2 and mean.loc[2].n_vectors == 1
    mx = pool_embeddings(df, mode="max").toPandas().set_index("doc_id")
    assert list(mx.loc[1].pooled) == [3.0, 4.0, 2.0]
    nm = pool_embeddings(df, mode="mean", normalize=True).toPandas().set_index("doc_id")
    assert np.linalg.norm(nm.loc[1].pooled) == pytest.approx(1.0, abs=1e-12)
    # direction preserved under normalization
    assert np.allclose(
        np.array(nm.loc[1].pooled) * np.linalg.norm([2.0, 2.0, 1.0]),
        [2.0, 2.0, 1.0],
    )
    with pytest.raises(ValueError, match="mode"):
        pool_embeddings(df, mode="sum")


class TestLof:
    @staticmethod
    def _ref(X, k):
        import numpy as np

        n = len(X)
        D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
        res = {}
        kdist, neigh = {}, {}
        for i in range(n):
            order = sorted((D[i, j], j) for j in range(n) if j != i)
            kd = order[min(k, n - 1) - 1][0]
            kdist[i] = kd
            neigh[i] = [j for (dd, j) in order if dd <= kd]
        lrd = {}
        for i in range(n):
            reach = [max(kdist[j], D[i, j]) for j in neigh[i]]
            s = sum(reach)
            lrd[i] = len(reach) / s if s > 0 else None
        for i in range(n):
            all_lrds = [lrd[j] for j in neigh[i]]
            finite = [x for x in all_lrds if x is not None]
            if lrd[i] is None:
                lf = 1.0  # mutual-duplicate cluster: paper's inf/inf = 1
            elif len(finite) < len(all_lrds):
                lf = float("inf")  # infinitely denser neighbor pocket
            else:
                lf = (sum(finite) / len(finite)) / lrd[i]
            res[i] = dict(
                kdist=kdist[i],
                lrd=lrd[i],
                lof=lf,
                n_nb=len(all_lrds),
            )
        return res

    def _df(self, spark, X):
        return spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(X)],
            "vec_id long, embedding array<double>",
        )

    def test_matches_reference(self, spark):
        import numpy as np

        from temporal_retriever_spark.llm.similarity import lof

        rng = np.random.default_rng(5)
        X = rng.normal(size=(40, 8))
        got = {r["vec_id"]: r for r in lof(self._df(spark, X), k=5).collect()}
        ref = self._ref(X, 5)
        assert set(got) == set(ref)
        for i in ref:
            assert got[i]["kdist"] == pytest.approx(ref[i]["kdist"], rel=1e-9)
            assert got[i]["lrd"] == pytest.approx(ref[i]["lrd"], rel=1e-9)
            assert got[i]["lof"] == pytest.approx(ref[i]["lof"], rel=1e-9)
            assert got[i]["n_nb"] == ref[i]["n_nb"]

    def test_planted_outlier_scores_high(self, spark):
        import numpy as np

        from temporal_retriever_spark.llm.similarity import lof

        rng = np.random.default_rng(6)
        cluster = rng.normal(0, 0.3, size=(60, 6))
        outlier = np.full((1, 6), 4.0)
        X = np.vstack([cluster, outlier])
        got = {r["vec_id"]: r["lof"] for r in lof(self._df(spark, X), k=5).collect()}
        inliers = [got[i] for i in range(60)]
        assert got[60] > 3.0
        assert max(inliers) < 2.0
        assert sum(inliers) / len(inliers) == pytest.approx(1.0, abs=0.15)

    def test_candidates_path_matches_exact_when_complete(self, spark):
        import numpy as np

        from temporal_retriever_spark.llm.similarity import lof

        rng = np.random.default_rng(7)
        X = rng.normal(size=(20, 4))
        df = self._df(spark, X)
        cand = spark.createDataFrame(
            [(i, j) for i in range(20) for j in range(i + 1, 20)],
            "id_a long, id_b long",
        )
        exact = {r["vec_id"]: r for r in lof(df, k=4).collect()}
        blocked = {r["vec_id"]: r for r in lof(df, k=4, candidates=cand).collect()}
        for i in exact:
            assert blocked[i]["lof"] == pytest.approx(exact[i]["lof"], rel=1e-9)

    def test_probe_ids_path_matches_full_exact(self, spark):
        # The anchored 3-hop cone (probes → N(P) → N(N(P)), each hop a
        # broadcast |cone|×n pass) must reproduce the full O(n²) run
        # bit-for-bit on the probe rows — this is the linearity claim
        # the anchored lof_embeddings contract rests on.
        import numpy as np

        from temporal_retriever_spark.llm.similarity import lof

        rng = np.random.default_rng(11)
        X = rng.normal(size=(60, 6))
        df = self._df(spark, X)
        probes = spark.createDataFrame(
            [(3,), (17,), (42,), (59,)], "vec_id long"
        )
        full = {r["vec_id"]: r for r in lof(df, k=5).collect()}
        anch = {r["vec_id"]: r for r in lof(df, k=5, probe_ids=probes).collect()}
        assert set(anch) == {3, 17, 42, 59}
        for i in anch:
            assert anch[i]["kdist"] == full[i]["kdist"]
            assert anch[i]["lrd"] == pytest.approx(full[i]["lrd"], rel=1e-12)
            assert anch[i]["lof"] == pytest.approx(full[i]["lof"], rel=1e-12)
            assert anch[i]["n_nb"] == full[i]["n_nb"]

    def test_probe_ids_and_candidates_mutually_exclusive(self, spark):
        import numpy as np

        from temporal_retriever_spark.llm.similarity import lof

        df = self._df(spark, np.zeros((3, 2)))
        probes = spark.createDataFrame([(0,)], "vec_id long")
        with pytest.raises(ValueError, match="mutually exclusive"):
            lof(df, k=2, candidates=probes, probe_ids=probes)

    def test_duplicate_cluster_infinite_lrd(self, spark):
        # 8 exact duplicates at the origin (k=5 → kdist 0, lrd NULL =
        # the paper's infinite density) plus a loose ring nearby whose
        # neighborhoods include duplicates. Explicit semantics:
        # duplicates get lof = 1.0 (inf/inf convention); finite-lrd
        # points with an infinite-lrd neighbor get lof = +inf; n_nb
        # counts ALL neighbors including infinite-lrd ones.
        import math

        import numpy as np

        from temporal_retriever_spark.llm.similarity import lof

        dup = np.zeros((8, 3))
        ring = np.array(
            [[0.5 + 0.01 * i, 0.0, 0.0] for i in range(4)]
        )
        X = np.vstack([dup, ring])
        got = {r["vec_id"]: r for r in lof(self._df(spark, X), k=5).collect()}
        ref = self._ref(X, 5)
        assert set(got) == set(ref)
        for i in range(8):
            assert got[i]["kdist"] == 0.0
            assert got[i]["lrd"] is None
            assert got[i]["lof"] == 1.0
            assert got[i]["n_nb"] == ref[i]["n_nb"] >= 5
        saw_inf = False
        for i in range(8, 12):
            assert got[i]["lrd"] is not None
            if math.isinf(ref[i]["lof"]):
                assert math.isinf(got[i]["lof"])
                saw_inf = True
            else:
                assert got[i]["lof"] == pytest.approx(
                    ref[i]["lof"], rel=1e-9
                )
            assert got[i]["n_nb"] == ref[i]["n_nb"]
        assert saw_inf

    def test_validation(self, spark):
        from temporal_retriever_spark.llm.similarity import lof

        df = self._df(spark, [[0.0, 0.0]])
        with pytest.raises(ValueError):
            lof(df, k=0)
