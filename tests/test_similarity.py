"""DBSCAN density clustering (llm.similarity.dbscan)."""

from __future__ import annotations

import pytest



# ---------------------------------------------------------------------------
# DBSCAN over embeddings
# ---------------------------------------------------------------------------


class TestDbscan:
    def _vectors(self, spark):
        """Two tight cosine clusters, one border point, one outlier."""
        rows = [
            # cluster around e_x (pairwise cosine ~0.999)
            (1, [1.0, 0.02, 0.0]),
            (2, [1.0, 0.0, 0.02]),
            (3, [1.0, -0.02, 0.0]),
            # cluster around e_y
            (11, [0.02, 1.0, 0.0]),
            (12, [0.0, 1.0, 0.02]),
            (13, [-0.02, 1.0, 0.0]),
            # border: close to cluster-x members but not dense itself
            (21, [1.0, 0.25, 0.0]),
            # noise: far from everyone
            (31, [0.577, 0.577, 0.577]),
        ]
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    def test_roles_and_clusters(self, spark):
        from temporal_retriever_spark.llm.similarity import dbscan

        got = {
            r["vec_id"]: (r["role"], r["cluster"])
            for r in dbscan(
                self._vectors(spark), threshold=0.97, min_pts=3
            ).collect()
        }
        assert got[1] == ("core", 1)
        assert got[2] == ("core", 1)
        assert got[3] == ("core", 1)
        assert got[11] == ("core", 11)
        assert got[12] == ("core", 11)
        assert got[13] == ("core", 11)
        # 21 neighbors cluster-x cores (cos ~0.97+) but has < min_pts
        assert got[21] == ("border", 1)
        assert got[31] == ("noise", None)

    def test_min_pts_one_makes_everything_core(self, spark):
        from temporal_retriever_spark.llm.similarity import dbscan

        got = dbscan(
            self._vectors(spark), threshold=0.97, min_pts=1
        ).collect()
        assert all(r["role"] == "core" for r in got)
        # the outlier is its own singleton cluster
        by = {r["vec_id"]: r["cluster"] for r in got}
        assert by[31] == 31

    def test_validation(self, spark):
        from temporal_retriever_spark.llm.similarity import dbscan

        with pytest.raises(ValueError, match="min_pts"):
            dbscan(self._vectors(spark), min_pts=0)


# ---------------------------------------------------------------------------
# PCA top component (power iteration)
# ---------------------------------------------------------------------------


class TestPcaPower:
    def test_matches_numpy_eigvector(self, spark):
        import numpy as np

        from temporal_retriever_spark.llm.similarity import pca_power

        # anisotropic cloud: dominant axis along (3, 1, 0)
        rows = []
        for i in range(200):
            t = ((i * 37) % 100 - 50) / 10.0
            s = ((i * 61) % 100 - 50) / 50.0
            rows.append((i, [3.0 * t + 0.1 * s, 1.0 * t - 0.3 * s, 0.05 * s]))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )
        got = pca_power(df, iterations=30).collect()
        X = np.array([v for _, v in rows])
        Xc = X - X.mean(axis=0)
        C = (X.T @ X) / len(X) - np.outer(X.mean(axis=0), X.mean(axis=0))
        evals, evecs = np.linalg.eigh(C)
        top = evecs[:, -1]
        scores_np = Xc @ top
        by = {r["vec_id"]: r for r in got}
        got_scores = np.array([by[i]["pc1"] for i, _ in rows])
        # sign is arbitrary between the two methods: align then compare
        if np.dot(got_scores, scores_np) < 0:
            scores_np = -scores_np
        assert np.allclose(got_scores, scores_np, atol=1e-6)
        evr = by[0]["explained_variance_ratio"]
        assert evr == pytest.approx(evals[-1] / evals.sum(), rel=1e-9)
        assert evr > 0.95  # the cloud really is 1-dimensional-ish

    def test_centered_scores_mean_zero(self, spark):
        from temporal_retriever_spark.llm.similarity import pca_power
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(70)],
            "vec_id long, embedding array<float>",
        )
        got = pca_power(df, iterations=15)
        m = got.agg(F.avg("pc1")).collect()[0][0]
        assert abs(m) < 1e-9

    def test_validation(self, spark):
        from temporal_retriever_spark.llm.similarity import pca_power

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="iterations"):
            pca_power(df, iterations=0)
        with pytest.raises(ValueError, match="empty"):
            pca_power(df.filter("vec_id > 5"))
