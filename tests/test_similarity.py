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
