"""Achlioptas JL projection: distance preservation, determinism, plan."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.similarity import jl_weights, random_projection


class TestWeights:
    def test_values_and_determinism(self):
        w = jl_weights(64, 8)
        assert len(w) == 8 and all(len(r) == 64 for r in w)
        flat = [x for r in w for x in r]
        assert set(flat) <= {-1, 0, 1}
        # ~2/3 zeros by construction
        zfrac = flat.count(0) / len(flat)
        assert 0.5 < zfrac < 0.8, zfrac
        assert jl_weights(64, 8) == w  # no RNG state
        assert jl_weights(64, 8, salt="other") != w

    def test_matches_sql_derivation(self):
        # the md5-mod-6 rule a SQL mirror computes
        import hashlib

        w = jl_weights(4, 2, salt="s")
        for j in range(2):
            for i in range(4):
                m = int(
                    hashlib.md5(f"s:{j}:{i}".encode()).hexdigest()[:8], 16
                ) % 6
                expect = 1 if m == 0 else (-1 if m == 1 else 0)
                assert w[j][i] == expect


class TestProjection:
    def test_shape_and_determinism(self, spark):
        rng = np.random.default_rng(7)
        data = [(i, rng.standard_normal(32).tolist()) for i in range(20)]
        df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
        out = random_projection(df, dim=32, out_dim=8).collect()
        assert all(len(r["projected"]) == 8 for r in out)
        again = random_projection(df, dim=32, out_dim=8).collect()
        a = {r["vec_id"]: r["projected"] for r in out}
        b = {r["vec_id"]: r["projected"] for r in again}
        assert a == b

    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(3)
        data = [(i, rng.standard_normal(16).tolist()) for i in range(5)]
        df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
        got = {
            r["vec_id"]: np.array(r["projected"])
            for r in random_projection(df, dim=16, out_dim=4).collect()
        }
        W = np.array(jl_weights(16, 4), dtype=float)
        scale = math.sqrt(3.0 / 4)
        for i, vec in data:
            ref = scale * (W @ np.array(vec))
            assert np.allclose(got[i], ref, atol=1e-12), i

    def test_jl_distance_preservation(self, spark):
        # pairwise distances survive within the JL distortion envelope
        rng = np.random.default_rng(11)
        n, dim, k = 40, 64, 32
        data = [(i, rng.standard_normal(dim).tolist()) for i in range(n)]
        df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
        proj = {
            r["vec_id"]: np.array(r["projected"])
            for r in random_projection(df, dim=dim, out_dim=k).collect()
        }
        orig = {i: np.array(v) for i, v in data}
        ratios = []
        for i in range(0, n, 3):
            for j in range(i + 1, n, 7):
                d0 = np.linalg.norm(orig[i] - orig[j])
                d1 = np.linalg.norm(proj[i] - proj[j])
                ratios.append(d1 / d0)
        r = np.array(ratios)
        # mean ratio ~1 (unbiased), individual within loose JL bounds
        assert abs(r.mean() - 1.0) < 0.15, r.mean()
        assert (r > 0.4).all() and (r < 1.8).all(), (r.min(), r.max())

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="positive"):
            random_projection(df, dim=0, out_dim=4)

    def test_plan_native_no_shuffle(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0] * 16)], "vec_id long, embedding array<double>"
        )
        plan = (
            random_projection(df, dim=16, out_dim=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "ArrowEval" not in plan
