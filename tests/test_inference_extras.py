"""Tests for woe_iv, friedman_test, fisher_exact."""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pytest

from temporal_retriever_spark.inference import (
    fisher_exact,
    friedman_test,
    woe_iv,
)


class TestWoeIv:
    def test_hand_computed(self, spark):
        # cat A: 30 events / 10 non; cat B: 10 events / 50 non
        rows = (
            [("A", 1)] * 30 + [("A", 0)] * 10 + [("B", 1)] * 10 + [("B", 0)] * 50
        )
        df = spark.createDataFrame(rows, "cat string, y int")
        got = {r["category"]: r for r in woe_iv(df, "cat", "y").collect()}
        s, k = 0.5, 2
        te, tn = 40, 60
        for cat, e, ne in (("A", 30, 10), ("B", 10, 50)):
            ge = (e + s) / (te + s * k)
            gn = (ne + s) / (tn + s * k)
            assert got[cat]["woe"] == pytest.approx(math.log(ge / gn), rel=1e-12)
            assert got[cat]["iv_term"] == pytest.approx(
                (ge - gn) * math.log(ge / gn), rel=1e-12
            )
            assert got[cat]["n"] == e + ne and got[cat]["n_events"] == e
        iv = sum(r["iv_term"] for r in got.values())
        assert got["A"]["iv"] == pytest.approx(iv, rel=1e-12)

    def test_uninformative_feature_low_iv(self, spark):
        rng = np.random.default_rng(1)
        rows = [
            (rng.choice(["A", "B", "C"]).item(), int(rng.random() < 0.3))
            for _ in range(3000)
        ]
        df = spark.createDataFrame(rows, "cat string, y int")
        r = woe_iv(df, "cat", "y").collect()[0]
        assert r["iv"] < 0.02

    def test_empty_cell_finite(self, spark):
        rows = [("A", 1)] * 5 + [("B", 0)] * 5  # A has no non-events
        df = spark.createDataFrame(rows, "cat string, y int")
        got = {r["category"]: r for r in woe_iv(df, "cat", "y").collect()}
        assert math.isfinite(got["A"]["woe"]) and got["A"]["woe"] > 0

    def test_validation(self, spark):
        df = spark.createDataFrame([("A", 1)], "cat string, y int")
        with pytest.raises(ValueError):
            woe_iv(df, "cat", "y", smoothing=0.0)


def _friedman_ref(mat):
    """Tie-corrected Friedman (Conover) on an n x k matrix."""
    mat = np.asarray(mat, float)
    n, k = mat.shape
    r = np.empty_like(mat)
    for i in range(n):
        row = mat[i]
        for j in range(k):
            r[i, j] = (row < row[j]).sum() + ((row == row[j]).sum() + 1) / 2
    a = (r**2).sum()
    rj = r.sum(axis=0)
    b = (rj**2).sum() / n
    c = n * k * (k + 1) ** 2 / 4
    return n * (k - 1) * (b - c) / (a - c)


class TestFriedman:
    def _df(self, spark, mat):
        rows = [
            (f"b{i}", f"t{j}", float(v))
            for i, row in enumerate(mat)
            for j, v in enumerate(row)
        ]
        return spark.createDataFrame(rows, "blk string, trt string, y double")

    def test_matches_reference_with_ties(self, spark):
        rng = np.random.default_rng(2)
        mat = np.round(rng.normal(size=(12, 4)), 1)  # rounding makes ties
        r = friedman_test(self._df(spark, mat), "blk", "trt", "y").collect()[0]
        assert r["q_stat"] == pytest.approx(_friedman_ref(mat), rel=1e-9)
        assert r["n_blocks"] == 12 and r["k_groups"] == 4 and r["dof"] == 3

    def test_exact_p_matches_chi2(self, spark):
        from temporal_retriever_spark.stats import chi2_sf

        rng = np.random.default_rng(3)
        mat = rng.normal(size=(15, 3))
        r = friedman_test(
            self._df(spark, mat), "blk", "trt", "y", groups=3
        ).collect()[0]
        assert r["p_value"] == pytest.approx(
            chi2_sf(_friedman_ref(mat), 2), abs=1e-6
        )

    def test_planted_effect_significant(self, spark):
        rng = np.random.default_rng(4)
        mat = rng.normal(size=(20, 3))
        mat[:, 2] += 2.0  # treatment 2 consistently higher
        r = friedman_test(
            self._df(spark, mat), "blk", "trt", "y", groups=3
        ).collect()[0]
        assert r["p_value"] < 0.001

    def test_incomplete_blocks_dropped(self, spark):
        mat = np.random.default_rng(5).normal(size=(10, 3))
        df = self._df(spark, mat)
        extra = spark.createDataFrame(
            [("bx", "t0", 1.0), ("bx", "t1", 2.0)],  # missing t2
            "blk string, trt string, y double",
        )
        r = friedman_test(df.union(extra), "blk", "trt", "y").collect()[0]
        assert r["n_blocks"] == 10


def _fisher_ref(a, b, c, d):
    """Exact two-sided p via Fraction hypergeometric enumeration."""
    r1, r2, c1 = a + b, c + d, a + c
    n = a + b + c + d

    def p(k):
        return Fraction(
            math.comb(r1, k) * math.comb(r2, c1 - k), math.comb(n, c1)
        )

    pobs = p(a)
    tol = pobs + pobs / 10**7
    lo, hi = max(0, c1 - r2), min(r1, c1)
    return float(sum(p(k) for k in range(lo, hi + 1) if p(k) <= tol))


class TestFisherExact:
    def _df(self, spark, a, b, c, d):
        rows = (
            [(1, 1)] * a + [(1, 0)] * b + [(0, 1)] * c + [(0, 0)] * d
        )
        return spark.createDataFrame(rows, "g int, o int")

    def test_tea_tasting(self, spark):
        # Fisher's lady-tasting-tea 2x2: p = 0.4857142857...
        r = fisher_exact(self._df(spark, 3, 1, 1, 3), "g", "o").collect()[0]
        assert r["p_value"] == pytest.approx(_fisher_ref(3, 1, 1, 3), rel=1e-9)
        assert r["p_value"] == pytest.approx(34 / 70, rel=1e-9)
        assert r["odds_ratio"] == pytest.approx(9.0)

    def test_various_tables(self, spark):
        for a, b, c, d in ((5, 0, 1, 4), (10, 10, 10, 10), (2, 7, 8, 2), (0, 5, 5, 0)):
            r = fisher_exact(self._df(spark, a, b, c, d), "g", "o").collect()[0]
            assert r["p_value"] == pytest.approx(
                _fisher_ref(a, b, c, d), rel=1e-9
            ), (a, b, c, d)
            assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)

    def test_independent_table_p_one(self, spark):
        r = fisher_exact(self._df(spark, 10, 10, 10, 10), "g", "o").collect()[0]
        assert r["p_value"] == pytest.approx(1.0, abs=1e-9)

    def test_zero_cell_odds_ratio_null(self, spark):
        r = fisher_exact(self._df(spark, 5, 0, 1, 4), "g", "o").collect()[0]
        assert r["odds_ratio"] is None
