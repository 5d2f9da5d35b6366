from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from temporal_retriever_spark.tsdist import (
    dtw_numpy,
    dtw_pairs,
    matrix_profile,
    matrix_profile_numpy,
)


def _dtw_textbook(a, b, band=None):
    """Classic O(nm) DP with explicit min over the three moves."""
    n, m = len(a), len(b)
    D = np.full((n, m), math.inf)
    for i in range(n):
        for j in range(m):
            if band is not None and abs(i * m / n - j) > band + abs(n - m):
                continue
            c = (a[i] - b[j]) ** 2
            if i == 0 and j == 0:
                D[i, j] = c
            elif i == 0:
                D[i, j] = c + D[i, j - 1]
            elif j == 0:
                D[i, j] = c + D[i - 1, j]
            else:
                D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return D[-1, -1]


class TestDtwNumpy:
    def test_prefix_min_form_equals_textbook(self):
        rng = np.random.default_rng(1)
        for n, m in ((12, 12), (9, 17), (30, 25)):
            a, b = rng.normal(size=n), rng.normal(size=m)
            assert dtw_numpy(a, b) == pytest.approx(
                _dtw_textbook(a, b), rel=1e-12
            )

    def test_banded_equals_textbook(self):
        rng = np.random.default_rng(2)
        a, b = rng.normal(size=20), rng.normal(size=20)
        for band in (2, 5, 8):
            assert dtw_numpy(a, b, band=band) == pytest.approx(
                _dtw_textbook(a, b, band=band), rel=1e-12
            )

    def test_identical_series_zero(self):
        a = np.array([1.0, 3.0, 2.0, 5.0])
        assert dtw_numpy(a, a) == 0.0

    def test_shift_tolerance(self):
        # DTW absorbs a phase shift Euclidean can't
        t = np.linspace(0, 4 * np.pi, 60)
        a, b = np.sin(t), np.sin(t + 0.5)
        eucl = float(((a - b) ** 2).sum())
        assert dtw_numpy(a, b) < 0.2 * eucl

    def test_band_tightening_monotone(self):
        rng = np.random.default_rng(3)
        a, b = rng.normal(size=25), rng.normal(size=25)
        d_full = dtw_numpy(a, b)
        d5, d1 = dtw_numpy(a, b, band=5), dtw_numpy(a, b, band=1)
        assert d_full <= d5 + 1e-12 <= d1 + 1e-12


def _mk_series(spark, mapping):
    rows = []
    for key, vals in mapping.items():
        for i, v in enumerate(vals):
            rows.append((key, dt.date(2024, 1, 1) + dt.timedelta(days=i), float(v)))
    return spark.createDataFrame(rows, "event_type string, ds date, y double")


class TestDtwPairs:
    def test_all_pairs_and_values(self, spark):
        rng = np.random.default_rng(5)
        data = {k: rng.normal(size=20) for k in ("a", "b", "c")}
        got = {
            (r["id_a"], r["id_b"]): r
            for r in dtw_pairs(_mk_series(spark, data), znorm=False).collect()
        }
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
        for (ka, kb), r in got.items():
            assert r["dtw"] == pytest.approx(
                _dtw_textbook(data[ka], data[kb]), rel=1e-9
            )
            assert r["n_a"] == 20 and r["n_b"] == 20

    def test_znorm_scale_invariance(self, spark):
        rng = np.random.default_rng(6)
        base = rng.normal(size=24)
        data = {"x": base, "y": 100 + 50 * base}
        r = dtw_pairs(_mk_series(spark, data), znorm=True).collect()[0]
        assert r["dtw"] == pytest.approx(0.0, abs=1e-18)

    def test_blocked_pairs_only(self, spark):
        rng = np.random.default_rng(7)
        df = _mk_series(
            spark, {k: rng.normal(size=10) for k in ("a", "b", "c", "d")}
        )
        from pyspark.sql import functions as F

        df = df.withColumn(
            "blk", F.when(F.col("event_type").isin("a", "b"), "g1").otherwise("g2")
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in dtw_pairs(df, block_col="blk").collect()
        }
        assert got == {("a", "b"), ("c", "d")}


def _mp_brute(y, m, excl=None):
    n = len(y)
    nw = n - m + 1
    excl = max(1, m // 2) if excl is None else excl
    wins = [np.asarray(y[i : i + m], float) for i in range(nw)]
    prof, idx = np.full(nw, np.nan), np.full(nw, -1)
    for i in range(nw):
        wi = wins[i]
        if wi.std() <= 0:
            continue
        zi = (wi - wi.mean()) / wi.std()
        best, bj = np.inf, -1
        for j in range(nw):
            if abs(i - j) < excl or wins[j].std() <= 0:
                continue
            zj = (wins[j] - wins[j].mean()) / wins[j].std()
            d = round(float(np.sqrt(((zi - zj) ** 2).sum())) + 1.234567e-07, 6)
            if d < best:
                best, bj = d, j
        if bj >= 0:
            prof[i], idx[i] = best, bj
    return prof, idx


class TestMatrixProfile:
    def test_numpy_matches_bruteforce(self):
        rng = np.random.default_rng(8)
        y = np.cumsum(rng.normal(size=60))
        prof, idx = matrix_profile_numpy(y, 8)
        bprof, bidx = _mp_brute(y, 8)
        np.testing.assert_allclose(prof, bprof, rtol=1e-9)
        np.testing.assert_array_equal(idx, bidx)

    def test_planted_motif_found(self):
        rng = np.random.default_rng(9)
        y = rng.normal(size=100) * 0.1
        motif = np.array([0, 3, 6, 3, 0, -3, -6, -3.0])
        y[10:18] += motif
        y[70:78] += motif
        prof, idx = matrix_profile_numpy(y, 8)
        lo = int(np.nanargmin(prof))
        # the global minimum sits on (or within a couple of starts of)
        # one motif occurrence, and its nearest neighbor is the other
        assert lo in range(8, 13) or lo in range(68, 73)
        other = idx[lo]
        if lo < 40:
            assert other in range(68, 73)
        else:
            assert other in range(8, 13)

    def test_flat_windows_null(self):
        y = np.concatenate([np.full(12, 5.0), [1, 9, 2, 8, 3, 7, 4.0, 6]])
        prof, idx = matrix_profile_numpy(y, 6)
        assert np.isnan(prof[0]) and idx[0] == -1

    def test_spark_matches_numpy(self, spark):
        rng = np.random.default_rng(10)
        data = {
            "a": np.cumsum(rng.normal(size=40)),
            "b": np.cumsum(rng.normal(size=30)),
        }
        rows = matrix_profile(_mk_series(spark, data), m=8).collect()
        for key, y in data.items():
            got = sorted(
                [r for r in rows if r["event_type"] == key],
                key=lambda r: r["i"],
            )
            prof, idx = matrix_profile_numpy(np.asarray(y), 8)
            assert len(got) == len(prof)
            for r in got:
                ref = prof[r["i"]]
                if np.isnan(ref):
                    assert r["mp_dist"] is None
                else:
                    assert r["mp_dist"] == pytest.approx(ref, rel=1e-9)
                assert r["mp_index"] == idx[r["i"]]

    def test_validation(self, spark):
        df = _mk_series(spark, {"a": [1.0, 2.0]})
        with pytest.raises(ValueError):
            matrix_profile(df, m=1)
        with pytest.raises(ValueError):
            matrix_profile(df, series_cols=())
