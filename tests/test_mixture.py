from __future__ import annotations

import math

import numpy as np
import pytest

from temporal_retriever_spark.mixture import gmm_em


def _em_ref(y, k=2, rounds=6, floor=1e-6):
    """Numpy replay of the exact deterministic EM recipe."""
    y = np.asarray(y, float)
    n = len(y)
    mus = [np.quantile(y, (2 * c + 1) / (2 * k)) for c in range(k)]
    v0 = max(y.var(), floor)
    vs = [v0] * k
    ws = [1.0 / k] * k
    for _ in range(rounds):
        ls = np.array(
            [
                np.log(ws[c]) - (y - mus[c]) ** 2 / (2 * vs[c]) - 0.5 * np.log(vs[c])
                for c in range(k)
            ]
        )
        resp = np.array(
            [
                1.0 / sum(np.exp(ls[o] - ls[c]) for o in range(k))
                for c in range(k)
            ]
        )
        nc = resp.sum(axis=1)
        mus = [(resp[c] * y).sum() / nc[c] for c in range(k)]
        vs = [
            max((resp[c] * y * y).sum() / nc[c] - mus[c] ** 2, floor)
            for c in range(k)
        ]
        ws = [nc[c] / n for c in range(k)]
    ls = np.array(
        [
            np.log(ws[c]) - (y - mus[c]) ** 2 / (2 * vs[c]) - 0.5 * np.log(vs[c])
            for c in range(k)
        ]
    )
    lmax = ls.max(axis=0)
    ll = (lmax + np.log(np.exp(ls - lmax).sum(axis=0))).sum() + n * (
        -0.5 * math.log(2 * math.pi)
    )
    return ws, mus, vs, ll


def _df(spark, y, key=None):
    if key is None:
        return spark.createDataFrame([(float(v),) for v in y], "y double")
    return spark.createDataFrame(
        [(k, float(v)) for k, v in zip(key, y)], "k string, y double"
    )


class TestGmmEm:
    def test_matches_numpy_replay(self, spark):
        rng = np.random.default_rng(3)
        y = np.concatenate([rng.normal(0, 1, 150), rng.normal(6, 1.5, 100)])
        rows = sorted(gmm_em(_df(spark, y)).collect(), key=lambda r: r["comp"])
        ws, mus, vs, ll = _em_ref(y)
        for c, r in enumerate(rows):
            assert r["weight"] == pytest.approx(ws[c], rel=1e-9)
            assert r["mu"] == pytest.approx(mus[c], rel=1e-9)
            assert r["var"] == pytest.approx(vs[c], rel=1e-9)
            assert r["loglik"] == pytest.approx(ll, rel=1e-9)
            assert r["n"] == 250

    def test_recovers_bimodal_structure(self, spark):
        rng = np.random.default_rng(5)
        y = np.concatenate([rng.normal(-4, 0.8, 300), rng.normal(4, 0.8, 300)])
        rows = sorted(
            gmm_em(_df(spark, y), rounds=15).collect(), key=lambda r: r["mu"]
        )
        assert rows[0]["mu"] == pytest.approx(-4, abs=0.3)
        assert rows[1]["mu"] == pytest.approx(4, abs=0.3)
        assert rows[0]["weight"] == pytest.approx(0.5, abs=0.05)
        assert rows[0]["var"] == pytest.approx(0.64, rel=0.4)

    def test_three_components(self, spark):
        rng = np.random.default_rng(7)
        y = np.concatenate(
            [rng.normal(0, 0.5, 200), rng.normal(5, 0.5, 200), rng.normal(10, 0.5, 200)]
        )
        rows = sorted(
            gmm_em(_df(spark, y), k=3, rounds=20).collect(),
            key=lambda r: r["mu"],
        )
        assert [round(r["mu"]) for r in rows] == [0, 5, 10]

    def test_keyed_independent_fits(self, spark):
        rng = np.random.default_rng(9)
        ya = np.concatenate([rng.normal(0, 1, 120), rng.normal(8, 1, 120)])
        yb = rng.normal(3, 2, 240)
        df = _df(spark, np.concatenate([ya, yb]), key=["a"] * 240 + ["b"] * 240)
        rows = gmm_em(df, key_cols=("k",)).collect()
        for key, yref in (("a", ya), ("b", yb)):
            got = sorted(
                [r for r in rows if r["k"] == key], key=lambda r: r["comp"]
            )
            ws, mus, vs, ll = _em_ref(yref)
            for c, r in enumerate(got):
                assert r["mu"] == pytest.approx(mus[c], rel=1e-9)
                assert r["loglik"] == pytest.approx(ll, rel=1e-9)

    def test_higher_loglik_than_single_gaussian(self, spark):
        rng = np.random.default_rng(11)
        y = np.concatenate([rng.normal(-3, 1, 200), rng.normal(3, 1, 200)])
        r = gmm_em(_df(spark, y), rounds=15).collect()[0]
        # single-Gaussian MLE loglik
        v = y.var()
        ll1 = -len(y) / 2 * (math.log(2 * math.pi * v) + 1)
        assert r["loglik"] > ll1 + 50

    def test_validation(self, spark):
        df = _df(spark, [1.0, 2.0])
        with pytest.raises(ValueError):
            gmm_em(df, k=1)
        with pytest.raises(ValueError):
            gmm_em(df, rounds=0)
        with pytest.raises(ValueError):
            gmm_em(df, var_floor=0.0)

    def test_component_collapse_guard(self, spark):
        # k=3 over 2 clusters separated by 1e12: the middle component's
        # responsibility mass underflows to EXACTLY 0 by ~round 25
        # (verified against an unguarded scalar replay). Without the
        # _nc/weight floors this is 0/0 = NaN poisoning every later
        # round; with them the dead component parks at weight 0 and the
        # two live components stay exact.
        y = [0.0] * 10 + [1e12] * 10
        rows = sorted(
            gmm_em(_df(spark, y), k=3, rounds=30).collect(),
            key=lambda r: r["mu"],
        )
        assert len(rows) == 3
        for r in rows:
            for f in ("weight", "mu", "var", "loglik"):
                assert r[f] is not None and not math.isnan(r[f]), (f, r)
        ws = sorted(r["weight"] for r in rows)
        assert ws[0] == pytest.approx(0.0, abs=1e-12)
        assert ws[1] == pytest.approx(0.5, rel=1e-9)
        assert ws[2] == pytest.approx(0.5, rel=1e-9)
        mus = sorted(r["mu"] for r in rows)
        assert mus[0] == pytest.approx(0.0, abs=1e-3)
        assert mus[2] == pytest.approx(1e12, rel=1e-9)
