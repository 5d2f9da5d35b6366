from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from temporal_retriever_spark.funnel import markov_stationary
from temporal_retriever_spark.inference import iv_2sls
from temporal_retriever_spark.llm.text import zipf_fit


class TestMarkovStationary:
    def _df(self, spark, paths):
        rows = []
        for u, seq in enumerate(paths):
            for i, s in enumerate(seq):
                rows.append(
                    (f"u{u}", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), s)
                )
        return spark.createDataFrame(
            rows, "user_id string, ts timestamp, event_type string"
        )

    def test_matches_numpy_power_iteration(self, spark):
        paths = [
            list("ABABAB"), list("ABCABC"), list("CCCA"), list("BACA"),
            list("AABBA"),
        ]
        got = {
            r["state"]: r["pi"]
            for r in markov_stationary(self._df(spark, paths), rounds=20).collect()
        }
        # numpy replay: transition counts -> row-normalized P, dangling self-loop
        from collections import Counter

        cnt = Counter()
        states = sorted({s for p in paths for s in p})
        for p in paths:
            for a, b in zip(p, p[1:]):
                cnt[(a, b)] += 1
        k = len(states)
        P = np.zeros((k, k))
        for (a, b), c in cnt.items():
            P[states.index(a), states.index(b)] = c
        rows = P.sum(axis=1)
        for i in range(k):
            if rows[i] > 0:
                P[i] /= rows[i]
            else:
                P[i, i] = 1.0
        pi = np.full(k, 1.0 / k)
        for _ in range(20):
            pi = pi @ P
        for i, s in enumerate(states):
            assert got[s] == pytest.approx(pi[i], rel=1e-9), s

    def test_mass_conserved_and_dangling(self, spark):
        # 'Z' only appears as a final step -> dangling, keeps mass
        paths = [list("AZ"), list("AZ"), list("AA")]
        rows = markov_stationary(self._df(spark, paths), rounds=10).collect()
        total = sum(r["pi"] for r in rows)
        assert total == pytest.approx(1.0, rel=1e-12)
        z = [r for r in rows if r["state"] == "Z"][0]
        assert z["n_out"] == 0 and z["pi"] > 0.5  # absorbing state soaks mass

    def test_validation(self, spark):
        df = self._df(spark, [list("AB")])
        with pytest.raises(ValueError):
            markov_stationary(df, rounds=0)


class TestMarkovAbsorption:
    _df = TestMarkovStationary._df

    def test_matches_numpy_fundamental_matrix(self, spark):
        from temporal_retriever_spark.funnel import markov_absorption

        paths = [
            list("ABABD"), list("ABCD"), list("ACCD"), list("BACD"),
            list("AABBA"), list("BCD"), list("CABD"),
        ]
        absorb = ["D"]
        got = {
            (r["state"], r["absorb_state"]): r
            for r in markov_absorption(
                self._df(spark, paths), absorb, rounds=60
            ).collect()
        }
        # numpy replay: P from pair counts, Q/R split, truncated
        # Neumann series V = sum_{t<rounds} Q^t, B = V R, t = V 1
        from collections import Counter

        cnt = Counter()
        states = sorted({s for p in paths for s in p})
        for p in paths:
            for a, b in zip(p, p[1:]):
                cnt[(a, b)] += 1
        k = len(states)
        P = np.zeros((k, k))
        for (a, b), c in cnt.items():
            P[states.index(a), states.index(b)] = c
        rows = P.sum(axis=1)
        for i in range(k):
            if rows[i] > 0:
                P[i] /= rows[i]
        tr = [i for i, s in enumerate(states) if s not in absorb]
        ab = [i for i, s in enumerate(states) if s in absorb]
        Q = P[np.ix_(tr, tr)]
        R = P[np.ix_(tr, ab)]
        N = np.linalg.inv(np.eye(len(tr)) - Q)
        B = N @ R
        t = N.sum(axis=1)
        assert set(got) == {
            (states[i], states[a]) for i in tr for a in ab
        }
        for ii, i in enumerate(tr):
            for aa, a in enumerate(ab):
                g = got[(states[i], states[a])]
                assert g["p_absorb"] == pytest.approx(B[ii, aa], rel=1e-6)
                assert g["expected_steps"] == pytest.approx(
                    t[ii], rel=1e-6
                )

    def test_dead_end_transient_leaks_mass(self, spark):
        from temporal_retriever_spark.funnel import markov_absorption

        # Z is a dead-end NOT declared absorbing: journeys that hit Z
        # never absorb, so A's p_absorb sums below 1
        paths = [list("AD"), list("AZ")]
        got = {
            r["state"]: r
            for r in markov_absorption(
                self._df(spark, paths), ["D"], rounds=30
            ).collect()
        }
        assert got["A"]["p_absorb"] == pytest.approx(0.5, rel=1e-9)
        assert got["Z"]["p_absorb"] == 0.0
        assert got["Z"]["expected_steps"] == pytest.approx(1.0)

    def test_validation(self, spark):
        from temporal_retriever_spark.funnel import markov_absorption

        df = self._df(spark, [list("AB")])
        with pytest.raises(ValueError):
            markov_absorption(df, [])
        with pytest.raises(ValueError):
            markov_absorption(df, ["B"], rounds=0)


class TestZipfFit:
    def test_zipfian_corpus_slope_near_minus_one(self, spark):
        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(300)]
        probs = np.array([1.0 / (i + 1) for i in range(300)])
        probs /= probs.sum()
        docs = []
        for _ in range(200):
            words = rng.choice(vocab, size=120, p=probs)
            docs.append((" ".join(words),))
        df = spark.createDataFrame(docs, "text string")
        r = zipf_fit(df, top_n=100).collect()[0]
        assert r["slope"] == pytest.approx(-1.0, abs=0.15)
        assert r["r2"] > 0.97
        assert r["n_tokens"] == 100

    def test_uniform_corpus_flat_slope(self, spark):
        rng = np.random.default_rng(4)
        vocab = [f"w{i}" for i in range(50)]
        docs = [
            (" ".join(rng.choice(vocab, size=80)),) for _ in range(100)
        ]
        df = spark.createDataFrame(docs, "text string")
        r = zipf_fit(df, top_n=50).collect()[0]
        assert abs(r["slope"]) < 0.2

    def test_exact_ols_on_known_counts(self, spark):
        # 'a' x4, 'b' x2, 'c' x1 -> fit ln(count) on ln(rank) by hand
        df = spark.createDataFrame([("a a a a b b c",)], "text string")
        r = zipf_fit(df, top_n=3).collect()[0]
        x = np.log([1.0, 2.0, 3.0])
        y = np.log([4.0, 2.0, 1.0])
        slope, intercept = np.polyfit(x, y, 1)
        assert r["slope"] == pytest.approx(slope, rel=1e-9)
        assert r["intercept"] == pytest.approx(intercept, rel=1e-9)


class TestIv2sls:
    def test_recovers_causal_slope_under_confounding(self, spark):
        rng = np.random.default_rng(5)
        n = 4000
        u = rng.normal(size=n)              # confounder
        z = rng.normal(size=n)              # instrument
        x = 0.8 * z + u + rng.normal(0, 0.5, n)
        y = 2.0 * x - 3.0 * u + rng.normal(0, 0.5, n)  # true beta = 2
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(y, x, z)],
            "y double, x double, z double",
        )
        r = iv_2sls(df, "y", "x", "z").collect()[0]
        # OLS is badly biased downward here; IV recovers 2
        sxy = np.cov(x, y)[0, 1] / np.cov(x, x)[0, 0]
        assert abs(sxy - 2.0) > 0.5
        assert r["beta"] == pytest.approx(2.0, abs=0.15)
        assert r["first_stage_f"] > 100
        assert r["p_value"] < 1e-6

    def test_matches_closed_form(self, spark):
        rng = np.random.default_rng(6)
        n = 300
        z = rng.normal(size=n)
        x = z + rng.normal(size=n)
        y = 1.5 * x + rng.normal(size=n)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(y, x, z)],
            "y double, x double, z double",
        )
        r = iv_2sls(df, "y", "x", "z").collect()[0]
        szy = np.cov(z, y, ddof=0)[0, 1] * n
        szx = np.cov(z, x, ddof=0)[0, 1] * n
        beta = szy / szx
        assert r["beta"] == pytest.approx(beta, rel=1e-9)
        resid = y - (y.mean() - beta * x.mean()) - beta * x
        sigma2 = (resid**2).sum() / (n - 2)
        szz = z.var() * n
        se = np.sqrt(sigma2 * szz / szx**2)
        assert r["se"] == pytest.approx(se, rel=1e-9)

    def test_irrelevant_instrument_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0, 5.0), (2.0, 3.0, 5.0), (3.0, 1.0, 5.0)],
            "y double, x double, z double",
        )
        r = iv_2sls(df, "y", "x", "z").collect()[0]
        assert r["beta"] is None and r["p_value"] is None
