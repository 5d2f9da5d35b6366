"""Kaplan-Meier: textbook example, censoring semantics, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.survival import (
    kaplan_meier,
    median_survival,
    user_lifetimes,
)

# The classic 6-MP remission data (Freireich 1963, used in the
# Kaplan-Meier literature everywhere): durations in weeks, '+' means
# censored. 21 subjects.
SIXMP = [
    (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
    (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
    (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0),
]


def _km_ref(data):
    """Driver-side reference implementation."""
    from collections import Counter

    d = Counter(t for t, e in data if e)
    c = Counter(t for t, e in data if not e)
    times = sorted(set(d) | set(c))
    n = len(data)
    out, s = {}, 1.0
    for t in times:
        s *= 1.0 - d[t] / n
        out[t] = (n, d[t], c[t], s)
        n -= d[t] + c[t]
    return out


class TestKaplanMeier:
    def test_sixmp_textbook_curve(self, spark):
        df = spark.createDataFrame(SIXMP, "duration_days long, event int")
        got = {
            r["duration_days"]: r
            for r in kaplan_meier(df).collect()
        }
        ref = _km_ref(SIXMP)
        assert set(got) == set(ref)
        for t, (n, d, c, s) in ref.items():
            r = got[t]
            assert r["n_risk"] == n, t
            assert r["d_events"] == d, t
            assert r["censored"] == c, t
            assert math.isclose(r["survival"], s, rel_tol=1e-12), t
        # the published S(10) for this data is ~0.753
        assert math.isclose(got[10]["survival"], 0.7529, abs_tol=5e-4)

    def test_all_censored_curve_stays_at_one(self, spark):
        df = spark.createDataFrame(
            [(5, 0), (9, 0), (9, 0)], "duration_days long, event int"
        )
        rows = kaplan_meier(df).collect()
        assert all(r["survival"] == 1.0 for r in rows)
        assert all(r["d_events"] == 0 for r in rows)

    def test_no_censoring_matches_ecdf(self, spark):
        data = [(t, 1) for t in [1, 2, 2, 3, 5]]
        df = spark.createDataFrame(data, "duration_days long, event int")
        got = {r["duration_days"]: r["survival"] for r in kaplan_meier(df).collect()}
        # without censoring KM is 1 - ECDF
        assert math.isclose(got[1], 4 / 5)
        assert math.isclose(got[2], 2 / 5)
        assert math.isclose(got[3], 1 / 5)
        assert abs(got[5]) < 1e-15

    def test_keyed_curves_are_independent(self, spark):
        data = [("a", t, e) for t, e in SIXMP] + [("b", 4, 1), ("b", 8, 0)]
        df = spark.createDataFrame(
            data, "seg string, duration_days long, event int"
        )
        rows = kaplan_meier(df, keys=["seg"]).collect()
        a = {r["duration_days"]: r for r in rows if r["seg"] == "a"}
        b = {r["duration_days"]: r for r in rows if r["seg"] == "b"}
        ref = _km_ref(SIXMP)
        assert math.isclose(a[6]["survival"], ref[6][3], rel_tol=1e-12)
        assert math.isclose(b[4]["survival"], 0.5)
        assert b[8]["n_risk"] == 1 and b[8]["censored"] == 1

    def test_median_survival(self, spark):
        df = spark.createDataFrame(SIXMP, "duration_days long, event int")
        km = kaplan_meier(df)
        med = median_survival(km).collect()[0]["median_survival"]
        # published median remission time for 6-MP is 23 weeks
        assert med == 23

    def test_median_null_when_never_reached(self, spark):
        df = spark.createDataFrame(
            [(5, 0), (9, 0)], "duration_days long, event int"
        )
        med = median_survival(kaplan_meier(df)).collect()[0]["median_survival"]
        assert med is None


class TestUserLifetimes:
    def test_duration_and_censoring(self, spark):
        rows = [
            # user 1: active days 0..10, obs end day 30 -> churned
            (1, "2024-01-01 00:00:00"), (1, "2024-01-11 00:00:00"),
            # user 2: active through day 28 -> within 7d gap, censored
            (2, "2024-01-05 12:00:00"), (2, "2024-01-29 00:00:00"),
            # user 3: single event long ago -> duration 0, churned
            (3, "2024-01-02 00:00:00"),
            # obs-end anchor
            (4, "2024-01-31 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.to_timestamp("ts").alias("ts")
        )
        lt = {r["user_id"]: r for r in user_lifetimes(df).collect()}
        assert lt[1]["duration_days"] == 10 and lt[1]["event"] == 1
        assert lt[2]["duration_days"] == 23 and lt[2]["event"] == 0
        assert lt[3]["duration_days"] == 0 and lt[3]["event"] == 1
        assert lt[4]["event"] == 0  # defines obs end, still "active"

    def test_negative_gap_raises(self, spark):
        df = spark.createDataFrame([(1, "2024-01-01")], "user_id long, ts string")
        with pytest.raises(ValueError, match="churn_gap_days"):
            user_lifetimes(df, churn_gap_days=-1)


class TestPlan:
    def test_keyed_km_single_window_exchange_chain(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1), ("a", 2, 0), ("b", 1, 1)],
            "seg string, duration_days long, event int",
        )
        plan = (
            kaplan_meier(df, keys=["seg"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # groupBy + the two same-keyed windows: no Python, bounded exchanges
        assert "Python" not in plan and "ArrowEval" not in plan
        assert plan.count("Exchange") <= 3, plan


# ---------------------------------------------------------------------------
# Cox proportional hazards
# ---------------------------------------------------------------------------


def _cox_ref(rows, k, iters=4):
    """Driver-side Breslow Newton-Raphson mirroring the engine."""
    import numpy as np

    w = np.zeros(k)
    X = np.array([r[2] for r in rows])
    T = np.array([r[0] for r in rows], dtype=float)
    D = np.array([r[1] for r in rows])
    for _ in range(iters):
        eta = X @ w
        ex = np.exp(eta)
        g = np.zeros(k)
        H = np.zeros((k, k))
        for i in range(len(rows)):
            if D[i] != 1:
                continue
            risk = T >= T[i]
            s0 = ex[risk].sum()
            s1 = (X[risk].T * ex[risk]).sum(axis=1)
            s2 = (X[risk].T * ex[risk]) @ X[risk]
            g += X[i] - s1 / s0
            H += s2 / s0 - np.outer(s1 / s0, s1 / s0)
        w = w + np.linalg.solve(H, g)
    return list(w)


class TestCoxPH:
    def _frame(self, spark, rows, k):
        data = [
            (float(t), int(d), *[float(v) for v in xs]) for t, d, xs in rows
        ]
        cols = ", ".join(f"x{i} double" for i in range(k))
        return spark.createDataFrame(
            data, f"duration_days double, event int, {cols}"
        )

    def test_matches_reference_two_covariates(self, spark):
        from temporal_retriever_spark.survival import cox_ph

        # deterministic data with ties and censoring
        rows = []
        for i in range(60):
            x0 = (i % 10) / 10.0
            x1 = ((i * 7) % 5) / 5.0
            t = 1 + (i * 13) % 20  # many tied event times
            d = 1 if (i * 11) % 3 != 0 else 0
            rows.append((t, d, (x0, x1)))
        df = self._frame(spark, rows, 2)
        got = cox_ph(df, ["x0", "x1"], iterations=4)
        want = _cox_ref(rows, 2, iters=4)
        for a, b in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9), (got, want)

    def test_positive_hazard_covariate(self, spark):
        from temporal_retriever_spark.survival import cox_ph

        # high x -> early event times: hazard increases with x
        rows = []
        for i in range(80):
            x = (i % 8) / 8.0
            t = 30 - 25 * x + (i * 7) % 3
            rows.append((t, 1, (x,)))
        df = self._frame(spark, rows, 1)
        (coef,) = cox_ph(df, ["x0"], iterations=5)
        assert coef > 1.0

    def test_stratified_risk_sets(self, spark):
        from temporal_retriever_spark.survival import cox_ph

        # two strata with opposite time scales; the pooled fit differs
        rows = []
        for i in range(40):
            x = (i % 5) / 5.0
            s = "a" if i % 2 == 0 else "b"
            base = 10 if s == "a" else 100
            t = base - 8 * x + (i % 3)
            rows.append((t, 1, x, s))
        df = spark.createDataFrame(
            [(float(t), 1, float(x), s) for t, d, x, s in rows],
            "duration_days double, event int, x0 double, stratum string",
        )
        pooled = cox_ph(df, ["x0"], iterations=4)
        strat = cox_ph(df, ["x0"], strata_cols=["stratum"], iterations=4)
        # stratification changes the risk sets, so the estimates differ,
        # and the within-stratum hazard effect stays positive
        assert abs(strat[0] - pooled[0]) > 1e-6
        assert strat[0] > 0

    def test_validation(self, spark):
        from temporal_retriever_spark.survival import cox_ph

        df = spark.createDataFrame(
            [(1.0, 1, 0.5)], "duration_days double, event int, x0 double"
        )
        with pytest.raises(ValueError, match="covariate_cols"):
            cox_ph(df, [])
        with pytest.raises(ValueError, match="iterations"):
            cox_ph(df, ["x0"], iterations=0)
        with pytest.raises(ValueError, match="empty"):
            cox_ph(df.filter("event = 0"), ["x0"])


from temporal_retriever_spark.survival import logrank_test


def _naive_logrank(rows):
    """Textbook hypergeometric-moments log-rank from
    (group, duration, event) tuples; returns (O_a, E_a, V, chi2)."""
    times = sorted({t for _, t, e in rows if e})
    O = E = V = 0.0
    for t in times:
        n = sum(1 for _, u, _e in rows if u >= t)
        na = sum(1 for g, u, _e in rows if u >= t and g == "a")
        d = sum(1 for _, u, e in rows if u == t and e)
        da = sum(1 for g, u, e in rows if u == t and e and g == "a")
        O += da
        E += d * na / n
        if n > 1:
            V += d * (na / n) * (1 - na / n) * (n - d) / (n - 1)
    return O, E, V, (O - E) ** 2 / V


class TestLogRank:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp string, duration_days int, event int"
        )

    def test_matches_textbook_with_ties_and_censoring(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            ("a", rng.randint(1, 30), int(rng.random() < 0.7))
            for _ in range(120)
        ] + [
            ("b", rng.randint(5, 40), int(rng.random() < 0.6))
            for _ in range(100)
        ]
        got = logrank_test(
            self._df(spark, rows), group_col="grp", group_a="a", group_b="b"
        ).collect()[0]
        O, E, V, chi2 = _naive_logrank(rows)
        assert got["n_a"] == 120 and got["n_b"] == 100
        assert got["observed_a"] == int(O)
        assert math.isclose(got["expected_a"], E, rel_tol=1e-9)
        assert math.isclose(got["chi2_stat"], chi2, rel_tol=1e-9)
        # dof-1 chi2 sf reference
        from temporal_retriever_spark.stats import chi2_sf

        assert math.isclose(got["p_value"], chi2_sf(chi2, 1), abs_tol=2e-7)

    def test_identical_curves_high_p(self, spark):
        rows = [(g, t, 1) for g in ("a", "b") for t in range(1, 40)]
        got = logrank_test(
            self._df(spark, rows), group_col="grp", group_a="a", group_b="b"
        ).collect()[0]
        # perfectly matched samples: O == E exactly
        assert math.isclose(got["chi2_stat"], 0.0, abs_tol=1e-12)
        assert got["p_value"] > 0.999

    def test_separated_curves_low_p(self, spark):
        rows = [("a", t, 1) for t in range(1, 31)] + [
            ("b", t + 100, 1) for t in range(1, 31)
        ]
        got = logrank_test(
            self._df(spark, rows), group_col="grp", group_a="a", group_b="b"
        ).collect()[0]
        assert got["p_value"] < 1e-9

    def test_no_events_null(self, spark):
        rows = [("a", 5, 0), ("a", 7, 0), ("b", 6, 0), ("b", 9, 0)]
        got = logrank_test(
            self._df(spark, rows), group_col="grp", group_a="a", group_b="b"
        ).collect()[0]
        assert got["chi2_stat"] is None and got["p_value"] is None

    def test_keyed(self, spark):
        rows = [
            (k, g, t, 1)
            for k in (1, 2)
            for g in ("a", "b")
            for t in range(1, 20)
        ]
        df = spark.createDataFrame(
            rows, "k int, grp string, duration_days int, event int"
        )
        got = logrank_test(
            df, group_col="grp", group_a="a", group_b="b", keys=["k"]
        ).collect()
        assert {r["k"] for r in got} == {1, 2}
        assert all(math.isclose(r["chi2_stat"], 0.0, abs_tol=1e-12) for r in got)


from temporal_retriever_spark.survival import rmst


class TestRmst:
    def test_matches_hand_integration(self, spark):
        # events at t=2 (S->0.75), t=5 (S->0.5), censor at 8
        rows = [("s", 2, 1), ("s", 2, 0), ("s", 5, 1), ("s", 8, 0)]
        df = spark.createDataFrame(rows, "k string, duration_days int, event int")
        km = kaplan_meier(df, keys=["k"])
        got = rmst(km, tau=10.0, keys=["k"]).collect()[0]
        # S=1 on [0,2), 0.75*(1-1/4=?) hand-compute from km rows
        km_rows = sorted(km.collect(), key=lambda r: r["duration_days"])
        s = {r["duration_days"]: r["survival"] for r in km_rows}
        expected = 2.0  # [0,2) at S=1
        expected += s[2] * (5 - 2)
        expected += s[5] * (8 - 5)
        expected += s[8] * (10 - 8)
        assert got["rmst"] == pytest.approx(expected, rel=1e-12)

    def test_tau_clamps(self, spark):
        rows = [("s", 2, 1), ("s", 50, 1)]
        df = spark.createDataFrame(rows, "k string, duration_days int, event int")
        km = kaplan_meier(df, keys=["k"])
        got = rmst(km, tau=10.0, keys=["k"]).collect()[0]
        # [0,2) at 1, [2,10) at 0.5; the t=50 step is beyond tau
        assert got["rmst"] == pytest.approx(2.0 + 0.5 * 8.0)
        # tau before the first event: curve is 1 throughout
        got2 = rmst(km, tau=1.5, keys=["k"]).collect()[0]
        assert got2["rmst"] == pytest.approx(1.5)

    def test_no_events_full_tau_and_validation(self, spark):
        rows = [("s", 9, 0), ("s", 12, 0)]
        df = spark.createDataFrame(rows, "k string, duration_days int, event int")
        km = kaplan_meier(df, keys=["k"])
        got = rmst(km, tau=8.0, keys=["k"]).collect()[0]
        assert got["rmst"] == pytest.approx(8.0)  # S=1 everywhere under tau
        import pytest as _pt

        with _pt.raises(ValueError):
            rmst(km, tau=0.0)
