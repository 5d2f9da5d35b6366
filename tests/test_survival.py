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
