"""Funnel analysis: hand-built walks, greedy-earliest semantics,
window bound, summary rates."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.funnel import funnel, funnel_summary


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h, m), t) for u, d, h, m, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


STEPS = ["click", "view", "purchase"]


def test_full_and_partial_walks(spark):
    rows = [
        # user 1: full funnel
        (1, 1, 9, 0, "click"),
        (1, 1, 10, 0, "view"),
        (1, 1, 11, 30, "purchase"),
        # user 2: stops after view
        (2, 1, 9, 0, "click"),
        (2, 1, 9, 30, "view"),
        # user 3: purchase BEFORE click -> only step 1
        (3, 1, 8, 0, "purchase"),
        (3, 1, 9, 0, "click"),
        # user 4: only unrelated events -> excluded entirely
        (4, 1, 9, 0, "signup"),
        # user 5: view first, never clicks -> steps_completed 0
        (5, 1, 9, 0, "view"),
    ]
    got = {r["user_id"]: r for r in funnel(_df(spark, rows), STEPS).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["steps_completed"] == 3
    assert got[1]["seconds_to_convert"] == 2.5 * 3600
    assert got[2]["steps_completed"] == 2
    assert got[2]["seconds_to_convert"] is None
    assert got[3]["steps_completed"] == 1
    assert got[5]["steps_completed"] == 0
    assert got[5]["t_1"] is None


def test_greedy_earliest_anchor(spark):
    """t1 anchors at the EARLIEST click even when a later click would
    convert faster — the documented greedy semantics."""
    rows = [
        (1, 1, 9, 0, "click"),
        (1, 2, 9, 0, "click"),
        (1, 2, 9, 30, "view"),
        (1, 2, 10, 0, "purchase"),
    ]
    got = funnel(_df(spark, rows), STEPS).first()
    assert str(got["t_1"]) == "2024-01-01 09:00:00"
    assert got["steps_completed"] == 3  # later events still within walk


def test_within_bound(spark):
    rows = [
        (1, 1, 9, 0, "click"),
        (1, 3, 9, 0, "view"),       # 2 days later -> outside 1 day
        (1, 3, 10, 0, "purchase"),
        (2, 1, 9, 0, "click"),
        (2, 1, 20, 0, "view"),      # same day -> inside
        (2, 1, 21, 0, "purchase"),
    ]
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(_df(spark, rows), STEPS, within="1 day").collect()
    }
    assert got == {1: 1, 2: 3}


def test_strict_ordering_same_timestamp(spark):
    rows = [
        (1, 1, 9, 0, "click"),
        (1, 1, 9, 0, "view"),  # same instant: does NOT advance
        (1, 1, 10, 0, "view"),
    ]
    got = funnel(_df(spark, rows), STEPS).first()
    assert got["steps_completed"] == 2
    assert str(got["t_2"]) == "2024-01-01 10:00:00"


def test_summary_rates(spark):
    rows = [
        (1, 1, 9, 0, "click"), (1, 1, 10, 0, "view"), (1, 1, 11, 0, "purchase"),
        (2, 1, 9, 0, "click"), (2, 1, 10, 0, "view"),
        (3, 1, 9, 0, "click"),
        (4, 1, 9, 0, "click"),
    ]
    got = {
        r["step"]: (r["step_name"], r["n_users"], r["conversion_rate"])
        for r in funnel_summary(_df(spark, rows), STEPS).collect()
    }
    assert got[1] == ("click", 4, 1.0)
    assert got[2] == ("view", 2, 0.5)
    assert got[3] == ("purchase", 1, 0.25)


def test_validation(spark):
    df = _df(spark, [(1, 1, 9, 0, "click")])
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, ["click"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(df, ["click", "click"])


class TestCohortRetention:
    def test_weekly_matrix(self, spark):
        from temporal_retriever_spark.funnel import cohort_retention

        rows = [
            # cohort week of Jan 1 (Mon): users 1, 2
            (1, datetime(2024, 1, 2, 10), "click"),
            (1, datetime(2024, 1, 9, 10), "click"),   # back week 1
            (1, datetime(2024, 1, 23, 10), "view"),   # back week 3
            (2, datetime(2024, 1, 3, 10), "view"),
            # cohort week of Jan 8: user 3
            (3, datetime(2024, 1, 10, 10), "click"),
            (3, datetime(2024, 1, 17, 10), "click"),  # back week 1
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = {
            (str(r["cohort"]), r["period"]): (
                r["n_active"], r["n_cohort"], r["retention"]
            )
            for r in cohort_retention(df, grain="W").collect()
        }
        # week-end Sunday labels: Jan 1 week -> 2024-01-07
        assert got[("2024-01-07", 0)] == (2, 2, 1.0)
        assert got[("2024-01-07", 1)] == (1, 2, 0.5)
        assert got[("2024-01-07", 3)] == (1, 2, 0.5)
        assert ("2024-01-07", 2) not in got
        assert got[("2024-01-14", 0)] == (1, 1, 1.0)
        assert got[("2024-01-14", 1)] == (1, 1, 1.0)

    def test_multiple_events_one_bucket_count_once(self, spark):
        from temporal_retriever_spark.funnel import cohort_retention

        rows = [
            (1, datetime(2024, 1, 2, 9), "click"),
            (1, datetime(2024, 1, 2, 10), "click"),
            (1, datetime(2024, 1, 2, 11), "view"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = cohort_retention(df, grain="D").collect()
        assert len(got) == 1
        assert got[0]["n_active"] == 1 and got[0]["period"] == 0

    def test_max_periods(self, spark):
        from temporal_retriever_spark.funnel import cohort_retention

        rows = [
            (1, datetime(2024, 1, 1, 9), "click"),
            (1, datetime(2024, 3, 1, 9), "click"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = cohort_retention(df, grain="D", max_periods=7).collect()
        assert {r["period"] for r in got} == {0}


def test_transition_matrix(spark):
    from temporal_retriever_spark.funnel import transition_matrix

    rows = [
        (1, datetime(2024, 1, 1, 9), "a"),
        (1, datetime(2024, 1, 1, 10), "b"),
        (1, datetime(2024, 1, 1, 11), "a"),
        (2, datetime(2024, 1, 1, 9), "a"),
        (2, datetime(2024, 1, 1, 10), "b"),
        (2, datetime(2024, 1, 1, 11), "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_step"], r["to_step"]): (r["n"], r["p"])
        for r in transition_matrix(df).collect()
    }
    # pairs: u1: a->b, b->a; u2: a->b, b->b
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "b")] == (1, 0.5)
    raw = transition_matrix(df, normalize=False).columns
    assert "p" not in raw


from temporal_retriever_spark.funnel import attribution


class TestAttribution:
    def _events(self, spark):
        import datetime

        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

        def at(mins):
            return t0 + datetime.timedelta(minutes=mins)

        rows = [
            # u1: email (t-120m) -> ad (t-30m) -> buy
            ("u1", at(0), "email"), ("u1", at(90), "ad"), ("u1", at(120), "buy"),
            # u2: ad only, inside window
            ("u2", at(10), "ad"), ("u2", at(40), "buy"),
            # u3: direct (no touches)
            ("u3", at(50), "buy"),
            # u4: touch OUTSIDE the lookback window -> direct
            ("u4", at(0), "email"), ("u4", at(600), "buy"),
        ]
        return spark.createDataFrame(rows, "user_id string, ts timestamp, channel string")

    def _by_channel(self, rows):
        return {r["channel"]: r for r in rows}

    def test_last_touch(self, spark):
        got = self._by_channel(
            attribution(
                self._events(spark), conversion="buy", channel_col="channel",
                model="last_touch", lookback_seconds=3 * 3600,
            ).collect()
        )
        assert got["ad"]["credit"] == pytest.approx(2.0)  # u1 last + u2
        assert "email" not in got
        assert got["(direct)"]["credit"] == pytest.approx(2.0)  # u3 + u4
        assert sum(r["credit"] for r in got.values()) == pytest.approx(4.0)

    def test_first_touch_and_linear(self, spark):
        ev = self._events(spark)
        first = self._by_channel(
            attribution(ev, conversion="buy", channel_col="channel",
                        model="first_touch", lookback_seconds=3 * 3600).collect()
        )
        assert first["email"]["credit"] == pytest.approx(1.0)  # u1 first
        assert first["ad"]["credit"] == pytest.approx(1.0)  # u2
        lin = self._by_channel(
            attribution(ev, conversion="buy", channel_col="channel",
                        model="linear", lookback_seconds=3 * 3600).collect()
        )
        assert lin["email"]["credit"] == pytest.approx(0.5)
        assert lin["ad"]["credit"] == pytest.approx(1.5)
        assert sum(r["credit"] for r in lin.values()) == pytest.approx(4.0)

    def test_time_decay_prefers_recent(self, spark):
        got = self._by_channel(
            attribution(
                self._events(spark), conversion="buy", channel_col="channel",
                model="time_decay", lookback_seconds=3 * 3600,
                halflife_seconds=1800.0,
            ).collect()
        )
        # u1: ad is 30min old (w=2^-1), email 120min (w=2^-4):
        # ad share = .5/(.5+.0625) = 8/9
        assert got["ad"]["credit"] == pytest.approx(8 / 9 + 1.0)
        assert got["email"]["credit"] == pytest.approx(1 / 9)
        assert sum(r["credit"] for r in got.values()) == pytest.approx(4.0)

    def test_validation(self, spark):
        ev = self._events(spark)
        with pytest.raises(ValueError):
            attribution(ev, conversion="buy", channel_col="channel", model="x")
        with pytest.raises(ValueError):
            attribution(ev, conversion="buy", channel_col="channel",
                        lookback_seconds=0)
        with pytest.raises(ValueError):
            attribution(ev, conversion="buy", channel_col="channel",
                        model="time_decay", halflife_seconds=0)


from temporal_retriever_spark.funnel import path_ngrams


class TestPathNgrams:
    def test_counts_and_users(self, spark):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)

        def at(m):
            return t0 + datetime.timedelta(minutes=m)

        rows = [
            ("u1", at(1), "a"), ("u1", at(2), "b"), ("u1", at(3), "c"),
            ("u1", at(4), "b"), ("u1", at(5), "c"),
            ("u2", at(1), "a"), ("u2", at(2), "b"), ("u2", at(3), "c"),
            ("u3", at(1), "x"),  # too short for any 3-gram
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
        got = {r["path"]: r for r in path_ngrams(df, n=3).collect()}
        assert got["a>b>c"]["occurrences"] == 2
        assert got["a>b>c"]["users"] == 2
        assert got["b>c>b"]["occurrences"] == 1
        assert got["c>b>c"]["occurrences"] == 1
        assert len(got) == 3

    def test_bigrams_match_transitions(self, spark):
        import datetime

        from temporal_retriever_spark.funnel import transition_matrix

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        import random

        rng = random.Random(4)
        for u in range(20):
            for m in range(10):
                rows.append((f"u{u}", t0 + datetime.timedelta(minutes=m),
                             rng.choice("abc")))
        df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
        bi = {tuple(r["path"].split(">")): r["occurrences"]
              for r in path_ngrams(df, n=2).collect()}
        tm = {(r["from_step"], r["to_step"]): r["n"]
              for r in transition_matrix(df).collect()}
        assert bi == tm

    def test_tie_order_deterministic_and_validation(self, spark):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = [("u", t0, "b"), ("u", t0, "a"), ("u", t0 + datetime.timedelta(minutes=1), "c")]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
        got = {r["path"] for r in path_ngrams(df, n=2).collect()}
        assert got == {"a>b", "b>c"}
        with pytest.raises(ValueError):
            path_ngrams(df, n=1)
