"""As-of join and sessionization vs DuckDB's native ASOF JOIN /
gaps-and-islands SQL, plus boundary-semantics unit tests."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.asof import asof_join, session_stats, sessionize
from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def daily(tables):
    ev = tables["events"].select(
        "event_type", F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    )
    return ev.groupBy("event_type", F.date_trunc("day", "ds").alias("ds")).agg(
        F.sum("y").alias("y")
    )


DAILY_SQL = """
    SELECT event_type, date_trunc('day', ts) AS ds, SUM(value) AS y
    FROM events GROUP BY 1, 2
"""


def test_asof_join_matches_duckdb_asof(daily, duck):
    clicks = daily.filter(F.col("event_type") == "click").drop("event_type")
    views = (
        daily.filter(F.col("event_type") == "view").drop("event_type")
        .filter(F.dayofmonth("ds") % 2 == 0)
        .withColumnRenamed("y", "v")
    )
    got = asof_join(
        clicks, views, ts_col="ds", value_cols=("v",),
        tolerance="5 days", keep_match_ts=True,
    ).select(
        "ds", F.round("y", 6).alias("y"), F.round("v", 6).alias("v"), "matched_ts"
    )
    assert_matches_oracle(got, duck, f"""
        WITH clicks AS (SELECT ds, y FROM ({DAILY_SQL}) WHERE event_type = 'click'),
        views AS (SELECT ds, y AS v FROM ({DAILY_SQL})
                  WHERE event_type = 'view' AND day(ds) % 2 = 0)
        SELECT c.ds, ROUND(c.y, 6) AS y,
          CASE WHEN v.ds >= c.ds - INTERVAL 5 DAY THEN ROUND(v.v, 6) END AS v,
          CASE WHEN v.ds >= c.ds - INTERVAL 5 DAY THEN v.ds END AS matched_ts
        FROM clicks c ASOF LEFT JOIN views v ON c.ds >= v.ds
    """)


def test_asof_join_keyed_matches_duckdb(tables, duck):
    ev = tables["events"].select(
        "event_type", F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    )
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ds").alias("ds")).agg(
        F.sum("y").alias("y")
    )
    # right side: every 6th hour per key -> genuine as-of lookups
    right = hourly.filter(F.hour("ds") % 6 == 0).withColumnRenamed("y", "ref")
    got = asof_join(
        hourly, right, on=("event_type",), ts_col="ds", value_cols=("ref",)
    ).select("event_type", "ds", F.round("y", 6).alias("y"),
             F.round("ref", 6).alias("ref"))
    assert_matches_oracle(got, duck, f"""
        WITH h AS (SELECT event_type, date_trunc('hour', ts) AS ds, SUM(value) AS y
                   FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, ds, y AS ref FROM h WHERE hour(ds) % 6 = 0)
        SELECT h.event_type, h.ds, ROUND(h.y, 6) AS y, ROUND(r.ref, 6) AS ref
        FROM h ASOF LEFT JOIN r ON h.event_type = r.event_type AND h.ds >= r.ds
    """)


def test_asof_exact_match_and_ties(spark):
    left = spark.createDataFrame(
        [("k", 10), ("k", 5)], "k string, t int"
    ).select("k", F.timestamp_seconds("t").alias("ds"))
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 7, 2.0), ("k", 11, 9.0)], "k string, t int, v double"
    ).select("k", F.timestamp_seconds("t").alias("ds"), "v")
    rows = {
        r["ds"].second: r["v"]
        for r in asof_join(left, right, on=("k",), value_cols=("v",)).collect()
    }
    # exact-timestamp right row matches (allow_exact_matches); later rows don't
    assert rows[5] == 1.0
    assert rows[10] == 2.0


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame([("k", 1)], "k string, t int").select(
        "k", F.timestamp_seconds("t").alias("ds")
    )
    right = spark.createDataFrame([("k", 2, 1.0)], "k string, t int, v double").select(
        "k", F.timestamp_seconds("t").alias("ds"), "v"
    )
    out = asof_join(left, right, on=("k",), value_cols=("v",)).collect()
    assert out[0]["v"] is None


def test_sessionize_and_stats_match_oracle(tables, duck):
    ev = tables["events"].select(
        "event_type", F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    ).filter(F.col("event_type").isin("click", "view"))
    got = session_stats(
        ev, gap="2 hours", series_cols=("event_type",), value_col="y"
    ).select(
        "event_type", "session_seq", "session_start", "session_end",
        F.round("duration_sec", 6).alias("duration_sec"), "n_events",
        F.round("session_value", 6).alias("session_value"),
    )
    assert_matches_oracle(got, duck, """
        WITH e AS (SELECT event_type, ts AS ds, value AS y FROM events
                   WHERE event_type IN ('click', 'view')),
        m AS (SELECT event_type, ds, y,
            CASE WHEN lag(ds) OVER w IS NULL
                   OR ds >= lag(ds) OVER w + INTERVAL 2 HOUR
                 THEN 1 ELSE 0 END AS nw
          FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ds)),
        s AS (SELECT event_type, ds, y,
            SUM(nw) OVER (PARTITION BY event_type ORDER BY ds
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
          FROM m)
        SELECT event_type, session_seq, MIN(ds) AS session_start,
               MAX(ds) AS session_end,
               ROUND(epoch(MAX(ds)) - epoch(MIN(ds)), 6) AS duration_sec,
               COUNT(*) AS n_events, ROUND(SUM(y), 6) AS session_value
        FROM s GROUP BY 1, 2
    """)


def test_session_boundary_matches_session_window_semantics(spark):
    # events at t=0 and t=gap exactly -> two sessions (half-open windows)
    df = spark.createDataFrame(
        [("k", 0), ("k", 1800), ("k", 3600 + 1800)], "k string, t int"
    ).select(F.lit("k").alias("series_id"), F.timestamp_seconds("t").alias("ds"))
    out = sessionize(df, gap="30 minutes", ts_col="ds").orderBy("ds").collect()
    assert [r["session_seq"] for r in out] == [1, 2, 3]
    # within-gap events extend the session
    df2 = spark.createDataFrame(
        [("k", 0), ("k", 1799), ("k", 3000)], "k string, t int"
    ).select(F.lit("k").alias("series_id"), F.timestamp_seconds("t").alias("ds"))
    out2 = sessionize(df2, gap="30 minutes", ts_col="ds").orderBy("ds").collect()
    assert [r["session_seq"] for r in out2] == [1, 1, 1]


def test_asof_forward_matches_duckdb(daily, duck):
    clicks = daily.filter(F.col("event_type") == "click").drop("event_type")
    views = (
        daily.filter(F.col("event_type") == "view").drop("event_type")
        .filter(F.dayofmonth("ds") % 2 == 0)
        .withColumnRenamed("y", "v")
    )
    got = asof_join(
        clicks, views, ts_col="ds", value_cols=("v",),
        direction="forward", keep_match_ts=True,
    ).select("ds", F.round("v", 6).alias("v"),
             F.col("matched_ts").cast("string").alias("matched_ts"))
    # DuckDB ASOF with l.ts <= r.ts == forward (closest later row)
    assert_matches_oracle(got, duck, f"""
        WITH clicks AS (SELECT ds, y FROM ({DAILY_SQL}) WHERE event_type = 'click'),
        views AS (SELECT ds, y AS v FROM ({DAILY_SQL})
                  WHERE event_type = 'view' AND day(ds) % 2 = 0)
        SELECT c.ds, ROUND(v.v, 6) AS v,
               CAST(CAST(v.ds AS TIMESTAMP) AS VARCHAR) AS matched_ts
        FROM clicks c ASOF LEFT JOIN views v ON c.ds <= v.ds
    """)


def test_asof_nearest_and_directions(spark):
    left = spark.createDataFrame(
        [("k", 10), ("k", 13), ("k", 20)], "k string, t int"
    ).select("k", F.timestamp_seconds("t").alias("ds"))
    right = spark.createDataFrame(
        [("k", 8, 1.0), ("k", 14, 2.0), ("k", 30, 3.0)],
        "k string, t int, v double",
    ).select("k", F.timestamp_seconds("t").alias("ds"), "v")

    def run(direction, **kw):
        return {
            r["ds"].second + 60 * r["ds"].minute: r["v"]
            for r in asof_join(
                left, right, on=("k",), value_cols=("v",),
                direction=direction, **kw,
            ).collect()
        }

    assert run("backward") == {10: 1.0, 13: 1.0, 20: 2.0}
    assert run("forward") == {10: 2.0, 13: 2.0, 20: 3.0}
    # nearest: 10 -> 8 (d2) vs 14 (d4) = 1.0; 13 -> 14 (d1) = 2.0;
    # 20 -> 14 (d6) vs 30 (d10) = 2.0
    assert run("nearest") == {10: 1.0, 13: 2.0, 20: 2.0}
    # tolerance prunes far matches per direction
    assert run("nearest", tolerance="5 seconds") == {10: 1.0, 13: 2.0, 20: None}
    with pytest.raises(ValueError):
        asof_join(left, right, on=("k",), direction="sideways")


def test_asof_forward_exact_match_wins(spark):
    left = spark.createDataFrame([("k", 5)], "k string, t int").select(
        "k", F.timestamp_seconds("t").alias("ds")
    )
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 7, 2.0)], "k string, t int, v double"
    ).select("k", F.timestamp_seconds("t").alias("ds"), "v")
    out = asof_join(
        left, right, on=("k",), value_cols=("v",), direction="forward"
    ).collect()
    assert out[0]["v"] == 1.0  # allow_exact_matches


def test_interval_join_basic_and_bounds(spark):
    from temporal_retriever_spark.asof import interval_join

    ev = spark.createDataFrame(
        [
            ("k", datetime.datetime(2024, 1, 1, 0, 0)),   # == start
            ("k", datetime.datetime(2024, 1, 1, 12, 0)),  # inside
            ("k", datetime.datetime(2024, 1, 2, 0, 0)),   # == end
            ("k", datetime.datetime(2024, 1, 5, 0, 0)),   # outside
        ],
        "key string, ds timestamp",
    )
    iv = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2), "w1")],
        "key string, start timestamp, end timestamp, win string",
    )
    got = interval_join(ev, iv, on=["key"]).orderBy("ds").collect()
    # [start, end): start matches, end does not
    assert [str(r["ds"]) for r in got] == [
        "2024-01-01 00:00:00", "2024-01-01 12:00:00"
    ]
    both = interval_join(ev, iv, on=["key"], closed="both").count()
    assert both == 3
    neither = interval_join(ev, iv, on=["key"], closed="neither").count()
    assert neither == 1


def test_interval_join_spans_many_buckets(spark):
    """An interval wider than the bucket must be exploded into every
    cell it overlaps, and each (event, interval) pair appears ONCE."""
    from temporal_retriever_spark.asof import interval_join

    ev = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 10, 3, 0))],
        "key string, ds timestamp",
    )
    iv = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 2, 1), "big")],
        "key string, start timestamp, end timestamp, win string",
    )
    got = interval_join(ev, iv, on=["key"], bucket="1 day").collect()
    assert len(got) == 1 and got[0]["win"] == "big"


def test_interval_join_left_keeps_unmatched(spark):
    from temporal_retriever_spark.asof import interval_join

    ev = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1, 12)), ("k", datetime.datetime(2024, 3, 1))],
        "key string, ds timestamp",
    )
    iv = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2), "w1")],
        "key string, start timestamp, end timestamp, win string",
    )
    got = {
        str(r["ds"]): r["win"]
        for r in interval_join(ev, iv, on=["key"], how="left").collect()
    }
    assert got["2024-01-01 12:00:00"] == "w1"
    assert got["2024-03-01 00:00:00"] is None


def test_interval_join_no_nested_loop_in_plan(spark):
    from temporal_retriever_spark.asof import interval_join

    ev = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1, 12))], "key string, ds timestamp"
    )
    iv = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2), "w")],
        "key string, start timestamp, end timestamp, win string",
    )
    plan = (
        interval_join(ev, iv, on=["key"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_validation(spark):
    from temporal_retriever_spark.asof import interval_join

    ev = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), 1.0)],
        "key string, ds timestamp, win double",
    )
    iv = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2), "w")],
        "key string, start timestamp, end timestamp, win string",
    )
    with pytest.raises(ValueError, match="collide"):
        interval_join(ev, iv, on=["key"])
    with pytest.raises(ValueError, match="closed"):
        interval_join(ev.drop("win"), iv, on=["key"], closed="open")
