"""GROUPING SETS multi-grain rollup: per-grain equivalence, plan shape
(one exchange), mixed calendar/clock grains, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import (
    bucket_aggregate,
    bucket_aggregate_multi,
)
@pytest.fixture(scope="module")
def events(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumnRenamed("ts", "ds")
        .withColumnRenamed("value", "y")
        .select("event_type", "ds", "y")
        .cache()
    )
    df.count()
    return df


def _collect_multi(got, grain):
    return {
        (r["event_type"], r["ds"]): (r["y_sum"], r["y_mean"], r["y_median"])
        for r in got.filter(F.col("grain") == grain).collect()
    }


def test_matches_per_grain_aggregates(events):
    got = bucket_aggregate_multi(
        events,
        grains=("D", "W", "M"),
        aggs=("sum", "mean", "median"),
        series_cols=("event_type",),
    ).cache()
    try:
        for grain in ("D", "W", "M"):
            want = {
                (r["event_type"], r["ds"]): (r["y"], r["_mean"], r["_median"])
                for r in bucket_aggregate(
                    events,
                    grain=grain,
                    agg="sum",
                    series_cols=("event_type",),
                    extra_aggs={"_mean": ("y", "mean"), "_median": ("y", "median")},
                )
                .withColumn("ds", F.col("ds").cast("timestamp"))
                .collect()
            }
            have = _collect_multi(got, grain)
            assert len(have) == len(want)
            for k, v in want.items():
                assert have[k] == pytest.approx(v, rel=1e-12), k
    finally:
        got.unpersist()


def test_single_exchange_plan(events):
    got = bucket_aggregate_multi(
        events, grains=("D", "W", "M"), aggs=("sum", "min"),
        series_cols=("event_type",),
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan


def test_mixed_calendar_and_clock_grains(events):
    got = bucket_aggregate_multi(
        events.filter(F.col("event_type") == "click"),
        grains=("H", "D"),
        aggs=("sum",),
    )
    rows = got.collect()
    grains = {r["grain"] for r in rows}
    assert grains == {"H", "D"}
    d_sum = sum(r["y_sum"] for r in rows if r["grain"] == "D")
    h_sum = sum(r["y_sum"] for r in rows if r["grain"] == "H")
    assert d_sum == pytest.approx(h_sum, rel=1e-9)


def test_grain_alias_and_errors(events):
    got = bucket_aggregate_multi(events.limit(10), grains=("day",), aggs=("avg",))
    assert {r["grain"] for r in got.collect()} == {"D"}
    assert "y_mean" in got.columns
    with pytest.raises(ValueError, match="duplicate grains"):
        bucket_aggregate_multi(events, grains=("D", "day"))
    with pytest.raises(ValueError, match="non-empty"):
        bucket_aggregate_multi(events, grains=())
    with pytest.raises(ValueError, match="duplicate aggs"):
        bucket_aggregate_multi(events, grains=("D",), aggs=("avg", "mean"))
