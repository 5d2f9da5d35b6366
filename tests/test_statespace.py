"""Kalman local-level filter/smoother: hand-computed recursion, gap
handling, smoother properties, forecast closed form."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.statespace import kalman_forecast, kalman_local_level


def _series(spark, ys, sid="s1"):
    rows = [(sid, f"2024-01-{d+1:02d}", y) for d, y in enumerate(ys)]
    return spark.createDataFrame(
        rows, "series_id string, ds string, y double"
    ).select("series_id", F.col("ds").cast("date").alias("ds"), "y")


def _hand_filter(ys, q, r):
    a = p = None
    out = []
    for y in ys:
        if a is None:
            if y is None:
                out.append((math.nan, math.nan))
                continue
            a, p = y, r
        else:
            ppred = p + q
            if y is None:
                p = ppred
            else:
                k = ppred / (ppred + r)
                a = a + k * (y - a)
                p = (1 - k) * ppred
        out.append((a, p))
    return out


def test_filter_matches_hand_recursion(spark):
    ys = [10.0, 12.0, 11.0, 15.0, 9.0]
    q, r = 2.0, 5.0
    got = (
        kalman_local_level(_series(spark, ys), q=q, r=r)
        .orderBy("ds")
        .collect()
    )
    want = _hand_filter(ys, q, r)
    for row, (a, p) in zip(got, want):
        assert row["level"] == pytest.approx(a, rel=1e-12)
        assert row["level_var"] == pytest.approx(p, rel=1e-12)


def test_null_gap_widens_variance_keeps_level(spark):
    ys = [10.0, None, None, 10.0]
    q, r = 1.0, 4.0
    got = (
        kalman_local_level(_series(spark, ys), q=q, r=r)
        .orderBy("ds")
        .collect()
    )
    assert got[1]["level"] == got[0]["level"] == 10.0
    assert got[1]["level_var"] == got[0]["level_var"] + q
    assert got[2]["level_var"] == got[0]["level_var"] + 2 * q
    assert got[1]["y"] is None
    # after the gap, the update shrinks variance again
    assert got[3]["level_var"] < got[2]["level_var"] + q


def test_leading_nulls_are_diffuse(spark):
    ys = [None, 7.0, 8.0]
    got = (
        kalman_local_level(_series(spark, ys), q=1.0, r=2.0)
        .orderBy("ds")
        .collect()
    )
    assert got[0]["level"] is None and got[0]["level_var"] is None
    assert got[1]["level"] == 7.0 and got[1]["level_var"] == 2.0


def test_high_q_tracks_low_q_flattens(spark):
    ys = [0.0, 10.0, 0.0, 10.0]
    track = (
        kalman_local_level(_series(spark, ys), q=1e6, r=1.0)
        .orderBy("ds")
        .collect()
    )
    flat = (
        kalman_local_level(_series(spark, ys), q=1e-6, r=1.0)
        .orderBy("ds")
        .collect()
    )
    assert track[-1]["level"] == pytest.approx(10.0, abs=1e-3)
    assert 4.0 < flat[-1]["level"] < 6.0  # ~running mean


def test_smoother_variance_never_exceeds_filtered(spark):
    ys = [3.0, 9.0, 4.0, 8.0, 2.0, 7.0]
    got = (
        kalman_local_level(_series(spark, ys), q=1.5, r=3.0, smooth=True)
        .orderBy("ds")
        .collect()
    )
    for r_ in got:
        assert r_["smooth_var"] <= r_["level_var"] + 1e-12
    # final point: smoothed == filtered (no future information)
    assert got[-1]["level_smooth"] == got[-1]["level"]
    assert got[-1]["smooth_var"] == got[-1]["level_var"]


def test_smoother_matches_hand_backward_pass(spark):
    ys = [5.0, 6.0, 4.0]
    q, r = 2.0, 3.0
    filt = _hand_filter(ys, q, r)
    a = [x[0] for x in filt]
    p = [x[1] for x in filt]
    sa, sp = a[:], p[:]
    for t in (1, 0):
        ppred = p[t] + q
        c = p[t] / ppred
        sa[t] = a[t] + c * (sa[t + 1] - a[t])
        sp[t] = p[t] + c * c * (sp[t + 1] - ppred)
    got = (
        kalman_local_level(_series(spark, ys), q=q, r=r, smooth=True)
        .orderBy("ds")
        .collect()
    )
    for row, ea, ep in zip(got, sa, sp):
        assert row["level_smooth"] == pytest.approx(ea, rel=1e-12)
        assert row["smooth_var"] == pytest.approx(ep, rel=1e-12)


def test_forecast_closed_form(spark):
    ys = [10.0, 12.0, 11.0]
    q, r = 2.0, 5.0
    a_n, p_n = _hand_filter(ys, q, r)[-1]
    got = (
        kalman_forecast(_series(spark, ys), horizon=3, q=q, r=r)
        .orderBy("ds")
        .collect()
    )
    assert len(got) == 3
    for h, row in enumerate(got, start=1):
        assert row["yhat"] == pytest.approx(a_n, rel=1e-12)
        assert row["yhat_var"] == pytest.approx(p_n + h * q + r, rel=1e-12)
        assert row["yhat_lower"] < row["yhat"] < row["yhat_upper"]
        assert str(row["ds"]) == f"2024-01-{3+h:02d}"
    # interval widens with horizon
    assert (got[2]["yhat_upper"] - got[2]["yhat_lower"]) > (
        got[0]["yhat_upper"] - got[0]["yhat_lower"]
    )


def test_multiple_series_independent(spark):
    df = _series(spark, [1.0, 2.0], "a").unionByName(
        _series(spark, [100.0, 200.0], "b")
    )
    got = {
        (r["series_id"], str(r["ds"])): r["level"]
        for r in kalman_local_level(df, q=1.0, r=1.0).collect()
    }
    assert got[("a", "2024-01-01")] == 1.0
    assert got[("b", "2024-01-01")] == 100.0


def test_validation(spark):
    df = _series(spark, [1.0])
    with pytest.raises(ValueError):
        kalman_local_level(df, q=-1.0)
    with pytest.raises(ValueError):
        kalman_local_level(df, r=0.0)
    with pytest.raises(ValueError):
        kalman_forecast(df, horizon=0)
    with pytest.raises(ValueError):
        kalman_forecast(df, interval_width=1.0)
