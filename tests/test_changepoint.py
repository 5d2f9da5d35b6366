"""Piecewise changepoint trend (native Prophet-trend analog) + knob wiring.

Reference: the endpoints forward ChangePointPriorScale /
uncertaintySamples into Prophet (app.py:124-131); the native backend
makes them functional — piecewise ridge trend / interval omission.
"""

from __future__ import annotations

import datetime as dt

import pytest

from temporal_retriever_spark.forecast import (
    changepoint1_stages,
    changepoint_fractions,
    fit_changepoint_trend,
    forecast_changepoint,
    forecast_covariate_changepoint,
)


def _kinked(spark, n=80, kink=40, s1=1.0, s2=5.0):
    base = dt.date(2024, 1, 1)
    rows = [
        (
            "s1",
            base + dt.timedelta(days=i),
            float(s1 * i) if i < kink else s1 * kink + s2 * (i - kink),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "series_id string, ds date, y double"), base


def test_changepoint_fractions_span_first_80pct():
    fr = changepoint_fractions(4)
    assert fr == pytest.approx([0.2, 0.4, 0.6, 0.8])


def test_stages_solver_matches_numpy(spark):
    df, _ = _kinked(spark)
    kw = dict(n_changepoints=1, changepoint_prior_scale=0.5)
    numpy_beta = fit_changepoint_trend(df, **kw).collect()[0]["beta"]
    stage_beta = fit_changepoint_trend(df, solver="stages", **kw).collect()[0]["beta"]
    assert numpy_beta == pytest.approx(stage_beta, abs=1e-8)


def test_prior_scale_controls_flexibility(spark):
    # larger scale => weaker ridge penalty => tighter fit to the kink
    df, base = _kinked(spark)

    def max_resid(cps):
        out = forecast_changepoint(
            df, grain="D", horizon=0, n_changepoints=10,
            changepoint_prior_scale=cps, include_bounds=False,
        ).orderBy("ds").collect()
        truth = [float(i) if i < 40 else 40.0 + 5.0 * (i - 40) for i in range(80)]
        return max(abs(r["yhat"] - t) for r, t in zip(out, truth))

    flexible, stiff = max_resid(5.0), max_resid(0.001)
    assert flexible < stiff
    assert flexible < 5.0  # tracks the kink


def test_future_extrapolates_final_slope(spark):
    df, base = _kinked(spark)
    out = forecast_changepoint(
        df, grain="D", horizon=5, n_changepoints=10,
        changepoint_prior_scale=5.0, include_bounds=False,
        include_history=False,
    ).orderBy("ds").collect()
    assert len(out) == 5
    # post-kink slope is 5/day; day 84 truth = 40 + 5*44 = 260
    assert out[-1]["yhat"] == pytest.approx(260.0, abs=5.0)
    steps = [b["yhat"] - a["yhat"] for a, b in zip(out, out[1:])]
    assert all(s == pytest.approx(5.0, abs=1.0) for s in steps)


def test_bounds_envelope_and_coef(spark):
    df, base = _kinked(spark)
    cov = spark.createDataFrame(
        [
            ("s1", base + dt.timedelta(days=i), float(i % 7))
            for i in range(85)
        ],
        "series_id string, ds date, cov double",
    )
    out = forecast_covariate_changepoint(
        df, cov, grain="D", horizon=5, n_changepoints=5,
        changepoint_prior_scale=0.5,
    ).collect()
    assert len(out) == 85
    for r in out:
        assert r["yhat_lower"] <= r["yhat"] <= r["yhat_upper"]
        assert r["coef"] is not None


def test_stage_strings_are_engine_portable(duck):
    # the same changepoint1_stages strings must evaluate in DuckDB
    ctes = [
        "g AS (SELECT 10.0 AS g0_0, 3.0 AS g0_1, 1.0 AS g0_2, "
        "5.0 AS g1_1, 2.0 AS g1_2, 4.0 AS g2_2, "
        "7.0 AS v0, 8.0 AS v1, 9.0 AS v2)"
    ]
    prev = "g"
    for i, (name, expr) in enumerate(changepoint1_stages(2.0)):
        cur = f"t{i}"
        ctes.append(f"{cur} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cur
    row = duck.execute(
        f"WITH {', '.join(ctes)} SELECT beta0, beta1, beta2 FROM {prev}"
    ).fetchone()
    import numpy as np

    a = np.array([[10.0, 3.0, 1.0], [3.0, 5.0, 2.0], [1.0, 2.0, 6.0]])
    want = np.linalg.solve(a, [7.0, 8.0, 9.0])
    assert row == pytest.approx(tuple(want), abs=1e-12)


def test_invalid_args(spark):
    df, _ = _kinked(spark, n=10)
    with pytest.raises(ValueError):
        fit_changepoint_trend(df, n_changepoints=0)
    with pytest.raises(ValueError):
        fit_changepoint_trend(df, n_changepoints=2, solver="stages")
    with pytest.raises(ValueError):
        fit_changepoint_trend(df, n_changepoints=1, solver="bogus")
