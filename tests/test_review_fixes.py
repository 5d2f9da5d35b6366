"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from temporal_retriever_spark.align import future_grid
from temporal_retriever_spark.api.models import parse_correlation
from temporal_retriever_spark.forecast import forecast_linear_seasonal
from temporal_retriever_spark.pipeline import analyze
from temporal_retriever_spark.api.models import AnalyzeRequest


def test_future_grid_horizon_zero_is_empty(spark):
    bounds = spark.createDataFrame(
        [("s", datetime.date(2024, 1, 31))], "series_id string, max_ds date"
    )
    assert future_grid(bounds, grain="D", horizon=0).count() == 0


def test_forecast_horizon_zero_history_only(spark):
    rows = [("s", datetime.date(2024, 1, 1 + i), 10.0 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "series_id string, ds date, y double")
    pred = forecast_linear_seasonal(df, grain="D", horizon=0)
    got = [r["ds"] for r in pred.collect()]
    assert len(got) == 10  # no duplicated max_ds, no spurious future tick
    assert len(set(got)) == 10


def test_caps_follow_reference_leg_selection():
    # reference app.py:513-517/533-537: covariate <- fromIndex options'
    # caps.fromIndex; target <- toIndex options' caps.toIndex
    raw = {
        "id": "c",
        "fromData": "a", "fromIndex": "x", "toData": "b", "toIndex": "y",
        "ForecastingOptions": {
            "fromIndex": {"caps": {
                "fromIndex": {"floor": 10.0, "ceiling": 100.0},
                "toIndex": {"floor": -1.0, "ceiling": 5000.0},
            }},
            "toIndex": {"caps": {
                "fromIndex": {"floor": -2.0, "ceiling": 7.0},
                "toIndex": {"floor": 3.0, "ceiling": 300.0},
            }},
        },
    }
    corr = parse_correlation(raw)
    assert corr.forecast_options.from_cap.floor == 10.0
    assert corr.forecast_options.from_cap.ceiling == 100.0
    assert corr.forecast_options.to_cap.floor == 3.0
    assert corr.forecast_options.to_cap.ceiling == 300.0


def test_analyze_constant_series_yields_nan_acf(spark):
    docs = {
        "flat": {"data": [
            {"date": f"2024-01-{d:02d}T00:00:00Z", "v": 5.0} for d in range(1, 15)
        ]},
        "vary": {"data": [
            {"date": f"2024-01-{d:02d}T00:00:00Z", "v": float(d % 3 + d)}
            for d in range(1, 15)
        ]},
    }
    req = AnalyzeRequest(
        documents=docs,
        correlations=(
            parse_correlation({
                "id": "k", "fromData": "flat", "fromIndex": "v",
                "toData": "vary", "toIndex": "v",
            }),
        ),
    )
    out = analyze(spark, req, lags=3)  # must not raise
    from_lags = out["correlations"]["k"]["autocorrelations"]["from"]["lags"]
    assert from_lags[0] == 1.0
    assert all(math.isnan(v) for k, v in from_lags.items() if k > 0)
