"""Exercise the forecast_prophet grouped-UDF plumbing with a stub library.

The container has no ``prophet``; these tests install a minimal
API-compatible stand-in (distributed to executor Python workers via
``addPyFile``) so the Spark-side plumbing — per-series grouping, schema
mapping, future-grid length, knob passthrough — actually runs. Library
*numerics* parity still needs a real prophet install (README
DIVERGENCES #6); what's verified here is everything around the fit.
Reference: app.py:124-138 builds Prophet(changepoint_prior_scale,
uncertainty_samples) per correlation.
"""

from __future__ import annotations

import datetime as dt
import sys
import textwrap

import pytest

_FAKE_PROPHET = textwrap.dedent(
    '''
    """Minimal Prophet API stand-in for plumbing tests (deterministic)."""
    import pandas as pd


    class Prophet:
        def __init__(self, growth="linear", changepoint_prior_scale=0.05,
                     uncertainty_samples=1000, **kwargs):
            self.growth = growth
            self.cps = changepoint_prior_scale
            self.us = uncertainty_samples

        def fit(self, df):
            self.hist = df.reset_index(drop=True)
            self.mean = float(df["y"].mean())
            return self

        def make_future_dataframe(self, periods, freq="D"):
            last = self.hist["ds"].max()
            fut = pd.date_range(last, periods=periods + 1, freq=freq)[1:]
            ds = pd.concat(
                [pd.Series(self.hist["ds"]), pd.Series(fut)], ignore_index=True
            )
            return pd.DataFrame({"ds": pd.to_datetime(ds)})

        def predict(self, future):
            out = pd.DataFrame({"ds": future["ds"]})
            # knobs observable in the output: yhat carries cps, the band
            # width carries uncertainty_samples on/off
            out["yhat"] = self.mean + self.cps
            width = 1.0 if self.us else 0.0
            out["yhat_lower"] = out["yhat"] - width
            out["yhat_upper"] = out["yhat"] + width
            return out
    '''
)


@pytest.fixture()
def fake_prophet(spark, tmp_path, monkeypatch):
    mod = tmp_path / "prophet.py"
    mod.write_text(_FAKE_PROPHET)
    # driver side: prophet_available() import check
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("prophet", None)
    # executor side: python workers import inside the UDF
    spark.sparkContext.addPyFile(str(mod))
    yield
    sys.modules.pop("prophet", None)


def _series(spark, n=30):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (sid, base + dt.timedelta(days=i), float(i + off))
        for sid, off in (("a", 0.0), ("b", 100.0))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "series_id string, ds timestamp, y double")


def test_prophet_plumbing_runs_per_series(spark, fake_prophet):
    from temporal_retriever_spark.forecast import (
        forecast_prophet,
        prophet_available,
    )

    assert prophet_available()
    out = forecast_prophet(
        _series(spark), grain="D", horizon=5,
        changepoint_prior_scale=0.25, uncertainty_samples=10,
    )
    assert out.columns == ["series_id", "ds", "yhat", "yhat_lower", "yhat_upper"]
    rows = out.collect()
    # per-series: 30 history + 5 future rows each
    by_sid = {}
    for r in rows:
        by_sid.setdefault(r["series_id"], []).append(r)
    assert {k: len(v) for k, v in by_sid.items()} == {"a": 35, "b": 35}
    # knob passthrough: stub yhat = series mean + cps
    a_mean = sum(range(30)) / 30.0
    assert by_sid["a"][0]["yhat"] == pytest.approx(a_mean + 0.25)
    assert by_sid["b"][0]["yhat"] == pytest.approx(100.0 + a_mean + 0.25)
    assert by_sid["a"][0]["yhat_upper"] - by_sid["a"][0]["yhat_lower"] == (
        pytest.approx(2.0)
    )


def test_prophet_uncertainty_samples_zero_width(spark, fake_prophet):
    from temporal_retriever_spark.forecast import forecast_prophet

    out = forecast_prophet(
        _series(spark), grain="D", horizon=3, uncertainty_samples=0,
    ).collect()
    for r in out:
        assert r["yhat_lower"] == r["yhat"] == r["yhat_upper"]


def test_prophet_gate_raises_without_library(spark):
    from temporal_retriever_spark.forecast import (
        forecast_prophet,
        prophet_available,
    )

    if prophet_available():  # pragma: no cover - container has no prophet
        pytest.skip("real prophet installed")
    with pytest.raises(ImportError):
        forecast_prophet(_series(spark), grain="D", horizon=2)
