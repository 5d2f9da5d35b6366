"""GARCH(1,1): recursion vs a direct numpy replay, null propagation,
forecast term structure, validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.statespace import garch_forecast, garch_volatility


def _replay(ys, alpha, beta, omega):
    s2_inf = omega / (1.0 - alpha - beta)
    out = []
    cur = s2_inf
    for t, y in enumerate(ys):
        if t > 0:
            e = ys[t - 1]
            if e is None:
                cur = omega + (alpha + beta) * cur
            else:
                cur = omega + alpha * e * e + beta * cur
        out.append(cur)
    return out


@pytest.fixture(scope="module")
def returns(spark):
    # deterministic synthetic "returns" with a volatile stretch
    ys = [
        math.sin(1000 * (i + 1) ** 2 % 97) * (3.0 if 30 <= i < 40 else 1.0)
        for i in range(60)
    ]
    rows = [("s", i, float(y)) for i, y in enumerate(ys)]
    return (
        spark.createDataFrame(rows, "series_id string, ds int, y double"),
        ys,
    )


def test_matches_direct_replay(returns):
    df, ys = returns
    got = (
        garch_volatility(df, alpha=0.1, beta=0.85, omega=0.05)
        .orderBy("ds")
        .collect()
    )
    want = _replay(ys, 0.1, 0.85, 0.05)
    assert len(got) == len(want)
    for r, w in zip(got, want):
        assert r["sigma2"] == pytest.approx(w, rel=1e-12)
        assert r["sigma"] == pytest.approx(math.sqrt(w), rel=1e-12)
        assert r["z"] == pytest.approx(r["resid"] / math.sqrt(w), rel=1e-12)


def test_volatile_stretch_raises_sigma(returns):
    df, _ = returns
    got = garch_volatility(df, alpha=0.2, beta=0.7, omega=0.05).collect()
    sig = {r["ds"]: r["sigma2"] for r in got}
    calm = sum(sig[i] for i in range(10, 30)) / 20
    vol = sum(sig[i] for i in range(35, 45)) / 10
    assert vol > 2 * calm


def test_null_propagates_expectation_update(spark):
    rows = [("s", 0, 1.0), ("s", 1, None), ("s", 2, 1.0)]
    df = spark.createDataFrame(rows, "series_id string, ds int, y double")
    got = {
        r["ds"]: r
        for r in garch_volatility(df, alpha=0.1, beta=0.8, omega=0.1).collect()
    }
    s2_inf = 0.1 / (1.0 - 0.9)
    s2_1 = 0.1 + 0.1 * 1.0 + 0.8 * s2_inf
    s2_2 = 0.1 + 0.9 * s2_1  # null at t=1: E[e^2] = sigma2
    assert got[1]["sigma2"] == pytest.approx(s2_1, rel=1e-12)
    assert got[1]["z"] is None and got[1]["resid"] is None
    assert got[2]["sigma2"] == pytest.approx(s2_2, rel=1e-12)


def test_variance_targeting_path(returns):
    df, ys = returns
    got = garch_volatility(df, alpha=0.1, beta=0.85).orderBy("ds").collect()
    n = len(ys)
    mean = sum(ys) / n
    s2 = sum((y - mean) ** 2 for y in ys) / (n - 1)  # resid var, ddof=1
    # demean=False: var(ddof=1) of raw y
    s2_raw = sum((y - mean) ** 2 for y in ys) / (n - 1)
    assert got[0]["sigma2"] == pytest.approx(s2_raw, rel=1e-9)
    # long-run level equals the sample variance under targeting
    om = s2_raw * (1.0 - 0.95)
    assert got[5]["sigma2"] == pytest.approx(
        _replay(ys, 0.1, 0.85, om)[5], rel=1e-9
    )


def test_forecast_term_structure(returns):
    df, ys = returns
    a, b, om = 0.1, 0.85, 0.05
    fc = garch_forecast(
        df, omega=om, alpha=a, beta=b, horizon=200,
    ).orderBy("h").collect()
    s2_inf = om / (1.0 - a - b)
    filt = _replay(ys, a, b, om)
    s2_next = om + a * ys[-1] ** 2 + b * filt[-1]
    assert fc[0]["sigma2_hat"] == pytest.approx(s2_next, rel=1e-12)
    # geometric reversion to the unconditional variance:
    # (α+β)^199 ≈ 3.7e-5 of the initial gap remains at h=200
    assert fc[-1]["sigma2_hat"] == pytest.approx(s2_inf, abs=1e-4)
    mids = [r["sigma2_hat"] for r in fc]
    assert all(
        abs(m2 - s2_inf) <= abs(m1 - s2_inf) + 1e-15
        for m1, m2 in zip(mids, mids[1:])
    )


def test_validation(spark):
    df = spark.createDataFrame(
        [("s", 0, 1.0)], "series_id string, ds int, y double"
    )
    with pytest.raises(ValueError, match="stationarity"):
        garch_volatility(df, alpha=0.5, beta=0.5)
    with pytest.raises(ValueError, match="omega"):
        garch_volatility(df, omega=0.0)
    with pytest.raises(ValueError, match="alpha"):
        garch_volatility(df, alpha=-0.1)
    with pytest.raises(ValueError, match="horizon"):
        garch_forecast(df, omega=0.1, horizon=0)
