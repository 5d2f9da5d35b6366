from __future__ import annotations

import math

from temporal_retriever_spark.stats import betainc, f_sf


def test_betainc_exact_binomial_identity():
    # integer a,b: I_x(a,b) = sum_{j=a}^{a+b-1} C(a+b-1,j) x^j (1-x)^(n-j)
    # I_0.5(2,3) = (C(4,2)+C(4,3)+C(4,4)) / 16 = 11/16
    assert abs(betainc(2, 3, 0.5) - 11 / 16) < 1e-12
    assert betainc(2, 3, 0.0) == 0.0
    assert betainc(2, 3, 1.0) == 1.0


def test_betainc_symmetry():
    for a, b, x in [(2.5, 4.0, 0.3), (0.5, 0.5, 0.7), (10, 3, 0.9)]:
        assert abs(betainc(a, b, x) - (1 - betainc(b, a, 1 - x))) < 1e-12


def test_f_sf_median_equal_dof():
    # F(d, d) has median exactly 1
    for d in (2, 10, 30):
        assert abs(f_sf(1.0, d, d) - 0.5) < 1e-12


def test_f_sf_critical_values():
    # standard 5% critical values from F tables
    assert abs(f_sf(4.9646, 1, 10) - 0.05) < 1e-4
    assert abs(f_sf(3.4928, 2, 20) - 0.05) < 1e-4
    assert f_sf(100.0, 1, 10) < 1e-4
    assert f_sf(0.0, 1, 10) == 1.0
    assert f_sf(float("inf"), 3, 7) == 0.0


def test_granger_p_values(spark):
    import numpy as np

    from temporal_retriever_spark.diagnostics import granger_causality

    rng = np.random.default_rng(7)
    n = 300
    x = rng.normal(size=n)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 0.8 * x[t - 1] + 0.1 * rng.normal()
    rows = [("pair", float(i), float(y[i]), float(x[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "series_id string, ds double, y double, x double")
    out = {r["lag"]: r for r in granger_causality(df, maxlag=2, detrend=False).collect()}
    assert out[1]["p_value"] < 1e-6  # x strongly causes y
    rev = df.selectExpr("series_id", "ds", "x AS y", "y AS x")
    rout = {r["lag"]: r for r in granger_causality(rev, maxlag=2, detrend=False).collect()}
    assert rout[1]["p_value"] > 0.01  # reverse direction not significant
