"""Feature engineering: leakage-free lags/rolls, calendar features,
LOO target encoding math."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.features import make_lag_features, target_encode


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("s", date(2024, 1, d), float(d)) for d in range(1, 11)
    ]
    return spark.createDataFrame(rows, "series_id string, ds date, y double")


def test_lags_and_rolls_strictly_past(series):
    got = {
        str(r["ds"]): r
        for r in make_lag_features(
            series, lags=(1, 3), roll_windows=(3,), calendar=False
        ).collect()
    }
    r5 = got["2024-01-05"]
    assert r5["y_lag_1"] == 4.0 and r5["y_lag_3"] == 2.0
    # roll over [-3,-1]: days 2,3,4 -> mean 3
    assert r5["y_roll_mean_3"] == pytest.approx(3.0)
    assert r5["y_roll_std_3"] == pytest.approx(1.0)
    # short history: NULLs, never partial inventions for lags
    r1 = got["2024-01-01"]
    assert r1["y_lag_1"] is None and r1["y_roll_mean_3"] is None
    r2 = got["2024-01-02"]
    assert r2["y_roll_mean_3"] == 1.0 and r2["y_roll_std_3"] is None


def test_calendar_features(series):
    # 2024-01-01 is a Monday
    first = [
        r for r in make_lag_features(series, lags=(1,), roll_windows=()).collect()
        if str(r["ds"]) == "2024-01-01"
    ][0]
    assert first["dow"] == 1 and first["dom"] == 1 and first["month"] == 1
    assert first["weekofyear"] == 1


def test_target_encode_loo_math(spark):
    rows = [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 10.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    got = {
        (r["cat"], r["y"]): r["cat_te"]
        for r in target_encode(df, cat_col="cat", smoothing=0.0).collect()
    }
    # LOO within 'a': (sum - own)/(n-1)
    assert got[("a", 1.0)] == pytest.approx((3 + 5) / 2)
    assert got[("a", 3.0)] == pytest.approx((1 + 5) / 2)
    assert got[("a", 5.0)] == pytest.approx((1 + 3) / 2)
    g = (1 + 3 + 5 + 10 + 7) / 5
    # singleton 'b' with smoothing 0: n_loo = 0 -> global-mean fallback
    assert got[("b", 10.0)] == pytest.approx(g)
    # NULL category -> prior
    assert got[(None, 7.0)] == pytest.approx(g)


def test_target_encode_smoothing_shrinks_to_global(spark):
    rows = [("a", 0.0), ("a", 0.0), ("b", 10.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    g = 5.0
    small = {
        r["cat"]: r["cat_te"]
        for r in target_encode(df, cat_col="cat", smoothing=0.1).collect()
    }
    large = {
        r["cat"]: r["cat_te"]
        for r in target_encode(df, cat_col="cat", smoothing=1000.0).collect()
    }
    assert abs(large["a"] - g) < abs(small["a"] - g)
    assert large["a"] == pytest.approx(g, rel=1e-2)


def test_validation(series, spark):
    with pytest.raises(ValueError, match="lags"):
        make_lag_features(series, lags=(0,))
    with pytest.raises(ValueError, match="roll windows"):
        make_lag_features(series, roll_windows=(0,))
    df = spark.createDataFrame([("a", 1.0)], "cat string, y double")
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, cat_col="cat", smoothing=-1.0)


# ---------------------------------------------------------------------------
# Mutual information feature ranking
# ---------------------------------------------------------------------------


class TestMutualInformation:
    def test_hand_computed_independent_and_determined(self, spark):
        import math

        from temporal_retriever_spark.features import mutual_information

        # f_dep fully determines the label; f_ind is independent of it
        rows = []
        for i in range(200):
            lab = "a" if i % 2 == 0 else "b"
            f_dep = 0.1 if lab == "a" else 0.9
            # i%5 and i%2 are jointly uniform over each 10-cycle
            f_ind = (i % 5) / 5.0
            rows.append((f_dep, f_ind, lab))
        df = spark.createDataFrame(rows, "f_dep double, f_ind double, lab string")
        got = {r["feature"]: r["mi"] for r in mutual_information(
            df, ["f_dep", "f_ind"], "lab", n_bins=4
        ).collect()}
        # deterministic feature: MI = H(label) = ln 2
        assert got["f_dep"] == pytest.approx(math.log(2), rel=1e-12)
        assert got["f_ind"] == pytest.approx(0.0, abs=1e-12)

    def test_nonmonotone_dependence_detected(self, spark):
        from temporal_retriever_spark.features import mutual_information

        # label = 1 in the MIDDLE of the range: correlation ~0, MI > 0
        rows = [((i % 10) / 10.0, "mid" if 3 <= i % 10 <= 6 else "out")
                for i in range(300)]
        df = spark.createDataFrame(rows, "f double, lab string")
        got = mutual_information(df, ["f"], "lab", n_bins=10).collect()
        assert got[0]["mi"] > 0.3

    def test_ordering_and_validation(self, spark):
        from temporal_retriever_spark.features import mutual_information

        rows = [((i % 2) * 1.0, (i % 5) / 5.0, "x" if i % 2 else "y")
                for i in range(100)]
        df = spark.createDataFrame(rows, "f1 double, f2 double, lab string")
        got = mutual_information(df, ["f1", "f2"], "lab", n_bins=5).collect()
        assert got[0]["feature"] == "f1"  # perfectly informative sorts first
        assert got[0]["mi"] >= got[1]["mi"]
        with pytest.raises(ValueError, match="feature_cols"):
            mutual_information(df, [], "lab")
        with pytest.raises(ValueError, match="n_bins"):
            mutual_information(df, ["f1"], "lab", n_bins=1)


# ---------------------------------------------------------------------------
# Ridge regression (closed form)
# ---------------------------------------------------------------------------


class TestRidgeRegression:
    def test_matches_numpy_closed_form(self, spark):
        import numpy as np

        from temporal_retriever_spark.features import ridge_regression

        rows = [
            (float((i * 7) % 10) / 10.0, float((i * 3) % 5) / 5.0,
             2.0 + 1.5 * ((i * 7) % 10) / 10.0 - 0.8 * ((i * 3) % 5) / 5.0
             + ((i * 7919) % 11 - 5) / 50.0)
            for i in range(80)
        ]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        got = ridge_regression(df, ["x1", "x2"], "y", l2=2.0).collect()[0]
        X = np.array([[1.0, a, b] for a, b, _ in rows])
        Y = np.array([y for _, _, y in rows])
        P = np.diag([0.0, 2.0, 2.0])
        beta = np.linalg.solve(X.T @ X + P, X.T @ Y)
        assert got["n"] == 80
        assert got["intercept"] == pytest.approx(beta[0], rel=1e-9)
        assert got["coef_x1"] == pytest.approx(beta[1], rel=1e-9)
        assert got["coef_x2"] == pytest.approx(beta[2], rel=1e-9)

    def test_zero_penalty_is_ols_and_shrinkage(self, spark):
        from temporal_retriever_spark.features import ridge_regression

        rows = [(float(i) / 20.0, 3.0 * i / 20.0 + 1.0) for i in range(40)]
        df = spark.createDataFrame(rows, "x double, y double")
        ols = ridge_regression(df, ["x"], "y", l2=0.0).collect()[0]
        assert ols["coef_x"] == pytest.approx(3.0, abs=1e-9)
        assert ols["intercept"] == pytest.approx(1.0, abs=1e-9)
        reg = ridge_regression(df, ["x"], "y", l2=50.0).collect()[0]
        assert abs(reg["coef_x"]) < abs(ols["coef_x"])

    def test_keyed_models_and_null_rows_dropped(self, spark):
        from temporal_retriever_spark.features import ridge_regression

        rows = [("a", float(i), 2.0 * i) for i in range(20)] + [
            ("b", float(i), -1.0 * i + 5) for i in range(20)
        ] + [("a", None, 99.0)]
        df = spark.createDataFrame(rows, "k string, x double, y double")
        got = {r["k"]: r for r in ridge_regression(
            df, ["x"], "y", l2=0.0, keys=["k"]
        ).collect()}
        assert got["a"]["n"] == 20  # the null-feature row is dropped
        assert got["a"]["coef_x"] == pytest.approx(2.0, abs=1e-9)
        assert got["b"]["coef_x"] == pytest.approx(-1.0, abs=1e-9)

    def test_validation(self, spark):
        from temporal_retriever_spark.features import ridge_regression

        df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
        with pytest.raises(ValueError, match="feature_cols"):
            ridge_regression(df, [], "y")
        with pytest.raises(ValueError, match="l2"):
            ridge_regression(df, ["x"], "y", l2=-1.0)


class TestHuberRegression:
    def _rows(self):
        rows = [(float(i) / 20.0, 2.0 * i / 20.0 + 1.0) for i in range(40)]
        rows += [(0.5, 500.0), (0.6, -400.0)]  # wild outliers
        return rows

    def _irls_ref(self, rows, delta, iters, l2=0.0):
        import numpy as np

        X = np.array([[1.0, x] for x, _ in rows])
        Y = np.array([y for _, y in rows])
        P = np.diag([0.0, l2])
        beta = np.linalg.solve(X.T @ X + P, X.T @ Y)
        for _ in range(iters - 1):
            r = np.abs(Y - X @ beta)
            w = np.where(r <= delta, 1.0, delta / r)
            beta = np.linalg.solve(
                (X.T * w) @ X + P, (X.T * w) @ Y
            )
        return beta

    def test_matches_irls_reference_and_resists_outliers(self, spark):
        from temporal_retriever_spark.features import (
            huber_regression,
            ridge_regression,
        )

        rows = self._rows()
        df = spark.createDataFrame(rows, "x double, y double")
        got = huber_regression(df, ["x"], "y", delta=1.0, iterations=3).collect()[0]
        ref = self._irls_ref(rows, delta=1.0, iters=3)
        assert got["intercept"] == pytest.approx(ref[0], rel=1e-9)
        assert got["coef_x"] == pytest.approx(ref[1], rel=1e-9)
        ols = ridge_regression(df, ["x"], "y", l2=0.0).collect()[0]
        # the outliers wreck OLS but barely move Huber
        assert abs(ols["coef_x"] - 2.0) > 4.0
        assert abs(got["coef_x"] - 2.0) < 2.0

    def test_single_iteration_is_ols(self, spark):
        from temporal_retriever_spark.features import (
            huber_regression,
            ridge_regression,
        )

        df = spark.createDataFrame(self._rows(), "x double, y double")
        h1 = huber_regression(df, ["x"], "y", iterations=1).collect()[0]
        ols = ridge_regression(df, ["x"], "y", l2=0.0).collect()[0]
        assert h1["coef_x"] == pytest.approx(ols["coef_x"], rel=1e-12)

    def test_validation(self, spark):
        from temporal_retriever_spark.features import huber_regression

        df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
        with pytest.raises(ValueError, match="delta"):
            huber_regression(df, ["x"], "y", delta=0.0)
        with pytest.raises(ValueError, match="iterations"):
            huber_regression(df, ["x"], "y", iterations=0)


class TestQuantileRegression:
    def _irls_ref(self, rows, tau, iters, eps=1e-6, l2=0.0):
        import numpy as np

        X = np.array([[1.0, x] for x, _ in rows])
        Y = np.array([y for _, y in rows])
        P = np.diag([0.0, l2])
        beta = np.linalg.solve(X.T @ X + P, X.T @ Y)
        for _ in range(iters - 1):
            r = Y - X @ beta
            w = np.where(r >= 0, tau, 1.0 - tau) / np.maximum(np.abs(r), eps)
            beta = np.linalg.solve((X.T * w) @ X + P, (X.T * w) @ Y)
        return beta

    def test_matches_irls_reference(self, spark):
        from temporal_retriever_spark.features import quantile_regression

        import random

        rng = random.Random(9)
        rows = [
            (x / 10.0, 3.0 * x / 10.0 + 2.0 + rng.gauss(0, 1.5))
            for x in range(120)
        ]
        df = spark.createDataFrame(rows, "x double, y double")
        got = quantile_regression(
            df, ["x"], "y", tau=0.75, iterations=6
        ).collect()[0]
        ref = self._irls_ref(rows, tau=0.75, iters=6)
        assert got["intercept"] == pytest.approx(ref[0], rel=1e-9)
        assert got["coef_x"] == pytest.approx(ref[1], rel=1e-9)
        assert got["n"] == 120

    def test_quantile_ordering_and_coverage(self, spark):
        from temporal_retriever_spark.features import quantile_regression

        import random

        rng = random.Random(17)
        rows = [
            (x / 10.0, 1.0 + 0.5 * x / 10.0 + rng.gauss(0, 2.0))
            for x in range(300)
        ]
        df = spark.createDataFrame(rows, "x double, y double")
        lines = {}
        for tau in (0.1, 0.5, 0.9):
            r = quantile_regression(
                df, ["x"], "y", tau=tau, iterations=25
            ).collect()[0]
            lines[tau] = (r["intercept"], r["coef_x"])
        # envelopes ordered at the data midpoint
        mid = 15.0
        ys = {t: a + b * mid for t, (a, b) in lines.items()}
        assert ys[0.1] < ys[0.5] < ys[0.9]
        # coverage: ~90% of points under the tau=0.9 line
        a, b = lines[0.9]
        frac = sum(1 for x, y in rows if y <= a + b * x) / len(rows)
        assert 0.85 <= frac <= 0.95

    def test_median_fit_resists_outliers(self, spark):
        from temporal_retriever_spark.features import (
            quantile_regression,
            ridge_regression,
        )

        rows = [(float(i) / 20.0, 2.0 * i / 20.0 + 1.0) for i in range(40)]
        rows += [(0.5, 500.0), (0.6, 400.0)]  # one-sided wild outliers
        df = spark.createDataFrame(rows, "x double, y double")
        med = quantile_regression(df, ["x"], "y", tau=0.5, iterations=8).collect()[0]
        ols = ridge_regression(df, ["x"], "y", l2=0.0).collect()[0]
        assert abs(ols["intercept"] - 1.0) > 5.0
        assert abs(med["intercept"] - 1.0) < 1.0

    def test_validation(self, spark):
        from temporal_retriever_spark.features import quantile_regression

        df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
        for bad in (0.0, 1.0, -0.2):
            with pytest.raises(ValueError):
                quantile_regression(df, ["x"], "y", tau=bad)
        with pytest.raises(ValueError):
            quantile_regression(df, ["x"], "y", iterations=0)
        with pytest.raises(ValueError):
            quantile_regression(df, ["x"], "y", eps=0.0)
        with pytest.raises(ValueError):
            quantile_regression(df, [], "y")


class TestBoxCox:
    def _ll(self, y, lam):
        import numpy as np

        y = np.asarray(y, float)
        t = np.log(y) if lam == 0 else (y**lam - 1) / lam
        v = t.var()
        return -len(y) / 2 * np.log(v) + (lam - 1) * np.log(y).sum()

    def test_loglik_matches_reference(self, spark):
        import numpy as np

        from temporal_retriever_spark.features import boxcox_lambda

        rng = np.random.default_rng(2)
        y = np.exp(rng.normal(size=200))  # lognormal: λ=0 should win
        df = spark.createDataFrame([(float(v),) for v in y], "y double")
        rows = boxcox_lambda(df).collect()
        got = {r["lam"]: r for r in rows}
        for lam in (-1.0, 0.0, 1.0, 2.0):
            assert got[lam]["loglik"] == pytest.approx(
                self._ll(y, lam), rel=1e-9
            )
        best = [r["lam"] for r in rows if r["is_best"]]
        assert best == [0.0]

    def test_recovers_planted_lambda(self, spark):
        import numpy as np

        from temporal_retriever_spark.features import boxcox_lambda

        rng = np.random.default_rng(4)
        z = rng.normal(3, 0.8, size=300)
        y = (1 + 0.5 * z) ** 2  # exact inverse transform at λ=0.5
        df = spark.createDataFrame([(float(v),) for v in y], "y double")
        best = [
            r["lam"] for r in boxcox_lambda(df).collect() if r["is_best"]
        ]
        assert best == [0.5]

    def test_nonpositive_excluded_and_keyed(self, spark):
        from temporal_retriever_spark.features import boxcox_lambda

        df = spark.createDataFrame(
            [("a", 1.0), ("a", -5.0), ("a", 2.0), ("a", 4.0), ("b", 3.0)],
            "k string, y double",
        )
        rows = boxcox_lambda(df, key_cols=("k",)).collect()
        a = [r for r in rows if r["k"] == "a"]
        b = [r for r in rows if r["k"] == "b"]
        assert all(r["n"] == 3 for r in a)  # the -5 row is out of domain
        assert all(r["loglik"] is None for r in b)  # single row: no variance
        assert not any(r["is_best"] for r in b)

    def test_transform_and_validation(self, spark):
        import math

        from temporal_retriever_spark.features import (
            boxcox_lambda,
            boxcox_transform,
        )

        df = spark.createDataFrame(
            [(4.0,), (9.0,), (-1.0,)], "y double"
        )
        got = {
            r["y"]: r["y_bc"]
            for r in boxcox_transform(df, 0.5).collect()
        }
        assert got[4.0] == pytest.approx(2.0)  # (2-1)/0.5
        assert got[9.0] == pytest.approx(4.0)
        assert got[-1.0] is None
        log = {
            r["y"]: r["y_bc"]
            for r in boxcox_transform(df, 0.0).collect()
        }
        assert log[4.0] == pytest.approx(math.log(4.0))
        with pytest.raises(ValueError):
            boxcox_lambda(df, lambdas=())
        with pytest.raises(ValueError):
            boxcox_lambda(df, lambdas=(1.0, 1.0))


class TestCalendarFeatures:
    def test_fields_and_fourier(self, spark):
        import math

        from temporal_retriever_spark.features import calendar_features

        df = spark.createDataFrame(
            [("2024-01-01",), ("2024-02-29",), ("2024-06-15",), ("2024-12-31",)],
            "ds: string",
        ).select(F.col("ds").cast("date").alias("ds"))
        got = {
            str(r["ds"]): r
            for r in calendar_features(
                df, ts_col="ds", fourier_weekly=(1,), fourier_yearly=(2,)
            ).collect()
        }
        jan1 = got["2024-01-01"]  # a Monday
        assert jan1["dow"] == 1 and jan1["is_weekend"] is False
        assert jan1["is_month_start"] is True and jan1["doy"] == 1
        feb29 = got["2024-02-29"]
        assert feb29["is_month_end"] is True and feb29["month"] == 2
        jun15 = got["2024-06-15"]  # a Saturday
        assert jun15["dow"] == 6 and jun15["is_weekend"] is True
        # fourier replay
        td = (__import__("datetime").date(2024, 6, 15)
              - __import__("datetime").date(1970, 1, 1)).days
        assert jun15["weekly_sin_1"] == pytest.approx(
            math.sin(td * 2 * math.pi / 7.0), rel=1e-12
        )
        assert jun15["yearly_cos_2"] == pytest.approx(
            math.cos(td * 2 * math.pi * 2 / 365.25), rel=1e-12
        )

    def test_validation(self, spark):
        from temporal_retriever_spark.features import calendar_features

        df = spark.createDataFrame([("2024-01-01",)], "ds: string")
        with pytest.raises(ValueError):
            calendar_features(df, ts_col="ds", fourier_weekly=(0,))
