"""State-space filtering: Kalman local-level filter, RTS smoother,
and the implied forecast.

The local-level (random-walk-plus-noise) model is the simplest
structural time-series model (Harvey 1989; Durbin & Koopman 2012):

    y_t = μ_t + ε_t,   ε_t ~ N(0, r)      (observation noise)
    μ_t = μ_{t−1} + η_t,  η_t ~ N(0, q)   (level drift)

It generalizes the EWMA the reference exposes (`rolling.ewma` is the
steady-state limit of this filter) with principled uncertainty: the
filter emits a level VARIANCE per step, missing observations simply
propagate the prediction (variance grows by q), and the h-step
forecast interval is exact: Var[ŷ_{n+h}] = p_n + h·q + r.

No reference analog (the reference's only smoother is Prophet's
trend; app.py has no filtering surface) — this extends the
forecasting toolkit the same way `forecast_holt_winters` does.

Scale design: the recursion is sequential per series, so each series
runs ONE Arrow-batched pandas pass (`applyInPandas`) — the documented
Python path for coupled recursions, identical in shape to
`forecast_holt_winters`. State is O(1) per series; the shuffle is the
single groupBy(series) exchange. The DuckDB oracle replays the exact
recursion as a recursive CTE, so the filter is hash-checked
cross-engine despite being iterative.
"""

from __future__ import annotations

import math
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kalman_local_level",
    "kalman_forecast",
    "garch_volatility",
    "garch_forecast",
]


def _check_qr(q: float, r: float) -> None:
    if not q >= 0.0:
        raise ValueError(f"state variance q must be >= 0: {q}")
    if not r > 0.0:
        raise ValueError(f"observation variance r must be > 0: {r}")


def kalman_local_level(
    df: DataFrame,
    *,
    q: float = 1.0,
    r: float = 1.0,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    y_col: str = "y",
    smooth: bool = False,
) -> DataFrame:
    """Filter (and optionally RTS-smooth) each series.

    Filter init: posterior a₁ = y₁, p₁ = r. Step t ≥ 2:

        p⁻ = p_{t−1} + q;  k = p⁻ / (p⁻ + r)
        a_t = a_{t−1} + k·(y_t − a_{t−1});  p_t = (1 − k)·p⁻

    NULL observations skip the update (a_t = a_{t−1}, p_t = p⁻) —
    gap-tolerant by construction, variance widens through the gap.
    Rows BEFORE the first observed value have NULL level/variance
    (nothing anchors the diffuse prior yet).

    Output: input keys + (ds, y, level, level_var), plus
    (level_smooth, smooth_var) when ``smooth=True`` — the backward
    Rauch-Tung-Striebel pass a*_t = a_t + c_t(a*_{t+1} − a_t),
    p*_t = p_t + c_t²(p*_{t+1} − p⁻_{t+1}), c_t = p_t / p⁻_{t+1}.
    Smoothed variance never exceeds the filtered one (tested).
    """
    _check_qr(q, r)
    series_cols = list(series_cols)
    key_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in series_cols
    )
    ds_type = df.schema[ds_col].dataType.simpleString()
    schema = (
        f"{key_fields}, {ds_col} {ds_type}, y double, "
        "level double, level_var double"
    )
    if smooth:
        schema += ", level_smooth double, smooth_var double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ds_col, kind="mergesort")
        ys = pdf[y_col].astype(float)
        n = len(pdf)
        a_arr = [0.0] * n
        p_arr = [0.0] * n
        a = None
        p = None
        for t in range(n):
            y = ys.iloc[t]
            y = None if pd.isna(y) else float(y)
            if a is None:
                # diffuse start: first OBSERVED value anchors the level
                if y is None:
                    a_arr[t], p_arr[t] = float("nan"), float("nan")
                    continue
                a, p = y, r
            else:
                ppred = p + q
                if y is None:
                    a, p = a, ppred
                else:
                    k = ppred / (ppred + r)
                    a = a + k * (y - a)
                    p = (1.0 - k) * ppred
            a_arr[t], p_arr[t] = a, p
        out = pdf[series_cols + [ds_col]].copy()
        out["y"] = ys.astype(object).where(pd.notna(ys), None)
        out["level"] = a_arr
        out["level_var"] = p_arr
        if smooth:
            s_a = list(a_arr)
            s_p = list(p_arr)
            for t in range(n - 2, -1, -1):
                ppred_next = p_arr[t] + q
                if ppred_next > 0.0 and not pd.isna(p_arr[t]):
                    c = p_arr[t] / ppred_next
                    s_a[t] = a_arr[t] + c * (s_a[t + 1] - a_arr[t])
                    s_p[t] = p_arr[t] + c * c * (s_p[t + 1] - ppred_next)
            out["level_smooth"] = s_a
            out["smooth_var"] = s_p
        return out

    return df.groupBy(*series_cols).applyInPandas(run, schema)


def kalman_forecast(
    df: DataFrame,
    *,
    horizon: int = 14,
    q: float = 1.0,
    r: float = 1.0,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    y_col: str = "y",
    interval_width: float = 0.8,
) -> DataFrame:
    """h-step local-level forecast with exact intervals.

    The local-level point forecast is flat at the final filtered
    level; the predictive variance is closed-form: p_n + h·q + r.
    Daily-grain output: (series, ds, yhat, yhat_var, yhat_lower,
    yhat_upper) for h = 1..horizon, interval = yhat ± z·√var with z
    the two-sided normal quantile for ``interval_width``.

    Plan: the filter's one grouped Arrow pass, then a native
    sequence-explode grid — the variance-vs-horizon expansion is a
    JVM expression, no second Python pass.
    """
    _check_qr(q, r)
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1: {horizon}")
    if not 0.0 < interval_width < 1.0:
        raise ValueError(f"interval_width must be in (0,1): {interval_width}")
    from temporal_retriever_spark.stats import norm_ppf

    z = norm_ppf(0.5 + interval_width / 2.0)
    series_cols = list(series_cols)
    filt = kalman_local_level(
        df, q=q, r=r, series_cols=series_cols, ds_col=ds_col, y_col=y_col
    )
    last = filt.groupBy(*series_cols).agg(
        F.max_by("level", ds_col).alias("_a"),
        F.max_by("level_var", ds_col).alias("_p"),
        F.max(ds_col).alias("_last_ds"),
    )
    grid = last.select(
        *series_cols,
        "_a",
        "_p",
        "_last_ds",
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("_h"),
    )
    var = F.col("_p") + F.col("_h") * F.lit(float(q)) + F.lit(float(r))
    return grid.select(
        *series_cols,
        F.date_add(F.col("_last_ds"), F.col("_h")).alias(ds_col),
        F.col("_a").alias("yhat"),
        var.alias("yhat_var"),
        (F.col("_a") - F.lit(z) * F.sqrt(var)).alias("yhat_lower"),
        (F.col("_a") + F.lit(z) * F.sqrt(var)).alias("yhat_upper"),
    )


def _check_garch(alpha: float, beta: float, omega: float | None) -> None:
    if not alpha >= 0.0:
        raise ValueError(f"alpha must be >= 0: {alpha}")
    if not beta >= 0.0:
        raise ValueError(f"beta must be >= 0: {beta}")
    if not alpha + beta < 1.0:
        raise ValueError(
            f"alpha + beta must be < 1 for covariance stationarity: "
            f"{alpha} + {beta} = {alpha + beta}"
        )
    if omega is not None and not omega > 0.0:
        raise ValueError(f"omega must be > 0: {omega}")


def garch_volatility(
    df: DataFrame,
    *,
    alpha: float = 0.1,
    beta: float = 0.85,
    omega: float | None = None,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    y_col: str = "y",
    demean: bool = False,
) -> DataFrame:
    """GARCH(1,1) conditional volatility (Bollerslev 1986) per series:

        σ²_t = ω + α·e²_{t−1} + β·σ²_{t−1}

    with fixed parameters — the filtering/scoring operator, not an MLE
    fitter (the GARCH likelihood is non-convex; at scale you fit
    parameters offline on a sample and SCORE the fleet of series here,
    the same split as ``kalman_local_level``). Covariance stationarity
    ``α + β < 1`` is enforced.

    * ``omega`` given → σ²₁ = ω/(1−α−β) (the unconditional variance):
      every constant in the recursion is closed-form, so the DuckDB
      recursive-CTE oracle matches bit-for-bit (the contract path).
    * ``omega=None`` → variance targeting: ω = s²·(1−α−β) with s² the
      per-series sample variance, σ²₁ = s² (pandas-computed; float
      summation order makes this path ~1e-12-reproducible, not
      bit-exact, across engines).
    * ``demean=True`` subtracts the per-series mean first (same
      caveat); default treats ``y`` as already-centered returns.

    NULL observations propagate variance with the expectation update
    E[e²_t] = σ²_t:  σ²_{t+1} = ω + (α+β)·σ²_t, and score NULL z.

    Output: keys + (ds, y, resid, sigma2, sigma, z) where
    z = resid/σ_t is the standardized residual (|z| spikes flag
    volatility-adjusted anomalies — the vol-aware sibling of
    ``rolling.anomaly_zscore``).

    Plan: ONE groupBy(series) exchange + one Arrow pass with O(1)
    state, identical in shape to ``kalman_local_level``.
    """
    _check_garch(alpha, beta, omega)
    series_cols = list(series_cols)
    key_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in series_cols
    )
    ds_type = df.schema[ds_col].dataType.simpleString()
    schema = (
        f"{key_fields}, {ds_col} {ds_type}, y double, resid double, "
        "sigma2 double, sigma double, z double"
    )
    a, b = float(alpha), float(beta)
    w = None if omega is None else float(omega)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ds_col, kind="mergesort")
        ys = pdf[y_col].astype(float)
        mu = float(ys.mean()) if demean else 0.0
        resid = ys - mu
        if w is None:
            s2 = float(resid.var(ddof=1))
            om = s2 * (1.0 - a - b)
        else:
            om = w
            s2 = w / (1.0 - a - b)
        n = len(pdf)
        sig2 = [0.0] * n
        cur = s2
        for t in range(n):
            if t > 0:
                e_prev = resid.iloc[t - 1]
                if pd.isna(e_prev):
                    cur = om + (a + b) * cur
                else:
                    cur = om + a * (e_prev * e_prev) + b * cur
            sig2[t] = cur
        out = pdf[series_cols + [ds_col]].copy()
        out["y"] = ys.astype(object).where(pd.notna(ys), None)
        out["resid"] = resid.astype(object).where(pd.notna(resid), None)
        # math.sqrt, not **0.5: sqrt is correctly rounded IEEE on both
        # engines, pow(x, 0.5) need not be — keeps the oracle bit-exact.
        # A constant series under variance targeting gives sigma2 == 0
        # (omega = 0): score z as NULL instead of dividing by zero —
        # one dead-flat sensor must not abort a fleet-wide run
        out["sigma2"] = sig2
        out["sigma"] = [math.sqrt(s) for s in sig2]
        out["z"] = [
            None if (pd.isna(e) or s <= 0.0) else float(e) / math.sqrt(s)
            for e, s in zip(resid, sig2)
        ]
        return out

    return df.groupBy(*series_cols).applyInPandas(run, schema)


def garch_forecast(
    df: DataFrame,
    *,
    omega: float,
    horizon: int = 14,
    alpha: float = 0.1,
    beta: float = 0.85,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    y_col: str = "y",
    demean: bool = False,
) -> DataFrame:
    """h-step-ahead conditional variance, closed form:

        σ²_{n+h} = σ²_∞ + (α+β)^{h−1}·(σ²_{n+1} − σ²_∞),
        σ²_∞ = ω/(1−α−β),  σ²_{n+1} = ω + α·e²_n + β·σ²_n

    — geometric reversion of the variance forecast to its
    unconditional level, the textbook GARCH term structure.

    Plan: the filter's Arrow pass + a per-series tail aggregation +
    a native sequence-explode grid (the h-expansion is a JVM
    expression, like ``kalman_forecast``). Output: keys + (ds, h,
    sigma2_hat, sigma_hat).
    """
    if omega is None:
        raise ValueError(
            "garch_forecast requires explicit omega — the forecast's "
            "closed form needs the same omega the filter used"
        )
    _check_garch(alpha, beta, omega)
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1: {horizon}")
    series_cols = list(series_cols)
    filt = garch_volatility(
        df, alpha=alpha, beta=beta, omega=omega,
        series_cols=series_cols, ds_col=ds_col, y_col=y_col, demean=demean,
    )
    a, b = float(alpha), float(beta)
    last = filt.groupBy(*series_cols).agg(
        F.max_by("resid", ds_col).alias("_e"),
        F.max_by("sigma2", ds_col).alias("_s2"),
        F.max(ds_col).alias("_last_ds"),
    )
    om_expr = F.lit(float(omega))
    s2_inf = om_expr / F.lit(1.0 - a - b)
    s2_next = (
        om_expr
        + F.lit(a) * F.coalesce(F.col("_e") * F.col("_e"), F.col("_s2"))
        + F.lit(b) * F.col("_s2")
    )
    grid = last.select(
        *series_cols,
        "_last_ds",
        s2_next.alias("_s2n"),
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
    )
    s2_h = s2_inf + F.pow(F.lit(a + b), F.col("h") - F.lit(1)) * (
        F.col("_s2n") - s2_inf
    )
    ds_type = df.schema[ds_col].dataType.simpleString()
    if ds_type in ("date", "timestamp", "timestamp_ntz"):
        next_ds = F.date_add(F.col("_last_ds").cast("date"), F.col("h"))
    else:  # integer step index — advance arithmetically
        next_ds = F.col("_last_ds") + F.col("h")
    return grid.select(
        *series_cols,
        next_ds.alias(ds_col),
        F.col("h"),
        s2_h.alias("sigma2_hat"),
        F.sqrt(s2_h).alias("sigma_hat"),
    )
