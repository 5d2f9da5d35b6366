"""Whole-series diagnostics: ACF (W1), PACF (W2), describe (W11), Granger (W10).

Reference: ``autocorrelation``/``partial_autocorrelation`` wrap
statsmodels ``acf``/``pacf`` (core.py:6-27, called app.py:231-238);
Granger causality is declared in the API enum (app.py:33) and prototyped
in Untitled.ipynb cell 12; ``univariateStatistics`` declared but never
implemented (app.py:33) — we implement the intent as a describe agg.

Spark-first design:

* **ACF is fully native** — the statsmodels formula (adjusted=False)

      acf_k = Σ_t (y_t − ȳ)(y_{t+k} − ȳ) / Σ_t (y_t − ȳ)²

  is K lag-window products over one sort, aggregated per series: one
  shuffle for the window sort + one for the final agg, regardless of K.
  At 100 TB this is the scale path; no Python crosses the row stream.
* **PACF needs the whole series** (Yule-Walker solves a dense Toeplitz
  system) → grouped pandas UDF per series, numpy-only. Matches
  statsmodels ``pacf(method='ywadjusted')``: autocovariances with the
  *adjusted* divisor n−k, AR(k) solved per order, pacf_k = last coef.
* **Granger** — per (target, covariate) pair: OLS restricted vs
  unrestricted lag regressions, ssr-based F statistic (the notebook's
  ``ssr_ftest``), numpy ``lstsq`` inside the same grouped-UDF surface.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def default_nlags(n: int) -> int:
    """statsmodels default: min(10·log₁₀(n), n−1) (core.py:6-21 call)."""
    if n <= 1:
        return 0
    return min(int(10 * math.log10(n)), n - 1)


def acf(
    df: DataFrame,
    *,
    lags: int = 10,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """W1: autocorrelation function per series, natively.

    Output: one row per (series, lag) with ``lag`` in 0..lags (lag 0 is
    1.0 by construction, as statsmodels returns it).

    The divisors in numerator/denominator (both 1/n) cancel, so
    ``acf_k = sum(d_t * d_{t-k}) / sum(d_t^2)`` with d centered by the
    full-series mean.
    """
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols)
    ws = w.orderBy(ts_col)
    d = df.withColumn("_d", F.col(value_col) - F.avg(value_col).over(w))
    for k in range(1, lags + 1):
        d = d.withColumn(f"_p{k}", F.col("_d") * F.lag("_d", k).over(ws))
    agg = d.groupBy(*series_cols).agg(
        F.sum(F.col("_d") * F.col("_d")).alias("_c0"),
        *[F.sum(f"_p{k}").alias(f"_s{k}") for k in range(1, lags + 1)],
    )
    # try_divide: a constant series has zero variance (_c0 = 0) — ANSI
    # mode would throw; NULL acf (surfaced as NaN) matches statsmodels
    pairs = F.array(
        F.struct(F.lit(0).alias("lag"), F.lit(1.0).alias("acf")),
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.try_divide(F.col(f"_s{k}"), F.col("_c0")).alias("acf"),
            )
            for k in range(1, lags + 1)
        ],
    )
    return (
        agg.select(*series_cols, F.explode(pairs).alias("_e"))
        .select(*series_cols, F.col("_e.lag").alias("lag"), F.col("_e.acf").alias("acf"))
    )


def _yule_walker_pacf(y: np.ndarray, nlags: int) -> np.ndarray:
    """PACF via Yule-Walker with adjusted (n−k) autocovariance divisor.

    Mirrors statsmodels ``pacf_yw(..., method='adjusted')``: for each
    order k solve the k×k Toeplitz system R a = r and take a[k-1].
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    d = y - y.mean()
    # adjusted autocovariances c_0..c_nlags
    c = np.array(
        [(d[: n - k] * d[k:]).sum() / (n - k) for k in range(nlags + 1)]
    )
    out = np.empty(nlags + 1)
    out[0] = 1.0
    for k in range(1, nlags + 1):
        rho = c[1 : k + 1] / c[0]
        # Toeplitz matrix of normalized autocovariances
        mat = np.empty((k, k))
        for i in range(k):
            for j in range(k):
                mat[i, j] = c[abs(i - j)] / c[0]
        try:
            a = np.linalg.solve(mat, rho)
            out[k] = a[-1]
        except np.linalg.LinAlgError:
            out[k] = np.nan
    return out


def pacf(
    df: DataFrame,
    *,
    lags: int = 10,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """W2: partial autocorrelation per series via grouped pandas UDF.

    One group = one series (the reference's whole-DataFrame statsmodels
    call, core.py:24-27); Arrow-batched, numpy-only on executors.
    """
    series_cols = list(series_cols)
    schema = StructType(
        [StructField(c, df.schema[c].dataType) for c in series_cols]
        + [StructField("lag", IntegerType()), StructField("pacf", DoubleType())]
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        k = min(lags, max(y.size // 2 - 1, 0))
        vals = _yule_walker_pacf(y, k) if k > 0 else np.array([1.0])
        out = pd.DataFrame({"lag": np.arange(vals.size), "pacf": vals})
        for c in series_cols:
            out[c] = pdf[c].iloc[0]
        return out[series_cols + ["lag", "pacf"]]

    return df.groupBy(*series_cols).applyInPandas(compute, schema)


def describe(
    df: DataFrame,
    *,
    series_cols: Iterable[str] = ("series_id",),
    value_col: str = "y",
) -> DataFrame:
    """W11: univariate statistics per series, one native agg.

    count / mean / sample std / min / q25 / median / q75 / max —
    quantiles are exact linear-interpolated ``percentile`` (matches
    DuckDB ``quantile_cont``). At 100 TB swap to ``percentile_approx``.
    """
    series_cols = list(series_cols)
    qs = F.percentile(value_col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    aggs = [
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.stddev_samp(value_col).alias("std"),
        F.min(value_col).alias("min"),
        qs[0].alias("q25"),
        qs[1].alias("median"),
        qs[2].alias("q75"),
        F.max(value_col).alias("max"),
    ]
    if series_cols:
        return df.groupBy(*series_cols).agg(*aggs)
    return df.agg(*aggs)


def _granger_f(y: np.ndarray, x: np.ndarray, lag: int) -> tuple[float, int, int]:
    """ssr-based Granger F test for one lag order.

    Restricted:   y_t ~ const + y_{t-1..t-lag}
    Unrestricted: y_t ~ const + y_{t-1..t-lag} + x_{t-1..t-lag}
    F = ((RSS_r − RSS_u)/lag) / (RSS_u/(n − 2·lag − 1))
    (statsmodels grangercausalitytests ssr_ftest semantics.)
    """
    n = y.size
    rows = n - lag
    if rows <= 2 * lag + 1:
        return (float("nan"), lag, rows - 2 * lag - 1)
    target = y[lag:]
    ylags = np.column_stack([y[lag - k : n - k] for k in range(1, lag + 1)])
    xlags = np.column_stack([x[lag - k : n - k] for k in range(1, lag + 1)])
    const = np.ones((rows, 1))
    restricted = np.hstack([const, ylags])
    unrestricted = np.hstack([const, ylags, xlags])

    def rss(design: np.ndarray) -> float:
        coef, *_ = np.linalg.lstsq(design, target, rcond=None)
        resid = target - design @ coef
        return float(resid @ resid)

    rss_r, rss_u = rss(restricted), rss(unrestricted)
    dfd = rows - 2 * lag - 1
    if rss_u <= 0:
        return (float("inf"), lag, dfd)
    fstat = ((rss_r - rss_u) / lag) / (rss_u / dfd)
    return (fstat, lag, dfd)


def granger_causality(
    df: DataFrame,
    *,
    maxlag: int = 14,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    target_col: str = "y",
    cov_col: str = "x",
    detrend: bool = True,
) -> DataFrame:
    """W10: Granger F statistics per series pair and lag 1..maxlag.

    Input is the aligned pair frame (ds, y, x) per series (J2 output).
    The notebook prototype removes a linear trend first and gates on
    len ≥ maxlag (Untitled.ipynb cell 12) — both reproduced here.
    """
    from temporal_retriever_spark.stats import f_sf

    series_cols = list(series_cols)
    schema = StructType(
        [StructField(c, df.schema[c].dataType) for c in series_cols]
        + [
            StructField("lag", IntegerType()),
            StructField("f_stat", DoubleType()),
            StructField("p_value", DoubleType()),
            StructField("df_num", IntegerType()),
            StructField("df_den", LongType()),
            StructField("n_obs", LongType()),
        ]
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).dropna(subset=[target_col, cov_col])
        y = pdf[target_col].to_numpy(dtype=np.float64)
        x = pdf[cov_col].to_numpy(dtype=np.float64)
        records = []
        if y.size >= maxlag:
            if detrend and y.size > 1:
                t = np.arange(y.size, dtype=np.float64)
                y = y - np.polyval(np.polyfit(t, y, 1), t)
                x = x - np.polyval(np.polyfit(t, x, 1), t)
            for lag in range(1, maxlag + 1):
                fstat, dfn, dfd = _granger_f(y, x, lag)
                pval = f_sf(fstat, dfn, dfd) if dfd > 0 else float("nan")
                records.append((lag, fstat, pval, dfn, dfd, y.size))
        cols = ["lag", "f_stat", "p_value", "df_num", "df_den", "n_obs"]
        out = pd.DataFrame(records, columns=cols)
        for c in series_cols:
            out[c] = pdf[c].iloc[0] if len(pdf) else None
        return out[series_cols + cols]

    return df.groupBy(*series_cols).applyInPandas(compute, schema)
