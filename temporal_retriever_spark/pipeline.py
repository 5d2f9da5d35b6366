"""End-to-end analysis pipelines — the reference's three endpoints
re-expressed over the Spark engine.

Reference lifecycles (SURVEY §3): ``/analyze`` (app.py:96-250),
``/saturating-growth`` (app.py:490-559), ``/saturating-growth/single``
(app.py:562-609).

Documented divergences implemented as *intent* (SURVEY §3.1/§3.2):

* ALL correlations are processed — the reference returns from inside
  its loop (app.py:250) so only the first ever ran.
* ``grain``/``aggregation`` are actually applied on the saturating
  endpoints — the reference extracts then drops them (app.py:497-498).
* grain ``"min"`` is accepted (the reference's bucketer only matched
  "m", core.py:34, so the enum's "min" 500'd).
* day-grain bucketing works in the saturating path (the reference's
  bundle variant crashes, app.py:430).
* forecasts use the native deterministic linear+seasonal model
  (forecast.py) — Prophet isn't installed here; with prophet present
  ``backend="prophet"`` restores library parity.

Each correlation is independent; at scale the engine runs them as ONE
Spark plan per stage over the union of series (series_id keyed), not a
Python loop per correlation — the loop here only assembles per-
correlation response dicts from already-distributed computations.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import bucket_aggregate, date_bounds
from temporal_retriever_spark.align import coalesce_actuals, split_forecasts
from temporal_retriever_spark.api.models import AnalyzeRequest, Correlation
from temporal_retriever_spark.diagnostics import acf, default_nlags, pacf
from temporal_retriever_spark.forecast import (
    forecast_linear_seasonal,
    forecast_with_covariate,
)
from temporal_retriever_spark.ingest import documents_df, extract_series

ACF_DESCRIPTION = (
    "Autocorrelation measures the correlation between a time series and "
    "its lagged values over successive intervals; coefficients range "
    "from -1 to +1."
)
PACF_DESCRIPTION = (
    "Partial autocorrelation measures the direct correlation between a "
    "time series and a specific lagged value, removing the effect of "
    "intermediate lags."
)


def _prepare(
    raw: DataFrame, correlation: Correlation, *, dataset: str, index: str
) -> DataFrame:
    """prepare_dataset (app.py:70-93): extract → parse → bucket-agg.

    Request-embedded documents are driver-scale (10²-10⁴ rows), so the
    bucketed series is squeezed to one partition — per-request latency
    is dominated by task scheduling, not data. The batch engine path
    (bucket_aggregate on big tables) never does this.
    """
    series = extract_series(raw, dataset=dataset, index_path=index)
    return bucket_aggregate(
        series.filter(F.col("ds").isNotNull()),
        grain=correlation.grain,
        agg=correlation.aggregation,
        series_cols=("series_id",),
    ).coalesce(1)


def _leg_stats(bucketed: DataFrame, *, dataset: str, index: str):
    """One action: (min_ds, max_ds, n_buckets); clear error when empty."""
    row = bucketed.agg(
        F.min("ds").alias("min_ds"),
        F.max("ds").alias("max_ds"),
        F.count("y").alias("n"),
    ).collect()[0]
    if row["n"] == 0:
        raise ValueError(
            f"dataset {dataset!r} / index {index!r} produced no observations"
        )
    return row


def _records(df: DataFrame) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


_RENAMES = {
    "ds": "date",
    "yhat": "prediction",
    "yhat_lower": "prediction_lower_bound",
    "yhat_upper": "prediction_upper_bound",
}


def _rename_predictions(df: DataFrame) -> DataFrame:
    cols = [
        F.col(c).alias(_RENAMES.get(c, c)) for c in df.columns if c != "series_id"
    ]
    return df.select(*cols)


def analyze(
    spark: SparkSession, request: AnalyzeRequest, *, lags: int | None = None
) -> dict:
    """``/analyze`` semantics: covariate-driven forecast per correlation.

    Returns {"correlations": {id: {diagnostics, autocorrelations,
    partialAutocorrelations, regressorCoefficients, predictions}}} —
    the reference's response shape (app.py:211-248, responses.py).
    """
    raw = documents_df(spark, request.documents)
    raw.cache()
    output: dict[str, Any] = {"correlations": {}}
    try:
        for corr in request.correlations:
            cov = _prepare(raw, corr, dataset=corr.from_data, index=corr.from_index)
            target = _prepare(raw, corr, dataset=corr.to_data, index=corr.to_index)
            cov.cache()
            target.cache()

            cov_stats = _leg_stats(cov, dataset=corr.from_data, index=corr.from_index)
            tgt_stats = _leg_stats(target, dataset=corr.to_data, index=corr.to_index)
            n_cov, n_tgt = cov_stats["n"], tgt_stats["n"]
            cov_horizon = corr.prediction_horizon or n_cov
            tgt_horizon = corr.prediction_horizon or n_tgt

            # covariate leg: forecast, then actuals override predictions
            cov_pred = forecast_linear_seasonal(
                cov, grain=corr.grain, horizon=cov_horizon
            ).select("series_id", "ds", F.col("yhat").alias("cov"))
            cov_full = coalesce_actuals(
                cov_pred,
                cov.select("series_id", "ds", "y"),
                on=("series_id", "ds"),
                pred_col="cov",
                out_col="cov",
            )
            # rekey the covariate grid onto the target's series id so the
            # alignment join (J2/J3) is a plain equi-join on (series, ds);
            # series ids are deterministic "<dataset>.<index>" strings
            tgt_sid = f"{corr.to_data}.{corr.to_index}"
            cov_for_target = cov_full.withColumn("series_id", F.lit(tgt_sid))

            pred = forecast_with_covariate(
                target.select("series_id", "ds", "y"),
                cov_for_target,
                grain=corr.grain,
                horizon=tgt_horizon,
            )
            # single collect: segment flag instead of two split frames
            max_hist = tgt_stats["max_ds"]
            pred_rows = pred.orderBy("ds").collect()
            coef = pred_rows[0]["coef"] if pred_rows else None

            k = lags if lags is not None else default_nlags(n_tgt)
            k_cov = lags if lags is not None else default_nlags(n_cov)
            # union both legs -> ONE acf plan and ONE pacf plan per
            # correlation (halves the applyInPandas worker round-trips)
            both = cov.unionByName(target)
            k_max = max(k, k_cov, 1)
            acf_both = acf(both, lags=k_max, series_cols=("series_id",)).collect()
            pacf_both = pacf(both, lags=k_max, series_cols=("series_id",)).collect()
            cov_sid = f"{corr.from_data}.{corr.from_index}"

            def lags_for(rows, sid, col, kk):
                return {
                    "lags": {
                        int(r["lag"]): float(r[col])
                        for r in sorted(rows, key=lambda r: r["lag"])
                        if r["series_id"] == sid and r["lag"] <= kk
                    }
                }

            def to_record(row):
                d = row.asDict()
                d.pop("series_id", None)
                d.pop("coef", None)
                return {_RENAMES.get(k, k): v for k, v in d.items()}

            hist_records = [to_record(r) for r in pred_rows if r["ds"] <= max_hist]
            future_records = [to_record(r) for r in pred_rows if r["ds"] > max_hist]

            output["correlations"][corr.id] = {
                "diagnostics": {
                    "units": corr.grain,
                    "from": {
                        "data": corr.from_data,
                        "index": corr.from_index,
                        "minDate": cov_stats["min_ds"],
                        "maxDate": cov_stats["max_ds"],
                        "unitsForecasted": cov_horizon,
                    },
                    "to": {
                        "data": corr.to_data,
                        "index": corr.to_index,
                        "minDate": tgt_stats["min_ds"],
                        "maxDate": tgt_stats["max_ds"],
                        "unitsForecasted": tgt_horizon,
                    },
                },
                "autocorrelations": {
                    "description": ACF_DESCRIPTION,
                    "from": lags_for(acf_both, cov_sid, "acf", k_cov),
                    "to": lags_for(acf_both, tgt_sid, "acf", k),
                },
                "partialAutocorrelations": {
                    "description": PACF_DESCRIPTION,
                    "from": lags_for(pacf_both, cov_sid, "pacf", k_cov),
                    "to": lags_for(pacf_both, tgt_sid, "pacf", k),
                },
                "regressorCoefficients": [
                    {"regressor": cov_sid, "coef": coef}
                ],
                "predictions": {
                    "historicalForecasts": hist_records,
                    "futureForecasts": future_records,
                },
            }
            cov.unpersist()
            target.unpersist()
    finally:
        raw.unpersist()
    return output


def saturating_growth(spark: SparkSession, request: AnalyzeRequest) -> dict:
    """``/saturating-growth`` semantics (app.py:490-559), intent version.

    Covariate and target both forecast with floor/cap clamping (W5);
    the covariate's actuals override its predictions before the target
    leg consumes it (app.py:478-483).
    """
    raw = documents_df(spark, request.documents)
    raw.cache()
    output: dict[str, Any] = {"correlations": {}}
    try:
        for corr in request.correlations:
            opts = corr.forecast_options
            from_cap = opts.from_cap if opts else None
            to_cap = opts.to_cap if opts else None
            cov = _prepare(raw, corr, dataset=corr.from_data, index=corr.from_index)
            target = _prepare(raw, corr, dataset=corr.to_data, index=corr.to_index)
            horizon = corr.prediction_horizon

            cov_pred = forecast_linear_seasonal(
                cov,
                grain=corr.grain,
                horizon=horizon,
                saturating=True,
                user_floor=from_cap.floor if from_cap else 0.0,
                user_ceiling=from_cap.ceiling if from_cap else None,
            )
            cov_full = coalesce_actuals(
                cov_pred.select("series_id", "ds", "yhat"),
                cov.select("series_id", "ds", "y"),
                on=("series_id", "ds"),
                pred_col="yhat",
                out_col="cov",
            )
            tgt_sid = f"{corr.to_data}.{corr.to_index}"
            cov_for_target = cov_full.withColumn("series_id", F.lit(tgt_sid))
            pred = forecast_with_covariate(
                target.select("series_id", "ds", "y"),
                cov_for_target,
                grain=corr.grain,
                horizon=horizon,
            )
            # clamp the target leg into its caps (W5)
            from temporal_retriever_spark.aggregate import floor_ceiling

            caps = floor_ceiling(
                target,
                series_cols=("series_id",),
                user_floor=to_cap.floor if to_cap else 0.0,
                user_ceiling=to_cap.ceiling if to_cap else None,
            ).select("series_id", "floor", "cap")
            clamped = (
                pred.join(F.broadcast(caps), on="series_id")
                .withColumn(
                    "yhat",
                    F.least(F.greatest(F.col("yhat"), F.col("floor")), F.col("cap")),
                )
                .drop("floor", "cap")
            )
            hist, future = split_forecasts(
                clamped.drop("coef"),
                date_bounds(target, series_cols=("series_id",)),
                series_cols=("series_id",),
            )
            output["correlations"][corr.id] = {
                "historicalForecasts": _records(_rename_predictions(hist.orderBy("ds"))),
                "futureForecasts": _records(_rename_predictions(future.orderBy("ds"))),
            }
    finally:
        raw.unpersist()
    return output


def saturating_growth_single(
    spark: SparkSession,
    documents: dict,
    *,
    dataset: str,
    index: str,
    grain: str = "D",
    aggregation: str = "sum",
    horizon: int | None = None,
    floor: float | None = 0.0,
    ceiling: float | None = None,
) -> dict:
    """``/saturating-growth/single`` (app.py:562-609): univariate leg only."""
    raw = documents_df(spark, documents)
    series = extract_series(raw, dataset=dataset, index_path=index)
    bucketed = bucket_aggregate(
        series.filter(F.col("ds").isNotNull()),
        grain=grain,
        agg=aggregation,
        series_cols=("series_id",),
    )
    pred = forecast_linear_seasonal(
        bucketed,
        grain=grain,
        horizon=horizon,
        saturating=True,
        user_floor=floor,
        user_ceiling=ceiling,
    )
    hist, future = split_forecasts(
        pred,
        date_bounds(bucketed, series_cols=("series_id",)),
        series_cols=("series_id",),
    )
    return {
        "historicalForecasts": _records(_rename_predictions(hist.orderBy("ds"))),
        "futureForecasts": _records(_rename_predictions(future.orderBy("ds"))),
    }
