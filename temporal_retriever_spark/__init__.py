"""temporal_retriever_spark — a PySpark-native time-series context engine.

A from-scratch re-expression of the capabilities of
``hyperprior/temporal-retriever`` (reference at /root/reference, cited by
file:line in docstrings) as an idiomatic Spark engine:

* canonical long format ``(series_id, ds, y)`` (reference app.py:70-78)
* grain bucketing T2-T6 (reference core.py:30-59)
* dedup aggregation A1-A5 (reference app.py:89, 354-370)
* alignment joins J1-J3 + coalesce P7 (reference app.py:144-169)
* future grids W6, historical/future splits W7 (app.py:132-134, 201-209)
* diagnostics W1/W2/W10/W11 (reference core.py:6-27)
* forecasting W3-W5/W8/W9 (reference app.py:124-199, 442-487)
* LLM-data-pipeline extensions: dedup, similarity search, text analysis,
  multimodal column plumbing (north star, no reference analog)

Everything is DataFrame-API first so Catalyst can push filters, prune
columns, and pick broadcast joins; Python only enters via Arrow-batched
grouped pandas UDFs where whole-series math demands it.
"""

from temporal_retriever_spark.session import get_spark, stop_spark
from temporal_retriever_spark.grains import (
    GRAINS,
    bucket_expr,
    grain_interval,
    grain_duration,
    normalize_grain,
)
from temporal_retriever_spark.aggregate import (
    AGGREGATIONS,
    agg_expr,
    abc_classification,
    bucket_aggregate,
    bucket_aggregate_multi,
    date_bounds,
    floor_ceiling,
    normalize_aggregation,
)
from temporal_retriever_spark.timeparse import parse_timestamp, to_long_format
from temporal_retriever_spark.align import (
    align_series,
    coalesce_actuals,
    future_grid,
    split_forecasts,
)
from temporal_retriever_spark.diagnostics import (
    acf_pacf,
    acf,
    ccf,
    describe,
    f_sf_expr,
    granger_causality,
    granger_lag1,
    granger_native,
    pacf,
    periodogram,
    trend_test,
)
from temporal_retriever_spark.forecast import (
    fit_changepoint_trend,
    forecast_arima,
    forecast_arma,
    forecast_changepoint,
    forecast_exponential_smoothing,
    forecast_covariate_changepoint,
    forecast_linear_seasonal,
    forecast_prophet,
    forecast_croston,
    forecast_tsb,
    forecast_quantiles,
    forecast_var,
    demand_classification,
    forecast_with_covariate,
)
from temporal_retriever_spark.pipeline import (
    analyze,
    saturating_growth,
    saturating_growth_single,
)
from temporal_retriever_spark.api.models import AnalyzeRequest, parse_analyze_request
from temporal_retriever_spark.sources import load_tables, read_table
from temporal_retriever_spark.server import make_server, serve_background
from temporal_retriever_spark.streaming import (
    forecast_refresh,
    streaming_anomaly_zscore,
    streaming_bucket_aggregate,
    streaming_exact_dedup,
    streaming_month_rollup,
    streaming_series_state,
    streaming_sessionize,
    with_arrival_metrics,
)
from temporal_retriever_spark.asof import asof_join, session_stats, sessionize
from temporal_retriever_spark.rolling import (
    anomaly_robust,
    anomaly_seasonal,
    anomaly_zscore,
    cusum_drift,
    decompose,
    ewma,
    fill_gaps,
    rolling_aggregate,
    rolling_aggregate_time,
    rolling_corr,
)
from temporal_retriever_spark.statespace import (
    garch_forecast,
    garch_volatility,
    kalman_forecast,
    kalman_local_level,
)
from temporal_retriever_spark.basket import association_rules, frequent_itemsets
from temporal_retriever_spark.recommend import als_recommend, als_train
from temporal_retriever_spark.segmentation import binseg_changepoints, rfm_scores, segment_means
from temporal_retriever_spark.fuzzy import entity_resolution, fuzzy_join, qgrams_expr
from temporal_retriever_spark.funnel import (
    attribution,
    cohort_retention,
    path_ngrams,
    funnel,
    funnel_summary,
    transition_matrix,
)
from temporal_retriever_spark.graph import (
    connected_components,
    hits,
    k_core,
    label_propagation,
    pagerank,
    shortest_paths,
    triangle_count,
)
from temporal_retriever_spark.history import scd2_history, snapshot_at
from temporal_retriever_spark.tree import (
    ForestModel,
    GBTModel,
    TreeModel,
    forest_apply,
    forest_train,
    gbt_apply,
    gbt_train,
    tree_apply,
    tree_train,
)
from temporal_retriever_spark.quality import (
    bounds,
    benford_test,
    check_constraints,
    completeness,
    contained_in,
    non_negative,
    row_count,
    uniqueness,
)
from temporal_retriever_spark.impute import impute
from temporal_retriever_spark.features import (
    huber_regression,
    quantile_regression,
    make_lag_features,
    mutual_information,
    ridge_regression,
    target_encode,
)
from temporal_retriever_spark.survival import (
    cox_ph,
    kaplan_meier,
    logrank_test,
    median_survival,
    rmst,
    user_lifetimes,
)
from temporal_retriever_spark.evaluation import (
    calibration_bins,
    conformalize,
    classification_metrics,
    forecast_accuracy,
    interval_metrics,
    isotonic_calibration,
    quantile_loss,
)
from temporal_retriever_spark.inference import (
    anova_oneway,
    chi2_independence,
    diff_in_diff,
    propensity_att,
    fdr_bh,
    js_divergence,
    ks_2sample,
    mann_whitney_u,
    mantel_haenszel,
    mcnemar_test,
    spearman_corr,
    prop_ztest,
    psi,
    ratio_ttest,
    wilcoxon_signed_rank,
)

__all__ = [
    "abc_classification",
    "binseg_changepoints",
    "bounds",
    "bucket_aggregate_multi",
    "check_constraints",
    "chi2_independence",
    "fdr_bh",
    "demand_classification",
    "forecast_arima",
    "forecast_arma",
    "forecast_croston",
    "forecast_tsb",
    "forecast_var",
    "cohort_retention",
    "completeness",
    "connected_components",
    "contained_in",
    "als_recommend",
    "als_train",
    "anova_oneway",
    "association_rules",
    "attribution",
    "benford_test",
    "frequent_itemsets",
    "entity_resolution",
    "fuzzy_join",
    "funnel",
    "funnel_summary",
    "garch_forecast",
    "garch_volatility",
    "gbt_apply",
    "gbt_train",
    "hits",
    "k_core",
    "label_propagation",
    "tree_apply",
    "tree_train",
    "impute",
    "js_divergence",
    "ks_2sample",
    "calibration_bins",
    "classification_metrics",
    "cox_ph",
    "diff_in_diff",
    "forecast_accuracy",
    "conformalize",
    "interval_metrics",
    "quantile_loss",
    "forest_apply",
    "forest_train",
    "huber_regression",
    "quantile_regression",
    "isotonic_calibration",
    "kaplan_meier",
    "logrank_test",
    "rmst",
    "make_lag_features",
    "mann_whitney_u",
    "mantel_haenszel",
    "mcnemar_test",
    "spearman_corr",
    "median_survival",
    "mutual_information",
    "propensity_att",
    "ridge_regression",
    "user_lifetimes",
    "non_negative",
    "pagerank",
    "path_ngrams",
    "prop_ztest",
    "psi",
    "ratio_ttest",
    "wilcoxon_signed_rank",
    "qgrams_expr",
    "row_count",
    "scd2_history",
    "shortest_paths",
    "triangle_count",
    "rfm_scores",
    "segment_means",
    "snapshot_at",
    "target_encode",
    "transition_matrix",
    "uniqueness",
    "kalman_local_level",
    "kalman_forecast",
    "get_spark",
    "stop_spark",
    "GRAINS",
    "bucket_expr",
    "grain_interval",
    "grain_duration",
    "normalize_grain",
    "AGGREGATIONS",
    "agg_expr",
    "bucket_aggregate",
    "date_bounds",
    "floor_ceiling",
    "normalize_aggregation",
    "parse_timestamp",
    "to_long_format",
    "align_series",
    "coalesce_actuals",
    "future_grid",
    "split_forecasts",
    "acf",
    "acf_pacf",
    "ccf",
    "describe",
    "granger_causality",
    "granger_lag1",
    "granger_native",
    "f_sf_expr",
    "pacf",
    "periodogram",
    "trend_test",
    "fit_changepoint_trend",
    "forecast_changepoint",
    "forecast_exponential_smoothing",
    "forecast_covariate_changepoint",
    "forecast_linear_seasonal",
    "forecast_prophet",
    "forecast_quantiles",
    "forecast_with_covariate",
    "analyze",
    "saturating_growth",
    "saturating_growth_single",
    "AnalyzeRequest",
    "parse_analyze_request",
    "load_tables",
    "read_table",
    "make_server",
    "serve_background",
    "forecast_refresh",
    "streaming_anomaly_zscore",
    "streaming_bucket_aggregate",
    "streaming_exact_dedup",
    "streaming_month_rollup",
    "streaming_series_state",
    "streaming_sessionize",
    "with_arrival_metrics",
    "asof_join",
    "sessionize",
    "session_stats",
    "rolling_aggregate",
    "rolling_aggregate_time",
    "rolling_corr",
    "ewma",
    "anomaly_zscore",
    "anomaly_robust",
    "anomaly_seasonal",
    "cusum_drift",
    "fill_gaps",
    "decompose",
]

__version__ = "0.1.0"
