from __future__ import annotations

from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import bucket_aggregate
from temporal_retriever_spark.forecast import forecast_quantiles, quantile_col_name
from tests.conftest import assert_matches_oracle


def test_quantile_col_name():
    assert quantile_col_name(0.05) == "q05"
    assert quantile_col_name(0.5) == "q50"
    assert quantile_col_name(0.95) == "q95"
    assert quantile_col_name(0.975) == "q97_5"


def test_quantiles_monotone(tables):
    daily = bucket_aggregate(
        tables["events"].withColumnRenamed("ts", "ds").withColumnRenamed("value", "y"),
        grain="D",
        agg="sum",
        series_cols=("event_type",),
    )
    out = forecast_quantiles(
        daily, grain="D", horizon=5, series_cols=("event_type",)
    )
    qcols = ["q05", "q10", "q25", "q50", "q75", "q90", "q95"]
    for r in out.collect():
        vals = [r[c] for c in qcols]
        assert vals == sorted(vals), r
        assert r["q05"] <= r["yhat"] + 1e-9  # yhat within the band
        assert r["yhat"] <= r["q95"] + 1e-9


QUANTILE_ORACLE = """
WITH s AS (
    SELECT event_type, CAST(ts AS DATE) AS ds, SUM(value) AS y
    FROM events GROUP BY 1, 2
),
st AS (SELECT *, epoch(ds) / 86400.0 AS t FROM s),
fit AS (
    SELECT event_type,
           CASE WHEN (SUM(t * t) - SUM(t) * SUM(t) / CAST(COUNT(y) AS DOUBLE)) = 0
                THEN 0.0
                ELSE (SUM(t * y) - SUM(t) * SUM(y) / CAST(COUNT(y) AS DOUBLE))
                   / (SUM(t * t) - SUM(t) * SUM(t) / CAST(COUNT(y) AS DOUBLE))
           END AS b,
           SUM(y) / CAST(COUNT(y) AS DOUBLE) AS my,
           SUM(t) / CAST(COUNT(y) AS DOUBLE) AS mt,
           MAX(ds) AS max_ds
    FROM st GROUP BY 1
),
resid AS (
    SELECT st.event_type, dayofweek(st.ds) + 1 AS skey,
           st.y - (my + b * (st.t - mt)) AS r
    FROM st JOIN fit USING (event_type)
),
seas AS (SELECT event_type, skey, SUM(r) / CAST(COUNT(r) AS DOUBLE) AS s_mean
         FROM resid GROUP BY 1, 2),
r2 AS (
    SELECT resid.event_type, resid.r - seas.s_mean AS rr
    FROM resid JOIN seas ON resid.event_type = seas.event_type
    AND resid.skey = seas.skey
),
rq AS (
    SELECT event_type,
           quantile_cont(rr, 0.25) AS rq25, quantile_cont(rr, 0.5) AS rq50,
           quantile_cont(rr, 0.75) AS rq75
    FROM r2 GROUP BY 1
),
grid AS (
    SELECT event_type, ds FROM s
    UNION ALL
    SELECT event_type, max_ds + CAST(k AS INTEGER)
    FROM fit, generate_series(1, 5) AS g(k)
)
SELECT grid.event_type, grid.ds,
       ROUND(my + b * (epoch(grid.ds) / 86400.0 - mt) + COALESCE(s_mean, 0)
             + 1.234567e-7, 3) AS yhat,
       ROUND(my + b * (epoch(grid.ds) / 86400.0 - mt) + COALESCE(s_mean, 0)
             + COALESCE(rq25, 0) + 1.234567e-7, 3) AS q25,
       ROUND(my + b * (epoch(grid.ds) / 86400.0 - mt) + COALESCE(s_mean, 0)
             + COALESCE(rq50, 0) + 1.234567e-7, 3) AS q50,
       ROUND(my + b * (epoch(grid.ds) / 86400.0 - mt) + COALESCE(s_mean, 0)
             + COALESCE(rq75, 0) + 1.234567e-7, 3) AS q75
FROM grid
JOIN fit ON fit.event_type = grid.event_type
LEFT JOIN seas ON seas.event_type = grid.event_type
              AND seas.skey = dayofweek(grid.ds) + 1
LEFT JOIN rq ON rq.event_type = grid.event_type
"""


def test_quantile_forecast_oracle(tables, duck):
    daily = bucket_aggregate(
        tables["events"].withColumnRenamed("ts", "ds").withColumnRenamed("value", "y"),
        grain="D",
        agg="sum",
        series_cols=("event_type",),
    )
    out = forecast_quantiles(
        daily, grain="D", horizon=5, quantiles=(0.25, 0.5, 0.75),
        series_cols=("event_type",),
    )
    offset = F.lit(1.234567e-7)
    got = out.select(
        "event_type",
        "ds",
        F.round(F.col("yhat") + offset, 3).alias("yhat"),
        F.round(F.col("q25") + offset, 3).alias("q25"),
        F.round(F.col("q50") + offset, 3).alias("q50"),
        F.round(F.col("q75") + offset, 3).alias("q75"),
    )
    assert_matches_oracle(got, duck, QUANTILE_ORACLE)
