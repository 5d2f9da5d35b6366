from __future__ import annotations

from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import bucket_aggregate, date_bounds
from temporal_retriever_spark.align import (
    align_series,
    coalesce_actuals,
    future_grid,
    split_forecasts,
)
from tests.conftest import assert_matches_oracle


def _series(tables, event_type):
    return bucket_aggregate(
        tables["events"]
        .filter(F.col("event_type") == event_type)
        .withColumnRenamed("ts", "ds")
        .withColumnRenamed("value", "y"),
        grain="D",
        agg="sum",
    )


def test_coalesce_actuals(tables, duck):
    # J1+P7: predictions left-join actuals, actuals win (app.py:144-151)
    preds = _series(tables, "view").select("ds", (F.col("y") * 0.5).alias("yhat"))
    actuals = _series(tables, "view").filter(F.dayofmonth("ds") <= 15)
    got = coalesce_actuals(preds, actuals)
    sql = """
        WITH s AS (SELECT CAST(ts AS DATE) AS ds, SUM(value) AS y FROM events
                   WHERE event_type='view' GROUP BY 1),
             p AS (SELECT ds, y * 0.5 AS yhat FROM s),
             a AS (SELECT * FROM s WHERE date_part('day', ds) <= 15)
        SELECT p.ds, COALESCE(a.y, p.yhat) AS y
        FROM p LEFT JOIN a ON p.ds = a.ds
    """
    assert_matches_oracle(got, duck, sql)


def test_align_series_left_and_inner(tables, duck):
    target = _series(tables, "click")
    cov = _series(tables, "view").withColumnRenamed("y", "cov")
    got = align_series(target, cov, cov_cols=("cov",))
    sql = """
        WITH t AS (SELECT CAST(ts AS DATE) AS ds, SUM(value) AS y FROM events
                   WHERE event_type='click' GROUP BY 1),
             c AS (SELECT CAST(ts AS DATE) AS ds, SUM(value) AS cov FROM events
                   WHERE event_type='view' GROUP BY 1)
        SELECT t.ds, t.y, c.cov FROM t LEFT JOIN c ON t.ds = c.ds
    """
    assert_matches_oracle(got, duck, sql)
    # left + dropna == inner (app.py:188)
    dropped = align_series(target, cov, cov_cols=("cov",), drop_null_cov=True)
    inner = align_series(target, cov, how="inner", cov_cols=("cov",))
    assert dropped.count() == inner.count()


def test_future_grid_day(tables, duck):
    bucketed = bucket_aggregate(
        tables["events"].withColumnRenamed("ts", "ds").withColumnRenamed("value", "y"),
        grain="D", agg="sum", series_cols=("event_type",),
    )
    bounds = date_bounds(bucketed, series_cols=("event_type",))
    got = future_grid(bounds, grain="D", horizon=7, series_cols=("event_type",))
    sql = """
        WITH b AS (SELECT event_type, MAX(CAST(ts AS DATE)) AS max_ds
                   FROM events GROUP BY 1)
        SELECT event_type, max_ds + CAST(k AS INTEGER) AS ds
        FROM b, generate_series(1, 7) AS g(k)
    """
    assert_matches_oracle(got, duck, sql)


def test_future_grid_month_keeps_last_day(spark):
    import datetime

    bounds = spark.createDataFrame(
        [("s", datetime.date(2024, 1, 31))], "series_id string, max_ds date"
    )
    rows = sorted(
        str(r["ds"])
        for r in future_grid(bounds, grain="M", horizon=3).collect()
    )
    assert rows == ["2024-02-29", "2024-03-31", "2024-04-30"]


def test_split_forecasts(tables):
    series = _series(tables, "purchase").withColumn("series_id", F.lit("purchase"))
    bounds = date_bounds(
        series.filter(F.dayofmonth("ds") <= 20), series_cols=("series_id",)
    )
    hist, future = split_forecasts(series, bounds)
    n_hist, n_future = hist.count(), future.count()
    assert n_hist + n_future == series.count()
    assert n_future > 0
    max_hist = bounds.collect()[0]["max_ds"]
    assert all(r["ds"] <= max_hist for r in hist.collect())
    assert all(r["ds"] > max_hist for r in future.collect())
