"""Rolling/sliding operators vs the DuckDB window-SQL oracle, plus
edge-case unit tests (min_periods, empty frames, ANSI safety)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.rolling import (
    anomaly_zscore,
    decompose,
    ewma,
    fill_gaps,
    rolling_aggregate,
)
from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def daily(tables):
    ev = tables["events"].select(
        "event_type", F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    )
    return ev.groupBy("event_type", F.date_trunc("day", "ds").alias("ds")).agg(
        F.sum("y").alias("y")
    )


DAILY_SQL = """
    SELECT event_type, date_trunc('day', ts) AS ds, SUM(value) AS y
    FROM events GROUP BY 1, 2
"""


def test_rolling_aggregate_matches_oracle(daily, duck):
    got = rolling_aggregate(
        daily, window=7, aggs=("mean", "sum", "std", "count"),
        series_cols=("event_type",),
    ).select(
        "event_type", "ds",
        F.round("rolling_mean", 6).alias("rolling_mean"),
        F.round("rolling_sum", 6).alias("rolling_sum"),
        F.round("rolling_std", 6).alias("rolling_std"),
        "rolling_count",
    )
    assert_matches_oracle(got, duck, f"""
        SELECT event_type, ds,
          ROUND(AVG(y) OVER w, 6) AS rolling_mean,
          ROUND(SUM(y) OVER w, 6) AS rolling_sum,
          ROUND(STDDEV_SAMP(y) OVER w, 6) AS rolling_std,
          COUNT(y) OVER w AS rolling_count
        FROM ({DAILY_SQL})
        WINDOW w AS (PARTITION BY event_type ORDER BY ds
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """)


def test_rolling_min_periods(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(5)], "series_id string, t int, y double"
    ).select("series_id", F.col("t").cast("timestamp").alias("ds"), "y")
    out = rolling_aggregate(
        df, window=3, aggs=("mean",), min_periods=3
    ).orderBy("ds").collect()
    assert [r["rolling_mean"] for r in out] == [None, None, 1.0, 2.0, 3.0]


def test_rolling_rejects_unknown_agg(daily):
    with pytest.raises(ValueError, match="rolling"):
        rolling_aggregate(daily, window=3, aggs=("mode",))


def test_ewma_matches_selfjoin_oracle(daily, duck):
    got = ewma(daily, alpha=0.3, window=32, series_cols=("event_type",)).select(
        "event_type", "ds", F.round("ewma", 6).alias("ewma")
    )
    assert_matches_oracle(got, duck, f"""
        WITH n AS (SELECT event_type, ds, y,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ds) AS rn
          FROM ({DAILY_SQL}))
        SELECT a.event_type, a.ds,
          ROUND(SUM(b.y * POWER(0.7, a.rn - b.rn))
                / SUM(POWER(0.7, a.rn - b.rn)), 6) AS ewma
        FROM n a JOIN n b
          ON a.event_type = b.event_type AND b.rn BETWEEN a.rn - 31 AND a.rn
        GROUP BY a.event_type, a.ds
    """)


def test_ewma_alpha_one_is_identity(spark):
    df = spark.createDataFrame(
        [("a", i, float(i * 10)) for i in range(4)],
        "series_id string, t int, y double",
    ).select("series_id", F.col("t").cast("timestamp").alias("ds"), "y")
    out = ewma(df, alpha=1.0).orderBy("ds").collect()
    assert [r["ewma"] for r in out] == [0.0, 10.0, 20.0, 30.0]
    with pytest.raises(ValueError):
        ewma(df, alpha=0.0)


def test_anomaly_zscore_matches_oracle(daily, duck):
    got = anomaly_zscore(
        daily, window=14, threshold=2.0, series_cols=("event_type",)
    ).select("event_type", "ds", F.round("zscore", 6).alias("zscore"), "is_anomaly")
    assert_matches_oracle(got, duck, f"""
        WITH z AS (
          SELECT event_type, ds,
            CASE WHEN COUNT(y) OVER w >= 5 AND STDDEV_SAMP(y) OVER w <> 0
                 THEN (y - AVG(y) OVER w) / STDDEV_SAMP(y) OVER w END AS zs
          FROM ({DAILY_SQL})
          WINDOW w AS (PARTITION BY event_type ORDER BY ds
                       ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, ds, ROUND(zs, 6) AS zscore,
               COALESCE(ABS(zs) > 2.0, FALSE) AS is_anomaly
        FROM z
    """)


def test_anomaly_flags_injected_spike(spark):
    rows = [("a", i, 10.0 + (i % 3) * 0.1) for i in range(30)]
    rows[20] = ("a", 20, 500.0)
    df = spark.createDataFrame(
        rows, "series_id string, t int, y double"
    ).select("series_id", F.timestamp_seconds(F.col("t") * 86400).alias("ds"), "y")
    out = anomaly_zscore(df, window=10, threshold=3.0).orderBy("ds").collect()
    flags = [r["is_anomaly"] for r in out]
    assert flags[20] is True
    assert sum(flags) == 1  # the spike does not poison its neighbors' baseline


def test_fill_gaps_linear_matches_oracle(daily, duck):
    sparse = daily.filter(F.dayofmonth("ds") % 3 != 0)
    got = fill_gaps(
        sparse, grain="D", method="linear", series_cols=("event_type",)
    ).select("event_type", "ds", F.round("y", 6).alias("y"), "was_filled")
    assert_matches_oracle(got, duck, f"""
        WITH sparse AS (SELECT * FROM ({DAILY_SQL}) WHERE day(ds) % 3 <> 0),
        bounds AS (SELECT event_type, MIN(ds) lo, MAX(ds) hi FROM sparse GROUP BY 1),
        grid AS (SELECT event_type,
                        UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS ds
                 FROM bounds),
        dense AS (SELECT g.event_type, g.ds, s.y
                  FROM grid g LEFT JOIN sparse s USING (event_type, ds)),
        nb AS (SELECT event_type, ds, y,
            last_value((CASE WHEN y IS NOT NULL
                             THEN struct_pack(t := ds, v := y) END) IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY ds
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
            first_value((CASE WHEN y IS NOT NULL
                              THEN struct_pack(t := ds, v := y) END) IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY ds
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
          FROM dense)
        SELECT event_type, ds,
          ROUND(COALESCE(y,
            CASE WHEN p.t IS NOT NULL AND nx.t IS NOT NULL AND nx.t <> p.t
                 THEN p.v + (nx.v - p.v) * (epoch(ds) - epoch(p.t))
                                          / (epoch(nx.t) - epoch(p.t)) END), 6) AS y,
          y IS NULL AS was_filled
        FROM nb
    """)


def test_fill_gaps_modes(spark):
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 3, 40.0)], "series_id string, d int, y double"
    ).select("series_id", F.timestamp_seconds(F.col("d") * 86400).alias("ds"), "y")
    lin = {r["ds"].day: r["y"] for r in fill_gaps(df, grain="D").collect()}
    assert lin[2] == pytest.approx(20.0) and lin[3] == pytest.approx(30.0)
    ff = {r["ds"].day: r["y"] for r in fill_gaps(df, grain="D", method="ffill").collect()}
    assert ff[2] == 10.0 and ff[3] == 10.0
    zz = {r["ds"].day: r["y"] for r in fill_gaps(df, grain="D", method="zero").collect()}
    assert zz[2] == 0.0
    nn = fill_gaps(df, grain="D", method="null").collect()
    assert sum(1 for r in nn if r["y"] is None) == 2
    assert sum(1 for r in nn if r["was_filled"]) == 2
    with pytest.raises(ValueError):
        fill_gaps(df, grain="D", method="cubic")


@pytest.mark.parametrize("period,frame_sql", [
    (7, "CASE WHEN COUNT(y) OVER w7 = 7 THEN AVG(y) OVER w7 END"),
    (6, """CASE WHEN COUNT(y) OVER w6a = 6 AND COUNT(y) OVER w6b = 6
           THEN (AVG(y) OVER w6a + AVG(y) OVER w6b) / 2 END"""),
])
def test_decompose_matches_oracle(daily, duck, period, frame_sql):
    got = decompose(daily, period=period, series_cols=("event_type",)).select(
        "event_type", "ds", F.round("y", 6).alias("y"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round("resid", 6).alias("resid"),
    )
    assert_matches_oracle(got, duck, f"""
        WITH n AS (SELECT event_type, ds, y,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ds) - 1 AS rn
          FROM ({DAILY_SQL})),
        tr AS (SELECT event_type, ds, y, rn % {period} AS pos,
            {frame_sql} AS trend
          FROM n
          WINDOW w7 AS (PARTITION BY event_type ORDER BY ds
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING),
                 w6a AS (PARTITION BY event_type ORDER BY ds
                         ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING),
                 w6b AS (PARTITION BY event_type ORDER BY ds
                         ROWS BETWEEN 2 PRECEDING AND 3 FOLLOWING)),
        sm AS (SELECT event_type, pos, AVG(y - trend) AS smean
               FROM tr GROUP BY 1, 2),
        cs AS (SELECT event_type, pos,
                      smean - AVG(smean) OVER (PARTITION BY event_type) AS seasonal
               FROM sm)
        SELECT t.event_type, t.ds, ROUND(t.y, 6) AS y, ROUND(t.trend, 6) AS trend,
               ROUND(c.seasonal, 6) AS seasonal,
               ROUND(t.y - t.trend - c.seasonal, 6) AS resid
        FROM tr t JOIN cs c ON t.event_type = c.event_type AND t.pos = c.pos
    """)


def test_decompose_reconstruction(daily):
    out = decompose(daily, period=7, series_cols=("event_type",))
    bad = out.filter(
        F.col("trend").isNotNull()
        & (F.abs(F.col("trend") + F.col("seasonal") + F.col("resid") - F.col("y")) > 1e-6)
    ).count()
    assert bad == 0
    with pytest.raises(ValueError):
        decompose(daily, period=1)


def test_rolling_time_window_matches_oracle(tables, duck):
    """Range-frame (interval) rolling over the irregular raw events —
    mirrors DuckDB RANGE BETWEEN INTERVAL semantics."""
    from temporal_retriever_spark.rolling import rolling_aggregate_time

    ev = tables["events"].select(
        "event_type", F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    )
    got = rolling_aggregate_time(
        ev, window="2 hours", aggs=("mean", "count"), series_cols=("event_type",)
    ).select(
        "event_type", "ds",
        F.round("rolling_mean", 6).alias("rolling_mean"), "rolling_count",
    )
    assert_matches_oracle(got, duck, """
        SELECT event_type, ts AS ds,
               ROUND(AVG(value) OVER w, 6) AS rolling_mean,
               COUNT(value) OVER w AS rolling_count
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL 2 HOURS PRECEDING AND CURRENT ROW)
    """)


def test_rolling_time_window_rejects_bad_interval(tables):
    from temporal_retriever_spark.rolling import rolling_aggregate_time

    ev = tables["events"].select(
        "event_type", F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    )
    with pytest.raises(ValueError):
        rolling_aggregate_time(ev, window="2 fortnights")
    with pytest.raises(ValueError):
        rolling_aggregate_time(ev, window="0 days")


def test_fill_gaps_month_grain_keeps_month_end_labels(spark):
    # month buckets are month-END dates; naive +1 MONTH stepping from
    # Jan 31 lands on Feb 28 then Mar 28 — the grid must stay last-day
    df = spark.createDataFrame(
        [("a", "2024-01-31", 1.0), ("a", "2024-05-31", 5.0)],
        "series_id string, d string, y double",
    ).select("series_id", F.to_date("d").alias("ds"), "y")
    out = fill_gaps(df, grain="M", method="linear").orderBy("ds").collect()
    assert [str(r["ds"]) for r in out] == [
        "2024-01-31", "2024-02-29", "2024-03-31", "2024-04-30", "2024-05-31",
    ]
    assert [r["was_filled"] for r in out] == [False, True, True, True, False]
    # linear interpolation is time-weighted across the uneven months
    filled = [r["y"] for r in out]
    assert filled[0] == 1.0 and filled[-1] == 5.0
    assert all(filled[i] < filled[i + 1] for i in range(4))


def test_fill_gaps_hour_grain(spark):
    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 3, 30.0)], "series_id string, h int, y double"
    ).select("series_id", F.timestamp_seconds(F.col("h") * 3600).alias("ds"), "y")
    out = fill_gaps(df, grain="H").orderBy("ds").collect()
    assert len(out) == 4
    assert [r["y"] for r in out] == [0.0, 10.0, 20.0, 30.0]


def test_cusum_matches_recursion(spark):
    """Window-native prefix form == Page's textbook recursion."""
    import numpy as np
    from temporal_retriever_spark.rolling import cusum_drift

    rng = np.random.default_rng(3)
    y = np.concatenate([rng.normal(0, 1, 100), rng.normal(3, 1, 50)])
    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(y)],
        "series_id string, ds double, y double",
    )
    out = cusum_drift(df, threshold=5.0, drift=0.5).orderBy("ds").collect()
    z = (y - y.mean()) / y.std(ddof=1)
    s_up = s_dn = 0.0
    for i, v in enumerate(z):
        s_up = max(0.0, s_up + v - 0.5)
        s_dn = max(0.0, s_dn - v - 0.5)
        assert abs(out[i]["cusum_up"] - s_up) < 1e-9, i
        assert abs(out[i]["cusum_down"] - s_dn) < 1e-9, i
    # the upward statistic crosses the threshold shortly after the
    # injected t=100 level shift (the down statistic accumulates before
    # it — full-series standardization centers between the two regimes)
    first_up = next(i for i, r in enumerate(out) if r["cusum_up"] > 5.0)
    assert 100 <= first_up <= 115
    assert not any(r["cusum_up"] > 5.0 for r in out[:100])


def test_cusum_matches_oracle(daily, duck):
    from temporal_retriever_spark.rolling import cusum_drift

    got = cusum_drift(daily, threshold=4.0, series_cols=("event_type",)).select(
        "event_type", "ds", F.round("cusum_up", 6).alias("cusum_up"),
        F.round("cusum_down", 6).alias("cusum_down"), "is_shift",
    )
    assert_matches_oracle(got, duck, f"""
        WITH z AS (
          SELECT event_type, ds,
            (y - AVG(y) OVER (PARTITION BY event_type))
              / STDDEV_SAMP(y) OVER (PARTITION BY event_type) AS z
          FROM ({DAILY_SQL})
        ),
        p AS (
          SELECT event_type, ds,
            SUM(z - 0.5) OVER w AS pu, SUM(z + 0.5) OVER w AS pd
          FROM z
          WINDOW w AS (PARTITION BY event_type ORDER BY ds
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        c AS (
          SELECT event_type, ds,
            pu - LEAST(MIN(pu) OVER w, 0.0) AS cu,
            -(pd - GREATEST(MAX(pd) OVER w, 0.0)) AS cd
          FROM p
          WINDOW w AS (PARTITION BY event_type ORDER BY ds
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, ds, ROUND(cu, 6) AS cusum_up,
               ROUND(cd, 6) AS cusum_down,
               (cu > 4.0 OR cd > 4.0) AS is_shift
        FROM c
    """)


def test_anomaly_robust_matches_oracle(daily, duck):
    from temporal_retriever_spark.rolling import anomaly_robust

    got = anomaly_robust(
        daily, window=14, threshold=3.0, series_cols=("event_type",)
    ).select(
        "event_type", "ds",
        F.round("robust_zscore", 6).alias("robust_zscore"), "is_anomaly",
    )
    # DuckDB mirror: list() window aggregate + list lambdas
    assert_matches_oracle(got, duck, f"""
        WITH base AS (
          SELECT event_type, ds, y,
                 list_sort(list(y) OVER w) AS arr
          FROM ({DAILY_SQL})
          WINDOW w AS (PARTITION BY event_type ORDER BY ds
                       ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
        ),
        med AS (
          SELECT *, len(arr) AS n,
            CASE WHEN len(arr) >= 5 THEN
              CASE WHEN len(arr) % 2 = 1 THEN arr[len(arr) // 2 + 1]
                   ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0 END
            END AS m
          FROM base
        ),
        madt AS (
          SELECT *, list_sort(list_transform(arr, v -> abs(v - m))) AS dv
          FROM med
        ),
        sc AS (
          SELECT event_type, ds, y, n, m,
            CASE WHEN m IS NOT NULL THEN
              CASE WHEN n % 2 = 1 THEN dv[n // 2 + 1]
                   ELSE (dv[n // 2] + dv[n // 2 + 1]) / 2.0 END
            END AS mad
          FROM madt
        )
        SELECT event_type, ds,
          ROUND(CASE WHEN mad IS NOT NULL AND mad <> 0
                THEN 0.6745 * (y - m) / mad END, 6) AS robust_zscore,
          COALESCE(ABS(CASE WHEN mad IS NOT NULL AND mad <> 0
                THEN 0.6745 * (y - m) / mad END) > 3.0, FALSE) AS is_anomaly
        FROM sc
    """)


def test_anomaly_robust_survives_outlier_in_window(spark):
    """The property that motivates MAD: a prior spike inside the
    baseline window must not mask a later genuine anomaly."""
    from temporal_retriever_spark.rolling import anomaly_robust, anomaly_zscore

    rows = [("a", i, 10.0 + (i % 2) * 0.5) for i in range(40)]
    rows[20] = ("a", 20, 1000.0)   # first spike
    rows[26] = ("a", 26, 500.0)    # second spike, 6 rows later
    df = spark.createDataFrame(
        rows, "series_id string, t int, y double"
    ).select("series_id", F.timestamp_seconds(F.col("t") * 86400).alias("ds"), "y")
    robust = {r["ds"].day if hasattr(r["ds"], "day") else None: r["is_anomaly"]
              for r in anomaly_robust(df, window=10, threshold=3.5).collect()}
    classic = anomaly_zscore(df, window=10, threshold=3.0).orderBy("ds").collect()
    robust_flags = [r["is_anomaly"] for r in
                    anomaly_robust(df, window=10, threshold=3.5).orderBy("ds").collect()]
    # robust flags BOTH spikes; the classic z-score misses the second
    # because the first inflates its window's std
    assert robust_flags[20] and robust_flags[26]
    assert classic[20]["is_anomaly"] is True
    assert classic[26]["is_anomaly"] is False


def test_rolling_corr_matches_oracle(tables, duck):
    from temporal_retriever_spark.rolling import rolling_corr

    ev = tables["events"].select(
        "event_type", F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    )
    daily = ev.groupBy("event_type", F.date_trunc("day", "ds").alias("ds")).agg(
        F.sum("y").alias("y")
    )
    clicks = daily.filter(F.col("event_type") == "click").select("ds", "y")
    views = daily.filter(F.col("event_type") == "view").select(
        "ds", F.col("y").alias("x")
    )
    pair = clicks.join(views, on="ds").withColumn("series_id", F.lit("p"))
    got = rolling_corr(pair, window=14).select(
        "series_id", "ds", F.round("rolling_corr", 6).alias("rolling_corr")
    )
    assert_matches_oracle(got, duck, """
        WITH d AS (SELECT event_type, date_trunc('day', ts) AS ds, SUM(value) AS y
                   FROM events GROUP BY 1, 2),
        p AS (SELECT t.ds, t.y, c.y AS x
              FROM (SELECT ds, y FROM d WHERE event_type = 'click') t
              JOIN (SELECT ds, y FROM d WHERE event_type = 'view') c USING (ds)),
        s AS (SELECT ds,
              CAST(COUNT(*) OVER w AS DOUBLE) AS n,
              SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
              SUM(x * y) OVER w AS sxy,
              SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
          FROM p WINDOW w AS (ORDER BY ds ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        SELECT 'p' AS series_id, ds,
          ROUND(CASE WHEN n >= 3 AND (sxx - sx*sx/n) > 0 AND (syy - sy*sy/n) > 0
                THEN (sxy - sx*sy/n)
                     / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) END, 6)
            AS rolling_corr
        FROM s
    """)


def test_rolling_corr_perfect_and_constant(spark):
    from temporal_retriever_spark.rolling import rolling_corr

    rows = [("s", i, float(i), float(2 * i + 1)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "series_id string, t int, y double, x double"
    ).select("series_id", F.timestamp_seconds(F.col("t") * 60).alias("ds"), "y", "x")
    out = rolling_corr(df, window=5).orderBy("ds").collect()
    assert out[0]["rolling_corr"] is None and out[1]["rolling_corr"] is None
    for r in out[2:]:
        assert abs(r["rolling_corr"] - 1.0) < 1e-9
    const = df.withColumn("x", F.lit(7.0))
    out2 = rolling_corr(const, window=5).collect()
    assert all(r["rolling_corr"] is None for r in out2)


def test_rolling_quantile_matches_pandas(spark):
    """Type-7 interpolation parity with pandas rolling quantile."""
    import numpy as np
    import pandas as pd

    from temporal_retriever_spark.rolling import rolling_quantile

    rng = np.random.default_rng(17)
    y = rng.normal(50, 10, 40)
    df = spark.createDataFrame(
        [("s", i, float(v)) for i, v in enumerate(y)],
        "series_id string, t int, y double",
    ).select(
        "series_id", F.timestamp_seconds(F.col("t") * 3600).alias("ds"), "y"
    )
    got = (
        rolling_quantile(df, window=7, q=(0.5, 0.9), min_periods=3)
        .orderBy("ds").collect()
    )
    ser = pd.Series(y)
    want50 = ser.rolling(7, min_periods=3).quantile(0.5, interpolation="linear")
    want90 = ser.rolling(7, min_periods=3).quantile(0.9, interpolation="linear")
    for i, r in enumerate(got):
        for col, want in (("rolling_q50", want50), ("rolling_q90", want90)):
            if pd.isna(want.iloc[i]):
                assert r[col] is None, (i, col)
            else:
                assert r[col] == pytest.approx(want.iloc[i], abs=1e-9), (i, col)


def test_rolling_quantile_labels_and_validation(spark):
    from temporal_retriever_spark.rolling import rolling_quantile

    df = spark.createDataFrame(
        [("s", 0, 1.0)], "series_id string, ds int, y double"
    )
    out = rolling_quantile(df, window=3, q=(0.0, 0.975, 1.0))
    assert {"rolling_q0", "rolling_q97_5", "rolling_q100"} <= set(out.columns)
    with pytest.raises(ValueError, match="quantile"):
        rolling_quantile(df, window=3, q=1.5)


def test_winsorize_clamps_to_quantile_envelope(spark):
    import numpy as np
    import pandas as pd

    from temporal_retriever_spark.rolling import winsorize

    y = np.concatenate([np.arange(1, 20, dtype=float), [1000.0]])  # one spike
    pdf = pd.DataFrame(
        {"series_id": "s", "ds": pd.date_range("2024-01-01", periods=20), "y": y}
    )
    out = winsorize(
        spark.createDataFrame(pdf), lower=0.05, upper=0.95, series_cols=("series_id",)
    ).toPandas()
    lo, hi = np.percentile(y, 5), np.percentile(y, 95)
    assert out.q_lo.iloc[0] == pytest.approx(lo, abs=1e-9)
    assert out.q_hi.iloc[0] == pytest.approx(hi, abs=1e-9)
    assert out.y_wins.max() == pytest.approx(hi, abs=1e-9)  # spike repaired
    assert (out.y_wins <= out.q_hi.iloc[0] + 1e-12).all()
    assert (out.y_wins >= out.q_lo.iloc[0] - 1e-12).all()
    # mid-range values untouched
    mid = out[(out.y > lo) & (out.y < hi)]
    assert (mid.y_wins == mid.y).all()
    with pytest.raises(ValueError, match="lower"):
        winsorize(spark.createDataFrame(pdf), lower=0.9, upper=0.1)


# -- anomaly_seasonal -------------------------------------------------------


def _seasonal_series(spark, n=28, spike_at=17, period=7):
    import datetime as _dt

    rows = []
    for t in range(n):
        # deterministic bounded noise keeps the residual MAD healthy
        # (a perfectly repeating sawtooth degenerates MAD to ~0)
        noise = 0.0 if spike_at < 0 else ((t * 2654435761 % 97) / 97.0 - 0.5) * 4.0
        y = 100.0 + 10.0 * (t % period) + noise + (50.0 if t == spike_at else 0.0)
        rows.append(
            ("s1", _dt.datetime(2024, 1, 1) + _dt.timedelta(days=t), y)
        )
    return spark.createDataFrame(rows, "series_id string, ds timestamp, y double")


def test_anomaly_seasonal_flags_spike_not_peaks(spark):
    from temporal_retriever_spark.rolling import anomaly_seasonal

    # threshold 8: with 4 weeks of data the spike leaks ~1/4 of its
    # mass into the seasonal mean (classical decompose, documented),
    # producing echo scores ~5; the spike itself scores ~11 — by far
    # the argmax — so a tight threshold isolates exactly it
    out = (
        anomaly_seasonal(_seasonal_series(spark), period=7, threshold=8.0)
        .orderBy("ds")
        .collect()
    )
    flagged = [i for i, r in enumerate(out) if r["is_anomaly"]]
    assert flagged == [17]
    scores = [abs(r["score"]) if r["score"] is not None else -1.0 for r in out]
    assert max(range(len(scores)), key=scores.__getitem__) == 17
    # weekly RAW-VALUE peaks (pos 6, the series maxima) score low:
    # seasonality is removed before scoring
    for i in (6, 13):
        assert abs(out[i]["score"]) < 1.0


def test_anomaly_seasonal_edges_null(spark):
    from temporal_retriever_spark.rolling import anomaly_seasonal

    out = anomaly_seasonal(_seasonal_series(spark), period=7).orderBy("ds").collect()
    for r in out[:3] + out[-3:]:
        assert r["resid"] is None and r["score"] is None and r["is_anomaly"] is None


def test_anomaly_seasonal_constant_resid_null_scores(spark):
    from temporal_retriever_spark.rolling import anomaly_seasonal

    out = anomaly_seasonal(
        _seasonal_series(spark, spike_at=-1), period=7
    ).collect()
    # perfectly periodic series: resid == 0 everywhere (MAD 0) -> no flags
    assert all(r["score"] is None for r in out)


def test_anomaly_seasonal_validation(spark):
    from temporal_retriever_spark.rolling import anomaly_seasonal

    with pytest.raises(ValueError):
        anomaly_seasonal(_seasonal_series(spark), period=7, threshold=0.0)


class TestRollingDistinct:
    def _events(self, spark):
        from datetime import datetime

        rows = []
        # series s: user u active on day d
        for d, users in enumerate([[1, 2], [2, 3], [3], [], [1], [4, 5], [1]]):
            for u in users:
                rows.append(("s", datetime(2024, 1, 1 + d, 12), u))
        return spark.createDataFrame(rows, "series_id string, ds timestamp, user_id long")

    def test_exact_rolling_3day(self, spark):
        from temporal_retriever_spark.rolling import rolling_distinct

        got = {
            str(r["ds"]): r["n_distinct"]
            for r in rolling_distinct(
                self._events(spark), entity_col="user_id",
                window_buckets=3, method="exact",
            ).collect()
        }
        # day1:{1,2} day2:{2,3} day3:{3} day5:{1} day6:{4,5} day7:{1}
        assert got["2024-01-01"] == 2          # {1,2}
        assert got["2024-01-02"] == 3          # {1,2,3}
        assert got["2024-01-03"] == 3          # {1,2,3}
        assert got["2024-01-05"] == 2          # day3..5 -> {3,1}
        assert got["2024-01-07"] == 3          # day5..7 -> {1,4,5}
        assert "2024-01-04" not in got         # no events that bucket

    def test_sketch_matches_exact_at_small_cardinality(self, spark, tables):
        from temporal_retriever_spark.rolling import rolling_distinct

        ev = tables["events"].select(
            "event_type", F.col("ts").alias("ds"), "user_id"
        )
        kw = dict(entity_col="user_id", series_cols=("event_type",),
                  window_buckets=7)
        exact = {
            (r["event_type"], str(r["ds"])): r["n_distinct"]
            for r in rolling_distinct(ev, method="exact", **kw).collect()
        }
        est = {
            (r["event_type"], str(r["ds"])): r["n_distinct"]
            for r in rolling_distinct(ev, method="sketch", **kw).collect()
        }
        assert set(exact) == set(est)
        for k, v in exact.items():
            assert abs(est[k] - v) <= max(2, 0.05 * v), (k, est[k], v)

    def test_validation(self, spark):
        from temporal_retriever_spark.rolling import rolling_distinct

        df = self._events(spark)
        with pytest.raises(ValueError, match="window_buckets"):
            rolling_distinct(df, entity_col="user_id", window_buckets=0)
        with pytest.raises(ValueError, match="no fixed span"):
            rolling_distinct(df, entity_col="user_id", grain="M")
        with pytest.raises(ValueError, match="unknown method"):
            rolling_distinct(df, entity_col="user_id", method="x")


class TestDecompositionStrength:
    def test_strong_seasonal_vs_strong_trend(self, spark):
        import datetime
        import math
        import random

        from temporal_retriever_spark.rolling import (
            decompose,
            decomposition_strength,
        )

        rng = random.Random(3)
        d0 = datetime.date(2024, 1, 1)
        rows = []
        for t in range(84):
            d = d0 + datetime.timedelta(days=t)
            rows.append(("seasonal", d,
                         10.0 + 8.0 * math.sin(2 * math.pi * t / 7)
                         + rng.gauss(0, 0.3)))
            rows.append(("trendy", d, 2.0 * t + rng.gauss(0, 0.5)))
            rows.append(("noise", d, rng.gauss(0, 1.0)))
        df = spark.createDataFrame(rows, "series_id string, ds date, y double")
        dec = decompose(df, period=7)
        got = {r["series_id"]: r for r in decomposition_strength(dec).collect()}
        assert got["seasonal"]["seasonal_strength"] > 0.95
        assert got["trendy"]["trend_strength"] > 0.95
        assert got["noise"]["trend_strength"] < 0.5
        assert got["noise"]["seasonal_strength"] < 0.5

    def test_matches_hand_formula(self, spark):
        import datetime

        from temporal_retriever_spark.rolling import (
            decompose,
            decomposition_strength,
        )

        d0 = datetime.date(2024, 1, 1)
        rows = [("s", d0 + datetime.timedelta(days=t), float(t % 4) + 0.1 * t)
                for t in range(24)]
        df = spark.createDataFrame(rows, "series_id string, ds date, y double")
        dec = decompose(df, period=4)
        comp = [
            (r["trend"], r["seasonal"], r["resid"])
            for r in dec.collect()
            if r["trend"] is not None and r["resid"] is not None
            and r["seasonal"] is not None
        ]
        import statistics

        vr = statistics.pvariance([r for _, _, r in comp])
        vtr = statistics.pvariance([t + r for t, _, r in comp])
        vsr = statistics.pvariance([s + r for _, s, r in comp])
        got = decomposition_strength(dec).collect()[0]
        assert got["trend_strength"] == pytest.approx(
            max(0.0, 1 - vr / vtr), rel=1e-9
        )
        assert got["seasonal_strength"] == pytest.approx(
            max(0.0, 1 - vr / vsr), rel=1e-9
        )
