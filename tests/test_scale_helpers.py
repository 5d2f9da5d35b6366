from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import bucket_aggregate, salted_aggregate
from temporal_retriever_spark.sources.writers import write_partitioned


def test_salted_aggregate_matches_plain(tables):
    events = tables["events"].select("event_type", F.col("value").alias("y"))
    for agg in ("sum", "min", "max", "mean"):
        plain = {
            r["event_type"]: r["y"]
            for r in events.groupBy("event_type")
            .agg(
                {"sum": F.sum, "min": F.min, "max": F.max, "mean": F.avg}[agg]("y").alias("y")
            )
            .collect()
        }
        salted = {
            r["event_type"]: r["y"]
            for r in salted_aggregate(
                events, keys=("event_type",), agg=agg, salt_buckets=8
            ).collect()
        }
        assert set(plain) == set(salted)
        for k in plain:
            assert abs(plain[k] - salted[k]) < 1e-6, (agg, k)


def test_salted_aggregate_rejects_median(tables):
    with pytest.raises(ValueError, match="median"):
        salted_aggregate(
            tables["events"].select("event_type", F.col("value").alias("y")),
            keys=("event_type",),
            agg="median",
        )


def test_partitioned_write_prunes(spark, tables):
    d = tempfile.mkdtemp(prefix="trs-part-")
    try:
        daily = bucket_aggregate(
            tables["events"]
            .withColumnRenamed("ts", "ds")
            .withColumnRenamed("value", "y"),
            grain="D",
            agg="sum",
            series_cols=("event_type",),
        ).withColumn("day", F.col("ds").cast("string"))
        write_partitioned(daily, f"{d}/out", partition_cols=("day",))
        back = spark.read.parquet(f"{d}/out")
        one_day = back.filter(F.col("day") == "2024-01-05")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # pruned scan reads exactly that day's rows
        want = daily.filter(F.col("day") == "2024-01-05").count()
        assert one_day.count() == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_tables_join_without_shuffle(spark, tables):
    from temporal_retriever_spark.sources.writers import write_bucketed

    daily = bucket_aggregate(
        tables["events"]
        .withColumnRenamed("ts", "ds")
        .withColumnRenamed("value", "y"),
        grain="D",
        agg="sum",
        series_cols=("event_type",),
    )
    cov = daily.withColumnRenamed("y", "cov")
    try:
        write_bucketed(daily, "t_target", bucket_cols=("event_type",), num_buckets=4)
        write_bucketed(cov, "t_cov", bucket_cols=("event_type",), num_buckets=4)
        a = spark.table("t_target")
        b = spark.table("t_cov").select("event_type", "ds", "cov")
        # disable broadcast so the co-located layout (not size) carries it;
        # allow the bucket key (series) to satisfy the (series, ds) join —
        # equal series implies same bucket, so no shuffle is needed
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_req = with_conf.get("spark.sql.requireAllClusterKeysForCoPartition")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with_conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
        try:
            joined = a.join(b, on=["event_type", "ds"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # identically-bucketed tables: the join key prefix matches the
            # bucket spec, so neither side shuffles
            assert "Exchange hashpartitioning" not in plan, plan
            assert joined.count() == daily.count()
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            with_conf.set("spark.sql.requireAllClusterKeysForCoPartition", old_req)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_target")
        spark.sql("DROP TABLE IF EXISTS t_cov")


def test_new_window_ops_parallelize_across_series(spark):
    """64 series × 5k rows: the as-of and rolling window stages must
    split across series keys (>1 task after the key shuffle), proving
    the operators parallelize by series rather than serializing."""
    from temporal_retriever_spark.asof import asof_join
    from temporal_retriever_spark.rolling import rolling_aggregate

    n_series, n_rows = 64, 5000
    base = (
        spark.range(n_series * n_rows)
        .select(
            (F.col("id") % n_series).cast("string").alias("series_id"),
            F.timestamp_seconds((F.col("id") / n_series).cast("long") * 60).alias("ds"),
            (F.col("id") % 997).cast("double").alias("y"),
        )
    )
    rolled = rolling_aggregate(base, window=10, aggs=("mean",))
    # partitions after the series-key exchange (AQE may coalesce; must
    # still exceed one — a single task would serialize 64 series)
    parts = rolled.select("series_id").rdd.getNumPartitions()
    assert parts > 1
    assert rolled.count() == n_series * n_rows
    right = base.filter(F.col("ds").cast("long") % 600 == 0).withColumnRenamed("y", "v")
    joined = asof_join(
        base, right, on=("series_id",), value_cols=("v",)
    )
    assert joined.count() == n_series * n_rows
    # spot-check one series: every row has a match (rights every 10 min)
    row = joined.filter(
        (F.col("series_id") == "3") & (F.col("ds").cast("long") == 3600)
    ).first()
    assert row["v"] is not None


def test_new_diagnostics_parallelize_across_series(spark):
    """The round-4 diagnostics keep their one-row-per-series shape at
    width: 48 series x 400 rows through ljung_box / kpss / adf /
    detect_seasonality in one plan each, values matching the
    single-series path exactly (per-series independence)."""
    import numpy as np
    import pandas as pd

    from temporal_retriever_spark.diagnostics import (
        adf,
        detect_seasonality,
        kpss,
        ljung_box,
    )

    rng = np.random.default_rng(17)
    frames = []
    for i in range(48):
        frames.append(
            pd.DataFrame(
                {
                    "series_id": f"s{i:02d}",
                    "ds": pd.date_range("2023-01-01", periods=400),
                    "y": np.cumsum(rng.normal(size=400)) if i % 2 else rng.normal(size=400),
                }
            )
        )
    wide = spark.createDataFrame(pd.concat(frames))
    lb = ljung_box(wide, lags=4).toPandas()
    assert len(lb) == 48 * 4
    kp = kpss(wide, nlags=8).toPandas()
    assert len(kp) == 48 and kp.kpss_stat.notna().all()
    ad = adf(wide, maxlag=1).toPandas()
    assert len(ad) == 48 and ad.adf_stat.notna().all()
    ds = detect_seasonality(wide, max_period=10).toPandas()
    assert len(ds) == 48
    # independence: one series alone gives identical numbers
    one = spark.createDataFrame(frames[3])
    solo = kpss(one, nlags=8).toPandas().iloc[0]
    inwide = kp[kp.series_id == "s03"].iloc[0]
    assert solo.kpss_stat == inwide.kpss_stat


def test_salted_aggregate_plan_splits_hot_key(spark):
    """The salting must be visible in the PLAN: phase 1 aggregates on
    (key, _salt) — so one pathologically hot key spreads over
    salt_buckets reducers — and phase 2 combines partials on the key
    alone. A refactor that silently collapses the two phases would pass
    value tests (salting is algebraically invisible) but reintroduce
    the single-reducer hot spot; this pins the shape."""
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    out = salted_aggregate(df, keys=("k",), value_col="y", agg="sum",
                           salt_buckets=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan, plan
    assert plan.count("Aggregate") >= 2, plan
    # the phase-1 grouping carries the salt; phase-2 does not
    first_agg = plan[plan.rindex("Aggregate"):]  # innermost = phase 1
    assert "_salt" in first_agg
    # and values equal the plain aggregation exactly
    got = {r["k"]: r["y"] for r in out.collect()}
    want = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("y").alias("s")).collect()
    }
    assert got == want
