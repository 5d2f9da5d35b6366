from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import bucket_aggregate
from temporal_retriever_spark.sources import read_table
from temporal_retriever_spark.streaming import (
    streaming_bucket_aggregate,
    with_arrival_metrics,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="trs-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def event_stream(spark, tables, tmpdir):
    """Replay the events table as a file-source stream (2 chunks)."""
    events = tables["events"].select(
        F.col("ts").alias("ds"), F.col("event_type"), F.col("value").alias("y")
    )
    a, b = events.randomSplit([0.5, 0.5], seed=1)
    a.write.parquet(f"{tmpdir}/in/chunk=0")
    b.write.parquet(f"{tmpdir}/in/chunk=1")
    schema = events.schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
            f"{tmpdir}/in/chunk=*"
        ),
        events,
        tmpdir,
    )


@pytest.mark.parametrize("grain", ["H", "D", "W"])
def test_streaming_matches_batch_buckets(spark, event_stream, grain):
    stream, events, tmpdir = event_stream
    agged = streaming_bucket_aggregate(
        stream, grain=grain, agg="sum", series_cols=("event_type",), watermark="10 days"
    )
    q = (
        agged.writeStream.outputMode("complete")
        .format("memory")
        .queryName(f"stream_{grain}")
        .option("checkpointLocation", f"{tmpdir}/ckpt-{grain}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], str(r["ds"])): r["y"]
        for r in spark.table(f"stream_{grain}").collect()
    }
    want = {
        (r["event_type"], str(r["ds"])): r["y"]
        for r in bucket_aggregate(
            events, grain=grain, agg="sum", series_cols=("event_type",)
        ).collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) < 1e-6, key


def test_streaming_rejects_month_and_median(spark, event_stream):
    stream, _, _ = event_stream
    with pytest.raises(ValueError, match="month grain"):
        streaming_bucket_aggregate(stream, grain="M")
    with pytest.raises(ValueError, match="median"):
        streaming_bucket_aggregate(stream, grain="H", agg="median")


def test_arrival_metrics(spark, event_stream):
    stream, events, tmpdir = event_stream
    observed = with_arrival_metrics(stream)
    agged = streaming_bucket_aggregate(
        observed, grain="D", agg="sum", series_cols=("event_type",), watermark="10 days"
    )
    seen = []

    def on_batch(batch, bid):
        seen.append(batch.count())

    q = (
        agged.writeStream.outputMode("update")
        .foreachBatch(on_batch)
        .option("checkpointLocation", f"{tmpdir}/ckpt-obs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(seen) > 0


def test_forecast_refresh_foreachbatch(spark, event_stream):
    from temporal_retriever_spark.forecast import forecast_linear_seasonal
    from temporal_retriever_spark.streaming import forecast_refresh

    stream, events, tmpdir = event_stream
    agged = streaming_bucket_aggregate(
        stream, grain="D", agg="sum", series_cols=("event_type",), watermark="10 days"
    ).select("event_type", "ds", "y")
    forecasts = {}

    def refresh(table, batch_id):
        pred = forecast_linear_seasonal(
            table, grain="D", horizon=3, series_cols=("event_type",)
        )
        forecasts[batch_id] = pred.count()

    q = forecast_refresh(
        agged,
        state_view="bucket_state",
        refresh=refresh,
        checkpoint=f"{tmpdir}/ckpt-refresh",
    ).start()
    q.awaitTermination(180)
    assert len(forecasts) >= 1
    # final refresh saw every series with history+future rows
    assert max(forecasts.values()) > 0


@pytest.mark.parametrize("agg", ["sum", "mean"])
def test_streaming_month_rollup_matches_batch(spark, event_stream, agg):
    from temporal_retriever_spark.streaming import streaming_month_rollup

    stream, events, tmpdir = event_stream
    emitted = {}

    def capture(months, batch_id):
        emitted["final"] = {
            (r["event_type"], str(r["ds"])): r["y"] for r in months.collect()
        }

    writer = streaming_month_rollup(
        stream,
        agg=agg,
        series_cols=("event_type",),
        watermark="90 days",
        state_view=f"month_days_{agg}",
        checkpoint=f"{tmpdir}/ckpt-month-{agg}",
        emit=capture,
    )
    q = writer.start()
    q.awaitTermination(120)
    got = emitted["final"]
    want = {
        (r["event_type"], str(r["ds"])): r["y"]
        for r in bucket_aggregate(
            events, grain="M", agg=agg, series_cols=("event_type",)
        ).collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) < 1e-6, key


def test_streaming_month_rollup_rejects_median(spark, event_stream):
    from temporal_retriever_spark.streaming import streaming_month_rollup

    stream, _, _ = event_stream
    with pytest.raises(ValueError, match="median"):
        streaming_month_rollup(stream, agg="median")
