"""streaming_sessionize (native session_window) agrees with the batch
gaps-and-islands ``asof.session_stats`` on session boundaries and
aggregates."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.asof import session_stats
from temporal_retriever_spark.streaming import streaming_sessionize


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="trs-sess-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_sessions_match_batch(spark, tables, tmpdir):
    events = tables["events"].select(
        F.col("event_type").alias("series_id"),
        F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    ).filter(F.col("series_id").isin("click", "view"))
    a, b = events.randomSplit([0.5, 0.5], seed=7)
    a.write.parquet(f"{tmpdir}/in/chunk=0")
    b.write.parquet(f"{tmpdir}/in/chunk=1")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/in/chunk=*")
    )
    sessions = streaming_sessionize(
        stream, gap="2 hours", series_cols=("series_id",),
        value_col="y", watermark="10 days",
    )
    q = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sessions")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], round(r["session_value"], 6)
        )
        for r in spark.table("stream_sessions").collect()
    }
    want = {
        (r["series_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], round(r["session_value"], 6)
        )
        for r in session_stats(
            events, gap="2 hours", series_cols=("series_id",), value_col="y"
        ).collect()
    }
    assert got == want


def test_streaming_anomaly_matches_batch(spark, tables, tmpdir):
    """Ordered replay: stateful streaming z-score == batch rolling
    anomaly_zscore flags (the spike-excluding [-window,-1] baseline)."""
    from temporal_retriever_spark.rolling import anomaly_zscore
    from temporal_retriever_spark.streaming import streaming_anomaly_zscore

    events = tables["events"].select(
        F.col("event_type").alias("series_id"),
        F.col("ts").cast("timestamp").alias("ds"),
        F.col("value").alias("y"),
    )
    daily = events.groupBy(
        "series_id", F.date_trunc("day", "ds").alias("ds")
    ).agg(F.sum("y").alias("y"))
    # time-ordered chunks so arrival order == event order
    mid = daily.agg(F.expr("percentile(CAST(ds AS DOUBLE), 0.5)")).first()[0]
    daily.filter(F.col("ds").cast("double") <= mid).write.parquet(f"{tmpdir}/in/chunk=0")
    daily.filter(F.col("ds").cast("double") > mid).write.parquet(f"{tmpdir}/in/chunk=1")
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/in/chunk=*")
    )
    scored = streaming_anomaly_zscore(stream, window=10, threshold=2.0)
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_anomaly")
        .option("checkpointLocation", f"{tmpdir}/ckpt-anom")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series_id"], str(r["ds"])): (
            None if r["zscore"] is None else round(r["zscore"], 9),
            r["is_anomaly"],
        )
        for r in spark.table("stream_anomaly").collect()
    }
    want = {
        (r["series_id"], str(r["ds"])): (
            None if r["zscore"] is None else round(r["zscore"], 9),
            r["is_anomaly"],
        )
        for r in anomaly_zscore(
            daily, window=10, threshold=2.0, series_cols=("series_id",)
        ).collect()
    }
    assert got == want
