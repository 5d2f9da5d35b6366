"""ProcessingTimeTimeout state expiry in streaming_anomaly_zscore:
an idle series' buffer is removed after state_ttl, so later arrivals
score against a COLD baseline instead of the stale one."""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from temporal_retriever_spark.streaming import streaming_anomaly_zscore


def _chunk(spark, d, name, t0, values):
    rows = [(("s"), i + t0, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "series_id string, t int, y double").select(
        "series_id", F.timestamp_seconds(F.col("t") * 60).alias("ds"), "y"
    )
    df.coalesce(1).write.parquet(f"{d}/in/{name}")
    return df


def test_processing_time_timeout_expires_state(spark):
    d = tempfile.mkdtemp(prefix="trs-ttl-")
    try:
        schema = "series_id string, ds timestamp, y double"
        # alternating values: the trailing buffer has nonzero std, so a
        # SURVIVING state would score later arrivals immediately
        _chunk(spark, d, "c0", 0, [10.0, 12.0, 10.0, 12.0, 10.0, 12.0, 10.0, 12.0])
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in/c*")
        )
        out = streaming_anomaly_zscore(
            stream,
            window=5,
            min_periods=2,
            timeout="ProcessingTimeTimeout",
            state_ttl="2 seconds",
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("ttl_scores")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.table("ttl_scores").count() >= 8:
                    break
                time.sleep(0.5)
            assert spark.table("ttl_scores").count() == 8
            # idle past the TTL: empty micro-batches fire the timeout
            # invocation, which must REMOVE the series buffer
            time.sleep(8)
            _chunk(spark, d, "c1", 100, [10.0, 10.0, 99.0])
            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.table("ttl_scores").count() >= 11:
                    break
                time.sleep(0.5)
            rows = {
                r["ds"]: r for r in spark.table("ttl_scores").collect()
            }
            assert len(rows) == 11
            late = sorted(t for t in rows if t.hour >= 1)
            assert len(late) == 3
            # cold state: the first TWO post-expiry rows are below
            # min_periods again; a warm (non-expired) buffer with
            # nonzero std would have scored them -> non-null
            assert rows[late[0]]["zscore"] is None
            assert rows[late[1]]["zscore"] is None
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
