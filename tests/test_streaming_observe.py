"""The observe() arrival metrics must surface via the streaming listener."""

from __future__ import annotations

import shutil
import tempfile
import threading

from pyspark.sql import functions as F

from temporal_retriever_spark.streaming import (
    streaming_bucket_aggregate,
    with_arrival_metrics,
)


def test_observe_metrics_reported(spark, tables):
    d = tempfile.mkdtemp(prefix="trs-obs-")
    captured = []
    done = threading.Event()

    from pyspark.sql.streaming import StreamingQueryListener

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            row = event.progress.observedMetrics.get("arrivals")
            if row is not None:
                captured.append((row["rows"], str(row["max_event_time"])))
                done.set()

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        events = tables["events"].select(
            F.col("ts").alias("ds"), "event_type", F.col("value").alias("y")
        )
        events.write.parquet(f"{d}/in/c0")
        stream = spark.readStream.schema(events.schema).parquet(f"{d}/in/c*")
        agged = streaming_bucket_aggregate(
            with_arrival_metrics(stream),
            grain="D",
            agg="sum",
            series_cols=("event_type",),
            watermark="10 days",
        )
        q = (
            agged.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        done.wait(timeout=30)
        assert captured, "no observed metrics reported"
        total_rows = sum(r for r, _ in captured)
        assert total_rows == events.count()
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(d, ignore_errors=True)
