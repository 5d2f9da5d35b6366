from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from temporal_retriever_spark.streaming import streaming_series_state


def test_stateful_running_stats_match_batch(spark, tables):
    d = tempfile.mkdtemp(prefix="trs-state-")
    try:
        events = tables["events"].select(
            F.col("event_type").alias("series_id"),
            F.col("ts").alias("ds"),
            F.col("value").alias("y"),
        )
        a, b = events.randomSplit([0.5, 0.5], seed=5)
        a.write.parquet(f"{d}/in/c0")
        b.write.parquet(f"{d}/in/c1")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in/c*")
        )
        out = streaming_series_state(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("series_state")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # memory sink in update mode appends each update; take the LAST
        # emitted row per series (highest n)
        rows = spark.table("series_state").collect()
        final = {}
        for r in rows:
            cur = final.get(r["series_id"])
            if cur is None or r["n"] > cur["n"]:
                final[r["series_id"]] = r
        batch = {
            r["series_id"]: r
            for r in events.groupBy("series_id")
            .agg(
                F.count("y").alias("n"),
                F.min("ds").alias("min_ds"),
                F.max("ds").alias("max_ds"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
                F.avg("y").alias("mean_y"),
                F.stddev_samp("y").alias("std_y"),
            )
            .collect()
        }
        assert set(final) == set(batch)
        for sid in batch:
            s, bt = final[sid], batch[sid]
            assert s["n"] == bt["n"]
            assert s["min_ds"] == bt["min_ds"]
            assert s["max_ds"] == bt["max_ds"]
            assert s["min_y"] == bt["min_y"]
            assert s["max_y"] == bt["max_y"]
            assert abs(s["mean_y"] - bt["mean_y"]) < 1e-9
            assert abs(s["std_y"] - bt["std_y"]) < 1e-6
    finally:
        shutil.rmtree(d, ignore_errors=True)
