from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.streaming import streaming_exact_dedup


def test_streaming_dedup_first_wins(spark):
    d = tempfile.mkdtemp(prefix="trs-sdedup-")
    try:
        rows = [
            ("2024-01-01 00:00:00", "fp1", "a"),
            ("2024-01-01 00:05:00", "fp1", "b"),  # dup of fp1 -> dropped
            ("2024-01-01 00:10:00", "fp2", "c"),
            ("2024-01-01 00:20:00", "fp2", "d"),  # dup of fp2 -> dropped
            ("2024-01-01 00:30:00", "fp3", "e"),
        ]
        df = spark.createDataFrame(rows, "ds string, fingerprint string, payload string")
        df = df.withColumn("ds", F.col("ds").cast("timestamp"))
        df.write.parquet(f"{d}/in/part=0")
        stream = (
            spark.readStream.schema(df.schema).parquet(f"{d}/in/part=*")
        )
        deduped = streaming_exact_dedup(stream, watermark="1 hour")
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("sdedup")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["fingerprint"]: r["payload"] for r in spark.table("sdedup").collect()}
        assert set(got) == {"fp1", "fp2", "fp3"}
    finally:
        shutil.rmtree(d, ignore_errors=True)
