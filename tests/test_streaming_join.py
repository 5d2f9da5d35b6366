"""Stream-stream interval join: streamed result == the batch join,
and the watermark/range condition is accepted by the planner (state
eviction horizon derivable)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.streaming import streaming_interval_join


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="trs-sjoin-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _legs(tables):
    ev = tables["events"].select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ds"),
        "event_type",
        F.col("value").alias("y"),
    )
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    views = ev.filter(F.col("event_type") == "view").drop("event_type")
    # keep it small but non-trivial: a user slice
    clicks = clicks.filter(F.col("user_id") % 7 == 0)
    views = views.filter(F.col("user_id") % 7 == 0)
    return clicks, views


def test_stream_join_matches_batch(spark, tables, tmpdir):
    clicks, views = _legs(tables)
    for name, df in (("clicks", clicks), ("views", views)):
        a, b = df.randomSplit([0.5, 0.5], seed=5)
        a.write.parquet(f"{tmpdir}/{name}/chunk=0")
        b.write.parquet(f"{tmpdir}/{name}/chunk=1")
    sc = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/clicks/chunk=*")
    )
    sv = (
        spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/views/chunk=*")
    )
    joined = streaming_interval_join(
        sc,
        sv,
        keys=("user_id",),
        before="0 seconds",
        after="2 hours",
        watermark="30 minutes",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_ij")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["ds"]), str(r["ds_r"]), round(r["y"], 6),
         round(r["y_r"], 6))
        for r in spark.table("stream_ij").collect()
    }
    batch = clicks.alias("l").join(
        views.selectExpr(
            "user_id", "ds as ds_r", "y as y_r"
        ).alias("r"),
        on=F.expr(
            "l.user_id = r.user_id AND "
            "ds_r >= ds AND ds_r <= ds + INTERVAL 2 HOURS"
        ),
    )
    want = {
        (r["user_id"], str(r["ds"]), str(r["ds_r"]), round(r["y"], 6),
         round(r["y_r"], 6))
        for r in batch.collect()
    }
    assert len(want) > 0
    assert got == want


def test_left_outer_emits_unmatched(spark, tables, tmpdir):
    clicks, views = _legs(tables)
    clicks.write.parquet(f"{tmpdir}/clicks/chunk=0")
    views.write.parquet(f"{tmpdir}/views/chunk=0")
    sc = (
        spark.readStream.schema(clicks.schema)
        .parquet(f"{tmpdir}/clicks/chunk=*")
    )
    sv = (
        spark.readStream.schema(views.schema)
        .parquet(f"{tmpdir}/views/chunk=*")
    )
    joined = streaming_interval_join(
        sc, sv, keys=("user_id",),
        before="0 seconds", after="2 hours",
        watermark="5 minutes", how="leftOuter",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_ij_outer")
        .option("checkpointLocation", f"{tmpdir}/ckpt2")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("stream_ij_outer").collect()
    got_matched = {
        (r["user_id"], str(r["ds"]), str(r["ds_r"]))
        for r in rows
        if r["ds_r"] is not None
    }
    want_matched = {
        (r["user_id"], str(r["ds"]), str(r["ds_r"]))
        for r in clicks.alias("l")
        .join(
            views.selectExpr("user_id", "ds as ds_r", "y as y_r").alias("r"),
            on=F.expr(
                "l.user_id = r.user_id AND "
                "ds_r >= ds AND ds_r <= ds + INTERVAL 2 HOURS"
            ),
        )
        .collect()
    }
    # matched pairs are exactly the batch inner join (outer adds
    # null-extended rows only for clicks the watermark has passed;
    # availableNow may leave the newest unmatched clicks pending —
    # that's Spark's documented outer-join semantics, not data loss)
    assert got_matched == want_matched
    assert len(want_matched) > 0
    for r in rows:
        if r["ds_r"] is None:
            assert r["y_r"] is None  # null-extension is all-or-nothing


def test_streaming_funnel_matches_batch(spark, tables, tmpdir):
    """Ordered replay (time-split chunks): the final streamed funnel
    state per user equals the batch greedy walk."""
    from temporal_retriever_spark.funnel import funnel
    from temporal_retriever_spark.streaming import streaming_funnel

    ev = tables["events"].select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    ).filter(F.col("user_id") % 9 == 0)
    steps = ["click", "view", "purchase"]
    mid = ev.agg(F.percentile_approx("ts", 0.5)).first()[0]
    # ONE part file per chunk: the ordered-replay premise needs each
    # trigger to deliver a time-contiguous slice (multiple part files
    # per chunk would interleave a user's events across triggers)
    ev.filter(F.col("ts") <= mid).coalesce(1).write.parquet(f"{tmpdir}/f/chunk=0")
    ev.filter(F.col("ts") > mid).coalesce(1).write.parquet(f"{tmpdir}/f/chunk=1")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/f/chunk=*")
    )
    walked = streaming_funnel(stream, steps, within="1 day")
    q = (
        walked.writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_funnel")
        .option("checkpointLocation", f"{tmpdir}/fckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: keep each user's LAST emitted row (max steps wins —
    # progress is monotone)
    rows = spark.table("stream_funnel").collect()
    got = {}
    for r in rows:
        prev = got.get(r["user_id"])
        if prev is None or r["steps_completed"] >= prev["steps_completed"]:
            got[r["user_id"]] = r
    want = {
        r["user_id"]: r
        for r in funnel(ev, steps, within="1 day").collect()
    }
    assert set(got) == set(want)
    for u, w in want.items():
        g = got[u]
        assert g["steps_completed"] == w["steps_completed"], u
        for i in (1, 2, 3):
            assert str(g[f"t_{i}"]) == str(w[f"t_{i}"]), (u, i)
        assert g["seconds_to_convert"] == w["seconds_to_convert"], u
