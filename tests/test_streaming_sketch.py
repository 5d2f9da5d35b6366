"""Streaming sketch parity: hll_build / hist_build / cms_build are
plain bounded-cardinality aggregations, so they run UNCHANGED as
Structured Streaming aggregations (complete mode) — the final state
after N micro-batches must equal the batch sketch of the same rows.
That's the operational point of mergeable sketches: the stream IS the
incremental merge."""

from __future__ import annotations

import tempfile

from temporal_retriever_spark.llm.sketch import (
    cms_build,
    hist_build,
    hll_build,
)


def _run_complete(spark, df, tmp, qname, build):
    a, b = df.randomSplit([0.5, 0.5], seed=11)
    a.coalesce(1).write.parquet(f"{tmp}/in/c0")
    b.coalesce(1).write.parquet(f"{tmp}/in/c1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/c*")
    )
    q = (
        build(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.exception() is not None:
        raise q.exception()
    return spark.table(qname).toPandas()


def test_streaming_hll_equals_batch(spark):
    tmp = tempfile.mkdtemp(prefix="trs-shll-")
    df = spark.createDataFrame(
        [(f"u{i % 97}",) for i in range(400)], "v: string"
    )
    got = _run_complete(
        spark, df, tmp, "shll", lambda s: hll_build(s, "v", p=7)
    )
    want = hll_build(df, "v", p=7).toPandas()
    g = {(r.register): r.max_rank for r in got.itertuples()}
    w = {(r.register): r.max_rank for r in want.itertuples()}
    assert g == w


def test_streaming_hist_equals_batch(spark):
    tmp = tempfile.mkdtemp(prefix="trs-shist-")
    df = spark.createDataFrame(
        [(float(i % 113),) for i in range(500)], "v: double"
    )
    kw = dict(lo=0.0, hi=120.0, bins=24)
    got = _run_complete(
        spark, df, tmp, "shist", lambda s: hist_build(s, "v", **kw)
    )
    want = hist_build(df, "v", **kw).toPandas()
    g = {r.bin: r.cnt for r in got.itertuples()}
    w = {r.bin: r.cnt for r in want.itertuples()}
    assert g == w


def test_streaming_cms_equals_batch(spark):
    tmp = tempfile.mkdtemp(prefix="trs-scms-")
    df = spark.createDataFrame(
        [(f"t{i % 41}",) for i in range(300)], "v: string"
    )
    got = _run_complete(
        spark,
        df,
        tmp,
        "scms",
        lambda s: cms_build(s, "v", depth=3, width=32),
    )
    want = cms_build(df, "v", depth=3, width=32).toPandas()
    g = {(r.row_idx, r.bucket): r.cnt for r in got.itertuples()}
    w = {(r.row_idx, r.bucket): r.cnt for r in want.itertuples()}
    assert g == w
