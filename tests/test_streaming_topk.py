"""Streaming SpaceSaving heavy hitters: exactness, bounds, state."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.streaming import streaming_heavy_hitters


def _run_stream(spark, df, tmp, qname, **kw):
    a, b = df.randomSplit([0.5, 0.5], seed=3)
    # one file per half -> exactly two micro-batches, so the state
    # genuinely merges across triggers
    a.coalesce(1).write.parquet(f"{tmp}/in/c0")
    b.coalesce(1).write.parquet(f"{tmp}/in/c1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/c*")
    )
    out = streaming_heavy_hitters(stream, **kw)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.exception() is not None:
        raise q.exception()
    # update mode appends per-batch emissions; the final state of each
    # (group, token) is the row with the highest est_count
    pdf = spark.table(qname).toPandas()
    return pdf.sort_values("est_count").groupby(["group_id", "token"]).last().reset_index()


def _tokens_df(spark, rows):
    return spark.createDataFrame(rows, "group_id string, token string")


def test_exact_when_capacity_covers_vocabulary(spark):
    tmp = tempfile.mkdtemp(prefix="trs-topk-")
    rows = []
    freq = {"a": 50, "b": 30, "c": 20, "d": 10, "e": 5}
    for tok, n in freq.items():
        rows += [("g", tok)] * n
    df = _tokens_df(spark, rows)
    final = _run_stream(spark, df, tmp, "topk_exact", k=3, capacity=16)
    # the last emission's top-3 are exact with zero error
    last_counts = {r.token: (r.est_count, r.err) for r in final.itertuples()}
    assert last_counts["a"] == (50, 0)
    assert last_counts["b"] == (30, 0)
    assert last_counts["c"] == (20, 0)
    # the final top-3 by converged counts is exactly a, b, c (earlier
    # micro-batches legitimately emitted interim top-3 snapshots)
    top3 = final.sort_values("est_count", ascending=False).token.head(3)
    assert set(top3) == {"a", "b", "c"}


def test_spacesaving_bounds_under_pressure(spark):
    tmp = tempfile.mkdtemp(prefix="trs-topk-")
    rows = []
    true = {}
    # 40 distinct tokens, capacity 8: heavy tokens must survive
    for i in range(40):
        n = 200 if i < 3 else 2  # three true heavy hitters
        true[f"t{i:02d}"] = n
        rows += [("g", f"t{i:02d}")] * n
    df = _tokens_df(spark, rows)
    final = _run_stream(spark, df, tmp, "topk_bounds", k=5, capacity=8)
    got = {r.token: (r.est_count, r.err) for r in final.itertuples()}
    n_total = sum(true.values())
    for tok in ("t00", "t01", "t02"):
        # guarantee: any token with true count > N/capacity is present
        assert true[tok] > n_total / 8
        assert tok in got
        est, err = got[tok]
        # est >= true >= est - err
        assert est >= true[tok] >= est - err


def test_groups_are_independent(spark):
    tmp = tempfile.mkdtemp(prefix="trs-topk-")
    rows = [("g1", "x")] * 10 + [("g1", "y")] * 5 + [("g2", "z")] * 7
    df = _tokens_df(spark, rows)
    final = _run_stream(spark, df, tmp, "topk_groups", k=2, capacity=8)
    g1 = final[final.group_id == "g1"]
    g2 = final[final.group_id == "g2"]
    assert {r.token: r.est_count for r in g1.itertuples()} == {"x": 10, "y": 5}
    assert {r.token: r.est_count for r in g2.itertuples()} == {"z": 7}


def test_heavy_hitters_validation(spark):
    df = _tokens_df(spark, [("g", "a")])
    with pytest.raises(ValueError, match="capacity"):
        streaming_heavy_hitters(df, k=10, capacity=5)
