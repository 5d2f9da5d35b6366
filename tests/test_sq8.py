"""SQ8 scalar quantization: code validity, reconstruction bound,
near-exact top-k, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.pq import (
    sq8_decode_expr,
    sq8_encode,
    sq8_topk,
    sq8_train,
)
from temporal_retriever_spark.llm.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def ranges(emb):
    return sq8_train(emb)


def test_ranges_shape(emb, ranges):
    dim = emb.select(F.size("embedding")).first()[0]
    assert len(ranges) == dim
    assert all(lo <= hi for lo, hi in ranges)


def test_codes_valid_and_deterministic(emb, ranges):
    a = {r["vec_id"]: r["codes"] for r in sq8_encode(emb, ranges).collect()}
    b = {r["vec_id"]: r["codes"] for r in sq8_encode(emb, ranges).collect()}
    assert a == b
    for codes in a.values():
        assert len(codes) == len(ranges)
        assert all(0 <= c <= 255 for c in codes)


def test_reconstruction_bound(emb, ranges):
    """|x − decode(encode(x))| ≤ half a quantization step per dim."""
    codes = sq8_encode(emb, ranges)
    joined = emb.join(codes, "vec_id")
    err = joined.select(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            sq8_decode_expr("codes", ranges),
            lambda x, d: F.abs(x - d),
        ).alias("e")
    )
    max_err = err.select(
        F.max(
            F.aggregate("e", F.lit(0.0), lambda a, x: F.greatest(a, x))
        ).alias("m")
    ).first()["m"]
    worst_step = max((hi - lo) / 255.0 for lo, hi in ranges)
    assert max_err <= worst_step / 2.0 + 1e-12


def test_topk_near_exact(emb, ranges):
    """8-bit scalar quantization barely perturbs cosine: ≥ 0.9 recall
    vs exact top-5 on every query."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    approx = sq8_topk(emb, queries, ranges, k=5)
    hits = (
        exact.select("query_id", "vec_id")
        .join(approx.select("query_id", "vec_id"), on=["query_id", "vec_id"])
        .count()
    )
    assert hits >= 45  # 0.9 overall


def test_constant_dim_codes_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    ranges = sq8_train(df)
    assert ranges[0] == (1.0, 1.0)
    got = {r["vec_id"]: r["codes"] for r in sq8_encode(df, ranges).collect()}
    assert got[1][0] == 0 and got[2][0] == 0
    assert got[1][1] == 0 and got[2][1] == 255
