"""Product quantization: train / encode / ADC search / reconstruction.

Contract: codes are m small ints; ADC ranks approximate cosine; the
refine path returns exact cosine for its survivors; reconstruction MSE
falls as the codebook grows (more codes ⇒ finer quantizer).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.pq import (
    pq_encode,
    pq_reconstruction_error,
    pq_topk,
    pq_train,
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
def books(emb):
    return pq_train(emb, m=16, n_codes=64, max_iter=5, seed=7)


def test_train_shapes(books):
    assert len(books) == 16
    assert all(len(b) == 64 for b in books)
    assert all(len(c) == 4 for b in books for c in b)
    assert all(
        math.isfinite(x) for b in books for c in b for x in c
    )


def test_train_dim_not_divisible(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7, n_codes=4, max_iter=1)


def test_encode_codes_valid(emb, books):
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 16
        assert all(0 <= c < 64 for c in r["codes"])


def test_encode_deterministic(emb, books):
    a = {r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    b = {r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    assert a == b


def test_adc_recall_vs_exact(emb, books):
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    approx = pq_topk(emb, queries, books, k=5)
    hits = (
        exact.select("query_id", "vec_id")
        .join(approx.select("query_id", "vec_id"), on=["query_id", "vec_id"])
        .groupBy("query_id")
        .count()
        .collect()
    )
    got = {r["query_id"]: r["count"] for r in hits}
    # these embeddings are near-random (max pairwise cosine ~0.39), the
    # hardest regime for ADC ranking: gate on aggregate recall, not
    # per-query (measured: 27/50 at m=16/n_codes=64 on sf0.001)
    assert sum(got.values()) >= 15, got


def test_refine_recall_near_exact(emb, books):
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    refined = pq_topk(emb, queries, books, k=5, refine=6)
    hits = (
        exact.select("query_id", "vec_id")
        .join(refined.select("query_id", "vec_id"), on=["query_id", "vec_id"])
        .count()
    )
    assert hits >= 42  # >= 0.84 overall recall with a 6x refine pool (measured 49/50)

    # refine path reports exact cosine: spot-check one pair against a
    # direct computation
    row = refined.orderBy("query_id", "rank").first()
    qv = emb.filter(F.col("vec_id") == row["query_id"]).first()["embedding"]
    cv = emb.filter(F.col("vec_id") == row["vec_id"]).first()["embedding"]
    dot = sum(float(a) * float(b) for a, b in zip(qv, cv))
    na = math.sqrt(sum(float(a) ** 2 for a in qv))
    nb = math.sqrt(sum(float(b) ** 2 for b in cv))
    assert row["score"] == pytest.approx(dot / (na * nb), abs=1e-9)


def test_precomputed_codes_reused(emb, books):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = pq_encode(emb, books).cache()
    a = pq_topk(emb, queries, books, k=3, codes=codes).collect()
    b = pq_topk(emb, queries, books, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    codes.unpersist()


def test_reconstruction_error_improves_with_codes(emb):
    small = pq_train(emb, m=8, n_codes=2, max_iter=3, seed=7)
    big = pq_train(emb, m=8, n_codes=64, max_iter=3, seed=7)
    mse_small = (
        pq_reconstruction_error(emb, small).agg(F.avg("mse")).first()[0]
    )
    mse_big = pq_reconstruction_error(emb, big).agg(F.avg("mse")).first()[0]
    assert mse_big < mse_small
    assert mse_big >= 0.0


class TestIVFPQ:
    @pytest.fixture(scope="class")
    def model(self, emb):
        from temporal_retriever_spark.llm.pq import ivfpq_train

        return ivfpq_train(
            emb, n_cells=8, m=16, n_codes=32, coarse_iter=3, pq_iter=3, seed=7
        )

    def test_encode_shape(self, emb, model):
        from temporal_retriever_spark.llm.pq import ivfpq_encode

        centroids, books = model
        idx = ivfpq_encode(emb, centroids, books).collect()
        assert len(idx) == emb.count()
        for r in idx:
            assert 0 <= r["cell"] < 8
            assert len(r["codes"]) == 16
            assert all(0 <= c < 32 for c in r["codes"])

    def test_candidates_only_probed_cells(self, emb, model):
        from temporal_retriever_spark.llm.pq import ivfpq_encode, ivfpq_topk
        from temporal_retriever_spark.llm.similarity import assign_clusters

        centroids, books = model
        idx = ivfpq_encode(emb, centroids, books).cache()
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = ivfpq_topk(
            emb, queries, centroids, books, k=5, nprobe=2, index=idx
        )
        cells = {r["vec_id"]: r["cell"] for r in idx.collect()}
        from temporal_retriever_spark.llm.pq import _unit_expr

        probed = assign_clusters(
            queries.select("query_id", _unit_expr("embedding").alias("e")),
            centroids, id_col="query_id", vec_col="e", n_nearest=2,
        )
        allowed = {}
        for r in probed.collect():
            allowed.setdefault(r["query_id"], set()).add(r["cluster"])
        for r in got.collect():
            assert cells[r["vec_id"]] in allowed[r["query_id"]]
        idx.unpersist()

    def test_refined_recall(self, emb, model):
        from temporal_retriever_spark.llm.pq import ivfpq_topk

        centroids, books = model
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = cosine_topk(emb, queries, k=5)
        # probe every cell: isolates the residual-ADC quality from the
        # coarse recall loss (near-random data scatters neighbors
        # across cells; real clustered corpora probe few cells)
        got = ivfpq_topk(
            emb, queries, centroids, books, k=5, nprobe=8, refine=6
        )
        hits = (
            exact.select("query_id", "vec_id")
            .join(got.select("query_id", "vec_id"), on=["query_id", "vec_id"])
            .count()
        )
        assert hits >= 40  # >= 0.8 with full probe + 6x refine
