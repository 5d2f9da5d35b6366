from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.similarity import (
    assign_clusters,
    cosine_topk,
    ivf_cosine_topk,
    kmeans_fit,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated gaussian blobs in 8d."""
    rng = np.random.default_rng(3)
    centers = np.array(
        [[10, 0, 0, 0, 0, 0, 0, 0], [0, 10, 0, 0, 0, 0, 0, 0], [0, 0, 10, 0, 0, 0, 0, 0]],
        dtype=float,
    )
    rows = []
    for i in range(240):
        c = i % 3
        v = centers[c] + rng.normal(scale=0.5, size=8)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, true_c int")


def test_kmeans_recovers_blobs(clustered):
    centroids = kmeans_fit(clustered, k=3, max_iter=10)
    assigned = assign_clusters(clustered, centroids)
    joined = assigned.join(clustered.select("vec_id", "true_c"), on="vec_id")
    # every k-means cluster should be pure w.r.t. the true blob
    purity = joined.groupBy("cluster").agg(
        F.countDistinct("true_c").alias("nd"), F.count("*").alias("n")
    ).collect()
    assert all(r["nd"] == 1 for r in purity), purity
    assert len(purity) == 3
    assert sum(r["n"] for r in purity) == 240


def test_ivf_exact_on_blobs(clustered):
    queries = clustered.limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(clustered, queries, k=3)
    approx = ivf_cosine_topk(
        clustered, queries, k=3, n_clusters=3, nprobe=1, max_iter=10
    )
    e = {(r["query_id"], r["rank"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["rank"], r["vec_id"]) for r in approx.collect()}
    # on separated blobs, probing 1 cell recovers the exact neighbors
    assert e == a


def test_ivf_recall_random(tables):
    emb = tables["embeddings"]
    queries = emb.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=1)
    approx = ivf_cosine_topk(emb, queries, k=1, n_clusters=8, nprobe=4, max_iter=3)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # random embeddings have weak cluster structure; probing half the
    # cells should still recover a good share of true top-1s
    assert recall >= 0.4, recall


def test_ivf_deterministic(tables):
    emb = tables["embeddings"]
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    a = ivf_cosine_topk(emb, queries, k=2, n_clusters=4, nprobe=2, max_iter=2)
    b = ivf_cosine_topk(emb, queries, k=2, n_clusters=4, nprobe=2, max_iter=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
