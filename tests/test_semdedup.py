"""SemDeDup (k-means-blocked semantic dedup): hand-built geometry with
pinned centroids, drop-rule invariants, priority rules."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.similarity import (
    cosine_similarity_expr,
    kmeans_fit,
    semantic_dedup,
)

CENTROIDS = [[1.0, 0.0], [0.0, 1.0]]


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _rot(deg):
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


def test_min_id_drops_larger_of_each_pair(spark):
    df = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.01]),  # ~dup of 1, cluster 0
            (3, [0.0, 1.0]),
            (4, [0.01, 0.999]),  # ~dup of 3, cluster 1
            (5, _rot(45)),  # alone in whichever cluster
        ],
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.99, centroids=CENTROIDS
        ).collect()
    }
    assert out[1]["keep"] and out[3]["keep"] and out[5]["keep"]
    assert not out[2]["keep"] and out[2]["keeper_id"] == 1
    assert not out[4]["keep"] and out[4]["keeper_id"] == 3
    assert out[2]["keeper_cos"] == pytest.approx(
        (0.999) / math.hypot(0.999, 0.01), abs=1e-6
    )
    assert out[1]["keeper_id"] is None and out[1]["keeper_cos"] is None


def test_cross_cluster_duplicates_not_compared(spark):
    # identical vectors forced into different cells by pinned centroids
    # are never paired — blocking bounds recall, the documented tradeoff
    df = _emb(spark, [(1, _rot(44)), (2, _rot(46))])
    out = semantic_dedup(df, threshold=0.9, centroids=CENTROIDS).collect()
    assert all(r["keep"] for r in out)
    assert {r["cluster"] for r in out} == {0, 1}


def test_far_from_centroid_keeps_less_typical(spark):
    # 2 is farther from centroid [1,0] than 1 → paper rule keeps 2
    df = _emb(spark, [(1, _rot(1)), (2, _rot(8))])
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.99, centroids=CENTROIDS, keep="far_from_centroid"
        ).collect()
    }
    assert out[2]["keep"] and not out[1]["keep"]
    assert out[1]["keeper_id"] == 2


def test_chain_invariants(spark):
    # chain: cos(a,b) >= t, cos(b,c) >= t, cos(a,c) < t — the one-pass
    # rule drops b AND c (documented transitive aggressiveness); the
    # two contract invariants must still hold
    t = 0.99  # cos(5°)≈0.9962 >= t, cos(10°)≈0.9848 < t
    df = _emb(spark, [(1, _rot(0)), (2, _rot(5)), (3, _rot(10))])
    rows = semantic_dedup(df, threshold=t, centroids=CENTROIDS).collect()
    out = {r["vec_id"]: r for r in rows}
    assert out[1]["keep"] and not out[2]["keep"] and not out[3]["keep"]
    assert out[2]["keeper_id"] == 1 and out[3]["keeper_id"] == 2
    # invariant 2: every dropped row's witness is >= threshold
    for r in rows:
        if not r["keep"]:
            assert r["keeper_cos"] >= t


def test_invariants_on_fixture_with_fitted_kmeans(spark, tables):
    emb = tables["embeddings"]
    t = 0.35
    sd = semantic_dedup(emb, threshold=t, n_clusters=8, max_iter=3).cache()
    n = emb.count()
    assert sd.count() == n  # partition complete, one row per vector
    # invariant 1: no two kept vectors in the same cluster >= t
    kept = sd.filter("keep").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    a = kept.select(
        F.col("vec_id").alias("l"), F.col("cluster"), F.col("embedding").alias("_lv")
    )
    b = kept.select(
        F.col("vec_id").alias("r"), F.col("cluster"), F.col("embedding").alias("_rv")
    )
    viol = (
        a.join(b, "cluster")
        .filter(F.col("l") < F.col("r"))
        .withColumn("c", cosine_similarity_expr("_lv", "_rv"))
        .filter(F.col("c") >= t)
        .count()
    )
    assert viol == 0
    # invariant 2: every drop's witness cosine recomputes >= t from raw
    drops = sd.filter("NOT keep")
    chk = (
        drops.join(emb.select(F.col("vec_id"), F.col("embedding").alias("_dv")), "vec_id")
        .join(
            emb.select(
                F.col("vec_id").alias("keeper_id"), F.col("embedding").alias("_kv")
            ),
            "keeper_id",
        )
        .withColumn("c", cosine_similarity_expr("_dv", "_kv"))
    )
    bad = chk.filter(F.col("c") < t).count()
    assert bad == 0
    sd.unpersist()


def test_precomputed_centroids_skip_fit(spark):
    df = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    cents = kmeans_fit(df, k=2, max_iter=2)
    out = semantic_dedup(df, threshold=0.9, centroids=cents).collect()
    assert len(out) == 2 and all(r["keep"] for r in out)


def test_bad_keep_rule(spark):
    df = _emb(spark, [(1, [1.0, 0.0])])
    with pytest.raises(ValueError):
        semantic_dedup(df, keep="bogus", centroids=CENTROIDS)
