"""Physical-plan regression tests: the scale claims in PLANS.md/
COVERAGE.md pinned as assertions, so a refactor that silently
de-optimizes a plan (extra exchange, lost WindowGroupLimit, Python in
a native path) fails CI instead of surfacing at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"alpha beta gamma doc {i} " * 5, f"s{i % 3}") for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def daily(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1)
    frames = [
        pd.DataFrame(
            {
                "series_id": s,
                "ds": pd.date_range("2024-01-01", periods=90),
                "y": rng.normal(size=90),
            }
        )
        for s in ("a", "b")
    ]
    return spark.createDataFrame(pd.concat(frames))


def test_chunking_is_shuffle_free(spark, docs):
    from temporal_retriever_spark.llm.chunking import chunk_documents

    plan = _plan(chunk_documents(docs, chunk_tokens=8, overlap=2))
    assert _exchanges(plan) == 0
    assert "Generate" in plan  # the posexplode
    assert "Python" not in plan


def test_train_test_split_is_shuffle_free(spark, docs):
    from temporal_retriever_spark.llm.corpus import train_test_split

    plan = _plan(train_test_split(docs, {"train": 0.9, "test": 0.1}))
    assert _exchanges(plan) == 0
    assert "Python" not in plan


def test_concat_packing_is_one_exchange_no_python(spark, docs):
    from temporal_retriever_spark.llm.chunking import pack_sequences

    plan = _plan(pack_sequences(docs, capacity=64, buckets=4, mode="concat"))
    assert _exchanges(plan) == 1
    assert "Python" not in plan


def test_sample_k_has_partial_window_group_limit(spark, docs):
    from temporal_retriever_spark.llm.corpus import sample_k_per_group

    plan = _plan(sample_k_per_group(docs, 3))
    # partial (pre-shuffle) + final: map tasks trim to local top-k
    assert plan.count("WindowGroupLimit") == 2
    assert _exchanges(plan) == 1


def test_ljung_box_single_aggregation_no_python(spark, daily):
    from temporal_retriever_spark.diagnostics import ljung_box

    plan = _plan(ljung_box(daily, lags=5))
    assert _exchanges(plan) == 1  # one series-key shuffle for window+agg
    assert "Python" not in plan


def test_adf_native_no_python(spark, daily):
    from temporal_retriever_spark.diagnostics import adf

    plan = _plan(adf(daily, maxlag=2))
    assert "Python" not in plan
    assert _exchanges(plan) <= 2


def test_quality_prune_scores_ride_the_scan(spark, docs):
    from temporal_retriever_spark.llm.corpus import quality_prune

    plan = _plan(quality_prune(docs, keep_frac=0.5))
    assert _exchanges(plan) == 1  # the single group-key window shuffle
    assert "Python" not in plan


def test_theta_and_baselines_no_python(spark, daily):
    from temporal_retriever_spark.forecast import forecast_baseline, forecast_theta

    assert "Python" not in _plan(forecast_theta(daily, horizon=3))
    assert "Python" not in _plan(forecast_baseline(daily, method="drift", horizon=3))


def test_embedding_outliers_broadcast_and_group_limit(spark):
    from temporal_retriever_spark.llm.similarity import embedding_group_outliers

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 2) for i in range(20)],
        "vec_id long, embedding array<double>, label int",
    )
    plan = _plan(embedding_group_outliers(df, k=2))
    assert "BroadcastExchange" in plan  # centroids broadcast back
    assert plan.count("WindowGroupLimit") == 2  # partial + final bottom-k
    assert "Python" not in plan


def test_lm_training_is_one_exchange_no_python(spark, docs):
    from temporal_retriever_spark.llm.lm import train_ngram_lm

    plan = _plan(train_ngram_lm(docs, n=3))
    assert _exchanges(plan) == 1  # the single ngram-count aggregation
    assert "Python" not in plan
    assert "Generate" in plan  # native explode, not a UDF


def test_lm_scoring_stays_jvm_side(spark, docs):
    from temporal_retriever_spark.llm.lm import score_ngram_lm, train_ngram_lm

    model = train_ngram_lm(docs, n=3)
    plan = _plan(score_ngram_lm(docs, model, n=3))
    assert "Python" not in plan  # ln/exp/joins all native
    # doc text is consumed by the first narrow explode; only
    # (id, ngram, occ) scalars reach the joins and final agg
    assert "BroadcastExchange" in plan or "Exchange hashpartitioning" in plan


def test_bpe_encode_is_single_arrow_pass_no_shuffle(spark, docs):
    from temporal_retriever_spark.llm.bpe import bpe_encode

    plan = _plan(bpe_encode(docs, [("a", "b")]))
    assert _exchanges(plan) == 0
    assert plan.count("MapInPandas") == 1  # one Arrow stage, no per-row UDF


def test_semantic_dedup_vectors_shuffle_once(spark):
    from temporal_retriever_spark.llm.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(i % 5), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(
        semantic_dedup(df, threshold=0.99, centroids=[[1.0, 0.0], [0.0, 1.0]])
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    # nested-loop joins appear ONLY as the k-row broadcast-centroid
    # assignment crossJoin (the assignment subtree shows once per
    # self-join branch pre-AQE; ReuseExchange / caller persist dedupes
    # at runtime — documented in the operator); the PAIR join itself
    # must be cluster-keyed, never nested-loop
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight, Cross" in line  # the centroid crossJoin
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_kalman_filter_single_grouped_arrow_pass(spark, daily):
    from temporal_retriever_spark.statespace import kalman_local_level

    plan = _plan(kalman_local_level(daily, q=1.0, r=1.0))
    assert _exchanges(plan) == 1  # the groupBy(series) exchange
    assert plan.count("FlatMapGroupsInPandas") == 1
