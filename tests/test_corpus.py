from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.corpus import prepare_corpus
from temporal_retriever_spark.llm.dedup import ngram_jaccard_pairs
from temporal_retriever_spark.llm.text import language_id, text_stats


@pytest.fixture()
def docs(tables):
    return tables["documents"].select("doc_id", "text", "source")


def test_gates_match_standalone_operators(spark, docs):
    out = prepare_corpus(
        docs, min_chars=100, max_digit_ratio=0.3, langs=("en", "de"), dedup=None
    )
    stats = {r["doc_id"]: r for r in text_stats(docs).collect()}
    lang = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    got = {r["doc_id"] for r in out.collect()}
    want = {
        d
        for d, s in stats.items()
        if s["n_chars"] >= 100
        # text_stats rounds the ratio; the gate uses the raw value — both
        # sides of this check go through the same rounding
        and s["digit_ratio"] <= 0.3
        and lang[d] in ("en", "de")
    }
    # rounding at the 0.3 boundary could differ; allow only boundary drift
    sym = got ^ want
    for d in sym:
        assert abs(stats[d]["digit_ratio"] - 0.3) < 1e-6, d
    # appended metric columns match the standalone operator
    for r in out.collect():
        assert r["n_tokens"] == stats[r["doc_id"]]["n_tokens"]
        assert r["lang_pred"] == lang[r["doc_id"]]


def test_exact_dedup_keeps_min_id(spark, docs):
    out = prepare_corpus(docs, min_chars=0, max_digit_ratio=1.0, dedup="exact")
    # no two survivors share a normalized text, and each survivor is the
    # minimum id among the input docs with that text
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    groups = {
        r["n"]: (r["keep"], r["cnt"])
        for r in docs.select(norm.alias("n"), "doc_id")
        .groupBy("n")
        .agg(F.min("doc_id").alias("keep"), F.count("*").alias("cnt"))
        .collect()
    }
    surv = out.select(norm.alias("n"), "doc_id").collect()
    assert len(surv) == len(groups)
    for r in surv:
        assert r["doc_id"] == groups[r["n"]][0]


def test_near_dedup_removes_cluster_losers(spark, docs):
    out = prepare_corpus(
        docs, min_chars=0, max_digit_ratio=1.0, dedup="near", jaccard_threshold=0.2
    )
    survivors = {r["doc_id"] for r in out.select("doc_id").collect()}
    # every exact-Jaccard near-dup pair must have lost its higher id
    # unless both ids map to different clusters (they can't: a pair IS
    # an edge, so they share a component)
    pairs = ngram_jaccard_pairs(docs, threshold=0.2).collect()
    for r in pairs:
        assert not (
            r["id_a"] in survivors and r["id_b"] in survivors
        ), (r["id_a"], r["id_b"])
    # and nothing outside the near-dup graph was dropped
    clustered = {x for r in pairs for x in (r["id_a"], r["id_b"])}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert all_ids - clustered <= survivors


def test_gate_pass_is_narrow(spark, docs):
    # the quality+language gates must not introduce a shuffle or join
    out = prepare_corpus(docs, dedup=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
