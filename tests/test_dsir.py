"""DSIR importance resampling: weight math, selection behavior,
determinism, distribution shift toward the target."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.dsir import (
    dsir_select,
    gumbel_expr,
    importance_weights,
)
from temporal_retriever_spark.llm.lm import train_ngram_lm


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "source")
        .cache()
    )
    df.count()
    return df


def test_identical_models_zero_ratio(spark, docs):
    model = train_ngram_lm(docs, n=3)
    got = importance_weights(docs.limit(20), model, model, n=3)
    rows = got.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["log_ratio"] == pytest.approx(0.0, abs=1e-9)
        assert r["log_ratio_per_token"] == pytest.approx(0.0, abs=1e-12)


def test_target_docs_score_higher(docs):
    """Docs the target model was trained on carry higher importance
    weights than out-of-target docs (the model memorizes its corpus)."""
    target = train_ngram_lm(docs.filter(F.col("source") == "src0"), n=3)
    raw = train_ngram_lm(docs, n=3)
    w = importance_weights(docs, target, raw, n=3).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    means = {
        r["grp"]: r["m"]
        for r in w.groupBy(
            F.when(F.col("source") == "src0", "in").otherwise("out").alias("grp")
        )
        .agg(F.avg("log_ratio_per_token").alias("m"))
        .collect()
    }
    assert means["in"] > means["out"]


def test_low_temperature_is_argmax(docs):
    """temperature → 0 reduces Gumbel-top-k to deterministic top-k by
    log_ratio (noise becomes negligible against the scaled weights)."""
    target = train_ngram_lm(docs.filter(F.col("source") == "src0"), n=3)
    raw = train_ngram_lm(docs, n=3)
    sel = dsir_select(
        docs, target, raw, n_select=30, temperature=1e-9
    )
    got = sorted(r["doc_id"] for r in sel.collect())
    want = sorted(
        r["doc_id"]
        for r in importance_weights(docs, target, raw, n=3)
        .orderBy(F.col("log_ratio").desc(), "doc_id")
        .limit(30)
        .collect()
    )
    assert got == want


def test_salt_determinism(docs):
    target = train_ngram_lm(docs.filter(F.col("source") == "src0"), n=3)
    raw = train_ngram_lm(docs, n=3)
    a = sorted(r["doc_id"] for r in dsir_select(docs, target, raw, n_select=50, salt="s1").collect())
    b = sorted(r["doc_id"] for r in dsir_select(docs, target, raw, n_select=50, salt="s1").collect())
    c = sorted(r["doc_id"] for r in dsir_select(docs, target, raw, n_select=50, salt="s2").collect())
    assert a == b
    assert a != c  # independent draw (astronomically unlikely to match)


def test_selection_shifts_distribution(spark):
    """Synthetic signal: raw pool is 80% B-vocab / 20% A-vocab; target
    is A-vocab. DSIR selection over-represents A docs vs the pool."""
    rng = random.Random(1)
    va = ["alpha", "beta", "gamma", "delta"]
    vb = ["one", "two", "three", "four"]

    def mk(i, vocab):
        return (i, " ".join(rng.choice(vocab) for _ in range(25)))

    pool = [
        mk(i, va if i % 5 == 0 else vb) + ("A" if i % 5 == 0 else "B",)
        for i in range(300)
    ]
    tgt = [mk(1000 + i, va) + ("T",) for i in range(60)]
    df = spark.createDataFrame(
        pool + tgt, "doc_id long, text string, grp string"
    )
    raw_docs = df.filter(F.col("grp") != "T")
    target_model = train_ngram_lm(df.filter(F.col("grp") == "T"), n=2)
    raw_model = train_ngram_lm(raw_docs, n=2)
    sel = dsir_select(raw_docs, target_model, raw_model, n_select=60, n=2)
    frac_a = (
        sel.join(df.select("doc_id", "grp"), "doc_id")
        .filter(F.col("grp") == "A")
        .count()
        / 60
    )
    assert frac_a >= 0.8, frac_a  # pool rate is 0.2


def test_gumbel_in_range(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    got = df.select(gumbel_expr("doc_id").alias("g")).agg(
        F.min("g"), F.max("g"), F.avg("g")
    ).first()
    # standard Gumbel: mean ~ 0.577, finite range on 1000 draws
    assert -3 < got["min(g)"] < got["max(g)"] < 12
    assert 0.3 < got["avg(g)"] < 0.9


def test_validation(docs):
    model = train_ngram_lm(docs.limit(5), n=3)
    with pytest.raises(ValueError, match="n_select"):
        dsir_select(docs, model, model, n_select=0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_select(docs, model, model, n_select=1, temperature=0.0)
