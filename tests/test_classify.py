"""Naive-Bayes classifier: hand-computed probabilities, shard-merge
equivalence, language-ID accuracy on the corpus labels."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.classify import (
    NBModel,
    nb_classify,
    nb_score,
    nb_train,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
        .cache()
    )
    df.count()
    return df


def test_hand_computed_word_unigram(spark):
    """Two one-word docs, add-1 smoothing — every probability checked
    against the closed form (EOS padding included: V = {x, y, EOS})."""
    train = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "doc_id long, text string, label string"
    )
    model = nb_train(train, label_col="label", n=1, unit="word")
    scored = {
        (r["doc_id"], r["label"]): (r["avg_loglik"], r["n_tokens"])
        for r in nb_score(
            spark.createDataFrame([(9, "x")], "doc_id long, text string"),
            model,
            n=1,
            unit="word",
        ).collect()
    }
    # under a: ln(1/2) + ln(2/5) + ln(2/5), over n_tokens=2
    want_a = (math.log(0.5) + 2 * math.log(2 / 5)) / 2
    # under b: ln(1/2) + ln(1/5) + ln(2/5)
    want_b = (math.log(0.5) + math.log(1 / 5) + math.log(2 / 5)) / 2
    assert scored[(9, "a")][0] == pytest.approx(want_a, abs=1e-12)
    assert scored[(9, "b")][0] == pytest.approx(want_b, abs=1e-12)
    assert scored[(9, "a")][1] == 2

    pred = nb_classify(
        spark.createDataFrame([(9, "x")], "doc_id long, text string"),
        model,
        n=1,
        unit="word",
    ).first()
    assert pred["pred_label"] == "a"
    assert pred["margin"] == pytest.approx(want_a - want_b, abs=1e-12)


def test_shard_merge_equals_whole(spark, docs):
    """Counts merged across two shard models == one-shot training."""
    a = nb_train(docs.filter(F.col("doc_id") % 2 == 0), label_col="lang")
    b = nb_train(docs.filter(F.col("doc_id") % 2 == 1), label_col="lang")
    merged = NBModel(
        a.token_counts.unionByName(b.token_counts)
        .groupBy("label", "token")
        .agg(F.sum("cnt").alias("cnt")),
        a.label_stats.unionByName(b.label_stats)
        .groupBy("label")
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")),
    )
    whole = nb_train(docs, label_col="lang")
    got = {
        (r["label"], r["token"]): r["cnt"] for r in merged.token_counts.collect()
    }
    want = {
        (r["label"], r["token"]): r["cnt"] for r in whole.token_counts.collect()
    }
    assert got == want
    gs = {r["label"]: (r["n_docs"], r["n_tokens"]) for r in merged.label_stats.collect()}
    ws = {r["label"]: (r["n_docs"], r["n_tokens"]) for r in whole.label_stats.collect()}
    assert gs == ws


def test_learns_separable_classes(spark):
    """On data with real signal (two distinct word distributions) the
    classifier is near-perfect. The fixture corpus's ``lang`` column is
    NOT usable for this: its text is the same word soup for every
    label (verified: NB and any other learner sit at chance there)."""
    import random

    rng = random.Random(0)
    vocab_a = ["apfel", "birne", "kirsche", "traube", "pflaume"]
    vocab_b = ["apple", "pear", "cherry", "grape", "plum"]
    shared = ["the", "and", "of"]
    rows = []
    for i in range(200):
        lab = "a" if i % 2 == 0 else "b"
        vocab = vocab_a if lab == "a" else vocab_b
        words = [
            rng.choice(vocab if rng.random() < 0.7 else shared)
            for _ in range(30)
        ]
        rows.append((i, " ".join(words), lab))
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    train = df.filter(F.col("doc_id") % 5 != 0)
    held = df.filter(F.col("doc_id") % 5 == 0)
    model = nb_train(train, label_col="label", n=2, unit="char")
    pred = nb_classify(held, model, n=2, unit="char")
    joined = pred.join(held.select("doc_id", "label"), "doc_id")
    n = joined.count()
    hits = joined.filter(F.col("pred_label") == F.col("label")).count()
    assert n == 40
    assert hits / n >= 0.95, f"accuracy {hits}/{n}"


def test_margin_nonnegative_and_null_single_label(spark):
    train = spark.createDataFrame(
        [(1, "abc", "only")], "doc_id long, text string, label string"
    )
    model = nb_train(train, label_col="label")
    got = nb_classify(
        spark.createDataFrame([(2, "abx")], "doc_id long, text string"), model
    ).first()
    assert got["pred_label"] == "only"
    assert got["margin"] is None


def test_alpha_validation(spark, docs):
    model = nb_train(docs.limit(10), label_col="lang")
    with pytest.raises(ValueError, match="alpha"):
        nb_score(docs.limit(5), model, alpha=0.0)


# ---------------------------------------------------------------------------
# Logistic regression (full-batch GD)
# ---------------------------------------------------------------------------


def _logreg_ref(rows, k, lr=0.5, iters=8, l2=0.0):
    """Driver-side GD mirroring the engine's update order exactly."""
    n = len(rows)
    w = [0.0] * (k + 1)
    for _ in range(iters):
        g = [0.0] * (k + 1)
        for y, xs in rows:
            m = w[0]
            for i in range(k):
                m = m + w[i + 1] * xs[i]
            p = 1.0 / (1.0 + math.exp(-m))
            d = p - y
            g[0] += d
            for i in range(k):
                g[i + 1] += d * xs[i]
        w = [
            w[j] - lr * (g[j] / n + (l2 * w[j] if j > 0 else 0.0))
            for j in range(k + 1)
        ]
    return w


class TestLogReg:
    def test_matches_reference_gd(self, spark):
        from temporal_retriever_spark.llm.classify import logreg_train

        rows = [
            (1.0, (0.2, 1.5)),
            (0.0, (0.9, -0.3)),
            (1.0, (0.1, 2.0)),
            (0.0, (1.2, 0.0)),
            (1.0, (0.3, 1.1)),
            (0.0, (0.8, -1.0)),
        ]
        df = spark.createDataFrame(
            [(y, a, b) for y, (a, b) in rows], "y double, f1 double, f2 double"
        )
        got = logreg_train(df, ["f1", "f2"], "y", lr=0.5, iterations=8)
        want = _logreg_ref(rows, k=2, lr=0.5, iters=8)
        for g, w in zip(got, want):
            assert math.isclose(g, w, rel_tol=1e-9), (got, want)

    def test_l2_shrinks_weights(self, spark):
        from temporal_retriever_spark.llm.classify import logreg_train

        df = spark.createDataFrame(
            [(1.0, 2.0), (0.0, -2.0), (1.0, 1.5), (0.0, -1.5)] * 5,
            "y double, f double",
        )
        free = logreg_train(df, ["f"], "y", iterations=20)
        reg = logreg_train(df, ["f"], "y", iterations=20, l2=0.5)
        assert abs(reg[1]) < abs(free[1])

    def test_separable_accuracy_and_score(self, spark):
        from temporal_retriever_spark.llm.classify import (
            logreg_score,
            logreg_train,
        )

        # y = 1 iff f1 > 0; 40 points, clean margin
        pts = [(1.0, 0.5 + 0.05 * i, float(i % 3)) for i in range(20)] + [
            (0.0, -0.5 - 0.05 * i, float(i % 3)) for i in range(20)
        ]
        df = spark.createDataFrame(pts, "y double, f1 double, f2 double")
        w = logreg_train(df, ["f1", "f2"], "y", lr=1.0, iterations=30)
        scored = logreg_score(df, w, ["f1", "f2"])
        acc = scored.filter(
            (F.col("pred") == 1) == (F.col("y") == 1.0)
        ).count() / 40.0
        assert acc >= 0.95
        probs = [r["prob"] for r in scored.collect()]
        assert all(0.0 <= p <= 1.0 for p in probs)

    def test_validation(self, spark):
        from temporal_retriever_spark.llm.classify import (
            logreg_score,
            logreg_train,
        )

        df = spark.createDataFrame([(1.0, 1.0)], "y double, f double")
        with pytest.raises(ValueError, match="iterations"):
            logreg_train(df, ["f"], "y", iterations=0)
        with pytest.raises(ValueError, match="lr"):
            logreg_train(df, ["f"], "y", lr=0.0)
        with pytest.raises(ValueError, match="feature_cols"):
            logreg_train(df, [], "y")
        with pytest.raises(ValueError, match="empty"):
            logreg_train(df.filter("y > 5"), ["f"], "y")
        with pytest.raises(ValueError, match="weights"):
            logreg_score(df, [0.0], ["f"])


def _poisson_ref(rows, k, lr=0.1, iters=8):
    n = len(rows)
    w = [0.0] * (k + 1)
    for _ in range(iters):
        g = [0.0] * (k + 1)
        for y, xs in rows:
            m = w[0]
            for i in range(k):
                m = m + w[i + 1] * xs[i]
            d = math.exp(m) - y
            g[0] += d
            for i in range(k):
                g[i + 1] += d * xs[i]
        w = [w[j] - lr * (g[j] / n) for j in range(k + 1)]
    return w


class TestPoisson:
    def test_matches_reference_gd(self, spark):
        from temporal_retriever_spark.llm.classify import poisson_train

        rows = [
            (3.0, (0.5,)),
            (1.0, (0.1,)),
            (7.0, (1.2,)),
            (2.0, (0.4,)),
            (5.0, (0.9,)),
        ]
        df = spark.createDataFrame(
            [(y, x) for y, (x,) in rows], "y double, f double"
        )
        got = poisson_train(df, ["f"], "y", lr=0.1, iterations=8)
        want = _poisson_ref(rows, k=1)
        for g, w in zip(got, want):
            assert math.isclose(g, w, rel_tol=1e-9), (got, want)

    def test_learns_rate_structure(self, spark):
        from temporal_retriever_spark.llm.classify import (
            poisson_score,
            poisson_train,
        )

        # y = exp(1 + 0.5x) evaluated exactly (deterministic "counts");
        # unit-scale features per the docstring (exp link curvature)
        pts = [(math.exp(1.0 + 0.5 * (i / 30.0)), i / 30.0) for i in range(30)]
        df = spark.createDataFrame(pts, "y double, f double")
        w = poisson_train(df, ["f"], "y", lr=0.3, iterations=120)
        assert abs(w[0] - 1.0) < 0.05 and abs(w[1] - 0.5) < 0.05, w
        scored = poisson_score(df, w, ["f"])
        rel = scored.select(
            F.max(F.abs(F.col("rate") - F.col("y")) / F.col("y")).alias("m")
        ).collect()[0]["m"]
        assert rel < 0.05

    def test_validation(self, spark):
        from temporal_retriever_spark.llm.classify import (
            poisson_score,
            poisson_train,
        )

        df = spark.createDataFrame([(1.0, 1.0)], "y double, f double")
        with pytest.raises(ValueError, match="iterations"):
            poisson_train(df, ["f"], "y", iterations=0)
        with pytest.raises(ValueError, match="lr"):
            poisson_train(df, ["f"], "y", lr=-1.0)
        with pytest.raises(ValueError, match="weights"):
            poisson_score(df, [0.0, 1.0, 2.0], ["f"])
