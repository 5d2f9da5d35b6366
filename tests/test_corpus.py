from __future__ import annotations

import math

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
    # the quality+language gates must not introduce a KEYED shuffle or
    # a join. The one allowed exchange is the guarded round-robin
    # spread_scan (r9): it fires only on under-partitioned scans (as
    # here, a tiny test frame) and is a no-op at real partition counts.
    out = prepare_corpus(docs, dedup=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    n_exchanges = plan.count("Exchange")
    n_roundrobin = plan.count("RoundRobinPartitioning")
    assert n_exchanges == n_roundrobin <= 1, plan


def test_uniform_sample_deterministic_and_stable(spark, docs):
    from temporal_retriever_spark.llm.corpus import sample_corpus

    a = {r["doc_id"] for r in sample_corpus(docs, fraction=0.3).select("doc_id").collect()}
    b = {r["doc_id"] for r in sample_corpus(docs, fraction=0.3).select("doc_id").collect()}
    assert a == b  # reproducible across runs
    # append-only stability: growing the fraction only adds ids
    c = {r["doc_id"] for r in sample_corpus(docs, fraction=0.6).select("doc_id").collect()}
    assert a <= c
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # roughly the requested rate
    # disjoint salts draw independently (different samples)
    d = {r["doc_id"] for r in sample_corpus(docs, fraction=0.3, salt="s2").select("doc_id").collect()}
    assert a != d
    with pytest.raises(ValueError):
        sample_corpus(docs, fraction=1.5)
    with pytest.raises(ValueError):
        sample_corpus(docs)


def test_stratified_sample_rates_and_drop(spark, tables):
    from temporal_retriever_spark.llm.corpus import sample_corpus

    docs = tables["documents"]
    out = sample_corpus(
        docs, fractions={"en": 1.0, "de": 0.0}, strata_col="lang"
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}  # de sampled at 0, others dropped entirely
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en


def test_sample_predicate_stays_on_scan(spark, docs):
    from temporal_retriever_spark.llm.corpus import sample_corpus

    plan = sample_corpus(docs, fraction=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_sketch_stats_within_bounds(spark, tables):
    from temporal_retriever_spark.llm.corpus import corpus_sketch_stats

    docs = tables["documents"]
    approx = corpus_sketch_stats(docs, group_col="lang")
    exact = docs.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("xd"),
        F.expr("percentile(length(text), array(0.4, 0.6))").alias("xq"),
    )
    rows = approx.join(exact, on="lang").collect()
    assert rows
    for r in rows:
        assert abs(r["approx_distinct_docs"] - r["xd"]) <= max(2, 0.06 * r["xd"])
        assert r["xq"][0] <= r["len_p50"] <= r["xq"][1]
        assert r["len_p50"] <= r["len_p90"] <= r["len_p99"]


def test_quality_prune_exact_counts_and_order(spark):
    import math

    from temporal_retriever_spark.llm.corpus import quality_prune

    rows = []
    # src a: 10 docs of stepped quality (longer text = higher len_score)
    for i in range(10):
        rows.append((i, "word " * (5 + i * 8), "a"))
    for i in range(4):
        rows.append((100 + i, "tok " * (10 + i * 10), "b"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = quality_prune(df, keep_frac=0.3).toPandas()
    counts = out.groupby("source").size()
    assert counts["a"] == math.ceil(0.3 * 10) and counts["b"] == math.ceil(0.3 * 4)
    # docs 5..9 saturate len_score and tie at the top score; the
    # deterministic id-asc tie-break keeps the smallest tied ids
    assert set(out[out.source == "a"].doc_id) == {5, 6, 7}
    assert set(out[out.source == "b"].doc_id) == {102, 103}
    # keep_frac=1 keeps everything; invalid frac raises
    assert quality_prune(df, keep_frac=1.0).count() == 14
    with pytest.raises(ValueError, match="keep_frac"):
        quality_prune(df, keep_frac=0.0)


def test_quality_prune_keyless_warns(spark):
    import warnings

    from temporal_retriever_spark.llm.corpus import quality_prune

    df = spark.createDataFrame(
        [(1, "some text here", "s")], "doc_id long, text string, source string"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        quality_prune(df, keep_frac=0.5, group_col=None)
    assert any("quality_prune" in str(w.message) for w in caught)


def test_quality_prune_precomputed_score(spark):
    from temporal_retriever_spark.llm.corpus import quality_prune

    df = spark.createDataFrame(
        [(1, "x", "s", 0.9), (2, "x", "s", 0.1), (3, "x", "s", 0.5)],
        "doc_id long, text string, source string, myscore double",
    )
    out = quality_prune(df, keep_frac=0.3, score_col="myscore").toPandas()
    assert list(out.doc_id) == [1] and out.iloc[0].quality_score == 0.9


def test_mixture_plan_scarce_group_taken_whole(spark):
    from temporal_retriever_spark.llm.corpus import apply_mixture, mixture_plan

    rows = []
    # tokens: a=100 docs x 10 tok, b=20 x 10, c=40 x 10
    for src, n in (("a", 100), ("b", 20), ("c", 40)):
        for i in range(n):
            rows.append((hash((src, i)) % 10**9, "tok " * 10, src))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = {"a": 0.5, "b": 0.2, "c": 0.3}
    plan = mixture_plan(df, w).toPandas().set_index("source")
    # feasible budgets avail/w: a=2000, b=1000, c=1333.3 -> b binds at
    # B=1000 and is taken whole; the others sample down
    assert plan.loc["b"].fraction == pytest.approx(1.0)
    assert plan.loc["c"].fraction == pytest.approx(1000 * 0.3 / 400, rel=1e-9)
    assert plan.loc["a"].fraction == pytest.approx(1000 * 0.5 / 1000, rel=1e-9)
    # budgets respect the target ratio
    assert plan.budget_tokens.loc["a"] / plan.budget_tokens.loc["b"] == pytest.approx(2.5)
    # explicit smaller budget scales down proportionally
    plan2 = mixture_plan(df, w, total_tokens=500).toPandas().set_index("source")
    assert plan2.loc["a"].budget_tokens == pytest.approx(250.0)
    sampled = apply_mixture(df, mixture_plan(df, w))
    assert 0 < sampled.count() <= len(rows)
    with pytest.raises(ValueError, match="sum"):
        mixture_plan(df, {"a": 0.5})
    with pytest.raises(ValueError, match="positive"):
        mixture_plan(df, {"a": 1.2, "b": -0.2})


from temporal_retriever_spark.llm.corpus import gini_concentration


class TestGini:
    def test_uniform_is_zero(self, spark):
        rows = [(f"s{i % 4}",) for i in range(40)]
        df = spark.createDataFrame(rows, "src string")
        out = gini_concentration(df, "src").collect()[0]
        assert out["n_groups"] == 4 and out["total"] == 40.0
        assert abs(out["gini"]) < 1e-12

    def test_total_concentration_approaches_one(self, spark):
        rows = [("big",)] * 997 + [("a",), ("b",), ("c",)]
        df = spark.createDataFrame(rows, "src string")
        out = gini_concentration(df, "src").collect()[0]
        # G for [1,1,1,997]: 2*(1+2+3+4*997)/(4*1000) - 5/4 = 0.747
        assert math.isclose(out["gini"], 0.747, abs_tol=1e-9)

    def test_weighted_and_label(self, spark):
        rows = [("a", 10), ("a", 10), ("b", 80)]
        df = spark.createDataFrame(rows, "src string, tok long")
        out = gini_concentration(
            df, "src", weight_col="tok", label="tokens_by_src"
        ).collect()[0]
        # masses [20, 80]: G = 2*(1*20+2*80)/(2*100) - 3/2 = 0.3
        assert out["dimension"] == "tokens_by_src"
        assert math.isclose(out["gini"], 0.3, rel_tol=1e-12)

    def test_null_groups_dropped(self, spark):
        rows = [("a",), (None,), ("b",)]
        df = spark.createDataFrame(rows, "src string")
        assert gini_concentration(df, "src").collect()[0]["n_groups"] == 2
