"""Lexical and hybrid retrieval: Okapi BM25 scoring + reciprocal-rank
fusion with the embedding ANN operators.

The published pieces: BM25 (Robertson & Walker; the Lucene
``k1``/``b`` parameterization with the non-negative idf) and RRF
(Cormack, Clarke & Buettcher 2009) — the standard way production
search fuses a lexical ranking with a vector ranking without score
calibration.

Scale design:

* The corpus side is indexed ONCE: ``bm25_index`` computes per-(doc,
  term) frequencies and per-doc lengths in one explode + one
  aggregation (map-side combined; text never shuffles again), exactly
  the ``lm.train_ngram_lm`` shape. Document frequencies and the
  corpus constants (N, avgdl) derive from the index — no second scan.
* Scoring joins the (tiny, broadcast) query-term table against the
  posting rows by term, then ONE groupBy(query, doc) of scalar
  partials. Per-query top-k is the pre-shuffle ``WindowGroupLimit``
  rank window, like ``cosine_topk``.
* ``rrf_fuse`` is a union + one aggregation over (query, doc, rank)
  triples — rankings are already tiny (top-k per query).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_index", "bm25_topk", "mmr_rerank", "rrf_fuse", "hybrid_topk"]


def _terms(text_col) -> "F.Column":
    """Lowercase whitespace terms of normalized text (module-wide)."""
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+", " "
    )
    return F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
        F.array().cast("array<string>")
    )


def bm25_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Posting rows: (id, term, tf, dl) — term frequency and document
    length. One explode + ONE aggregation; build once, score many."""
    toks = docs.select(
        F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    w = Window.partitionBy(id_col)
    return tf.withColumn("dl", F.sum("tf").over(w))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Per-query BM25 top-k: (query_id, id, rank, bm25).

    score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's shifted idf,
    always ≥ 0). Repeated query terms count once (set semantics, the
    standard convention). Ties break on the smaller doc id.

    Pass a cached ``index`` (from :func:`bm25_index`) to amortize the
    corpus pass across query batches.
    """
    if index is None:
        index = bm25_index(docs, id_col=id_col, text_col=text_col)
    consts = index.groupBy().agg(
        F.countDistinct(id_col).alias("_n"),
        (F.sum("tf") / F.countDistinct(id_col)).alias("_avgdl"),
    )
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(_terms(F.col(query_text_col)))).alias("term"),
    )
    # document frequencies only for the QUERY terms (semi-join first):
    # the full-vocabulary df table is corpus-sized and must never be
    # aggregated — let alone broadcast — for a handful of queries
    df_tbl = (
        index.join(
            F.broadcast(qterms.select("term").distinct()), on="term", how="left_semi"
        )
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
    )
    scored = (
        index.join(F.broadcast(qterms), on="term")
        .join(F.broadcast(df_tbl), on="term")
        .crossJoin(F.broadcast(consts))
        .select(
            query_id_col,
            id_col,
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("_avgdl")
                    )
                )
            ).alias("_s"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_s").alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "bm25")
    )


def rrf_fuse(
    rankings: Iterable[DataFrame],
    *,
    k: int = 60,
    top: int | None = None,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion: score(d) = Σ_r 1/(k + rank_r(d)).

    Each input ranking contributes only for documents it ranked (the
    standard RRF convention). Output: (query_id, id, rank, rrf) with
    the fused rank (ties → smaller id), truncated to ``top`` if given.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0: {k}")
    rankings = list(rankings)
    if not rankings:
        raise ValueError("need at least one ranking")
    parts = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("_c"),
        )
        for r in rankings
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    fused = un.groupBy(query_id_col, id_col).agg(F.sum("_c").alias("rrf"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf").desc(), F.col(id_col)
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if top is not None:
        out = out.filter(F.col("rank") <= top)
    return out.select(query_id_col, id_col, "rank", "rrf")


def hybrid_topk(
    docs: DataFrame,
    corpus_vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Hybrid lexical+vector retrieval: BM25 top-k and exact cosine
    top-k fused by RRF. ``queries`` carries both a text column and an
    embedding column; vector ids must align with doc ids.

    The vector leg is ``cosine_topk`` (swap in ``pq_topk`` /
    ``ivf_cosine_topk`` at scale — any (query, id, rank) ranking
    fuses identically).
    """
    from temporal_retriever_spark.llm.similarity import cosine_topk

    lex = bm25_topk(
        docs,
        queries.select(query_id_col, query_text_col),
        k=k,
        k1=k1,
        b=b,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    ).select(query_id_col, F.col(id_col), "rank")
    vec = cosine_topk(
        corpus_vectors,
        queries.select(query_id_col, vec_col),
        k=k,
        id_col=vec_id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, F.col(vec_id_col).alias(id_col), "rank")
    return rrf_fuse(
        [lex, vec],
        k=rrf_k,
        top=k,
        query_id_col=query_id_col,
        id_col=id_col,
    )


def mmr_rerank(
    candidates: DataFrame,
    *,
    k: int = 10,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity pass after any retriever: greedily pick

        argmax_d  λ·rel(d) − (1−λ)·max_{s ∈ selected} cos(d, s)

    so near-duplicate hits can't crowd the top-k. λ=1 is pure
    relevance, λ→0 pure diversity. First pick is the highest-scored
    candidate; ties in any round break by (relevance DESC, ``id_col``
    ASC) — the pre-sorted argmax order — fully deterministic,
    oracle-replayable.

    Scale shape: the greedy loop is inherently sequential PER QUERY
    but queries are independent, so this runs as ONE grouped Arrow
    pass (`applyInPandas`) over per-query candidate lists — the
    documented whole-series-math exception to the no-Python rule.
    Candidate lists are top-N-bounded by construction (the retriever
    already truncated), so per-group memory is O(N·dim) regardless of
    corpus size; cost O(k·N·dim) per query.

    Output: (query, doc, mmr_rank 1..k, mmr_score) — mmr_score of the
    first pick is λ·rel (no diversity term yet), matching the paper.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1]: {lam}")

    out_schema = (
        f"{query_col} {dict(candidates.dtypes)[query_col]}, "
        f"{id_col} {dict(candidates.dtypes)[id_col]}, "
        "mmr_rank int, mmr_score double"
    )
    lam_f = float(lam)
    kk = int(k)

    def walk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        max_sim = np.full(n, -np.inf)
        for _ in range(min(kk, n)):
            if not chosen:
                mmr = lam_f * rel
            else:
                mmr = lam_f * rel - (1.0 - lam_f) * max_sim
            mmr[chosen] = -np.inf
            # ties: pdf is pre-sorted by (score desc, id asc) and
            # argmax returns the FIRST max — id-ascending tie-break
            best = int(np.argmax(mmr))
            chosen.append(best)
            scores.append(float(mmr[best]))
            sim = unit @ unit[best]
            max_sim = np.maximum(max_sim, sim)
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[chosen].to_numpy(),
                id_col: pdf[id_col].iloc[chosen].to_numpy(),
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
                "mmr_score": np.array(scores),
            }
        )

    return candidates.groupBy(query_col).applyInPandas(walk, out_schema)
