"""Corpus preparation: the end-to-end training-data filter pipeline.

Composes the §2.10 building blocks into the operator a pre-training
data pipeline actually runs: quality gate → language gate → dedup with
canonical keeper selection — the "raw crawl → clean corpus" step.

Scale shape: the quality and language gates are pure native expressions
evaluated in ONE narrow pass over the documents (no self-joins — the
metrics come from ``text.quality_exprs``/``text.language_expr``, not a
join against ``text_stats`` output), so they ride the scan and push
nothing to a shuffle. Dedup then shuffles only digests (exact) or
MinHash signatures/band keys (near) — never document bodies. The near
path is the sub-quadratic LSH → exact-Jaccard-verify → connected
components composition.

No reference analog (extension surface, SURVEY §2.10 / BASELINE north
star).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.dedup import (
    duplicate_clusters,
    exact_dedup,
    near_dup_pairs_verified,
)
from temporal_retriever_spark.llm.text import language_expr, quality_exprs

#: metric columns prepare_corpus appends to surviving rows
CORPUS_METRICS = ("n_chars", "n_tokens", "digit_ratio", "quality_score")


def prepare_corpus(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 100,
    max_digit_ratio: float = 0.3,
    min_quality: float | None = None,
    langs: Iterable[str] | None = None,
    dedup: str | None = "exact",
    shingle_size: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """Filter + dedup a document table into a training-ready corpus.

    Returns the surviving rows of ``df`` with ``lang_pred`` and the
    ``CORPUS_METRICS`` columns appended. Gates:

    * ``min_chars`` / ``max_digit_ratio`` / ``min_quality`` — quality
      thresholds over the native metric expressions.
    * ``langs`` — allowlist over the marker-n-gram language id
      (None = keep all languages).
    * ``dedup="exact"`` — one keeper (min id) per normalized text;
      ``dedup="near"`` — MinHash-LSH candidates, exact-Jaccard
      verification at ``jaccard_threshold``, connected components, one
      keeper (min id) per duplicate cluster; ``dedup=None`` — keep all.

    Determinism: every gate and both dedup modes are deterministic
    (fixed hash seeds), so the surviving id set is reproducible across
    runs and engines — the property the driver oracle checks.
    """
    metrics = quality_exprs(text_col)
    enriched = df.withColumns(
        {name: metrics[name] for name in CORPUS_METRICS}
    ).withColumn("lang_pred", language_expr(text_col))

    cond = (F.col("n_chars") >= int(min_chars)) & (
        F.col("digit_ratio") <= float(max_digit_ratio)
    )
    if min_quality is not None:
        cond = cond & (F.col("quality_score") >= float(min_quality))
    if langs is not None:
        cond = cond & F.col("lang_pred").isin(list(langs))
    filtered = enriched.filter(cond)

    if dedup is None:
        return filtered
    if dedup == "exact":
        return exact_dedup(filtered, text_col=text_col, id_col=id_col)
    if dedup != "near":
        raise ValueError(f"unknown dedup mode: {dedup!r}")
    pairs = near_dup_pairs_verified(
        filtered.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        n=shingle_size,
        num_hashes=num_hashes,
        num_bands=num_bands,
        threshold=jaccard_threshold,
    )
    clusters = duplicate_clusters(pairs)
    # drop every clustered doc except the canonical (min-id) keeper;
    # docs in no cluster survive untouched. Anti-join ships ids only.
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return filtered.join(losers, on=id_col, how="left_anti")
