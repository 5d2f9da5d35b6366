"""DSIR-style data selection: importance resampling toward a target
distribution.

The published recipe is Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" (DSIR): estimate cheap bag-of-n-gram
language models on a TARGET corpus (the distribution you want more
of — e.g. curated reference text) and on the RAW pool, weight every
raw document by the log-likelihood ratio ``log p_target(x) −
log p_raw(x)``, and sample the training set ∝ those weights via
Gumbel-top-k (sampling without replacement from the softmax). The
effect: the selected corpus *distributionally* matches the target
rather than just thresholding a quality score — the step beyond
CCNet-style perplexity pruning (``lm.perplexity_prune``), which this
module composes with the same ``llm.lm`` count models.

Scale design:

* Weights are two :func:`~temporal_retriever_spark.llm.lm.score_ngram_lm`
  passes (each: narrow scan → per-doc n-gram pre-agg → model-sized
  broadcast joins → one scalar groupBy) joined on id — linear, and
  the document text never shuffles.
* Selection is Gumbel-top-k: the Gumbel noise derives from the same
  engine-portable md5 draw as ``corpus.sample_corpus`` (no ``rand()``
  — reproducible, partition-layout-independent, re-runnable), and
  top-k is ``orderBy(...).limit(k)`` — Spark's TakeOrdered, a
  per-partition heap + driver merge of k rows, no global sort
  materialization.
* Both models are shard-mergeable count tables; at 100 TB train them
  on hash-samples and reuse across selection runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.corpus import sample_hash_expr
from temporal_retriever_spark.llm.lm import doc_ngram_occurrences, score_ngram_lm

__all__ = ["importance_weights", "gumbel_expr", "dsir_select"]


def importance_weights(
    docs: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    *,
    n: int = 3,
    unit: str = "char",
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    occ: DataFrame | None = None,
) -> DataFrame:
    """Per-document log importance weight under two n-gram LMs.

    Returns ``(id, n_grams, log_ratio_per_token, log_ratio)`` where
    ``log_ratio = ln p_target(x) − ln p_raw(x)`` (total over the
    document's n-grams) and the per-token column is the
    length-normalized variant (DSIR weighting uses the total; the
    per-token form is the comparable-across-lengths diagnostic).
    Both models must share ``n``/``unit`` with this call — a
    mismatched model fails loud downstream (see ``score_ngram_lm``).

    Persist ownership (VERDICT r9 item 5 — the r9 form persisted the
    corpus-sized per-doc n-gram table here and could never release it,
    pinning it in cache for the session): both scoring passes consume
    the SAME ``occ`` subtree, which Spark's exchange reuse computes
    once within a single action, so the default builds it unpersisted.
    A caller that materializes several actions over the weights (or
    loops over corpora) should build :func:`lm.doc_ngram_occurrences`
    itself, persist it, pass it via ``occ=``, and unpersist after its
    action completes — the owner-managed pattern the contract entry
    uses.
    """
    if occ is None:
        occ = doc_ngram_occurrences(
            docs, n=n, unit=unit, text_col=text_col, id_col=id_col
        )
    t = score_ngram_lm(
        docs, target_model, n=n, unit=unit, k=k, text_col=text_col,
        id_col=id_col, occ=occ,
    ).select(id_col, "n_grams", F.col("logprob_per_token").alias("_lp_t"))
    r = score_ngram_lm(
        docs, raw_model, n=n, unit=unit, k=k, text_col=text_col,
        id_col=id_col, occ=occ,
    ).select(id_col, F.col("logprob_per_token").alias("_lp_r"))
    return t.join(r, id_col).select(
        id_col,
        "n_grams",
        (F.col("_lp_t") - F.col("_lp_r")).alias("log_ratio_per_token"),
        (F.col("n_grams") * (F.col("_lp_t") - F.col("_lp_r"))).alias(
            "log_ratio"
        ),
    )


def gumbel_expr(id_col: str = "doc_id", *, salt: str = "") -> "F.Column":
    """Deterministic standard-Gumbel draw per id: ``−ln(−ln u)``.

    ``u`` is the md5 uniform of :func:`corpus.sample_hash_expr` shifted
    by half a bucket (``(h + 0.5)/2³²``) so it is strictly inside
    (0, 1) — ``u = 0`` would send the Gumbel to −∞. Engine-portable:
    any SQL engine with md5 reproduces the draw bit-for-bit.
    """
    u = sample_hash_expr(id_col, salt=salt) + F.lit(0.5 / 2**32)
    return -F.log(-F.log(u))


def dsir_select(
    docs: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    *,
    n_select: int,
    n: int = 3,
    unit: str = "char",
    k: float = 0.5,
    temperature: float = 1.0,
    salt: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
    occ: DataFrame | None = None,
) -> DataFrame:
    """Select ``n_select`` documents ∝ softmax(log_ratio / temperature)
    without replacement (Gumbel-top-k).

    Returns ``(id, n_grams, log_ratio_per_token, log_ratio, sort_key)``
    for the selected ids — join back to the corpus by id for payloads
    (ids-only selection keeps the top-k heap rows narrow).
    ``temperature → 0`` approaches deterministic top-k by weight;
    large temperatures approach uniform sampling. Reproducible via
    ``salt`` (disjoint salts ⇒ independent selections).
    """
    if n_select < 1:
        raise ValueError(f"n_select must be >= 1: {n_select}")
    if not temperature > 0:
        raise ValueError(f"temperature must be > 0: {temperature}")
    w = importance_weights(
        docs,
        target_model,
        raw_model,
        n=n,
        unit=unit,
        k=k,
        text_col=text_col,
        id_col=id_col,
        occ=occ,
    )
    key = (
        F.col("log_ratio") / F.lit(float(temperature))
        + gumbel_expr(id_col, salt=salt)
    ).alias("sort_key")
    return (
        w.select(id_col, "n_grams", "log_ratio_per_token", "log_ratio", key)
        .orderBy(F.col("sort_key").desc(), F.col(id_col))
        .limit(n_select)
    )
