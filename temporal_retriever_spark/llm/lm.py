"""Statistical n-gram language model: train on a reference corpus,
score documents by perplexity.

The published recipe this implements is CCNet-style quality filtering
(Wenzek et al. 2020): train a small LM on a high-quality reference
corpus (they use Wikipedia; here any DataFrame of documents), score
every candidate document by perplexity, and keep the low-perplexity
head / bucket the tail. The reference engine has no document pipeline
at all (it is a time-series service, app.py:96-98) — this module is
part of the corpus surface built on the same engine, alongside
``llm.filters`` (rule gates) and ``llm.dedup``.

Scale design (the part that matters at 100 TB):

* **Training is ONE aggregation.** Documents explode to n-grams via a
  native ``transform(sequence(...))`` HOF (JVM, codegen — no Python),
  then a single ``groupBy(ngram).count()``. The only shuffle carries
  (ngram, partial-count) pairs — map-side combine collapses each
  partition to its distinct n-grams first, so shuffle volume is
  bounded by |vocab|^n per partition, not corpus size. Context
  counts and the vocabulary size derive from the *model* table
  (tiny) — never a second pass over the corpus.
* **Scoring is two hash joins + one aggregation, all linear.** Each
  document pre-aggregates its n-grams to (doc_id, ngram, occurrences)
  before joining — a document that repeats an n-gram pays for it
  once in the join. The model side is small (≤ |charset|^n rows for
  char models); AQE broadcasts it, so at scale the scoring pass is a
  *narrow* scan + broadcast joins + one groupBy(doc_id) shuffle of
  scalar partial sums.
* **No driver state.** The model is a DataFrame; nothing is
  collected. Compose with ``corpus.quality_prune`` / ``sample_corpus``
  downstream — the perplexity column is an ordinary column.

Two smoothers, both pure count tables (shard-mergeable by summing):

* add-k (Lidstone): ``p(c|ctx) = (cnt + k) / (ctx_cnt + k·V)``,
  unseen context ⇒ uniform ``1/V`` — the simple, fully mergeable
  baseline (:func:`train_ngram_lm` / :func:`score_ngram_lm`).
* interpolated Kneser-Ney (:func:`train_kn_lm` / :func:`score_kn_lm`)
  — what KenLM, and therefore the actual CCNet pipeline, uses. The
  model artifact stays raw counts (mergeable); the KN continuation
  counts and discounts are re-derived from the merged table at scoring
  time with model-sized aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..spread import spread_scan

__all__ = [
    "char_ngrams_expr",
    "word_ngrams_expr",
    "train_ngram_lm",
    "doc_ngram_occurrences",
    "score_ngram_lm",
    "perplexity_prune",
    "train_kn_lm",
    "score_kn_lm",
]

#: boundary markers, chosen from C0 controls so they cannot occur in
#: normalized text (the normalizer collapses whitespace; STX/ETX are
#: not whitespace but never appear in real corpus text — and both are
#: reproducible cross-engine as chr(2)/chr(3) in the SQL oracle).
BOS = "\x02"
EOS = "\x03"


def _normalize(text_col: Column) -> Column:
    """Module-wide normalization: lowercase, collapse whitespace runs
    to single spaces, trim; null ⇒ empty."""
    return F.regexp_replace(
        F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+", " "
    )


def char_ngrams_expr(text_col: Column | str, n: int) -> Column:
    """Array of character ``n``-grams of the normalized, padded text.

    Padding is ``(n-1)·BOS ⧺ text ⧺ EOS`` so every document — even an
    empty one — yields at least one n-gram and the model learns
    document-initial and -final statistics. Pure JVM HOF
    (``transform`` over ``sequence``): no Python, no shuffle.

    Shape note (measured, round 6): ``substring(padded, i, n)`` scans
    UTF-8 bytes to position ``i``, so this loop is formally O(len²)
    per document — but the measured constant beats every O(len)
    alternative at corpus-realistic lengths: on 2k docs × 5k chars,
    substring = 13.5 s for 10M trigrams vs >6 min for
    split-to-char-array + ``element_at`` (array materialization and
    per-element UTF8String churn dominate) — regex-lookahead extraction
    was no better. For pathological documents (≫100 KB) chunk first
    (``llm.chunking.doc_chunks``); don't swap this for an "O(L)" array
    shape without re-measuring.

    Binding note (r10): the padded text must enter the per-position
    lambda as a BOUND VARIABLE, not a captured expression — a captured
    expression re-evaluates its whole tree (normalize regex + concat)
    once PER ELEMENT. The let-binding here is ``transform(array(padded),
    p -> …)``: the outer transform evaluates ``padded`` exactly once
    into the one-element array and the inner lambda reads the variable.
    Measured on the sf1 corpus (16.8M bigrams): 25.5 s captured →
    2.6 s bound, identical output. Same construction in
    :func:`word_ngrams_expr`.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    padded = F.concat(F.lit(BOS * (n - 1)), _normalize(col), F.lit(EOS))
    return F.element_at(
        F.transform(
            F.array(padded),
            lambda p: F.transform(
                F.sequence(F.lit(1), F.length(p) - F.lit(n - 1)),
                lambda i: F.substring(p, i, n),
            ),
        ),
        1,
    )


def word_ngrams_expr(text_col: Column | str, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) of the normalized text,
    padded with BOS/EOS word markers. Empty text ⇒ the boundary-only
    n-gram sequence (n-1 BOS tokens + EOS)."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = _normalize(col)
    toks = F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
        F.array().cast("array<string>")
    )
    padded = F.concat(
        F.array(*[F.lit(BOS) for _ in range(n - 1)]), toks, F.array(F.lit(EOS))
    )
    # let-binding via transform(array(padded), p -> …) so the
    # normalize/split/concat tree evaluates once per row, not once per
    # n-gram position — see char_ngrams_expr's binding note (r10)
    return F.element_at(
        F.transform(
            F.array(padded),
            lambda p: F.transform(
                F.sequence(F.lit(1), F.size(p) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(p, i, n), " "),
            ),
        ),
        1,
    )


def _ngrams(text_col: str, n: int, unit: str) -> Column:
    if unit == "char":
        return char_ngrams_expr(text_col, n)
    if unit == "word":
        return word_ngrams_expr(text_col, n)
    raise ValueError(f"unsupported unit: {unit!r} (use 'char' or 'word')")


def _last_token(ngram: Column, n: int, unit: str) -> Column:
    """The predicted token of an n-gram (its last char / word)."""
    if unit == "char":
        return F.substring(ngram, n, 1)
    return F.element_at(F.split(ngram, " "), -1)


def _context(ngram: Column, n: int, unit: str) -> Column:
    """The conditioning context of an n-gram (first n-1 chars/words)."""
    if unit == "char":
        return F.substring(ngram, 1, n - 1)
    toks = F.split(ngram, " ")
    return F.array_join(F.slice(toks, 1, n - 1), " ")


def train_ngram_lm(
    docs: DataFrame,
    *,
    n: int = 3,
    unit: str = "char",
    text_col: str = "text",
) -> DataFrame:
    """Train an add-k-smoothable n-gram count model.

    Returns ``(ngram, ctx, cnt)`` — one row per distinct n-gram seen
    in the training corpus, with its conditioning context split out.
    ONE corpus pass, ONE shuffle (the count aggregation, map-side
    combined); context totals and vocabulary size are derived from
    this table by :func:`score_ngram_lm`, never from the corpus.

    The model is shard-mergeable: train per corpus shard and
    ``groupBy(ngram, ctx).sum(cnt)`` to combine.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2 for a conditional model: {n}")
    # the n-gram HOF is per-row expression work: spread an
    # under-partitioned corpus scan or it serializes on one task
    docs = spread_scan(docs.select(text_col))
    grams = docs.select(F.explode(_ngrams(text_col, n, unit)).alias("ngram"))
    model = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
    return model.select(
        "ngram", _context(F.col("ngram"), n, unit).alias("ctx"), "cnt"
    )


def doc_ngram_occurrences(
    docs: DataFrame,
    *,
    n: int = 3,
    unit: str = "char",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram pre-aggregation: (id, ngram, occ, ctx).

    The corpus-sized half of :func:`score_ngram_lm`, exposed so a
    caller scoring the SAME documents against several models (DSIR's
    target/raw pair) can build it once, persist it, and pass it via
    ``occ=`` instead of re-exploding the corpus per model.
    """
    return (
        spread_scan(docs.select(id_col, text_col))
        .select(
            F.col(id_col), F.explode(_ngrams(text_col, n, unit)).alias("ngram")
        )
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("occ"))
        .withColumn("ctx", _context(F.col("ngram"), n, unit))
    )


def score_ngram_lm(
    docs: DataFrame,
    model: DataFrame,
    *,
    n: int = 3,
    unit: str = "char",
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    occ: DataFrame | None = None,
) -> DataFrame:
    """Score documents against a trained model: per-token average
    log-probability and perplexity.

    Returns ``(id_col, n_grams, logprob_per_token, perplexity)`` —
    ``perplexity = exp(-logprob_per_token)``, lower = more like the
    training corpus (the CCNet keep signal).

    Probabilities are add-k smoothed: ``(cnt + k) / (ctx_cnt + k·V)``
    with ``V`` = distinct predicted tokens in the model. Unseen
    n-gram with seen context ⇒ ``k / (ctx_cnt + k·V)``; unseen
    context ⇒ uniform ``1/V``.

    A model trained with a different ``n``/``unit`` contributes no
    usable rows (they are filtered out), leaving ``V=0`` — the uniform
    backstop then raises ``DIVIDE_BY_ZERO`` at execution (ANSI mode)
    instead of silently scoring every document as perfect (``p=1``),
    which is what a mismatched lookup would otherwise produce.

    Plan shape (asserted in tests/test_plan_shapes.py): narrow scan →
    explode → per-doc (doc, ngram) pre-aggregation → two joins against
    model-derived tables (broadcast under AQE when the model is small,
    shuffle-hash otherwise — both linear) → one groupBy(id) of scalar
    sums. Documents' text never shuffles; only (id, ngram, occ).
    """
    if not k > 0:
        raise ValueError(f"smoothing k must be > 0: {k}")
    # Guard against a model trained with a different n/unit: keep only
    # rows whose n-gram actually has n tokens. A silently mismatched
    # model would otherwise make every n-gram "unseen with an unseen
    # context" and V=1, scoring every document as perfect (p=1).
    if unit == "char":
        model = model.filter(F.length("ngram") == n)
    else:
        model = model.filter(F.size(F.split("ngram", " ")) == n)
    # model-derived tables (model-sized, tiny relative to the corpus)
    ctx_counts = model.groupBy("ctx").agg(F.sum("cnt").alias("ctx_cnt"))
    vocab = model.select(
        _last_token(F.col("ngram"), n, unit).alias("_tok")
    ).agg(F.count_distinct("_tok").alias("v"))

    if occ is None:
        occ = doc_ngram_occurrences(
            docs, n=n, unit=unit, text_col=text_col, id_col=id_col
        )
    joined = (
        occ.join(model.select("ngram", "cnt"), "ngram", "left")
        .join(ctx_counts, "ctx", "left")
        .crossJoin(F.broadcast(vocab))
    )
    kv = F.lit(float(k))
    p = (
        F.when(
            F.col("ctx_cnt").isNotNull(),
            (F.coalesce(F.col("cnt"), F.lit(0)) + kv)
            / (F.col("ctx_cnt") + kv * F.col("v")),
        )
        .otherwise(F.lit(1.0) / F.col("v"))
    )
    scored = joined.groupBy(id_col).agg(
        F.sum("occ").alias("n_grams"),
        (F.sum(F.col("occ") * F.log(p)) / F.sum("occ")).alias(
            "logprob_per_token"
        ),
    )
    return scored.withColumn("perplexity", F.exp(-F.col("logprob_per_token")))


def perplexity_prune(
    docs: DataFrame,
    model: DataFrame,
    *,
    keep_frac: float = 0.5,
    n: int = 3,
    unit: str = "char",
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Keep the lowest-perplexity ``keep_frac`` of documents — the
    CCNet head/middle cut, optionally per stratum (e.g. per language
    or source, so a hard language is not starved by an easy one).

    Scale path (default, ``exact=False``): compute the per-stratum
    perplexity threshold with ``approx_percentile`` — ONE aggregation
    whose state is a bounded quantile sketch per stratum, broadcast
    back as a tiny threshold table. No global sort, no windowed rank;
    this is the only shape that survives a 100 TB corpus.

    Exact path (``exact=True``): ``percent_rank`` window, ties broken
    by id — deterministic to the row, but a keyless call
    single-partitions the rank (fine for fixtures/tests, NOT a scale
    path; per-stratum calls shard the sort by stratum).

    Returns the surviving documents with their scores attached.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac}")
    scores = score_ngram_lm(
        docs, model, n=n, unit=unit, k=k, text_col=text_col, id_col=id_col
    )
    keyed = docs.join(scores, id_col)
    if not exact:
        grp = keyed.groupBy(strata_col) if strata_col else keyed.groupBy()
        thr = grp.agg(
            F.percentile_approx(
                "perplexity", F.lit(float(keep_frac)), F.lit(10_000)
            ).alias("_thr")
        )
        joined = (
            keyed.join(F.broadcast(thr), strata_col)
            if strata_col
            else keyed.crossJoin(F.broadcast(thr))
        )
        return joined.filter(F.col("perplexity") <= F.col("_thr")).drop("_thr")
    from pyspark.sql import Window

    part = (
        Window.partitionBy(strata_col)
        if strata_col
        else Window.partitionBy(F.lit(1))
    )
    w = part.orderBy(F.col("perplexity").asc(), F.col(id_col).asc())
    ranked = keyed.withColumn("_pr", F.percent_rank().over(w))
    return ranked.filter(F.col("_pr") <= F.lit(float(keep_frac))).drop("_pr")


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney — the smoothing KenLM uses, i.e. what the actual
# CCNet pipeline (Wenzek et al. 2020) scores with. Kept separate from the
# add-k path above because its count bookkeeping is different in kind:
# lower orders use CONTINUATION counts (distinct left extensions), not raw
# occurrence counts.
# ---------------------------------------------------------------------------


def _stream_kgrams(text_col: str, n: int, k: int, unit: str) -> Column:
    """All ``k``-grams of the ONE (n-1)-BOS-padded stream.

    KN needs every order counted over the *same* padded token stream
    (so a lower-order gram's left extensions are well-defined even at
    document start); this differs from ``char_ngrams_expr(text, k)``,
    which pads with ``k-1`` BOS for a standalone order-k model.
    """
    col = F.col(text_col)
    if unit == "char":
        padded = F.concat(F.lit(BOS * (n - 1)), _normalize(col), F.lit(EOS))
        return F.transform(
            F.sequence(F.lit(1), F.length(padded) - F.lit(k - 1)),
            lambda i: F.substring(padded, i, k),
        )
    norm = _normalize(col)
    toks = F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
        F.array().cast("array<string>")
    )
    padded = F.concat(
        F.array(*[F.lit(BOS) for _ in range(n - 1)]), toks, F.array(F.lit(EOS))
    )
    return F.transform(
        F.sequence(F.lit(1), F.size(padded) - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(padded, i, k), " "),
    )


def _gram_suffix(gram: Column, k: int, j: int, unit: str) -> Column:
    """Last ``j`` tokens of a ``k``-token gram."""
    if unit == "char":
        return F.substring(gram, k - j + 1, j)
    return F.array_join(F.slice(F.split(gram, " "), k - j + 1, j), " ")


def _gram_prefix(gram: Column, j: int, unit: str) -> Column:
    """First ``j`` tokens of a gram."""
    if unit == "char":
        return F.substring(gram, 1, j)
    return F.array_join(F.slice(F.split(gram, " "), 1, j), " ")


def train_kn_lm(
    docs: DataFrame,
    *,
    n: int = 3,
    unit: str = "char",
    text_col: str = "text",
) -> DataFrame:
    """Train the count tables for an interpolated Kneser-Ney n-gram LM.

    Returns ``(order, gram, cnt)`` — RAW occurrence counts of every
    k-gram for ``k = 2..n`` over the shared (n-1)-BOS-padded stream.
    The KN-specific quantities (continuation counts, context totals,
    count-of-count discounts) all derive from this table inside
    :func:`score_kn_lm` with model-sized aggregations — never a second
    corpus pass.

    Storing raw counts keeps the model **shard-mergeable** (train per
    corpus shard, ``groupBy(order, gram).sum(cnt)`` to combine) even
    though adjusted counts themselves are distinct-based and would not
    merge: the distincts are re-derived from the merged raw table.

    ONE corpus pass, ONE shuffle: a nested ``transform`` HOF emits
    (order, gram) pairs for all orders of a document in a single
    projection (JVM, codegen), then one groupBy counts them. Shuffle
    volume is bounded by the per-partition distinct gram count
    (map-side combine), not corpus size.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2 for a conditional model: {n}")
    def _tag(k: int):
        # single-parameter lambda: a two-parameter one would be bound
        # by Spark as transform's (element, index) form and the index
        # would silently overwrite the order tag
        return lambda g: F.struct(F.lit(k).alias("order"), g.alias("gram"))

    per_order = [
        F.transform(_stream_kgrams(text_col, n, k, unit), _tag(k))
        for k in range(2, n + 1)
    ]
    docs = spread_scan(docs.select(text_col))
    grams = docs.select(
        F.explode(F.concat(*per_order) if len(per_order) > 1 else per_order[0]).alias(
            "_og"
        )
    )
    return (
        grams.select(F.col("_og.order").alias("order"), F.col("_og.gram").alias("gram"))
        .groupBy("order", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _kn_used_tables(model: DataFrame, n: int, unit: str) -> dict[int, DataFrame]:
    """Per-order (gram, cnt) tables the KN formula actually uses:
    raw counts at the highest order, continuation counts (distinct
    left-extension counts, derived from the raw order-(k+1) table)
    below. All model-sized aggregations."""
    raw = {}
    for k in range(2, n + 1):
        tbl = model.filter(F.col("order") == k).select("gram", "cnt")
        # guard against a model trained with a different n/unit: a row
        # whose gram length disagrees with its order tag is dropped
        if unit == "char":
            tbl = tbl.filter(F.length("gram") == k)
        else:
            tbl = tbl.filter(F.size(F.split("gram", " ")) == k)
        raw[k] = tbl
    used = {n: raw[n]}
    for k in range(1, n):
        used[k] = (
            raw[k + 1]
            .select(_gram_suffix(F.col("gram"), k + 1, k, unit).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    return used


def score_kn_lm(
    docs: DataFrame,
    model: DataFrame,
    *,
    n: int = 3,
    unit: str = "char",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser-Ney per-document perplexity.

    Returns ``(id_col, n_grams, logprob_per_token, perplexity)`` with
    the same shape as :func:`score_ngram_lm` so the two smoothers are
    drop-in comparable.

    Model (Chen & Goodman 1998, interpolated form; single discount per
    order estimated as ``d_k = n1/(n1 + 2·n2)`` from the order's
    count-of-counts, the Ney-Essen-Kneser estimate, floored to 0.5
    when the order has no singletons/doubletons):

    * order k ≥ 2, context seen::

          p_k = (max(c_k − d_k, 0) + d_k · types_k(ctx) · p_{k−1}) / tot_k(ctx)

      where for the highest order ``c`` is the raw count and below it
      the continuation count N1+(·, gram); ``types_k(ctx)`` /
      ``tot_k(ctx)`` are the distinct-extension count / count total of
      the context in the same table (so each level normalizes exactly
      over the seen vocabulary). Context unseen ⇒ p_k = p_{k−1}.
    * unigram: ``p_1 = (max(c_1 − d_1, 0) + d_1) / tot_1`` — the
      ``d_1·V·(1/V)`` uniform-interpolation term collapses to ``d_1``,
      and an unseen token scores ``d_1 / tot_1``.

    Plan shape: documents pre-aggregate to (id, ngram, occ); every
    lookup table is model-sized (AQE broadcasts them), joined once per
    order on the gram suffix; one groupBy(id) of scalar sums ends the
    plan. Documents' text never shuffles.
    """
    used = _kn_used_tables(model, n, unit)

    # --- per-order scalar discounts (count-of-counts; tiny aggs) -----
    disc_cols = []
    for k in range(1, n + 1):
        disc_cols.append(
            used[k]
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("cnt") == 1, 1)), F.lit(0)
                ).alias("_n1"),
                F.coalesce(
                    F.sum(F.when(F.col("cnt") == 2, 1)), F.lit(0)
                ).alias("_n2"),
            )
            .select(
                # Fallback whenever n1 == 0, not just when n1 + 2·n2 == 0:
                # with no singletons but some doubletons the ratio is 0, a
                # zero discount gives unseen tokens p = 0, and F.log(0) is
                # NULL in Spark — silently dropped from the perplexity sum
                # while the DuckDB oracle's ln(0) errors (ADVICE r6).
                F.when(
                    F.col("_n1") > 0,
                    F.col("_n1") / (F.col("_n1") + 2 * F.col("_n2")),
                )
                .otherwise(F.lit(0.5))
                .alias(f"d_{k}")
            )
        )
    uni = used[1].agg(F.sum("cnt").alias("tot_1"))
    scalars = uni
    for dc in disc_cols:
        scalars = scalars.crossJoin(dc)

    # --- context aggregates per order ≥ 2 ----------------------------
    ctxagg = {
        k: (
            used[k]
            .groupBy(_gram_prefix(F.col("gram"), k - 1, unit).alias(f"ctx_{k}"))
            .agg(
                F.sum("cnt").alias(f"tot_{k}"),
                F.count(F.lit(1)).alias(f"types_{k}"),
            )
        )
        for k in range(2, n + 1)
    }

    occ = (
        spread_scan(docs.select(id_col, text_col))
        .select(
            F.col(id_col), F.explode(_stream_kgrams(text_col, n, n, unit)).alias("ngram")
        )
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    joined = occ
    for k in range(1, n + 1):
        joined = joined.join(
            used[k].select(
                F.col("gram").alias(f"_g_{k}"), F.col("cnt").alias(f"cnt_{k}")
            ),
            _gram_suffix(F.col("ngram"), n, k, unit) == F.col(f"_g_{k}"),
            "left",
        ).drop(f"_g_{k}")
    for k in range(2, n + 1):
        joined = joined.join(
            ctxagg[k],
            _gram_prefix(_gram_suffix(F.col("ngram"), n, k, unit), k - 1, unit)
            == F.col(f"ctx_{k}"),
            "left",
        ).drop(f"ctx_{k}")
    joined = joined.crossJoin(F.broadcast(scalars))

    p = (
        F.greatest(F.coalesce(F.col("cnt_1"), F.lit(0)) - F.col("d_1"), F.lit(0.0))
        + F.col("d_1")
    ) / F.col("tot_1")
    for k in range(2, n + 1):
        p = F.when(
            F.col(f"tot_{k}").isNotNull(),
            (
                F.greatest(
                    F.coalesce(F.col(f"cnt_{k}"), F.lit(0)) - F.col(f"d_{k}"),
                    F.lit(0.0),
                )
                + F.col(f"d_{k}") * F.col(f"types_{k}") * p
            )
            / F.col(f"tot_{k}"),
        ).otherwise(p)

    scored = joined.groupBy(id_col).agg(
        F.sum("occ").alias("n_grams"),
        (F.sum(F.col("occ") * F.log(p)) / F.sum("occ")).alias("logprob_per_token"),
    )
    return scored.withColumn("perplexity", F.exp(-F.col("logprob_per_token")))
