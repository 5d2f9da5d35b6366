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
from temporal_retriever_spark.spread import spread_scan

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
    df = spread_scan(df)
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
    # Pin the gate ABOVE the spread exchange (r10). PushDownPredicate
    # substitutes the metric aliases and pushes the whole gate below the
    # round-robin repartition onto the raw scan — which is exactly the
    # under-partitioned input the spread exists to fix, so the heavy
    # language/quality trees ran on 1-2 cores (measured 42.1 s → 7.5 s
    # at sf1 for the identical 37,790-row result). Wrapping the
    # condition in a single WHEN with a nondeterministic (always-true)
    # guard makes it non-pushable AND non-splittable (a bare
    # nondeterministic conjunct would be split off and the deterministic
    # part pushed anyway). At cluster partition counts the spread is a
    # structural no-op, the filter already sits in the scan stage, and
    # these expressions can never push as parquet data filters — so the
    # guard costs nothing there.
    gate = F.when(F.monotonically_increasing_id() >= 0, cond).otherwise(
        F.lit(False)
    )
    filtered = enriched.filter(gate)

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


def sample_hash_expr(id_col: str = "doc_id", *, salt: str = "") -> "F.Column":
    """Deterministic uniform-[0,1) draw per document id.

    First 8 hex digits of ``md5(salt || id)`` scaled by 2^-32 — the
    engine-portable "hash the id, not rand()" sampling idiom: the same
    document always draws the same number on any engine that has md5
    (Spark, DuckDB, Trino, …), so samples are reproducible, stable
    under re-partitioning, and disjoint salts give independent draws.
    ``rand()`` can't provide any of that (per-task seeding ties the
    draw to the physical partition layout).
    """
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
    return bucket / F.lit(float(2**32))


def sample_corpus(
    df: DataFrame,
    *,
    fraction: float | None = None,
    fractions: dict[str, float] | None = None,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic hash-based corpus sampling.

    * ``fraction`` — uniform: keep ids whose draw < fraction.
    * ``fractions`` + ``strata_col`` — stratified: per-stratum keep
      rates (strata absent from the dict are dropped), e.g. rebalance
      languages or sources in a training mix.

    The predicate is a pure native expression on the scan — no
    shuffle, no state, trivially pushed past column pruning; at 100 TB
    sampling is free. Reproducible: re-running on a grown corpus keeps
    every previously kept id (append-only stability), which matters
    for incremental training-data builds.
    """
    u = sample_hash_expr(id_col, salt=salt)
    if fraction is not None:
        if not 0.0 <= fraction <= 1.0:
            raise ValueError(f"fraction must be in [0, 1]: {fraction}")
        return df.filter(u < F.lit(float(fraction)))
    if fractions is None or strata_col is None:
        raise ValueError("pass either fraction= or (fractions= and strata_col=)")
    expr = None
    for stratum, f_ in fractions.items():
        cond, val = F.col(strata_col) == stratum, F.lit(float(f_))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    if expr is None:
        raise ValueError("fractions must be non-empty")
    # when-chain with no otherwise: unmatched strata get null rate ->
    # u < null is null -> row filtered out
    return df.filter(u < expr)


def corpus_sketch_stats(
    df: DataFrame,
    *,
    group_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    rsd: float = 0.02,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based corpus statistics: the one-pass profile a 100-TB
    corpus run starts with.

    Per group (or globally): document count, HyperLogLog++ approximate
    distinct documents (``approx_count_distinct`` at relative sd
    ``rsd``), and Greenwald-Khanna approximate length quantiles
    (``percentile_approx`` at ``accuracy``). Exact distinct/quantiles
    need a full shuffle of ids / a sort per group; the sketches are
    mergeable map-side partials — constant memory, one shuffle of
    sketch buffers only, which is the entire point at scale.

    Output schema: group, n_docs, approx_distinct_docs,
    len_p50/len_p90/len_p99 (per ``quantiles``).
    """
    keys = [group_col] if group_col else []
    length = F.length(F.col(text_col))
    qarr = F.percentile_approx(
        length, F.array(*[F.lit(float(q)) for q in quantiles]), F.lit(accuracy)
    )
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct(id_col, rsd).alias("approx_distinct_docs"),
        qarr.alias("_q"),
    )
    return agg.select(
        *keys,
        "n_docs",
        "approx_distinct_docs",
        *[
            F.col("_q")[i].alias(f"len_p{int(q * 100)}")
            for i, q in enumerate(quantiles)
        ],
    )


def sample_k_per_group(
    df: DataFrame,
    k: int,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    keep_rank: bool = False,
) -> DataFrame:
    """Exactly min(k, |group|) documents per group, deterministically.

    The distributed equivalent of per-stratum reservoir sampling:
    rank documents inside each group by the same md5 draw as
    ``sample_hash_expr`` (uniform, id-keyed, engine-portable) and keep
    the top ``k``. Unlike ``sample_corpus(fractions=)`` this yields an
    exact per-group count — the knob a training-mix builder needs when
    the recipe says "50k docs per language", not "0.1% of each".

    Scale shape: one hash-partition shuffle on ``group_col``; Spark
    compiles the rank filter to WindowGroupLimit, so every map task
    pre-trims to its local top-k before the exchange and the shuffle
    carries at most k rows per group per partition — the same plan
    shape as ``cosine_topk``. Deterministic ties (draw, then id) make
    the result reproducible and append-only stable for ids already in
    the top k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_hash_expr(id_col, salt=salt).asc(), F.col(id_col).asc()
    )
    out = df.withColumn("_sample_rank", F.row_number().over(w)).filter(
        F.col("_sample_rank") <= k
    )
    if keep_rank:
        return out.withColumnRenamed("_sample_rank", "sample_rank")
    return out.drop("_sample_rank")


def train_test_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic hash-range train/val/test assignment.

    ``weights`` maps split name -> fraction (must sum to ~1). Each
    document's uniform md5 draw lands in one cumulative range:
    ``{"train": .9, "val": .05, "test": .05}`` sends draws in
    [0, .9) to train, [.9, .95) to val, [.95, 1) to test. Pure
    native expression on the scan — zero shuffle, reproducible on any
    engine with md5, stable under corpus growth (a doc never changes
    split when new docs arrive — the property that prevents silent
    train/test leakage across pipeline re-runs).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = sample_hash_expr(id_col, salt=salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, frac in items[:-1]:
        acc += float(frac)
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def quality_prune(
    df: DataFrame,
    *,
    keep_frac: float = 0.5,
    group_col: str | None = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str | None = None,
    out_score_col: str = "quality_score",
) -> DataFrame:
    """Keep the top ``keep_frac`` of documents by quality score,
    per group (default: per source) — percentile pruning, the
    relative-quality gate that complements ``prepare_corpus``'s
    absolute thresholds: "keep the best 30% of every source" instead
    of "keep everything above 0.5", so a noisy source can't flood the
    mix and a clean one isn't over-trimmed.

    Score defaults to the native ``quality_exprs`` heuristic over
    ``text_col``; pass ``score_col`` to rank on a precomputed column.
    Exactly ceil(keep_frac·n) docs survive per group, ties broken by
    (score desc, id asc) — deterministic and engine-portable.

    Scale shape: one hash-partition window shuffle on the group key
    (scores are computed in the scan projection); the rank filter is
    the same top-k window family as ``sample_k_per_group``. Keyless
    (global) mode single-partitions the sort and warns — per-group is
    the scale path.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac}")
    from temporal_retriever_spark.llm.text import quality_exprs

    score = F.col(score_col) if score_col else quality_exprs(text_col)["quality_score"]
    scored = df.withColumn(out_score_col, score)
    if group_col is None:
        from temporal_retriever_spark.rolling import warn_keyless

        warn_keyless("quality_prune")
        part: list[str] = []
    else:
        part = [group_col]
    from pyspark.sql import Window

    w = Window.partitionBy(*part)
    wo = w.orderBy(F.col(out_score_col).desc(), F.col(id_col).asc())
    return (
        scored.withColumn("_qp_rn", F.row_number().over(wo))
        .withColumn("_qp_n", F.count(id_col).over(w))
        .filter(
            F.col("_qp_rn")
            <= F.ceil(F.col("_qp_n").cast("double") * F.lit(float(keep_frac)))
        )
        .drop("_qp_rn", "_qp_n")
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    *,
    total_tokens: int | None = None,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Plan a training-data mixture: given target per-group token
    shares (``weights``, summing to 1), compute the per-group sampling
    fraction that realizes the mix — the "50% web, 30% code, 20%
    books" step of every pre-training recipe.

    With ``total_tokens=None`` the plan uses the LARGEST feasible
    budget: B = min over groups of available_g / weight_g, i.e. the
    scarcest group is taken whole and the plentiful ones are sampled
    down. An explicit smaller budget scales every group
    proportionally. Groups absent from ``weights`` are excluded.

    Output (one row per planned group): group, available_tokens,
    target_weight, budget_tokens (B·w, capped at available), fraction
    (budget/available, ≤ 1). Fully distributed: one aggregation for
    availability, one scalar min for the budget — no collect.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive (omit a group to exclude it)")
    from temporal_retriever_spark.llm.text import token_count_expr

    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    avail = (
        df.filter(F.col(group_col).isin(*weights))
        .groupBy(group_col)
        .agg(F.sum(token_count_expr(F.col(text_col))).alias("available_tokens"))
        .withColumn("target_weight", wmap[F.col(group_col)])
    )
    # a weighted group with zero rows would be silently omitted and the
    # feasibility min computed over the rest — the plan would NOT
    # realize the requested mix; fail loudly instead (tiny action:
    # |weights| rows at most)
    present = {r[0] for r in avail.select(group_col).collect()}
    missing = sorted(set(weights) - present)
    if missing:
        raise ValueError(
            f"weighted group(s) with no rows in the corpus: {missing}; "
            f"remove them from weights or fix the group values"
        )
    feasible = avail.agg(
        F.min(F.col("available_tokens") / F.col("target_weight")).alias("_b")
    )
    if total_tokens is not None:
        feasible = feasible.select(
            F.least(F.col("_b"), F.lit(float(total_tokens))).alias("_b")
        )
    plan = avail.crossJoin(F.broadcast(feasible))
    budget = F.least(
        F.col("_b") * F.col("target_weight"), F.col("available_tokens").cast("double")
    )
    return plan.select(
        group_col,
        "available_tokens",
        "target_weight",
        budget.alias("budget_tokens"),
        F.try_divide(budget, F.col("available_tokens").cast("double")).alias(
            "fraction"
        ),
    )


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Apply a ``mixture_plan``: keep each group's documents whose
    deterministic md5 draw falls under the group's fraction — the
    same engine-portable, append-only-stable sampling as
    ``sample_corpus``, with per-group rates coming from the plan.
    Document-level hash sampling realizes the token shares in
    expectation (exact-token packing is a knapsack; the standard
    practice is doc-level rates). The plan broadcasts; the predicate
    rides the scan — zero extra shuffles.
    """
    u = sample_hash_expr(id_col, salt=salt)
    rates = plan.select(group_col, "fraction")
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(u < F.col("fraction"))
        .drop("fraction")
    )


def gini_concentration(
    df: DataFrame,
    group_col: str,
    *,
    weight_col: str | None = None,
    label: str | None = None,
) -> DataFrame:
    """Gini coefficient of corpus mass concentration across groups.

    "Is the corpus dominated by a handful of domains/sources?" as one
    number: G = 0 (uniform) .. →1 (one group owns everything), via
    the sorted-share identity ``G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n``
    over the per-group masses x (doc counts, or ``weight_col`` sums
    — e.g. token counts). The window runs over the GROUP table (one
    row per domain/source), never the corpus, so this is
    group-cardinality-sized after one counting shuffle.

    Ties break by group name for a deterministic rank on any engine.
    Output: ``dimension`` (the label, default the column name),
    ``n_groups, total, gini`` — a one-row report per call; union
    calls for a multi-dimension view.
    """
    from pyspark.sql import Window

    mass = (
        F.sum(weight_col) if weight_col is not None else F.count("*")
    ).cast("double")
    per_group = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(mass.alias("_x"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("_x").asc(), F.col(group_col).asc()
    )
    ranked = per_group.withColumn("_i", F.row_number().over(w))
    out = ranked.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("_x").alias("total"),
        (
            2.0 * F.sum(F.col("_i") * F.col("_x"))
            / (F.count("*") * F.sum("_x"))
            - (F.count("*") + 1.0) / F.count("*")
        ).alias("gini"),
    )
    return out.select(
        F.lit(label or group_col).alias("dimension"),
        "n_groups",
        "total",
        "gini",
    )
