"""Funnel (conversion) analysis over event streams.

The events-table OLAP classic: how many users progressed through the
ordered steps click → view → purchase, how far did each get, and how
long did conversion take? (The operator family behind ClickHouse's
``windowFunnel`` and SQL MATCH_RECOGNIZE-style sequence queries —
semantics here are the standard greedy-earliest walk, fully
documented and oracle-mirrorable.)

Semantics (greedy from the earliest anchor): t₁ is the user's
earliest step-1 event; tᵢ is the earliest step-i event strictly after
tᵢ₋₁; all steps must land within ``within`` of t₁ (None = unbounded).
Greedy-earliest is deterministic and mirrors as cascaded ``min``
subqueries in SQL.

Spark-first shape: ONE groupBy(user) exchange; the sequence walk is a
pure JVM ``aggregate`` HOF fold over each user's sorted (ts, step)
array — no Python, no per-step self-joins (a k-step funnel as k
self-joins would shuffle the events table k times; this shuffles it
once). Per-user event counts bound the fold (the same per-key-bounded
contract as ``asof.sessionize``).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "attribution",
    "funnel",
    "funnel_summary",
    "cohort_retention",
    "path_ngrams",
    "sequential_patterns",
    "transition_matrix",
    "markov_stationary",
    "markov_absorption",
]


def funnel(
    df: DataFrame,
    steps: Iterable[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Per-user funnel progress: (user, steps_completed, t_1..t_k,
    seconds_to_convert).

    ``within`` is an INTERVAL string (e.g. ``"1 day"``) bounding the
    whole funnel relative to t₁. Events not matching any step are
    ignored. Ties (same timestamp as the previous step) do NOT
    advance — steps are strictly ordered in time, so a single event
    can never satisfy two steps.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps: {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct: {steps}")
    k = len(steps)
    ev = df.filter(F.col(step_col).isin(steps)).select(
        F.col(user_col),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(step_col).alias("_step"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct("_ts", "_step"))).alias("_evs")
    )
    # fold state: array of k filled timestamps (nulls while unreached)
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def step_fold(acc, e):
        # next unfilled index = count of non-null entries
        filled = F.size(F.filter(acc, lambda t: t.isNotNull()))
        out = acc
        for i, name in enumerate(steps):
            want = (
                (filled == i)
                & (e["_step"] == name)
                & (
                    (e["_ts"] > F.element_at(acc, i))  # strictly after prev
                    if i > 0
                    else F.lit(True)
                )
            )
            if within is not None and i > 0:
                want = want & (
                    e["_ts"]
                    <= F.element_at(acc, 1) + F.expr(f"INTERVAL {within}")
                )
            out = F.when(
                want,
                F.concat(
                    F.slice(acc, 1, i),
                    F.array(e["_ts"]),
                    F.slice(acc, i + 2, k - i - 1) if i < k - 1 else F.array().cast("array<timestamp>"),
                ),
            ).otherwise(out)
        return out

    walked = per_user.select(
        user_col,
        F.aggregate("_evs", init, step_fold).alias("_t"),
    )
    t_cols = [
        F.element_at("_t", i + 1).alias(f"t_{i + 1}") for i in range(k)
    ]
    reached = F.size(F.filter(F.col("_t"), lambda t: t.isNotNull()))
    convert_sec = F.when(
        F.element_at("_t", k).isNotNull(),
        F.unix_timestamp(F.element_at("_t", k))
        - F.unix_timestamp(F.element_at("_t", 1)),
    )
    return walked.select(
        user_col,
        reached.alias("steps_completed"),
        *t_cols,
        convert_sec.alias("seconds_to_convert"),
    )


def funnel_summary(
    df: DataFrame,
    steps: Iterable[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Step-level conversion table: (step, step_name, n_users,
    conversion_rate) — n_users who completed ≥ step, rate relative to
    step 1. One extra tiny aggregation over :func:`funnel`."""
    steps = list(steps)
    per_user = funnel(
        df, steps, user_col=user_col, ts_col=ts_col, step_col=step_col,
        within=within,
    )
    counts = (
        # sequence(1, 0) would yield [1, 0] (Spark's default -1 step),
        # silently counting zero-step users as step-1 completers —
        # filter them out before the explode
        per_user.filter(F.col("steps_completed") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.col("steps_completed"))
            ).alias("step")
        )
        .groupBy("step")
        .agg(F.count("*").alias("n_users"))
    )
    names = per_user.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    base = counts.filter(F.col("step") == 1).select(
        F.col("n_users").alias("_base")
    )
    return (
        names.join(counts, on="step", how="left")
        .withColumn("n_users", F.coalesce("n_users", F.lit(0)))
        .crossJoin(F.broadcast(base))
        .select(
            "step",
            "step_name",
            "n_users",
            F.try_divide(F.col("n_users"), F.col("_base")).alias(
                "conversion_rate"
            ),
        )
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "W",
    max_periods: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: (cohort, period, n_active, n_cohort,
    retention) — users grouped by their FIRST activity bucket, counted
    in each later bucket they return.

    The other events-table OLAP classic next to :func:`funnel`.
    ``period`` is the bucket offset from the cohort bucket (0 = the
    signup bucket itself, retention ≡ 1.0 there); ``grain`` is any
    engine grain (D/W/M/H/min).

    Plan: first-activity per user is one min-aggregation; activity
    buckets deduplicate per (user, bucket); ONE join back on user (the
    cohort table is user-sized — at 100 TB both sides are already
    user-keyed so AQE plans a co-partitioned join) + one final
    (cohort, period) aggregation. Period arithmetic is native
    datediff/months_between — no calendars in Python.
    """
    from temporal_retriever_spark.grains import bucket_expr, normalize_grain

    g = normalize_grain(grain)
    b = bucket_expr(ts_col, g)
    active = df.select(F.col(user_col), b.alias("_b")).dropDuplicates()
    cohort = active.groupBy(user_col).agg(F.min("_b").alias("_cohort"))
    if g == "M":
        period = F.round(
            F.months_between(F.col("_b"), F.col("_cohort"))
        ).cast("int")
    elif g in ("D", "W"):
        days = 7 if g == "W" else 1
        period = (
            F.datediff(F.col("_b"), F.col("_cohort")) / F.lit(days)
        ).cast("int")
    else:  # clock grains: exact second arithmetic
        secs = {"H": 3600, "min": 60}[g]
        period = (
            (
                F.unix_timestamp("_b") - F.unix_timestamp("_cohort")
            )
            / F.lit(secs)
        ).cast("int")
    joined = active.join(cohort, on=user_col).select(
        F.col("_cohort").alias("cohort"), period.alias("period")
    )
    if max_periods is not None:
        joined = joined.filter(F.col("period") <= max_periods)
    sizes = cohort.groupBy(F.col("_cohort").alias("cohort")).agg(
        F.count("*").alias("n_cohort")
    )
    return (
        joined.groupBy("cohort", "period")
        .agg(F.count("*").alias("n_active"))
        .join(sizes, on="cohort")
        .select(
            "cohort",
            "period",
            "n_active",
            "n_cohort",
            F.try_divide(F.col("n_active"), F.col("n_cohort")).alias(
                "retention"
            ),
        )
    )


def transition_matrix(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    normalize: bool = True,
) -> DataFrame:
    """First-order Markov transitions over each user's event timeline:
    (from_step, to_step, n, p) where p is the row-normalized
    transition probability. The path-analysis companion to
    :func:`funnel` (which checks ONE ordered pattern; this summarizes
    ALL observed consecutive behavior).

    One (user, time-order) window pass forms consecutive pairs
    (deterministic tie order: ts then step), one aggregation counts
    them; normalization is a window over the tiny (from, to) count
    table. Identical lag semantics mirror in SQL.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "to_step")
    pairs = (
        df.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(step_col).alias("to_step"),
        )
        .withColumn("from_step", F.lag("to_step").over(w))
        .filter(F.col("from_step").isNotNull())
        .groupBy("from_step", "to_step")
        .agg(F.count("*").alias("n"))
    )
    if not normalize:
        return pairs
    wtot = Window.partitionBy("from_step")
    return pairs.select(
        "from_step",
        "to_step",
        "n",
        (F.col("n") / F.sum("n").over(wtot)).alias("p"),
    )


def attribution(
    events: DataFrame,
    *,
    conversion: str,
    channel_col: str,
    model: str = "last_touch",
    lookback_seconds: float = 7 * 86400,
    halflife_seconds: float = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Multi-touch conversion attribution — the marketing-analytics
    classic: each conversion distributes one unit of credit over the
    user's touch events inside the lookback window, per ``model``:

    * ``last_touch``  — all credit to the latest prior touch
    * ``first_touch`` — all credit to the earliest touch in window
    * ``linear``      — equal credit to every touch in window
    * ``time_decay``  — credit ∝ 2^(−age/halflife), normalized per
      conversion (recent touches weigh more; the standard
      exponential-decay model)

    Semantics: a touch is any event whose channel (``channel_col``)
    differs from the conversion event type; eligible touches happen
    STRICTLY BEFORE the conversion and within ``lookback_seconds`` of
    it. Conversions with no eligible touch earn a ``(direct)`` row —
    credit is conserved: Σ credit = conversion count, every model.
    Ties at the same timestamp split deterministically by the
    window-rank tie order (channel ascending).

    Plan: conversions ⋈ touches per user with the time-range
    predicate — ONE user-keyed shuffle join (state bounded by the
    lookback window, the batch twin of the streaming interval join);
    per-conversion normalization is one window over the joined pairs;
    final credit is one aggregation per channel. No Python anywhere.

    Output: (channel, conversions_touched, credit) where ``credit``
    sums to the total conversion count across rows.
    """
    models = ("last_touch", "first_touch", "linear", "time_decay")
    if model not in models:
        raise ValueError(f"model must be one of {models}: {model!r}")
    if lookback_seconds <= 0:
        raise ValueError(f"lookback_seconds must be > 0: {lookback_seconds}")
    if halflife_seconds <= 0:
        raise ValueError(f"halflife_seconds must be > 0: {halflife_seconds}")
    ch = F.col(channel_col)
    conv = (
        events.filter(ch == conversion)
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_cts"),
        )
        # multiple conversions at one instant collapse to one credit
        # unit (deterministic; re-running the join can't double-count).
        # Materialized: conv feeds the pair join AND the direct
        # anti-join — conversion-count-sized, one source scan
        .distinct()
        .localCheckpoint(eager=True)
    )
    touch = events.filter(ch != conversion).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_tts"),
        ch.alias("_ch"),
    )
    # full-precision epoch seconds (unix_timestamp would truncate
    # sub-second parts and skew the decay weights)
    age = F.col("_cts").cast("double") - F.col("_tts").cast("double")
    # pairs feed the credit window AND the direct anti-join: bound by
    # conversions × in-window touches, far under the raw event table —
    # materialize so the user-keyed join runs once
    pairs = conv.join(touch, on="_u").filter(
        (age > 0) & (age <= F.lit(float(lookback_seconds)))
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("_u", "_cts")
    rank_last = w.orderBy(F.col("_tts").desc(), F.col("_ch").asc())
    rank_first = w.orderBy(F.col("_tts").asc(), F.col("_ch").asc())
    if model == "last_touch":
        credit = F.when(F.row_number().over(rank_last) == 1, F.lit(1.0))
    elif model == "first_touch":
        credit = F.when(F.row_number().over(rank_first) == 1, F.lit(1.0))
    elif model == "linear":
        credit = F.lit(1.0) / F.count("_tts").over(w)
    else:  # time_decay
        wgt = F.pow(
            F.lit(2.0),
            -age.cast("double") / F.lit(float(halflife_seconds)),
        )
        credit = wgt / F.sum(wgt).over(w)
    scored = pairs.select(
        F.col("_ch").alias("channel"),
        F.col("_cts"),
        F.col("_u"),
        credit.alias("_credit"),
    ).filter(F.col("_credit").isNotNull())
    # conversions whose window held NO touch (including users with
    # touches only outside the lookback) earn the (direct) row —
    # credit is conserved exactly
    direct = conv.join(
        pairs.select("_u", "_cts").distinct(), on=["_u", "_cts"], how="left_anti"
    ).select(
        F.lit("(direct)").alias("channel"),
        F.col("_cts"),
        F.col("_u"),
        F.lit(1.0).alias("_credit"),
    )
    return scored.unionByName(direct).groupBy("channel").agg(
        F.count_distinct("_u", "_cts").cast("long").alias("conversions_touched"),
        F.sum("_credit").alias("credit"),
    )


def path_ngrams(
    events: DataFrame,
    *,
    n: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    sep: str = ">",
) -> DataFrame:
    """Frequent user-journey n-grams: the top event SEQUENCES users
    actually walk (the path-analysis companion to `transition_matrix`
    — Markov pairs say where users go NEXT, n-grams say which whole
    corridors are busy).

    Each position in a user's time-ordered event stream emits the
    n-gram ending there (windows of consecutive events; streams
    shorter than n emit nothing). Ties at identical timestamps order
    by event name — deterministic under any partition layout.

    Plan: ONE user-keyed window pass builds the n−1 lag columns (no
    per-user collect, no quadratic self-join), then one aggregation
    per distinct path — output is path-vocabulary-sized. Scale note:
    per-user state is the window frame (n−1 rows), so a mega-user
    cannot skew memory the way a collect_list sessionizer would.

    Output: (path, occurrences, users) — ``users`` = distinct users
    who walked the path at least once.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2: {n}")
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(event_col).asc()
    )
    ev = F.col(event_col).cast("string")
    d = events.filter(ev.isNotNull()).select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"), ev.alias("_e")
    )
    w = Window.partitionBy("_u").orderBy(F.col("_ts").asc(), F.col("_e").asc())
    cols = [F.lag("_e", n - 1 - i).over(w) for i in range(n - 1)] + [F.col("_e")]
    d = d.withColumn("_path", F.concat_ws(sep, *cols)).withColumn(
        "_full", cols[0].isNotNull()
    )
    return (
        d.filter(F.col("_full"))
        .groupBy(F.col("_path").alias("path"))
        .agg(
            F.count("*").cast("long").alias("occurrences"),
            F.count_distinct("_u").cast("long").alias("users"),
        )
    )


def sequential_patterns(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    max_len: int = 3,
    min_support: float = 0.0,
    max_items: int = 50,
    sep: str = ">",
) -> DataFrame:
    """GSP/PrefixSpan-style sequential pattern mining, lengths 1-3.

    A user *supports* the pattern a{sep}b{sep}c when their stream
    contains events of those types at STRICTLY increasing timestamps
    t1 < t2 < t3 — the subsequence need not be contiguous (contrast
    ``path_ngrams``, which counts contiguous runs). Support is the
    number of distinct supporting users (Agrawal & Srikant 1995's
    definition).

    The existence test is exact via the greedy reduction: a<b<c exists
    iff some b-event falls strictly between the user's EARLIEST a and
    LATEST c — so the whole mine runs on the (user, item, min_ts,
    max_ts) profile table, never on raw event pairs:

    * profile = ONE groupBy(user, item) pass (≤ users × vocabulary
      rows).
    * length 2 = profile self-join per user: vocabulary²-bounded row
      amplification, shuffled once on user.
    * length 3 = the (a, c) grid joined back to the events of the
      middle item — amplification ≤ vocabulary² per event, pruned by
      the a.min_ts < ts < c.max_ts range and the ``max_items``
      frequent-item cap (top items by user support; at 100 TB mine a
      capped vocabulary, which is also what makes results readable).
    * ``min_support`` (fraction of all users) filters with
      ``count >= ceil(min_support · n_users − 1e-9)`` — the
      epsilon-guarded form both engines compute identically.

    Output: (pattern, length, support_count, support_frac), one row
    per surviving pattern.
    """
    if not 1 <= max_len <= 3:
        raise ValueError(f"max_len must be 1, 2 or 3, got {max_len}")
    if max_items < 1:
        raise ValueError(f"max_items must be >= 1, got {max_items}")
    u, it, ts = F.col(user_col), F.col(item_col).cast("string"), F.col(ts_col)
    base = events.filter(u.isNotNull() & it.isNotNull()).select(
        u.alias("_u"), it.alias("_i"), ts.alias("_ts")
    )
    profile = base.groupBy("_u", "_i").agg(
        F.min("_ts").alias("_mn"), F.max("_ts").alias("_mx")
    )
    freq = (
        profile.groupBy("_i")
        .agg(F.count(F.lit(1)).cast("long").alias("_users"))
        .orderBy(F.desc("_users"), F.asc("_i"))
        .limit(max_items)
    )
    profile = profile.join(F.broadcast(freq.select("_i")), "_i")
    totals = base.select(
        F.count_distinct("_u").cast("double").alias("_n")
    )
    levels = [
        profile.groupBy("_i")
        .agg(F.count(F.lit(1)).cast("long").alias("support_count"))
        .select(
            F.col("_i").alias("pattern"),
            F.lit(1).alias("length"),
            "support_count",
        )
    ]
    if max_len >= 2:
        a = profile.select(
            F.col("_u"), F.col("_i").alias("_ai"), F.col("_mn").alias("_amn")
        )
        b = profile.select(
            F.col("_u"), F.col("_i").alias("_bi"), F.col("_mx").alias("_bmx")
        )
        levels.append(
            a.join(b, "_u")
            .filter(F.col("_amn") < F.col("_bmx"))
            .groupBy("_ai", "_bi")
            .agg(F.count(F.lit(1)).cast("long").alias("support_count"))
            .select(
                F.concat_ws(sep, "_ai", "_bi").alias("pattern"),
                F.lit(2).alias("length"),
                "support_count",
            )
        )
    if max_len >= 3:
        grid = (
            profile.select(
                F.col("_u"), F.col("_i").alias("_ai"), F.col("_mn").alias("_amn")
            )
            .join(
                profile.select(
                    F.col("_u"),
                    F.col("_i").alias("_ci"),
                    F.col("_mx").alias("_cmx"),
                ),
                "_u",
            )
            .filter(F.col("_amn") < F.col("_cmx"))
        )
        mid = base.join(F.broadcast(freq.select(F.col("_i"))), "_i").select(
            F.col("_u"), F.col("_i").alias("_bi"), F.col("_ts").alias("_bts")
        )
        levels.append(
            grid.join(mid, "_u")
            .filter(
                (F.col("_bts") > F.col("_amn")) & (F.col("_bts") < F.col("_cmx"))
            )
            .select("_u", "_ai", "_bi", "_ci")
            .distinct()
            .groupBy("_ai", "_bi", "_ci")
            .agg(F.count(F.lit(1)).cast("long").alias("support_count"))
            .select(
                F.concat_ws(sep, "_ai", "_bi", "_ci").alias("pattern"),
                F.lit(3).alias("length"),
                "support_count",
            )
        )
    from functools import reduce

    out = reduce(lambda x, y: x.unionByName(y), levels).crossJoin(
        F.broadcast(totals)
    )
    thresh = F.ceil(F.lit(float(min_support)) * F.col("_n") - F.lit(1e-9))
    return (
        out.filter(F.col("support_count") >= thresh)
        .select(
            "pattern",
            "length",
            "support_count",
            (F.col("support_count") / F.col("_n")).alias("support_frac"),
        )
    )


def markov_stationary(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    rounds: int = 20,
) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain — the
    long-run share of attention each step captures, the summary
    number `transition_matrix` rows don't directly give.

    Fixed-round power iteration π' = πP from the uniform start, with
    the deterministic dangling-state rule: a step with no outgoing
    transitions keeps its mass (self-loop) — mirrored in the oracle.
    A fixed round count keeps the plan static (the GMM/IRLS
    convention); at the default 20 rounds a 5-state chain is
    converged far past 6 dp.

    Plan discipline: π is referenced exactly ONCE per round — the
    dangling self-loop is folded into the single left join (a null
    ``to_step`` routes the mass back to ``state`` with weight 1), so
    the lazy plan grows LINEARLY in ``rounds``; π is additionally
    ``localCheckpoint``ed every 5 rounds (the LPA/ALS rule) so
    analysis cost stays flat at any round count.

    Scale: the chain is STEP-cardinality-sized — after the one
    row-count-proportional pass inside `transition_matrix`, every
    round is a join+aggregate over k² rows. Output is one row per
    distinct state (unreachable states report π = 0):
    ``(state, pi, n_out)``.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    # materialize the k²-row chain once: every round references it, and
    # without the checkpoint Catalyst would inline the full event-scan
    # window subplan `rounds` times (the LPA/ALS localCheckpoint rule)
    tm = (
        transition_matrix(
            df, user_col=user_col, ts_col=ts_col, step_col=step_col
        )
        .select(
            F.col("from_step").alias("_mk_from"),
            F.col("to_step").alias("_mk_to"),
            F.col("p").alias("_mk_p"),
        )
        .localCheckpoint(eager=True)
    )
    states = (
        df.select(F.col(step_col).alias("state"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    k = F.lit(1.0) / F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
    pi = states.select("state", k.alias("pi"))
    outdeg = tm.groupBy(F.col("_mk_from").alias("state")).agg(
        F.count(F.lit(1)).cast("long").alias("n_out")
    )
    for r in range(rounds):
        # ONE reference to pi per round: dangling states (no tm row)
        # survive the left join with _mk_to null → mass routed back
        # to themselves with weight 1 (the self-loop rule). Disjoint
        # plain column names keep the repeated tm join unambiguous.
        pi = (
            pi.join(tm, F.col("state") == F.col("_mk_from"), "left")
            .select(
                F.coalesce("_mk_to", "state").alias("state"),
                (
                    F.col("pi") * F.coalesce("_mk_p", F.lit(1.0))
                ).alias("pi"),
            )
            .groupBy("state")
            .agg(F.sum("pi").alias("pi"))
        )
        if (r + 1) % 5 == 0 and r + 1 < rounds:
            pi = pi.localCheckpoint(eager=False)
    # unreachable non-dangling states leave pi once their inflow hits
    # zero — restore them so the output is one row per state
    return (
        states.join(pi, "state", "left")
        .join(outdeg, "state", "left")
        .select(
            "state",
            F.coalesce("pi", F.lit(0.0)).alias("pi"),
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
        )
    )


def markov_absorption(
    df: DataFrame,
    absorb_states: Iterable[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    rounds: int = 30,
) -> DataFrame:
    """Absorbing-chain analysis of the user-journey Markov chain:
    for each transient state, the probability of eventually being
    absorbed into each ``absorb_states`` member and the expected
    number of steps taken before absorption — the funnel question
    "starting from a view, how likely is a purchase, and how long
    does the journey run?" asked of the whole chain at once.

    Standard absorbing-chain decomposition (P → Q transient→transient,
    R transient→absorbing): the fundamental matrix N = (I − Q)⁻¹ is
    computed as the truncated Neumann series Σ_{t<rounds} Qᵗ via the
    fixed-round recurrence V' = I + V·Q (V referenced ONCE per round
    — linear plan growth, localCheckpoint every 5 rounds), then
    ``p_absorb = V·R`` and ``expected_steps = Σ_j V[i,j]``. The
    truncation converges geometrically in Q's spectral radius; 30
    rounds pins a typical funnel chain far past 6 dp. Mass that
    escapes to transient dead-ends (states with no outgoing
    transitions that are NOT declared absorbing) is simply mass that
    never absorbs — p_absorb rows can sum below 1, by construction.

    Scale: everything after the one ``transition_matrix`` pass is
    k²-row arithmetic (k = step cardinality). Output: one row per
    (transient state, absorbing state):
    ``(state, absorb_state, p_absorb, expected_steps)``.
    """
    absorb = sorted(set(absorb_states))
    if not absorb:
        raise ValueError("absorb_states must be non-empty")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    tm = (
        transition_matrix(
            df, user_col=user_col, ts_col=ts_col, step_col=step_col
        )
        .select(
            F.col("from_step").alias("_ab_from"),
            F.col("to_step").alias("_ab_to"),
            F.col("p").alias("_ab_p"),
        )
        .localCheckpoint(eager=True)
    )
    is_abs_from = F.col("_ab_from").isin(absorb)
    is_abs_to = F.col("_ab_to").isin(absorb)
    q = tm.filter(~is_abs_from & ~is_abs_to).localCheckpoint(eager=True)
    rmat = tm.filter(~is_abs_from & is_abs_to).localCheckpoint(eager=True)
    transient = (
        df.select(F.col(step_col).alias("state"))
        .distinct()
        .filter(~F.col("state").isin(absorb))
        .localCheckpoint(eager=True)
    )
    ident = transient.select(
        F.col("state").alias("i"),
        F.col("state").alias("j"),
        F.lit(1.0).alias("v"),
    )
    visits = ident
    for r in range(rounds - 1):
        # V' = I + V·Q, one reference to V per round (the
        # markov_stationary plan-growth discipline)
        visits = (
            visits.join(q, F.col("j") == F.col("_ab_from"))
            .select(
                "i",
                F.col("_ab_to").alias("j"),
                (F.col("v") * F.col("_ab_p")).alias("v"),
            )
            .unionByName(ident)
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
        )
        if (r + 1) % 5 == 0 and r + 2 < rounds:
            visits = visits.localCheckpoint(eager=False)
    steps = visits.groupBy("i").agg(F.sum("v").alias("expected_steps"))
    babs = (
        visits.join(rmat, F.col("j") == F.col("_ab_from"))
        .groupBy("i", F.col("_ab_to").alias("absorb_state"))
        .agg(F.sum(F.col("v") * F.col("_ab_p")).alias("p_absorb"))
    )
    grid = transient.crossJoin(
        F.broadcast(
            transient.sparkSession.createDataFrame(
                [(a,) for a in absorb], "absorb_state string"
            )
        )
    )
    return (
        grid.join(
            babs,
            (grid["state"] == babs["i"])
            & (grid["absorb_state"] == babs["absorb_state"]),
            "left",
        )
        .select(
            grid["state"],
            grid["absorb_state"],
            F.coalesce("p_absorb", F.lit(0.0)).alias("p_absorb"),
        )
        .join(steps.select(F.col("i").alias("state"), "expected_steps"), "state", "left")
        .select(
            "state",
            "absorb_state",
            "p_absorb",
            F.coalesce("expected_steps", F.lit(1.0)).alias("expected_steps"),
        )
    )
