"""Kaplan-Meier survival analysis over event timelines.

User-retention questions ("what fraction of users are still active
after N days?") are right-censored: users active at the end of the
observation window haven't churned yet, and treating them as churned
biases every retention number downward. The Kaplan-Meier product-limit
estimator (Kaplan & Meier 1958) is the standard correction, and it
compiles to a plan that survives 100 TB of events:

1. ``groupBy(user)`` — one shuffle keyed on the subject builds
   per-user lifetimes (first/last activity, censoring flag).
2. ``groupBy(duration)`` — a second shuffle collapses to the
   distinct-duration table, whose cardinality is bounded by the
   observation window in days, not the user count.
3. Two ordered windows over that tiny table: a descending cumulative
   sum gives the at-risk count n_t, an ascending cumulative
   ``product(1 - d_t/n_t)`` gives the survival curve. With grouping
   ``keys`` the windows partition per key (the scale path); keyless
   mode is one ordered partition over distinct durations only —
   hundreds of rows regardless of input size.

The running product is evaluated in ascending duration order on any
engine, so the float sequence is bit-reproducible and 6-dp rounding
is stable cross-engine (same argument as ``inference.py``).

Reference parity: the reference engine has no survival surface
(``/root/reference/temporal_retriever/app.py`` enumerates only
forecast/acf/pacf/granger); this extends the events-analytics family
(``funnel.py`` cohort retention is the uncensored cousin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cox_ph",
    "kaplan_meier",
    "logrank_test",
    "median_survival",
    "rmst",
    "user_lifetimes",
]


def user_lifetimes(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_gap_days: float = 7.0,
    segment_cols: list[str] | None = None,
) -> DataFrame:
    """Per-user duration + censoring flag from a raw event log.

    Duration is whole days between a user's first and last event
    (integer floor — engine-portable). A user whose last event is
    more than ``churn_gap_days`` before the global observation end
    (the max timestamp in the log) has churned: ``event = 1``. Anyone
    still active within the gap is right-censored: ``event = 0``.

    ``segment_cols`` widens the subject key to (user, segments) —
    e.g. per-activity-type retention — and the columns carry through
    for a keyed ``kaplan_meier``. The censoring horizon stays global.

    One shuffle (groupBy subject); the observation end is a one-row
    aggregate broadcast back over the lifetimes.
    """
    if churn_gap_days < 0:
        raise ValueError(f"churn_gap_days must be >= 0, got {churn_gap_days}")
    subject = [user_col, *(segment_cols or [])]
    lt = events.groupBy(*subject).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )
    obs = events.agg(F.max(ts_col).alias("_obs_end"))
    gap_s = int(churn_gap_days * 86400)
    diff_s = F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
    return (
        lt.crossJoin(F.broadcast(obs))
        .withColumn(
            "duration_days", F.floor(diff_s / F.lit(86400)).cast("long")
        )
        .withColumn(
            "event",
            (
                (
                    F.unix_timestamp("_obs_end")
                    - F.unix_timestamp("last_ts")
                )
                > gap_s
            ).cast("int"),
        )
        .drop("_obs_end")
    )


def kaplan_meier(
    lifetimes: DataFrame,
    *,
    duration_col: str = "duration_days",
    event_col: str = "event",
    keys: list[str] | None = None,
) -> DataFrame:
    """Product-limit survival curve S(t) from (duration, event) rows.

    Returns one row per distinct duration (per key): ``n_risk``
    subjects at risk entering t, ``d_events`` observed events at t,
    ``censored`` subjects leaving the risk set at t without an event,
    and ``survival`` = Π_{u<=t} (1 − d_u/n_u). Censoring-only times
    keep their row (factor 1) — the risk set still shrinks there,
    which is the whole point of the estimator.

    Keyless mode single-partitions the distinct-duration table; that
    table is observation-window-sized (not data-sized), so this is
    safe at any input scale — per-key mode is the parallel path.
    """
    kcols = list(keys or [])
    dur = F.col(duration_col)
    per_t = lifetimes.groupBy(*kcols, duration_col).agg(
        F.sum(event_col).cast("long").alias("d_events"),
        (F.count("*") - F.sum(event_col)).cast("long").alias("censored"),
    )
    part = kcols if kcols else [F.lit(1)]
    w_desc = (
        Window.partitionBy(*part)
        .orderBy(dur.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.partitionBy(*part)
        .orderBy(dur.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_risk = per_t.withColumn(
        "n_risk", F.sum(F.col("d_events") + F.col("censored")).over(w_desc)
    )
    factor = F.lit(1.0) - F.col("d_events").cast("double") / F.col("n_risk")
    return with_risk.withColumn(
        "survival", F.product(factor).over(w_asc)
    ).select(*kcols, duration_col, "n_risk", "d_events", "censored", "survival")


def median_survival(
    km: DataFrame,
    *,
    duration_col: str = "duration_days",
    keys: list[str] | None = None,
) -> DataFrame:
    """Smallest duration where S(t) drops to <= 0.5, per key.

    NULL when the curve never reaches 0.5 inside the observation
    window (more than half the population is censored) — the honest
    answer, not an extrapolation.
    """
    kcols = list(keys or [])
    med = F.min(
        F.when(F.col("survival") <= 0.5, F.col(duration_col))
    ).alias("median_survival")
    if kcols:
        return km.groupBy(*kcols).agg(med)
    return km.agg(med)


def logrank_test(
    df: DataFrame,
    *,
    group_col: str,
    group_a: str,
    group_b: str,
    duration_col: str = "duration_days",
    event_col: str = "event",
    keys: list[str] | None = None,
) -> DataFrame:
    """Two-group log-rank test (Mantel-Cox): do groups a and b share
    one survival curve? The standard companion to `kaplan_meier` —
    the KM curves say WHAT differs, this says whether the difference
    beats chance under censoring.

    At each distinct event time t with d_t pooled events and n_t / n_at
    subjects at risk (pooled / in group a):

        E_a  = Σ_t d_t · n_at / n_t                     (expected)
        V    = Σ_t d_t · (n_at/n_t)(1 − n_at/n_t)(n_t − d_t)/(n_t − 1)
        χ²   = (O_a − E_a)² / V  ~  χ²(1)

    the hypergeometric-moments form, ties handled exactly (cf. any
    survival text; identical to lifelines' statistic).

    Plan shape (the same contract as `kaplan_meier`): one aggregation
    collapses to per-distinct-duration rows, ONE descending window
    computes both risk-set counts, and one final aggregation reduces
    to a row per key — every stage after the first shuffle is
    observation-window-sized, not data-sized. The p-value is the
    exact dof-1 chi-square closed form (`diagnostics.chi2_sf_sql`),
    identical string on both engines.

    Output per key: ``n_a, n_b, observed_a, expected_a, chi2_stat,
    p_value`` (NULL statistic when V = 0 — no comparable risk sets —
    rather than a fake zero).
    """
    kcols = list(keys or [])
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    ev = F.col(event_col).cast("long")
    per_t = (
        df.filter(in_a | in_b)
        .groupBy(*kcols, duration_col)
        .agg(
            F.sum(ev).alias("_d"),
            F.sum(F.when(in_a, ev).otherwise(F.lit(0))).alias("_da"),
            F.count("*").alias("_r"),
            F.count(F.when(in_a, F.lit(1))).alias("_ra"),
        )
    )
    part = kcols if kcols else [F.lit(1)]
    w_desc = (
        Window.partitionBy(*part)
        .orderBy(F.col(duration_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_t.select(
        *kcols,
        "_d",
        "_da",
        "_r",
        "_ra",
        F.sum("_r").over(w_desc).cast("double").alias("_n"),
        F.sum("_ra").over(w_desc).cast("double").alias("_na"),
    )
    d = F.col("_d").cast("double")
    frac_a = F.col("_na") / F.col("_n")
    e_a = d * frac_a
    v = F.when(
        F.col("_n") > 1,
        d
        * frac_a
        * (1.0 - frac_a)
        * (F.col("_n") - d)
        / (F.col("_n") - 1.0),
    ).otherwise(F.lit(0.0))
    agg = risk.groupBy(*kcols).agg(
        F.sum("_ra").cast("long").alias("n_a"),
        (F.sum("_r") - F.sum("_ra")).cast("long").alias("n_b"),
        F.sum("_da").cast("long").alias("observed_a"),
        F.sum(e_a).alias("expected_a"),
        F.sum(v).alias("_v"),
    )
    chi2 = F.when(
        F.col("_v") > 0,
        F.pow(F.col("observed_a").cast("double") - F.col("expected_a"), 2)
        / F.col("_v"),
    )
    out = agg.select(
        *kcols, "n_a", "n_b", "observed_a", "expected_a",
        chi2.alias("chi2_stat"),
    )
    from temporal_retriever_spark.diagnostics import chi2_sf_sql

    return out.withColumn(
        "p_value",
        F.when(
            F.col("chi2_stat").isNotNull(),
            F.expr(chi2_sf_sql("chi2_stat", 1)),
        ),
    )


def cox_ph(
    df: DataFrame,
    covariate_cols: list[str],
    *,
    time_col: str = "duration_days",
    event_col: str = "event",
    strata_cols: list[str] | None = None,
    iterations: int = 4,
) -> list[float]:
    """Cox proportional-hazards regression (Cox 1972) by Newton-Raphson
    on the Breslow partial likelihood — the covariate-effects
    companion to :func:`kaplan_meier` ("HOW does activity level move
    the churn hazard", not just "what is the survival curve").

    Fully native per iteration: risk-set sums S0 = Σ exp(η),
    S1_k = Σ x_k·exp(η), S2_kl = Σ x_k·x_l·exp(η) are ONE descending
    RANGE-frame window pass over the subject table (the default
    ORDER BY frame includes time ties, which is exactly Breslow's
    treatment of tied event times), and the gradient/Hessian are ONE
    aggregation over event rows. The driver holds only the k-vector
    and k×k Hessian (closed-form solve for k ≤ 2 — the same
    expression order the SQL oracle replays; numpy for larger k).
    Fixed ``iterations`` (Newton converges quadratically; 4 reaches
    1e-10 on real data), zero-init, deterministic.

    ``strata_cols`` partitions the risk sets (stratified Cox) — that
    is the scale path; keyless mode windows the SUBJECT table (one
    row per user, not per event) in a single partition, same caveat
    as keyless ``rolling``.

    Returns coefficients in ``covariate_cols`` order (hazard ratios
    are ``exp(coef)``).
    """
    from pyspark import StorageLevel

    k = len(covariate_cols)
    if k == 0:
        raise ValueError("covariate_cols must be non-empty")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    strata = list(strata_cols or [])
    sub = df.select(
        *strata,
        F.col(time_col).cast("double").alias("_t"),
        F.col(event_col).cast("int").alias("_d"),
        *[
            F.col(c).cast("double").alias(f"_x{i}")
            for i, c in enumerate(covariate_cols)
        ],
    ).filter(
        F.col("_t").isNotNull() & F.col("_d").isNotNull()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = sub.count()
    if n == 0:
        sub.unpersist()
        raise ValueError("cannot fit on an empty frame")
    part = strata if strata else [F.lit(1)]
    wd = Window.partitionBy(*part).orderBy(F.col("_t").desc())
    w = [0.0] * k
    for _ in range(iterations):
        eta = F.lit(0.0)
        for i in range(k):
            eta = eta + F.lit(w[i]) * F.col(f"_x{i}")
        ex = F.exp(eta)
        d = sub.withColumn("_s0", F.sum(ex).over(wd))
        for i in range(k):
            d = d.withColumn(f"_s1_{i}", F.sum(F.col(f"_x{i}") * ex).over(wd))
        for i in range(k):
            for j in range(i, k):
                d = d.withColumn(
                    f"_s2_{i}_{j}",
                    F.sum(F.col(f"_x{i}") * F.col(f"_x{j}") * ex).over(wd),
                )
        aggs = []
        for i in range(k):
            aggs.append(
                F.sum(
                    F.col(f"_x{i}") - F.col(f"_s1_{i}") / F.col("_s0")
                ).alias(f"g{i}")
            )
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(
                        F.col(f"_s2_{i}_{j}") / F.col("_s0")
                        - (F.col(f"_s1_{i}") / F.col("_s0"))
                        * (F.col(f"_s1_{j}") / F.col("_s0"))
                    ).alias(f"h{i}{j}")
                )
        row = d.filter(F.col("_d") == 1).agg(*aggs).collect()[0]
        if row["g0"] is None:
            sub.unpersist()
            raise ValueError(
                "no event rows (event = 1) — every subject is censored; "
                "the partial likelihood is undefined"
            )
        if k == 1:
            w = [w[0] + row["g0"] / row["h00"]]
        elif k == 2:
            det = row["h00"] * row["h11"] - row["h01"] * row["h01"]
            w = [
                w[0] + (row["h11"] * row["g0"] - row["h01"] * row["g1"]) / det,
                w[1] + (row["h00"] * row["g1"] - row["h01"] * row["g0"]) / det,
            ]
        else:
            import numpy as np

            H = np.zeros((k, k))
            g = np.array([row[f"g{i}"] for i in range(k)])
            for i in range(k):
                for j in range(i, k):
                    H[i, j] = H[j, i] = row[f"h{i}{j}"]
            w = list(np.array(w) + np.linalg.solve(H, g))
    sub.unpersist()
    return [float(v) for v in w]


def rmst(
    km: DataFrame,
    *,
    tau: float,
    duration_col: str = "duration_days",
    survival_col: str = "survival",
    keys: list[str] | None = None,
) -> DataFrame:
    """Restricted mean survival time — the area under the
    Kaplan-Meier curve up to horizon ``tau``: "expected survival
    time within the first τ days", the standard effect measure when
    median survival is undefined (heavy censoring) and the honest
    summary when hazards aren't proportional (where a Cox hazard
    ratio misleads).

    Input is a `kaplan_meier` output table. The KM step convention:
    S(t) = ``survival`` of the last duration ≤ t; the curve is 1 on
    [0, first duration). RMST integrates the step function exactly:

        RMST(τ) = min(t₁, τ) + Σ_i S(t_i)·(min(t_{i+1}, τ) − min(t_i, τ))

    with t_{k+1} = ∞ for the last step (clamped to τ). ONE ordered
    window (lead) over the distinct-duration table + one aggregation
    per key — observation-window-sized, like everything in this
    module.

    Output per key: ``tau, rmst``.
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0: {tau}")
    kcols = list(keys or [])
    part = kcols if kcols else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(duration_col)
    t = F.col(duration_col).cast("double")
    tl = F.lit(float(tau))
    nxt = F.coalesce(F.lead(t).over(w), tl)
    seg = F.col(survival_col) * (
        F.least(nxt, tl) - F.least(t, tl)
    )
    first = F.least(F.min(t).over(Window.partitionBy(*part)), tl)
    d = km.withColumn("_seg", seg).withColumn("_first", first)
    return d.groupBy(*kcols).agg(
        F.lit(float(tau)).alias("tau"),
        (F.max("_first") + F.sum("_seg")).alias("rmst"),
    )
