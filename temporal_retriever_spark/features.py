"""Feature engineering for downstream forecasting / ML models: lag
and rolling features over series, calendar features, and
leave-one-out target encoding for categoricals.

The step between the engine's analytics and a trained model: the
reference pipes Prophet frames around (app.py:70-93); at scale the
same role is a FEATURE MATRIX built with window functions — every
transform here is a native window/aggregation expression, and the
leakage rules (lags strictly from the past, LOO encoding excluding
the row's own target) are part of the operator contract, not caller
discipline.

* ``make_lag_features`` — y_lag_k (strict past), y_roll_mean_w /
  y_roll_std_w over [-w, -1] (the spike-excluding baseline frame,
  matching ``rolling.anomaly_zscore``), plus calendar features. ONE
  window exchange per series for every lag and roll together.
* ``target_encode`` — the Micci-Barreca target-encoding recipe with
  leave-one-out leakage control and additive smoothing toward the
  global mean: enc = (sum_cat − y + m·ȳ)/(n_cat − 1 + m). One
  aggregation + a broadcast join; singleton categories fall back to
  the smoothed prior (never divide by zero).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "boxcox_lambda",
    "boxcox_transform",
    "calendar_features",
    "huber_regression",
    "make_lag_features",
    "mutual_information",
    "ridge_regression",
    "target_encode",
]


def calendar_features(
    df: DataFrame,
    *,
    ts_col: str = "ds",
    fourier_weekly: Iterable[int] = (),
    fourier_yearly: Iterable[int] = (),
) -> DataFrame:
    """Append the standard calendar feature block for a timestamp
    column — pure projections, no shuffle, no Python.

    Base features: ``dow`` (ISO, 1=Mon..7=Sun), ``dom``, ``doy``,
    ``month``, ``quarter``, ``weekofyear`` (ISO), ``is_weekend``,
    ``is_month_start``, ``is_month_end``.

    Fourier terms (the Prophet seasonality basis, prophet_map.py uses
    the same construction inside the fit): for each order k in
    ``fourier_weekly`` / ``fourier_yearly``, columns
    ``weekly_sin_k / weekly_cos_k`` (period 7 days) and
    ``yearly_sin_k / yearly_cos_k`` (period 365.25 days) of
    sin/cos(2πk·t/period) with t = days since 1970-01-01 — giving a
    linear model smooth periodic regressors instead of one-hot spikes.
    """
    import math

    c = F.col(ts_col)
    d = c.cast("date")
    t = F.datediff(d, F.lit("1970-01-01")).cast("double")
    out = (
        df.withColumn("dow", F.weekday(c) + F.lit(1))
        .withColumn("dom", F.dayofmonth(c))
        .withColumn("doy", F.dayofyear(c))
        .withColumn("month", F.month(c))
        .withColumn("quarter", F.quarter(c))
        .withColumn("weekofyear", F.weekofyear(c))
        .withColumn("is_weekend", F.weekday(c) >= F.lit(5))
        .withColumn("is_month_start", F.dayofmonth(c) == F.lit(1))
        .withColumn("is_month_end", d == F.last_day(c))
    )
    for k in sorted(set(int(k) for k in fourier_weekly)):
        if k < 1:
            raise ValueError(f"fourier orders must be >= 1, got {k}")
        ang = t * F.lit(2.0 * math.pi * k / 7.0)
        out = out.withColumn(f"weekly_sin_{k}", F.sin(ang)).withColumn(
            f"weekly_cos_{k}", F.cos(ang)
        )
    for k in sorted(set(int(k) for k in fourier_yearly)):
        if k < 1:
            raise ValueError(f"fourier orders must be >= 1, got {k}")
        ang = t * F.lit(2.0 * math.pi * k / 365.25)
        out = out.withColumn(f"yearly_sin_{k}", F.sin(ang)).withColumn(
            f"yearly_cos_{k}", F.cos(ang)
        )
    return out


def boxcox_lambda(
    df: DataFrame,
    *,
    value_col: str = "y",
    key_cols: Iterable[str] = (),
    lambdas: Iterable[float] = (-1.0, -0.5, 0.0, 0.5, 1.0, 2.0),
) -> DataFrame:
    """Profile log-likelihood over a λ grid for the Box-Cox power
    transform (Box & Cox 1964) — the variance-stabilization step that
    decides whether a series should be modelled on the raw, sqrt or
    log scale before forecasting.

    For each key and each candidate λ the transformed values are
    t = (y^λ − 1)/λ (λ≠0) or ln y (λ=0), and the profile
    log-likelihood is LL(λ) = −n/2·ln(σ̂²_λ) + (λ−1)·Σ ln y with σ̂²
    the population variance of t. Rows with y ≤ 0 are excluded (the
    transform's domain), and keys left with < 2 valid rows or a
    degenerate (constant) transform yield NULL loglik for that λ.

    Returns one row per (key, λ): ``(*key_cols, lam, n, loglik,
    is_best)`` — ``is_best`` marks the grid argmax (ties broken
    toward the smaller λ, so the simpler transform wins).

    Scale design: the whole grid is ONE aggregation — per key it emits
    3·|λ| + 2 conditional sums, so 100k keys × any row count shuffle
    |λ|-bounded moment rows only; the argmax is a key-sized window.
    """
    key_cols = list(key_cols)
    lams = [float(l) for l in lambdas]
    if len(lams) != len(set(lams)) or not lams:
        raise ValueError(f"lambdas must be a non-empty set: {lambdas}")
    y = F.col(value_col).cast("double")
    valid = df.filter(y > 0)

    def t_expr(lam: float):
        if lam == 0.0:
            return F.log(y)
        return (F.pow(y, F.lit(lam)) - 1) / F.lit(lam)

    aggs = [
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.log(y)).alias("_slog"),
    ]
    for i, lam in enumerate(lams):
        t = t_expr(lam)
        aggs.append(F.sum(t).alias(f"_s{i}"))
        aggs.append(F.sum(t * t).alias(f"_q{i}"))
    g = valid.groupBy(*key_cols).agg(*aggs) if key_cols else valid.agg(*aggs)

    rows = []
    for i, lam in enumerate(lams):
        nn = F.col("_n").cast("double")
        var = F.col(f"_q{i}") / nn - (F.col(f"_s{i}") / nn) * (
            F.col(f"_s{i}") / nn
        )
        ll = F.when(
            (F.col("_n") >= 2) & (var > 0),
            -nn / 2 * F.log(var) + (F.lit(lam) - 1) * F.col("_slog"),
        )
        rows.append(
            F.struct(
                F.lit(lam).alias("lam"),
                ll.alias("loglik"),
            )
        )
    long = g.select(
        *key_cols,
        F.col("_n").alias("n"),
        F.explode(F.array(*rows)).alias("_e"),
    ).select(
        *key_cols,
        F.col("_e.lam").alias("lam"),
        "n",
        F.col("_e.loglik").alias("loglik"),
    )
    w = Window.partitionBy(*key_cols) if key_cols else Window.partitionBy()
    best = F.max(
        F.when(
            F.col("loglik").isNotNull(),
            F.struct(F.col("loglik").alias("ll"), (-F.col("lam")).alias("nl")),
        )
    ).over(w)
    return long.select(
        *key_cols,
        "lam",
        "n",
        "loglik",
        (
            F.col("loglik").isNotNull()
            & (F.col("loglik") == best["ll"])
            & (F.col("lam") == -best["nl"])
        ).alias("is_best"),
    )


def boxcox_transform(
    df: DataFrame, lam: float, *, value_col: str = "y", out_col: str = "y_bc"
) -> DataFrame:
    """Apply the Box-Cox transform at a fixed λ (rows with y ≤ 0 get
    NULL — out of the transform's domain, never silently clamped)."""
    y = F.col(value_col).cast("double")
    if float(lam) == 0.0:
        t = F.log(y)
    else:
        t = (F.pow(y, F.lit(float(lam))) - 1) / F.lit(float(lam))
    return df.withColumn(out_col, F.when(y > 0, t))


def make_lag_features(
    df: DataFrame,
    *,
    lags: Iterable[int] = (1, 7),
    roll_windows: Iterable[int] = (7,),
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
    calendar: bool = True,
) -> DataFrame:
    """Append lag / rolling / calendar features per series row.

    All lags and rolls share ONE (series, order) window exchange.
    Rolling frames are ``[-w, -1]`` — strictly past rows, never the
    current one, so the features are leakage-free for forecasting.
    Short histories yield NULLs (no partial-lag invention); rolling
    stats need at least 1 (mean) / 2 (std) past rows.

    Calendar features (``calendar=True``): dow (1=Mon..7=Sun), dom,
    month, weekofyear — pure projections.
    """
    lags = sorted(set(int(x) for x in lags))
    roll_windows = sorted(set(int(x) for x in roll_windows))
    if any(l < 1 for l in lags):
        raise ValueError(f"lags must be >= 1: {lags}")
    if any(w < 1 for w in roll_windows):
        raise ValueError(f"roll windows must be >= 1: {roll_windows}")
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    out = df
    for k in lags:
        out = out.withColumn(
            f"{value_col}_lag_{k}", F.lag(value_col, k).over(w)
        )
    for win in roll_windows:
        frame = w.rowsBetween(-win, -1)
        out = out.withColumn(
            f"{value_col}_roll_mean_{win}", F.avg(value_col).over(frame)
        ).withColumn(
            f"{value_col}_roll_std_{win}", F.stddev_samp(value_col).over(frame)
        )
    if calendar:
        out = (
            out.withColumn("dow", F.weekday(ts_col) + F.lit(1))
            .withColumn("dom", F.dayofmonth(ts_col))
            .withColumn("month", F.month(ts_col))
            .withColumn("weekofyear", F.weekofyear(ts_col))
        )
    return out


def target_encode(
    df: DataFrame,
    *,
    cat_col: str,
    target_col: str = "y",
    smoothing: float = 1.0,
    out_col: str | None = None,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing:

        enc(row) = (sum_cat − y_row + m·ȳ) / (n_cat − 1 + m)

    — the category's mean target computed WITHOUT the row's own value
    (the leakage control that plain mean-encoding lacks), shrunk
    toward the global mean ȳ by pseudo-count ``m``. Rows with a NULL
    target contribute nothing and are encoded from the full category
    statistics; NULL categories encode to the smoothed prior.

    One (category) aggregation broadcast back + one global-mean
    scalar — two small exchanges, the fact table never reshuffles.
    """
    if not smoothing >= 0:
        raise ValueError(f"smoothing must be >= 0: {smoothing}")
    out_col = out_col or f"{cat_col}_te"
    stats = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("_s"), F.count(target_col).alias("_n")
    )
    glob = df.agg(F.avg(target_col).alias("_g"))
    m = F.lit(float(smoothing))
    joined = df.join(F.broadcast(stats), on=cat_col, how="left").crossJoin(
        F.broadcast(glob)
    )
    own = F.when(F.col(target_col).isNotNull(), F.col(target_col)).otherwise(
        F.lit(0.0)
    )
    n_loo = F.col("_n") - F.col(target_col).isNotNull().cast("long")
    # coalesce the sum: a category whose targets are ALL NULL has
    # _s = NULL but _n = 0 — it must encode to the smoothed prior,
    # never to NULL
    enc = F.when(
        F.col("_n").isNull() | (n_loo + m == 0),
        F.col("_g"),
    ).otherwise(
        (F.coalesce(F.col("_s"), F.lit(0.0)) - own + m * F.col("_g"))
        / (n_loo.cast("double") + m)
    )
    return joined.select(*df.columns, enc.alias(out_col))


def mutual_information(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    n_bins: int = 10,
    ranges: dict | None = None,
) -> DataFrame:
    """Mutual information I(feature; label) per feature — the standard
    filter-method feature ranking (plus a model-free "is there ANY
    dependence" screen, unlike correlation it catches non-monotone
    structure).

    Features discretize into ``n_bins`` fixed-width bins (the same
    formula as the histogram tree / z-order layout); labels are used
    as-is (categorical or already-discrete). ONE aggregation computes
    every feature's joint (bin, label) table at once — rows explode
    into their k (feature, bin) pairs, map-side combined, so the
    shuffle carries at most features × bins × labels cells per
    partition. MI then assembles from the cell table with two
    window sums — everything after the first aggregation is
    cell-table-sized, independent of data volume.

    Returns ``(feature, mi)`` (natural-log units), descending —
    deterministic, fully native, SQL-mirrorable.
    """
    from temporal_retriever_spark.sources.layout import column_ranges
    from temporal_retriever_spark.tree import _bin_expr

    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if ranges is None:
        ranges = column_ranges(df, feature_cols)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("feature"),
                    _bin_expr(c, *ranges[c], n_bins).alias("bin"),
                )
                for c in feature_cols
            ]
        )
    ).alias("_p")
    cells = (
        df.filter(F.col(label_col).isNotNull())
        .select(F.col(label_col).alias("_l"), pairs)
        .groupBy("_p.feature", "_p.bin", "_l")
        .agg(F.count("*").cast("double").alias("n"))
    )
    wf = Window.partitionBy("feature")
    wb = Window.partitionBy("feature", "bin")
    wl = Window.partitionBy("feature", "_l")
    terms = cells.select(
        "feature",
        (
            (F.col("n") / F.sum("n").over(wf))
            * F.log(
                (F.col("n") * F.sum("n").over(wf))
                / (F.sum("n").over(wb) * F.sum("n").over(wl))
            )
        ).alias("_t"),
    )
    return (
        terms.groupBy("feature")
        .agg(F.sum("_t").alias("mi"))
        .orderBy(F.col("mi").desc(), "feature")
    )


def ridge_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    l2: float = 1.0,
    keys: Iterable[str] | None = None,
) -> DataFrame:
    """Closed-form ridge regression, optionally PER KEY — the
    continuous-outcome member of the supervised family (LR for
    binary, Poisson for counts, this for y ∈ ℝ; Hoerl & Kennard
    1970). Solves (X'X + λI')β = X'y with the intercept unpenalized
    (λ on every diagonal Gram cell except g₀₀).

    ONE aggregation computes every key's Gram matrix and moment
    vector (map-side combined, (k+1)(k+2)/2 + k+1 doubles per key on
    the wire); the solve is the shared staged-Cholesky strings
    (``forecast.ar_stages``), so thousands of per-series models cost
    one shuffle and the oracle replays the identical expressions.
    Returns (keys…, n, intercept, coef_<feature>…); rank-deficient
    keys yield NaN coefficients (λ > 0 prevents that for any
    non-degenerate data).
    """
    from temporal_retriever_spark.forecast import ar_stages

    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    keys = list(keys or [])
    y = F.col(label_col).cast("double")
    zs = [F.lit(1.0)] + [
        F.col(c).cast("double") for c in feature_cols
    ]
    m = k + 1
    cond = y.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    aggs = [F.count(F.when(cond, 1)).cast("double").alias("nn")]
    for i in range(m):
        for j in range(i, m):
            aggs.append(
                F.sum(F.when(cond, zs[i] * zs[j])).alias(f"g_{i}_{j}")
            )
        aggs.append(F.sum(F.when(cond, zs[i] * y)).alias(f"gy_{i}"))
    gram = df.groupBy(*keys).agg(*aggs)
    for i in range(1, m):
        gram = gram.withColumn(
            f"g_{i}_{i}", F.col(f"g_{i}_{i}") + F.lit(float(l2))
        )
    for name, expr in ar_stages(k):
        gram = gram.withColumn(name, F.expr(expr))
    return gram.select(
        *keys,
        F.col("nn").cast("long").alias("n"),
        F.col("c_0").alias("intercept"),
        *[
            F.col(f"c_{i + 1}").alias(f"coef_{c}")
            for i, c in enumerate(feature_cols)
        ],
    )


def quantile_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    tau: float = 0.5,
    iterations: int = 20,
    eps: float = 1e-6,
    l2: float = 0.0,
    keys: Iterable[str] | None = None,
) -> DataFrame:
    """Quantile (pinball-loss) regression by IRLS — fit the
    conditional τ-quantile line instead of the conditional mean:
    τ=0.5 is median (LAD) regression, τ=0.9 an upper envelope. The
    distribution-aware member of the regression family (Koenker &
    Bassett 1978); the workhorse for demand envelopes and SLA bands.

    IRLS form of the pinball loss ρ_τ(r) = r·(τ − 1{r<0}): round 0 is
    the plain (ridge) solve, each following round joins the key-sized
    coefficient table back (broadcast) and re-solves the weighted
    normal equations with

        w = (τ if r ≥ 0 else 1−τ) / max(|r|, eps)

    — the standard reweighting whose fixed point is the quantile fit
    (eps keeps near-zero residuals finite, same literal on both
    engines). Fixed ``iterations`` keeps the plan deterministic and
    oracle-replayable (one aggregation per round, the shared
    staged-Cholesky strings, per-key models in the same shuffle);
    like `huber_regression` this is the fixed-round IRLS
    approximation, not a simplex LP — identical across engines by
    construction. Unlike Huber (whose IRLS contracts in ~3 rounds)
    the pinball reweighting converges slowly: ~20 rounds for tail
    quantiles on noisy data (the default), each round one tiny-row
    aggregation. Returns (keys…, n, intercept, coef_<f>…).
    """
    from temporal_retriever_spark.forecast import ar_stages

    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    if not 0.0 < tau < 1.0:
        raise ValueError(f"tau must be in (0, 1), got {tau}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    keys = list(keys or [])
    y = F.col(label_col).cast("double")
    m = k + 1
    cond = y.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        *keys, y.alias("_y"),
        *[F.col(c).cast("double").alias(f"_x{i}") for i, c in enumerate(feature_cols)],
    )
    xs = [F.lit(1.0)] + [F.col(f"_x{i}") for i in range(k)]

    def solve(weight: Column) -> DataFrame:
        aggs = [F.count("*").cast("double").alias("nn")]
        for i in range(m):
            for j in range(i, m):
                aggs.append(
                    F.sum(weight * xs[i] * xs[j]).alias(f"g_{i}_{j}")
                )
            aggs.append(F.sum(weight * xs[i] * F.col("_y")).alias(f"gy_{i}"))
        gram = cur.groupBy(*keys).agg(*aggs) if keys else cur.groupBy().agg(*aggs)
        for i in range(1, m):
            gram = gram.withColumn(
                f"g_{i}_{i}", F.col(f"g_{i}_{i}") + F.lit(float(l2))
            )
        for name, expr in ar_stages(k):
            gram = gram.withColumn(name, F.expr(expr))
        return gram.select(
            *keys, "nn", *[F.col(f"c_{i}").alias(f"_b{i}") for i in range(m)]
        )

    cur = base
    coef = solve(F.lit(1.0))
    for _ in range(iterations - 1):
        joined = (
            base.join(F.broadcast(coef), on=keys)
            if keys
            else base.crossJoin(F.broadcast(coef))
        )
        pred = F.col("_b0")
        for i in range(k):
            pred = pred + F.col(f"_b{i + 1}") * F.col(f"_x{i}")
        r = F.col("_y") - pred
        w = F.when(r >= 0, F.lit(float(tau))).otherwise(
            F.lit(1.0 - float(tau))
        ) / F.greatest(F.abs(r), F.lit(float(eps)))
        cur = joined.withColumn("_w", w)
        coef = solve(F.col("_w"))
    return coef.select(
        *keys,
        F.col("nn").cast("long").alias("n"),
        F.col("_b0").alias("intercept"),
        *[
            F.col(f"_b{i + 1}").alias(f"coef_{c}")
            for i, c in enumerate(feature_cols)
        ],
    )


def huber_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    delta: float = 1.345,
    iterations: int = 3,
    l2: float = 0.0,
    keys: Iterable[str] | None = None,
) -> DataFrame:
    """Huber-loss robust regression by IRLS (Huber 1964) — the
    outlier-resistant member of the regression family: squared loss
    inside ``delta``, absolute loss outside, so a few wild rows can't
    drag the fit the way they drag OLS/ridge.

    Round 0 is the plain (ridge) solve; each following round joins
    the key-sized coefficient table back (broadcast), reweights rows
    ``w = min(1, δ/|r|)``, and re-solves the WEIGHTED normal
    equations — one aggregation per round, the shared staged-Cholesky
    strings, per-key models in the same shuffle. Fixed ``iterations``
    (IRLS contracts fast; 3 is the practical default), deterministic,
    oracle-replayable. Returns (keys…, n, intercept, coef_<f>…).
    """
    from temporal_retriever_spark.forecast import ar_stages

    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    if delta <= 0:
        raise ValueError(f"delta must be > 0, got {delta}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    keys = list(keys or [])
    y = F.col(label_col).cast("double")
    zs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    m = k + 1
    cond = y.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        *keys, y.alias("_y"),
        *[F.col(c).cast("double").alias(f"_x{i}") for i, c in enumerate(feature_cols)],
    )
    xs = [F.lit(1.0)] + [F.col(f"_x{i}") for i in range(k)]

    def solve(weight: Column) -> DataFrame:
        aggs = [F.count("*").cast("double").alias("nn")]
        for i in range(m):
            for j in range(i, m):
                aggs.append(
                    F.sum(weight * xs[i] * xs[j]).alias(f"g_{i}_{j}")
                )
            aggs.append(F.sum(weight * xs[i] * F.col("_y")).alias(f"gy_{i}"))
        gram = cur.groupBy(*keys) .agg(*aggs) if keys else cur.groupBy().agg(*aggs)
        for i in range(1, m):
            gram = gram.withColumn(
                f"g_{i}_{i}", F.col(f"g_{i}_{i}") + F.lit(float(l2))
            )
        for name, expr in ar_stages(k):
            gram = gram.withColumn(name, F.expr(expr))
        return gram.select(
            *keys, "nn", *[F.col(f"c_{i}").alias(f"_b{i}") for i in range(m)]
        )

    cur = base
    coef = solve(F.lit(1.0))
    for _ in range(iterations - 1):
        joined = (
            base.join(F.broadcast(coef), on=keys)
            if keys
            else base.crossJoin(F.broadcast(coef))
        )
        pred = F.col("_b0")
        for i in range(k):
            pred = pred + F.col(f"_b{i + 1}") * F.col(f"_x{i}")
        r = F.abs(F.col("_y") - pred)
        w = F.when(r <= F.lit(float(delta)), F.lit(1.0)).otherwise(
            F.lit(float(delta)) / r
        )
        cur = joined.withColumn("_w", w)
        coef = solve(F.col("_w"))
    return coef.select(
        *keys,
        F.col("nn").cast("long").alias("n"),
        F.col("_b0").alias("intercept"),
        *[
            F.col(f"_b{i + 1}").alias(f"coef_{c}")
            for i, c in enumerate(feature_cols)
        ],
    )
