"""Forecast evaluation: accuracy metrics and rolling-origin backtests.

The missing half of any forecasting engine — not producing forecasts
but deciding which forecaster to trust. ``forecast_accuracy`` scores a
prediction frame against actuals with the standard metric suite
(MAE/RMSE/MAPE/sMAPE/MASE/bias); ``rolling_origin_splits`` assigns the
rolling-origin cross-validation folds (Hyndman fpp "time series
cross-validation") that generate honest out-of-sample scores.

Scale shape: scoring is one equi-join on (series, ds) + ONE
aggregation per series (the MASE denominator adds one lag-window pass
over the history); fold assignment is a single reverse-rank window +
a sequence explode. No Python anywhere.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "gains_table",
    "conformalize",
    "interval_metrics",
    "quantile_loss",
    "backtest",
    "calibration_bins",
    "classification_metrics",
    "ensemble_forecasts",
    "forecast_accuracy",
    "isotonic_calibration",
    "rolling_origin_splits",
]


def forecast_accuracy(
    pred: DataFrame,
    actuals: DataFrame,
    *,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    yhat_col: str = "yhat",
    y_col: str = "y",
    seasonal_period: int = 1,
    history: DataFrame | None = None,
) -> DataFrame:
    """Per-series forecast accuracy over the dates present in BOTH
    frames: MAE, RMSE, MAPE (zero-actual rows skipped), sMAPE, bias
    (mean signed error), MASE, and n (scored points).

    MASE scales MAE by the in-sample one-step seasonal-naive MAE of
    ``history`` (defaults to ``actuals``) at ``seasonal_period`` —
    the scale-free metric that makes series comparable; MASE < 1 beats
    the naive forecaster. NULL when the history is too short or
    constant.

    One join + one aggregation; the MASE denominator is one ordered
    lag window over the history. Everything native.
    """
    if seasonal_period < 1:
        raise ValueError(f"seasonal_period must be >= 1: {seasonal_period}")
    series_cols = list(series_cols)
    p = pred.select(
        *series_cols, F.col(ds_col).alias("_ds"), F.col(yhat_col).alias("_yhat")
    )
    a = actuals.select(
        *series_cols, F.col(ds_col).alias("_ds"), F.col(y_col).alias("_y")
    )
    j = p.join(a, on=[*series_cols, "_ds"])
    err = F.col("_yhat") - F.col("_y")
    scored = j.groupBy(*series_cols).agg(
        F.count("_y").alias("n"),
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(
            F.when(F.col("_y") != 0, F.abs(F.try_divide(err, F.col("_y"))))
        ).alias("mape"),
        F.avg(
            F.lit(2.0)
            * F.try_divide(F.abs(err), F.abs(F.col("_y")) + F.abs(F.col("_yhat")))
        ).alias("smape"),
        F.avg(err).alias("bias"),
    )
    hist = history if history is not None else actuals
    ws = Window.partitionBy(*series_cols).orderBy(ds_col)
    scale = (
        hist.withColumn("_lag", F.lag(F.col(y_col), seasonal_period).over(ws))
        .filter(F.col("_lag").isNotNull())
        .groupBy(*series_cols)
        .agg(F.avg(F.abs(F.col(y_col) - F.col("_lag"))).alias("_scale"))
    )
    return (
        scored.join(scale, on=series_cols, how="left")
        .withColumn("mase", F.try_divide(F.col("mae"), F.col("_scale")))
        .drop("_scale")
    )


def rolling_origin_splits(
    df: DataFrame,
    *,
    n_folds: int = 3,
    horizon: int = 7,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
) -> DataFrame:
    """Rolling-origin cross-validation fold assignment per series.

    Fold i (1..n_folds) tests on the ``horizon`` rows ending
    ``(n_folds − i)·horizon`` before the series end and trains on
    everything strictly earlier — the forecast origin rolls forward
    by ``horizon`` per fold, so fold n_folds tests on the newest
    window. Output: input columns + ``fold`` + ``role``
    ('train'|'test'); rows newer than a fold's test window are
    excluded from that fold (no future leakage — checked in tests).

    One reverse-rank window + a sequence explode: each input row emits
    ≤ n_folds rows, no shuffled duplication beyond the fold fan-out.
    """
    if n_folds < 1:
        raise ValueError(f"n_folds must be >= 1: {n_folds}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1: {horizon}")
    series_cols = list(series_cols)
    wd = Window.partitionBy(*series_cols).orderBy(F.col(ds_col).desc())
    d = df.withColumn("_rn", F.row_number().over(wd)).withColumn(
        "fold", F.explode(F.sequence(F.lit(1), F.lit(n_folds)))
    )
    # fold i: test rows have reverse-rank in (back, back + horizon],
    # where back = (n_folds - i) * horizon; train rows are older
    back = (F.lit(n_folds) - F.col("fold")) * horizon
    role = (
        F.when(
            (F.col("_rn") > back) & (F.col("_rn") <= back + horizon), F.lit("test")
        )
        .when(F.col("_rn") > back + horizon, F.lit("train"))
        .otherwise(F.lit(None))
    )
    return d.withColumn("role", role).filter(F.col("role").isNotNull()).drop("_rn")


def ensemble_forecasts(
    forecasts: list[DataFrame],
    weights: list[float] | None = None,
    *,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    yhat_col: str = "yhat",
) -> DataFrame:
    """Weighted combination of forecast frames on (series, ds) — the
    forecast-combination step that reliably beats its members (the
    M-competition "combine!" result). Frames must share the key and
    ``yhat`` columns; weights default to equal and must sum to 1.

    Implementation: tag each frame with its weight, union, ONE
    aggregation summing w·ŷ per (series, ds). Rows missing from some
    member are dropped (an ensemble is only defined where every
    member votes) — enforced by counting votes.
    """
    if not forecasts:
        raise ValueError("forecasts must be non-empty")
    k = len(forecasts)
    if weights is None:
        weights = [1.0 / k] * k
    if len(weights) != k:
        raise ValueError(f"{k} forecasts but {len(weights)} weights")
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights)}")
    series_cols = list(series_cols)
    from functools import reduce

    tagged = [
        f.select(
            *series_cols,
            F.col(ds_col),
            (F.col(yhat_col) * F.lit(float(w))).alias("_wy"),
            F.lit(i).alias("_member"),
        )
        for i, (f, w) in enumerate(zip(forecasts, weights))
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    # exactly ONE row per member: a duplicate (series, ds) inside one
    # member would otherwise fake the vote count and double its weight
    return (
        unioned.groupBy(*series_cols, ds_col)
        .agg(
            F.sum("_wy").alias(yhat_col),
            F.count("_wy").alias("_rows"),
            F.countDistinct("_member").alias("_votes"),
        )
        .filter((F.col("_votes") == k) & (F.col("_rows") == k))
        .drop("_votes", "_rows")
    )


def backtest(
    df: DataFrame,
    forecaster,
    *,
    n_folds: int = 3,
    horizon: int = 7,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    y_col: str = "y",
    seasonal_period: int = 1,
) -> DataFrame:
    """Rolling-origin backtest of any forecaster: for each fold, fit
    on the train window, forecast the held-out horizon, and score with
    the full metric suite — the honest model-selection loop
    (``rolling_origin_splits`` × forecaster × ``forecast_accuracy``
    composed). Output: one row per (series, fold) with the metrics
    plus ``fold``.

    ``forecaster`` is any callable ``train_df -> DataFrame`` returning
    (series, ds, yhat) rows past the train window — every forecaster
    in this engine qualifies (``forecast_theta``, ``forecast_ar``,
    ``forecast_baseline``, ``forecast_holt_winters``, partials of
    them, or an ``ensemble_forecasts`` composition).

    The fold loop is a build-time Python loop over n_folds PLANS (not
    data): each fold contributes one branch to a union, so the whole
    backtest is one lazy DataFrame; nothing executes until the caller
    acts. MASE scales per fold on that fold's train window only — no
    leakage anywhere.
    """
    series_cols = list(series_cols)
    splits = rolling_origin_splits(
        df,
        n_folds=n_folds,
        horizon=horizon,
        series_cols=series_cols,
        ds_col=ds_col,
    )
    parts = []
    for fold in range(1, n_folds + 1):
        train = splits.filter(
            (F.col("fold") == fold) & (F.col("role") == "train")
        ).drop("fold", "role")
        test = splits.filter(
            (F.col("fold") == fold) & (F.col("role") == "test")
        ).drop("fold", "role")
        pred = forecaster(train)
        acc = forecast_accuracy(
            pred,
            test,
            series_cols=series_cols,
            ds_col=ds_col,
            y_col=y_col,
            seasonal_period=seasonal_period,
            history=train,
        )
        parts.append(acc.withColumn("fold", F.lit(fold)))
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def classification_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    keys: list[str] | None = None,
) -> DataFrame:
    """Binary-classifier scoring at any scale: AUC, log-loss, Brier.

    ROC AUC uses the rank identity ``AUC = (R⁺ − n⁺(n⁺+1)/2) /
    (n⁺·n⁻)`` — the probability a random positive outranks a random
    negative — computed on DISTINCT-score midranks exactly like
    ``inference.mann_whitney_u``, so ties are handled correctly
    (trapezoid ROC) and nothing ever sorts the raw rows: one
    ``groupBy(score)`` shuffle, one score-domain-sized ordered
    window. Log-loss clamps scores to [1e-15, 1−1e-15] (the sklearn
    convention) so a confident-wrong 0/1 score stays finite.

    Labels must be 0/1 (NULL rows dropped); output per key:
    ``n, n_pos, auc, log_loss, brier`` — AUC NULL for one-class
    groups (undefined, not 0.5-by-fiat).
    """
    keys = list(keys or [])
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.filter(s.isNotNull() & y.isNotNull())
    # moments: one aggregation
    eps = 1e-15
    sc = F.least(F.greatest(s, F.lit(eps)), F.lit(1.0 - eps))
    mom = base.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(y).cast("long").alias("n_pos"),
        F.avg(
            -(
                y.cast("double") * F.log(sc)
                + (1.0 - y.cast("double")) * F.log(F.lit(1.0) - sc)
            )
        ).alias("log_loss"),
        F.avg((s - y.cast("double")) * (s - y.cast("double"))).alias(
            "brier"
        ),
    )
    # midrank AUC over distinct scores
    cnts = base.groupBy(*keys, s.alias("_s")).agg(
        F.sum(y).cast("double").alias("_dp"),
        (F.count("*") - F.sum(y)).cast("double").alias("_dn"),
    )
    part = keys if keys else [F.lit(1)]
    w_prev = (
        Window.partitionBy(*part)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dt = F.col("_dp") + F.col("_dn")
    ranked = cnts.select(
        *keys,
        "_dp",
        F.coalesce(F.sum(dt).over(w_prev), F.lit(0.0)).alias("_before"),
        dt.alias("_dt"),
    )
    midrank = F.col("_before") + (F.col("_dt") + 1.0) / 2.0
    rpos = ranked.groupBy(*keys).agg(
        F.sum(F.col("_dp") * midrank).alias("_rpos")
    )
    joined = (
        mom.join(rpos, on=keys) if keys else mom.crossJoin(rpos)
    )
    np_ = F.col("n_pos").cast("double")
    nn = (F.col("n") - F.col("n_pos")).cast("double")
    auc = F.when(
        (np_ > 0) & (nn > 0),
        (F.col("_rpos") - np_ * (np_ + 1.0) / 2.0) / (np_ * nn),
    )
    return joined.select(
        *keys, "n", "n_pos", auc.alias("auc"), "log_loss", "brier"
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    keys: list[str] | None = None,
) -> DataFrame:
    """Reliability table: equal-width score bins vs observed rate.

    One aggregation on (keys, bin); scores land in
    ``floor(score · n_bins)`` clamped to the last bin (score = 1.0
    belongs to bin n−1, not a phantom bin n). Feed a calibration
    plot or an ECE computation downstream.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    keys = list(keys or [])
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    b = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    return (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(*keys, b)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.avg(s).alias("mean_score"),
            F.avg(y.cast("double")).alias("frac_positive"),
        )
        .orderBy(*keys, "bin")
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 50,
    keys: list[str] | None = None,
) -> DataFrame:
    """Monotone probability calibration: weighted isotonic regression
    (pool-adjacent-violators) fitted on the reliability table.

    The classifier-calibration step after ``calibration_bins`` shows a
    crooked reliability curve (Zadrozny & Elkan 2002): find the
    monotone non-decreasing fit minimizing weighted squared error to
    the per-bin positive rates. Computed NATIVELY via the classic
    minimax identity for isotonic regression —
    ``iso(k) = min_{j≥k} max_{i≤k} wavg(y, bins i..j)``
    (Robertson, Wright & Dykstra 1988, Thm 1.4.4) — instead of the
    sequential PAV stack: binning first collapses any corpus to
    ``n_bins`` rows per key, so the pair table is n_bins² per key
    REGARDLESS of data size, and two ordered windows (running max
    over i, then running min over j) finish the fit. One aggregation
    over the data + key-equi self-join of a tiny table + two windows;
    zero Python.

    Returns one row per non-empty bin: ``(keys…, bin, n, mean_score,
    frac_positive, iso_prob)`` with ``iso_prob`` monotone
    non-decreasing in ``bin`` within each key group. Join scores back
    on the bin to apply (scores in empty bins take the nearest fitted
    bin — caller's interpolation choice).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    keys = list(keys or [])
    bins = calibration_bins(
        df, score_col, label_col, n_bins=n_bins, keys=keys
    ).select(
        *keys,
        "bin",
        "n",
        "mean_score",
        "frac_positive",
        (F.col("n").cast("double") * F.col("frac_positive")).alias("_pos"),
        F.col("n").cast("double").alias("_w"),
    )
    cum = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bins = bins.withColumn("_cw", F.sum("_w").over(cum)).withColumn(
        "_cp", F.sum("_pos").over(cum)
    )
    lo = bins.select(
        *[F.col(c).alias(f"_l_{c}") for c in keys],
        F.col("bin").alias("_i"),
        F.col("_w").alias("_wi"),
        F.col("_pos").alias("_pi"),
        F.col("_cw").alias("_cwi"),
        F.col("_cp").alias("_cpi"),
    )
    hi = bins.select(
        *[F.col(c).alias(f"_r_{c}") for c in keys],
        "bin",
        "n",
        "mean_score",
        "frac_positive",
        F.col("_cw").alias("_cwj"),
        F.col("_cp").alias("_cpj"),
        F.col("bin").alias("_j"),
    )
    cond = F.col("_i") <= F.col("_j")
    for c in keys:
        cond = cond & (F.col(f"_l_{c}") == F.col(f"_r_{c}"))
    pairs = lo.join(hi, cond).withColumn(
        "_avg",
        (F.col("_cpj") - F.col("_cpi") + F.col("_pi"))
        / (F.col("_cwj") - F.col("_cwi") + F.col("_wi")),
    )
    kcols = [f"_r_{c}" for c in keys]
    runmax = (
        Window.partitionBy(*kcols, "_j")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # suffix-min as a reversed growing frame (_j is unique per (_i,key)
    # so row order is total): unboundedFollowing frames are rescanned
    # per row by Spark — O(n^2) in the partition.
    runmin = (
        Window.partitionBy(*kcols, "_i")
        .orderBy(F.desc("_j"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fitted = (
        pairs.withColumn("_a", F.max("_avg").over(runmax))
        .withColumn("_iso", F.min("_a").over(runmin))
        .filter(F.col("_i") == F.col("_j"))
    )
    return fitted.select(
        *[F.col(f"_r_{c}").alias(c) for c in keys],
        "bin",
        "n",
        "mean_score",
        "frac_positive",
        F.col("_iso").alias("iso_prob"),
    ).orderBy(*keys, "bin")


def interval_metrics(
    pred: DataFrame,
    actuals: DataFrame,
    *,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    lower_col: str = "yhat_lower",
    upper_col: str = "yhat_upper",
    y_col: str = "y",
    nominal: float = 0.9,
) -> DataFrame:
    """Interval-forecast scorecard over the dates present in BOTH
    frames: the point metrics in `forecast_accuracy` say nothing
    about whether the BANDS are honest, this does —

    * ``coverage``   — fraction of actuals inside [lower, upper]; an
      honest ``nominal``-level band covers ≈ nominal.
    * ``mean_width`` — average band width (sharpness; coverage alone
      rewards infinitely wide bands).
    * ``winkler``    — the mean interval (Winkler 1972) score at
      ``nominal``: width + (2/α)·distance for each miss — the proper
      scoring rule that trades coverage against sharpness, lower is
      better.

    One join + one aggregation per key. Output per series:
    ``n, coverage, mean_width, winkler``.
    """
    if not 0.0 < nominal < 1.0:
        raise ValueError(f"nominal must be in (0, 1): {nominal}")
    series_cols = list(series_cols)
    alpha = 1.0 - float(nominal)
    p = pred.select(
        *series_cols,
        F.col(ds_col).alias("_ds"),
        F.col(lower_col).cast("double").alias("_lo"),
        F.col(upper_col).cast("double").alias("_hi"),
    )
    a = actuals.select(
        *series_cols, F.col(ds_col).alias("_ds"),
        F.col(y_col).cast("double").alias("_y"),
    )
    j = p.join(a, on=[*series_cols, "_ds"]).filter(
        F.col("_y").isNotNull() & F.col("_lo").isNotNull()
        & F.col("_hi").isNotNull()
    )
    inside = (F.col("_y") >= F.col("_lo")) & (F.col("_y") <= F.col("_hi"))
    width = F.col("_hi") - F.col("_lo")
    winkler = (
        width
        + F.when(
            F.col("_y") < F.col("_lo"),
            F.lit(2.0 / alpha) * (F.col("_lo") - F.col("_y")),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("_y") > F.col("_hi"),
            F.lit(2.0 / alpha) * (F.col("_y") - F.col("_hi")),
        ).otherwise(F.lit(0.0))
    )
    return j.groupBy(*series_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.avg(inside.cast("double")).alias("coverage"),
        F.avg(width).alias("mean_width"),
        F.avg(winkler).alias("winkler"),
    )


def quantile_loss(
    pred: DataFrame,
    actuals: DataFrame,
    *,
    taus: Iterable[float] = (0.05, 0.5, 0.95),
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    quantile_col: str = "quantile",
    yhat_col: str = "yhat",
    y_col: str = "y",
) -> DataFrame:
    """Mean pinball (quantile) loss per series per τ — the proper
    scoring rule for quantile forecasts (`forecast_quantiles`
    produces long-format (series, ds, quantile, yhat) rows):

        L_τ(y, q) = (y − q)·τ          if y ≥ q
                    (q − y)·(1 − τ)    otherwise

    minimized in expectation exactly when q is the true τ-quantile,
    so comparing models on pinball loss is calibration-safe where
    MAE on a quantile column is not. One join + one aggregation.

    Output: (series, quantile, n, pinball).
    """
    taus = [float(t) for t in taus]
    for t in taus:
        if not 0.0 < t < 1.0:
            raise ValueError(f"every tau must be in (0, 1): {taus}")
    series_cols = list(series_cols)
    p = pred.filter(F.col(quantile_col).isin(taus)).select(
        *series_cols,
        F.col(ds_col).alias("_ds"),
        F.col(quantile_col).cast("double").alias("quantile"),
        F.col(yhat_col).cast("double").alias("_q"),
    )
    a = actuals.select(
        *series_cols, F.col(ds_col).alias("_ds"),
        F.col(y_col).cast("double").alias("_y"),
    )
    j = p.join(a, on=[*series_cols, "_ds"]).filter(F.col("_y").isNotNull())
    loss = F.when(
        F.col("_y") >= F.col("_q"),
        (F.col("_y") - F.col("_q")) * F.col("quantile"),
    ).otherwise((F.col("_q") - F.col("_y")) * (1.0 - F.col("quantile")))
    return j.groupBy(*series_cols, "quantile").agg(
        F.count("*").cast("long").alias("n"),
        F.avg(loss).alias("pinball"),
    )


def conformalize(
    pred: DataFrame,
    calibration: DataFrame,
    *,
    alpha: float = 0.1,
    series_cols: Iterable[str] = ("series_id",),
    ds_col: str = "ds",
    yhat_col: str = "yhat",
    y_col: str = "y",
) -> DataFrame:
    """Split-conformal prediction bands (Vovk et al.; the
    Lei-Wasserman split recipe): in-sample residual quantiles
    UNDER-cover out of sample (exactly what `interval_metrics` flags
    on short series); the conformal fix scores a held-out CALIBRATION
    window and widens symmetric bands by the finite-sample-valid
    quantile of the absolute errors there:

        q̂ = the k-th smallest of {|y_i − ŷ_i|},  k = ⌈(n+1)(1−α)⌉

    which guarantees ≥ 1−α marginal coverage on exchangeable future
    points — a distribution-free statement no residual-quantile band
    makes. When k > n (calibration too small for the requested
    level) the honest answer is an infinite band; this implementation
    clamps to the max score and flags it (``exact_guarantee =
    false``) rather than silently pretending.

    Plan: one join (pred ⋈ calibration) → one ordered rank window
    over the calibration-sized score table → the k-th row joins back
    onto every pred row (broadcast, per-series one row). Output: pred
    plus ``conformal_lower, conformal_upper, q_hat, exact_guarantee``.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    series_cols = list(series_cols)
    p = pred.select(
        *series_cols, F.col(ds_col).alias("_ds"),
        F.col(yhat_col).cast("double").alias("_yhat"),
    )
    c = calibration.select(
        *series_cols, F.col(ds_col).alias("_ds"),
        F.col(y_col).cast("double").alias("_y"),
    )
    scores = (
        p.join(c, on=[*series_cols, "_ds"])
        .filter(F.col("_y").isNotNull())
        .select(
            *series_cols,
            F.abs(F.col("_y") - F.col("_yhat")).alias("_s"),
            F.col("_ds"),
        )
    )
    w = Window.partitionBy(*series_cols).orderBy(
        F.col("_s").asc(), F.col("_ds").asc()
    )
    ranked = scores.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(*series_cols))
    )
    k = F.ceil((F.col("_n") + 1) * F.lit(1.0 - float(alpha)))
    qhat = (
        ranked.withColumn("_k", k)
        .filter(
            (F.col("_rk") == F.least(F.col("_k"), F.col("_n")))
        )
        .select(
            *series_cols,
            F.col("_s").alias("q_hat"),
            (F.col("_k") <= F.col("_n")).alias("exact_guarantee"),
        )
    )
    out = pred.join(F.broadcast(qhat), on=series_cols)
    return out.withColumn(
        "conformal_lower", F.col(yhat_col) - F.col("q_hat")
    ).withColumn("conformal_upper", F.col(yhat_col) + F.col("q_hat"))


def gains_table(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
    keys: list[str] | None = None,
) -> DataFrame:
    """Decile gains / lift table — the campaign-targeting view of a
    classifier (`classification_metrics` gives AUC; this says "mail
    the top 2 deciles, capture X% of responders"):

    rows ranked into ``n_bins`` score bands via QUANTILE BOUNDARIES
    (one percentile aggregation broadcast back — no global ntile
    sort, the same scale-right scoring as `rfm_scores`; boundary ties
    all land in the lower band), then per band: size, positives,
    response rate, cumulative capture of all positives walking from
    the TOP band down, and lift = band rate / base rate.

    Output per key: (bin 1..n_bins — 1 = highest scores, n,
    positives, response_rate, cum_capture, lift).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    keys = list(keys or [])
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("double")
    base = scored.filter(s.isNotNull() & lab.isNotNull()).select(
        *keys, s.alias("_s"), lab.alias("_y")
    )
    qs = [i / n_bins for i in range(1, n_bins)]
    qlit = "array(" + ", ".join(repr(q) for q in qs) + ")"
    bounds = base.groupBy(*keys).agg(
        F.expr(f"percentile(_s, {qlit})").alias("_b")
    )
    d = (
        base.join(F.broadcast(bounds), on=keys)
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    # bin 1 = TOP scores: count how many boundaries the score exceeds
    above = F.lit(0)
    for i in range(1, n_bins):
        above = above + (F.col("_s") > F.element_at(F.col("_b"), i)).cast("int")
    d = d.withColumn("bin", F.lit(n_bins) - above)
    per = d.groupBy(*keys, "bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_y").cast("double").alias("_pos"),
    )
    part = keys if keys else [F.lit(1)]
    wcum = (
        Window.partitionBy(*part)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*part)
    rate = F.col("_pos") / F.col("n")
    base_rate = F.sum("_pos").over(wtot) / F.sum("n").over(wtot)
    return per.select(
        *keys,
        "bin",
        "n",
        F.col("_pos").cast("long").alias("positives"),
        rate.alias("response_rate"),
        F.try_divide(
            F.sum("_pos").over(wcum), F.sum("_pos").over(wtot)
        ).alias("cum_capture"),
        F.try_divide(rate, base_rate).alias("lift"),
    )
