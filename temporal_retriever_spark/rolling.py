"""Rolling / sliding per-series operators: moving aggregates, EWMA,
rolling z-score anomaly flags, gap filling with interpolation, and
classical seasonal decomposition.

The reference's only windowed computation is the tumbling-bucket
aggregate (app.py:89, core.py:30-59) — it has no sliding windows at
all. These operators extend the engine with the standard time-series
toolkit, all expressed as native window functions / HOFs so they stay
inside whole-stage codegen.

Scale design: every operator here is ONE shuffle on the series key
followed by a per-partition sort — the minimal plan for ordered
per-series computation. Frames are row- or range-bounded (never
unbounded-both-sides), so Spark's sliding WindowExec streams each
partition without materializing it. Nothing collects to the driver;
a billion series parallelize across executors by key.
"""

from __future__ import annotations

import warnings
from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from temporal_retriever_spark.grains import grain_interval, interval_seconds


def warn_keyless(op: str) -> None:
    """Keyless ordered windows are correct but single-partition: the
    whole series sorts on ONE task. Inherent to a global ordered
    series — the scale path is per-series keys. Warn so a 100-TB
    caller notices before the plan runs."""
    warnings.warn(
        f"{op}: empty series_cols/keys — the ordered window runs in a "
        f"single partition (correct, but not a scale path); supply "
        f"per-series key columns to parallelize",
        RuntimeWarning,
        stacklevel=3,
    )


def _series_window(series_cols: Iterable[str], ts_col: str) -> Window:
    cols = list(series_cols)
    if not cols:
        warn_keyless("series window")
    w = Window.partitionBy(*cols) if cols else Window.partitionBy(F.lit(1))
    return w.orderBy(ts_col)


#: rolling aggregation name -> window aggregate builder (shared by the
#: row-frame and range-frame variants)
_ROLLING_AGGS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
    "count": F.count,
}


def _apply_rolling_aggs(df, frame, value_col, aggs, min_periods=1):
    col = F.col(value_col)
    n_in_frame = F.count(col).over(frame)
    out = df
    for agg in aggs:
        a = agg.strip().lower()
        if a not in _ROLLING_AGGS:
            raise ValueError(f"unsupported rolling aggregation: {agg!r}")
        expr = _ROLLING_AGGS[a](col).over(frame)
        if a != "count" and min_periods > 1:
            expr = F.when(n_in_frame >= min_periods, expr)
        out = out.withColumn(f"rolling_{a}", expr)
    return out


def rolling_aggregate(
    df: DataFrame,
    *,
    window: int,
    aggs: Iterable[str] = ("mean",),
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
    min_periods: int = 1,
) -> DataFrame:
    """Trailing moving aggregates over the last ``window`` rows
    (current row inclusive): ``rolling_<agg>`` columns for each of
    ``mean``, ``sum``, ``min``, ``max``, ``std``, ``count``.

    ``min_periods`` nulls the result until that many rows are in the
    frame (pandas ``rolling(min_periods=...)`` semantics). ``std`` is
    sample std (ddof=1), the engine-wide convention (A3).
    """
    frame = _series_window(series_cols, ts_col).rowsBetween(-(window - 1), 0)
    return _apply_rolling_aggs(df, frame, value_col, aggs, min_periods)


def rolling_aggregate_time(
    df: DataFrame,
    *,
    window: str,
    aggs: Iterable[str] = ("mean",),
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """Time-interval trailing aggregates: the frame is all rows within
    ``window`` (e.g. ``"7 days"``, ``"2 hours"``) at or before each
    row's timestamp — the right rolling semantics for IRREGULAR series,
    where a row-count frame silently spans wildly different durations.

    Implemented as a range frame over epoch seconds (micro-precision),
    inclusive on both ends: [ts − window, ts]. Same output columns as
    ``rolling_aggregate``. One window shuffle; RangeFrame streams each
    partition like the row-frame variant.
    """
    cols = list(series_cols)
    if not cols:
        warn_keyless("rolling_aggregate_time")
    # order by epoch MICROS (long): rangeBetween requires integral
    # bounds, and micros is the engine's native timestamp precision
    w = (
        (Window.partitionBy(*cols) if cols else Window.partitionBy(F.lit(1)))
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
    )
    # rangeBetween needs a literal bound: Python-side interval parse
    # (grains.interval_seconds — validated, timezone-independent)
    total = interval_seconds(window)
    frame = w.rangeBetween(-int(total * 1_000_000), 0)
    return _apply_rolling_aggs(df, frame, value_col, aggs)


def ewma(
    df: DataFrame,
    *,
    alpha: float,
    window: int = 64,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average, truncated to the last
    ``window`` rows.

    pandas ``ewm(alpha=..., adjust=True, ignore_na=True)`` semantics on
    the truncated frame: ewma_t = Σ_{j=0..m-1} (1-α)^j · y_{t-j} /
    Σ_{j} (1-α)^j where m = min(t+1, window), with j counting NON-NULL
    observations (nulls are compressed out of the weight ladder —
    ``ignore_na=True``, not the pandas default which decays weights
    across the gap). With the default window=64 and any
    α ≥ 0.07, the dropped tail weight (1-α)^64 < 1e-2 · α of the mass —
    and unlike the untruncated recursion this form is a *frame-local*
    computation: collect the frame into an array (bounded, ≤ window
    values) and reduce it with the ``aggregate`` HOF, entirely JVM-side.
    An untruncated EWMA is inherently sequential per series; the
    truncated form is what scales, and is the standard practice for
    streaming monitoring.

    The fold walks newest→oldest (``reverse`` of the collected frame),
    multiplying the running weight by (1-α) each step — numerically
    stable (weights only shrink).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    frame = _series_window(series_cols, ts_col).rowsBetween(-(window - 1), 0)
    arr = F.reverse(F.collect_list(value_col).over(frame))
    acc0 = F.struct(
        F.lit(0.0).alias("num"), F.lit(0.0).alias("den"), F.lit(1.0).alias("pw")
    )
    folded = F.aggregate(
        arr,
        acc0,
        lambda acc, x: F.struct(
            (acc["num"] + x * acc["pw"]).alias("num"),
            (acc["den"] + acc["pw"]).alias("den"),
            (acc["pw"] * F.lit(1.0 - alpha)).alias("pw"),
        ),
        # ANSI-safe: an all-null frame collects an empty array -> den=0
        lambda acc: F.when(acc["den"] > 0, acc["num"] / acc["den"]),
    )
    return df.withColumn(out_col, folded)


def rolling_quantile(
    df: DataFrame,
    *,
    window: int,
    q: float | Iterable[float] = 0.5,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
    min_periods: int = 1,
) -> DataFrame:
    """Trailing rolling quantile(s) over the last ``window`` rows
    (current row inclusive) — linear interpolation between order
    statistics (type-7 / ``quantile_cont`` semantics, what pandas,
    numpy and SQL engines default to), so results mirror across
    engines exactly.

    For each requested q a ``rolling_q<pct>`` column is added (q=0.5 →
    ``rolling_q50``, q=0.975 → ``rolling_q97_5`` — dots become
    underscores for SQL-safe names). Nulls are excluded from the frame
    (quantile of the observed values); results are null until
    ``min_periods`` observations.

    The frame is collected into a bounded sorted array once and every
    quantile reads order statistics from it with ``element_at`` —
    O(window log window) JVM work per row, one window shuffle per
    series, no Python. (An exact distributed quantile over sliding
    frames is inherently per-row; the bounded-frame collect IS the
    scalable formulation, same as ``anomaly_robust``'s median/MAD.)
    """
    qs = [q] if isinstance(q, (int, float)) else list(q)
    for v in qs:
        if not 0.0 <= float(v) <= 1.0:
            raise ValueError(f"quantile out of range [0, 1]: {v}")
    frame = _series_window(series_cols, ts_col).rowsBetween(-(window - 1), 0)
    arr = F.array_sort(F.collect_list(value_col).over(frame))
    out = df.withColumn("_rq_arr", arr).withColumn("_rq_n", F.size(F.col("_rq_arr")))
    n = F.col("_rq_n")
    for v in qs:
        pos = F.lit(float(v)) * (n - 1).cast("double")
        lo = F.floor(pos).cast("int")
        frac = pos - lo.cast("double")
        lo_val = F.element_at(F.col("_rq_arr"), lo + 1)
        hi_val = F.element_at(
            F.col("_rq_arr"), F.least(lo + 2, n).cast("int")
        )
        interp = lo_val + frac * (hi_val - lo_val)
        label = "rolling_q" + f"{float(v) * 100:g}".replace(".", "_")
        out = out.withColumn(
            label, F.when(n >= min_periods, interp)
        )
    return out.drop("_rq_arr", "_rq_n")


def anomaly_zscore(
    df: DataFrame,
    *,
    window: int = 30,
    threshold: float = 3.0,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
    min_periods: int = 5,
) -> DataFrame:
    """Rolling z-score anomaly detection.

    Each point is scored against the trailing ``window`` rows
    *excluding itself* (frame [-window, -1]) so a spike cannot mask
    itself by inflating its own baseline. Emits ``zscore`` (null until
    ``min_periods`` prior points exist or when the baseline std is 0)
    and ``is_anomaly`` (null-safe boolean: null zscore → false).

    This is the detector a monitoring pipeline runs continuously; the
    same expressions run under Structured Streaming via the batch
    ``foreachBatch`` rollup since sliding frames need ordered state.
    """
    base = _series_window(series_cols, ts_col).rowsBetween(-window, -1)
    mean = F.avg(value_col).over(base)
    std = F.stddev_samp(value_col).over(base)
    n = F.count(value_col).over(base)
    z = F.when(
        (n >= min_periods) & std.isNotNull() & (std != 0),
        (F.col(value_col) - mean) / std,
    )
    return (
        df.withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
        )
    )


def fill_gaps(
    df: DataFrame,
    *,
    grain: str,
    method: str = "linear",
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """Densify each series to its full grain grid and fill missing
    values.

    Missing buckets between each series' min and max timestamp are
    generated natively (per-series ``sequence`` + ``explode`` — the
    same distributed grid construction as ``align.future_grid``; the
    grid never touches the driver). Fill methods:

    * ``"linear"`` — time-weighted linear interpolation between the
      previous and next observed values (pandas
      ``interpolate(method="time")`` semantics); endpoints stay null.
    * ``"ffill"`` — carry the previous observation forward.
    * ``"zero"`` — fill with 0.0.
    * ``"null"`` — densify only, keep nulls.

    Output: ``(*series_cols, ts_col, value_col, was_filled)``.

    Plan: one groupBy shuffle for bounds, a broadcast-friendly
    left join of grid×observations on the series+ts key, then one
    window pass for the neighbor lookup — the grid join and window
    shuffle share the series-key partitioning.

    Month grains use month-stepped sequences; fixed grains step by the
    grain interval. Works on timestamp or date ``ts_col``.
    """
    if method not in ("linear", "ffill", "zero", "null"):
        raise ValueError(f"unsupported fill method: {method!r}")
    from temporal_retriever_spark.grains import normalize_grain

    grain = normalize_grain(grain)
    series_cols = list(series_cols)
    ts_type = dict(df.dtypes)[ts_col]

    bounds = df.groupBy(*series_cols).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    # integer-indexed stepping (the future_grid approach): INTERVAL
    # MONTH is variable-width, so sequence(lo, hi, step) drifts off the
    # month-END labels the M grain buckets to; last_day(add_months(..))
    # keeps last-day-ness exactly. Input must be bucketed at `grain`
    # (the bucket_aggregate output shape).
    lo, hi = F.col("_lo"), F.col("_hi")
    if grain == "M":
        n_steps = F.months_between(hi.cast("date"), lo.cast("date")).cast("int")
    elif grain in ("D", "W"):
        days = {"D": 1, "W": 7}[grain]
        n_steps = (F.datediff(hi.cast("date"), lo.cast("date")) / days).cast("int")
    else:
        secs = {"H": 3600, "min": 60}[grain]
        n_steps = (
            (hi.cast("timestamp").cast("double") - lo.cast("timestamp").cast("double"))
            / secs
        ).cast("int")
    k = F.col("_k")
    if grain == "M":
        tick = F.last_day(F.add_months(lo.cast("date"), k))
    elif grain in ("D", "W"):
        tick = F.date_add(lo.cast("date"), k * {"D": 1, "W": 7}[grain])
    else:
        tick = lo.cast("timestamp") + k * F.expr(grain_interval(grain))
    grid = bounds.select(
        *series_cols, "_lo", "_hi",
        F.explode(F.sequence(F.lit(0), n_steps)).alias("_k"),
    ).select(*series_cols, tick.cast(ts_type).alias(ts_col))
    dense = grid.join(
        df.select(*series_cols, ts_col, value_col),
        on=[*series_cols, ts_col],
        how="left",
    )
    was_filled = F.col(value_col).isNull()
    if method == "null":
        filled = F.col(value_col)
    elif method == "zero":
        filled = F.coalesce(F.col(value_col), F.lit(0.0))
    else:
        w = _series_window(series_cols, ts_col)
        prev_w = w.rowsBetween(Window.unboundedPreceding, 0)
        # next-observation lookup via the reversed growing frame (grid
        # ts is unique per series, so reversal is exact): a frame
        # ending at unboundedFollowing is rescanned per row by Spark —
        # O(n^2) in the series length.
        cols = list(series_cols)
        next_w = (
            (Window.partitionBy(*cols) if cols else Window.partitionBy(F.lit(1)))
            .orderBy(F.desc(ts_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        obs = F.when(
            F.col(value_col).isNotNull(),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("t"),
                F.col(value_col).alias("v"),
            ),
        )
        dense = dense.withColumn(
            "_prev", F.last(obs, ignorenulls=True).over(prev_w)
        )
        if method == "ffill":
            filled = F.coalesce(F.col(value_col), F.col("_prev.v"))
        else:
            dense = dense.withColumn(
                "_next", F.last(obs, ignorenulls=True).over(next_w)
            )
            t = F.col(ts_col).cast("timestamp")
            p_t, p_v = F.col("_prev.t"), F.col("_prev.v")
            n_t, n_v = F.col("_next.t"), F.col("_next.v")
            frac = (t.cast("double") - p_t.cast("double")) / (
                n_t.cast("double") - p_t.cast("double")
            )
            # the n_t != p_t guard keeps the ANSI division inside the
            # conditional branch (observed rows have prev==next==self)
            interp = F.when(
                p_t.isNotNull() & n_t.isNotNull() & (n_t != p_t),
                p_v + (n_v - p_v) * frac,
            )
            filled = F.coalesce(F.col(value_col), interp)
    return dense.select(
        *series_cols,
        ts_col,
        filled.alias(value_col),
        was_filled.alias("was_filled"),
    )


def decompose(
    df: DataFrame,
    *,
    period: int,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """Classical additive seasonal decomposition (moving-average flavor,
    statsmodels ``seasonal_decompose(model="additive")`` structure):

    * ``trend``     — centered moving average over ``period`` rows.
      Odd period: plain mean of the symmetric frame. Even period: the
      standard 2×MA (half-weight endpoints) via two stacked means.
    * ``seasonal``  — per seasonal-position mean of the detrended
      series, re-centered to sum to zero over one period.
    * ``resid``     — y − trend − seasonal (null where trend is null,
      i.e. the half-period edges, like statsmodels).

    The seasonal position is ``(row_number − 1) mod period`` per
    series, so the operator works for any grain/period combination
    without calendar assumptions.

    Plan: one series-key window shuffle serves the row numbering,
    trend frames, and the final join back; the seasonal means add one
    aggregate on (series, position) — two shuffles total.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2: {period}")
    series_cols = list(series_cols)
    w = _series_window(series_cols, ts_col)
    half = period // 2
    if period % 2 == 1:
        frame = w.rowsBetween(-half, half)
        n = F.count(value_col).over(frame)
        trend = F.when(n == period, F.avg(value_col).over(frame))
    else:
        # 2xMA: mean of the two length-`period` frames offset by one,
        # equivalently half-weighted endpoints over 2*half+1 rows
        f1 = w.rowsBetween(-half, half - 1)
        f2 = w.rowsBetween(-half + 1, half)
        n1 = F.count(value_col).over(f1)
        n2 = F.count(value_col).over(f2)
        trend = F.when(
            (n1 == period) & (n2 == period),
            (F.avg(value_col).over(f1) + F.avg(value_col).over(f2)) / 2.0,
        )
    pos = ((F.row_number().over(w) - 1) % period).alias("_pos")
    base = df.withColumn("_pos", pos).withColumn("trend", trend)
    detrended = base.withColumn("_d", F.col(value_col) - F.col("trend"))
    smeans = detrended.groupBy(*series_cols, "_pos").agg(
        F.avg("_d").alias("_smean")
    )
    centered = smeans.withColumn(
        "seasonal",
        F.col("_smean")
        - F.avg("_smean").over(
            Window.partitionBy(*series_cols) if series_cols
            else Window.partitionBy(F.lit(1))
        ),
    ).drop("_smean")
    return (
        # seasonal frame is series x period rows; small enough that AQE
        # broadcasts it on fixtures, and a co-partitioned shuffle join
        # (same series key) when series count is huge -- no hint needed
        detrended.join(centered, on=[*series_cols, "_pos"])
        .withColumn("resid", F.col("_d") - F.col("seasonal"))
        .select(
            *series_cols, ts_col, value_col, "trend", "seasonal", "resid"
        )
    )


def cusum_drift(
    df: DataFrame,
    *,
    threshold: float = 5.0,
    drift: float = 0.5,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """One-sided CUSUM level-shift detection (Page's test), fully
    window-native.

    The textbook recursion S_t = max(0, S_{t−1} + z_t − drift) is
    sequential, but it has a closed prefix form: with
    P_t = Σ_{i≤t}(z_i − drift),  S_t = P_t − min_{i≤t} P_i — a prefix
    sum minus a running minimum, both plain window aggregates. The
    downward statistic uses the mirrored identity. z is the per-series
    standardized value (full-series mean/std, sample ddof=1), so
    ``threshold`` and ``drift`` are in sigma units (classic CUSUM
    h≈4-5σ, k≈0.5σ).

    Output: input rows + ``cusum_up``, ``cusum_down``, ``is_shift``
    (either statistic above threshold). One window shuffle per series —
    the same minimal plan as every sliding operator here.
    """
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols)
    ws = w.orderBy(ts_col)
    run = ws.rowsBetween(Window.unboundedPreceding, 0)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(std.isNotNull() & (std != 0), (F.col(value_col) - mean) / std)
    d = df.withColumn("_z", z)
    p_up = F.sum(F.col("_z") - F.lit(float(drift))).over(run)
    p_dn = F.sum(F.col("_z") + F.lit(float(drift))).over(run)
    out = (
        d.withColumn("_pu", p_up)
        .withColumn("_pd", p_dn)
        .withColumn(
            "cusum_up",
            F.col("_pu") - F.least(F.min("_pu").over(run), F.lit(0.0)),
        )
        .withColumn(
            "cusum_down",
            -(F.col("_pd") - F.greatest(F.max("_pd").over(run), F.lit(0.0))),
        )
    )
    return out.select(
        *df.columns,
        F.col("cusum_up"),
        F.col("cusum_down"),
        (
            F.coalesce(F.col("cusum_up") > threshold, F.lit(False))
            | F.coalesce(F.col("cusum_down") > threshold, F.lit(False))
        ).alias("is_shift"),
    )


def anomaly_robust(
    df: DataFrame,
    *,
    window: int = 30,
    threshold: float = 3.5,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
    min_periods: int = 5,
) -> DataFrame:
    """Robust rolling anomaly detection: modified z-score on the
    trailing window's median/MAD instead of mean/std.

    A mean/std baseline (``anomaly_zscore``) is itself corrupted by
    outliers inside the window; the median absolute deviation is not
    (50% breakdown point). Score = 0.6745·(y − median)/MAD — the
    Iglewicz-Hoben modified z-score, flag at the conventional 3.5.

    The trailing frame [-window, -1] (self-excluding, like
    ``anomaly_zscore``) is collected per row into a bounded array and
    both the median and the MAD — the median of absolute deviations
    from that median — are computed with JVM array HOFs
    (``array_sort`` + element picks). No Python; O(window log window)
    per row; one window shuffle per series. MAD = 0 (constant window)
    yields a null score.
    """
    series_cols = list(series_cols)
    frame = _series_window(series_cols, ts_col).rowsBetween(-window, -1)
    arr = F.array_sort(F.collect_list(value_col).over(frame))
    n = F.size(arr)

    def _median_of(sorted_arr, size):
        mid = (size / F.lit(2)).cast("int")
        odd = size % 2 == 1
        return F.when(
            odd, F.element_at(sorted_arr, mid + 1)
        ).otherwise(
            (F.element_at(sorted_arr, mid) + F.element_at(sorted_arr, mid + 1))
            / 2.0
        )

    d = df.withColumn("_arr", arr).withColumn("_n", n)
    med = _median_of(F.col("_arr"), F.col("_n"))
    d = d.withColumn("_med", F.when(F.col("_n") >= min_periods, med))
    devs = F.array_sort(
        F.transform(F.col("_arr"), lambda v: F.abs(v - F.col("_med")))
    )
    mad = _median_of(devs, F.col("_n"))
    d = d.withColumn("_mad", F.when(F.col("_med").isNotNull(), mad))
    score = F.when(
        F.col("_mad").isNotNull() & (F.col("_mad") != 0),
        F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad"),
    )
    return (
        d.withColumn("robust_zscore", score)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("robust_zscore")) > threshold, F.lit(False)),
        )
        .drop("_arr", "_n", "_med", "_mad")
    )


def rolling_corr(
    df: DataFrame,
    *,
    window: int,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    y_col: str = "y",
    x_col: str = "x",
    min_periods: int = 3,
    out_col: str = "rolling_corr",
) -> DataFrame:
    """Trailing rolling Pearson correlation between two aligned columns
    over the last ``window`` rows — the local (windowed) complement of
    the global ``diagnostics.ccf``: where a regime change breaks a
    relationship, the rolling r shows *when*.

    Computed from the five frame sums (Σx, Σy, Σxy, Σx², Σy²) so the
    arithmetic mirrors in any SQL engine; null until ``min_periods``
    rows or when either column is constant in the frame. One window
    shuffle per series.
    """
    frame = _series_window(series_cols, ts_col).rowsBetween(-(window - 1), 0)
    # pairwise-complete: a row where either side is null contributes to
    # NO sum (otherwise n and the sums cover different row sets and the
    # result is not the Pearson r of the valid pairs)
    valid = F.col(y_col).isNotNull() & F.col(x_col).isNotNull()
    y = F.when(valid, F.col(y_col))
    x = F.when(valid, F.col(x_col))
    n = F.count(x).over(frame).cast("double")
    sx = F.sum(x).over(frame)
    sy = F.sum(y).over(frame)
    sxy = F.sum(x * y).over(frame)
    sxx = F.sum(x * x).over(frame)
    syy = F.sum(y * y).over(frame)
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    r = F.when(
        (n >= min_periods) & (vx > 0) & (vy > 0),
        cov / F.sqrt(vx * vy),
    )
    return df.withColumn(out_col, r)


def winsorize(
    df: DataFrame,
    *,
    lower: float = 0.05,
    upper: float = 0.95,
    series_cols: Iterable[str] = ("series_id",),
    value_col: str = "y",
    out_col: str | None = None,
) -> DataFrame:
    """Per-series winsorization: clamp values into the [lower, upper]
    empirical quantile envelope — the standard outlier-taming
    preprocessor before fitting anything least-squares-shaped
    (forecasts, Granger, correlation), where one spike can own the
    fit. Unlike ``anomaly_zscore`` this doesn't flag, it repairs.

    Output: input columns plus ``out_col`` (default
    ``{value_col}_wins``) and the per-series ``q_lo``/``q_hi`` bounds
    used. Exact quantiles via one partition-wide percentile window —
    a single hash-partition shuffle per series key, no ordering
    required, no Python.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1: ({lower}, {upper})")
    series_cols = list(series_cols)
    out_col = out_col or f"{value_col}_wins"
    w = Window.partitionBy(*series_cols)
    qarr = F.percentile(
        F.col(value_col).cast("double"),
        F.array(F.lit(float(lower)), F.lit(float(upper))),
    ).over(w)
    d = df.withColumn("_qb", qarr)
    return (
        d.withColumn("q_lo", F.col("_qb")[0])
        .withColumn("q_hi", F.col("_qb")[1])
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col).cast("double"), F.col("q_lo")), F.col("q_hi")),
        )
        .drop("_qb")
    )


def anomaly_seasonal(
    df: DataFrame,
    *,
    period: int,
    threshold: float = 3.5,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """Seasonality-aware anomaly detection (the seasonal-ESD family,
    Hochenbaum et al. 2017): decompose first, score the REMAINDER.

    A raw z/MAD score flags every seasonal peak as an outlier; the
    right test removes trend + seasonality (``decompose``) and applies
    the robust modified z-score to the residual: score =
    0.6745·(resid − median)/MAD with per-series median/MAD over the
    whole residual series (50% breakdown — the residual of a true
    anomaly doesn't corrupt its own baseline the way it corrupts a
    mean/std).

    Output: input keys + (ts, y, trend, seasonal, resid, score,
    is_anomaly). Rows at the half-period edges have NULL resid (no
    trend there, same as ``decompose``/statsmodels) and NULL
    score/flag. A zero-MAD series (constant residual) yields NULL
    scores — nothing to flag against.

    Plan: the two decompose shuffles + ONE more series-key window pass
    for median/MAD (both percentiles share the exchange). Everything
    native — no Python.
    """
    if not threshold > 0:
        raise ValueError(f"threshold must be > 0: {threshold}")
    series_cols = list(series_cols)
    dec = decompose(
        df,
        period=period,
        series_cols=series_cols,
        ts_col=ts_col,
        value_col=value_col,
    )
    if series_cols:
        w = Window.partitionBy(*series_cols)
    else:
        warn_keyless("seasonal anomaly scoring")
        w = Window.partitionBy(F.lit(1))
    med = F.percentile(F.col("resid"), F.lit(0.5)).over(w)
    d = dec.withColumn("_med", med)
    mad = F.percentile(F.abs(F.col("resid") - F.col("_med")), F.lit(0.5)).over(w)
    d = d.withColumn("_mad", mad)
    score = F.when(
        F.col("resid").isNotNull() & (F.col("_mad") > 0),
        F.lit(0.6745) * (F.col("resid") - F.col("_med")) / F.col("_mad"),
    )
    return (
        d.withColumn("score", score)
        .withColumn(
            "is_anomaly",
            F.when(
                F.col("score").isNotNull(),
                F.abs(F.col("score")) > F.lit(float(threshold)),
            ),
        )
        .drop("_med", "_mad")
    )


def rolling_distinct(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str = "ds",
    series_cols: Iterable[str] = ("series_id",),
    window_buckets: int = 7,
    grain: str = "D",
    method: str = "sketch",
    lgk: int = 12,
) -> DataFrame:
    """Rolling distinct-entity counts (e.g. 7-day active users) per
    series bucket: (series…, ds, n_distinct).

    Distinct counts don't decompose over windows (yesterday's users
    overlap today's), so the naive plan re-scans ``window_buckets``
    days of raw events per output row. Both paths here reduce the
    corpus ONCE to per-bucket state and merge state over the window:

    * ``method="sketch"`` — the 100-TB path: one ``hll_sketch_agg``
      per (series, bucket) (Apache DataSketches HLL, mergeable,
      ~2^lgk bytes), then ONE range-window ``hll_union_agg`` merge.
      Shuffles carry kilobyte sketches, never entity ids; standard
      error ≈ 1.04/√2^lgk (~1.6% at the default lgk=12).
    * ``method="exact"`` — per-bucket ``collect_set`` then a window
      flatten+distinct. Exact, but window memory is the distinct-set
      size — the verification / small-cardinality path.

    The window is ``window_buckets`` buckets ending at (and including)
    the current one, range-based on event time — gaps in the calendar
    count as empty buckets, not skipped ones.
    """
    from temporal_retriever_spark.grains import bucket_expr, normalize_grain

    g = normalize_grain(grain)
    secs = {"D": 86400, "W": 7 * 86400, "H": 3600, "min": 60}.get(g)
    if secs is None:
        raise ValueError(
            f"grain {grain!r} has no fixed span for a range window "
            "(month windows: bucket to D and use window_buckets=28/30/31)"
        )
    if window_buckets < 1:
        raise ValueError(f"window_buckets must be >= 1: {window_buckets}")
    series_cols = list(series_cols)
    b = bucket_expr(ts_col, g)
    base = df.select(*series_cols, b.alias("_b"), F.col(entity_col))
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("_b").cast("timestamp").cast("long"))
        .rangeBetween(-(window_buckets - 1) * secs, 0)
    )
    if method == "sketch":
        daily = base.groupBy(*series_cols, "_b").agg(
            F.hll_sketch_agg(entity_col, F.lit(lgk)).alias("_sk")
        )
        return daily.select(
            *series_cols,
            F.col("_b").alias(ts_col),
            F.hll_sketch_estimate(F.hll_union_agg("_sk").over(w)).alias(
                "n_distinct"
            ),
        )
    if method == "exact":
        daily = base.groupBy(*series_cols, "_b").agg(
            F.collect_set(entity_col).alias("_set")
        )
        return daily.select(
            *series_cols,
            F.col("_b").alias(ts_col),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("_set").over(w)))
            ).cast("long").alias("n_distinct"),
        )
    raise ValueError(f"unknown method: {method!r} (use 'sketch' or 'exact')")


def decomposition_strength(
    decomposed: DataFrame,
    *,
    series_cols: Iterable[str] = ("series_id",),
    trend_col: str = "trend",
    seasonal_col: str = "seasonal",
    resid_col: str = "resid",
) -> DataFrame:
    """Trend / seasonal STRENGTH per series (Hyndman & Athanasopoulos
    fpp3 §4.3) from a `decompose` output — the forecastability-triage
    numbers that route a 100k-series fleet: strength ≈ 0 means the
    component explains nothing (use a cheap baseline), ≈ 1 means it
    dominates (fit the seasonal/trend model):

        F_trend    = max(0, 1 − Var(R) / Var(T + R))
        F_seasonal = max(0, 1 − Var(R) / Var(S + R))

    (population variances; rows where any component is NULL — the
    moving-average margins — are excluded, matching the fpp3
    treatment of the detrended window). ONE aggregation per series.

    Output per series: ``n, trend_strength, seasonal_strength``.
    """
    series_cols = list(series_cols)
    t = F.col(trend_col).cast("double")
    s = F.col(seasonal_col).cast("double")
    r = F.col(resid_col).cast("double")
    base = decomposed.filter(
        t.isNotNull() & s.isNotNull() & r.isNotNull()
    )
    agg = base.groupBy(*series_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.var_pop(r).alias("_vr"),
        F.var_pop(t + r).alias("_vtr"),
        F.var_pop(s + r).alias("_vsr"),
    )
    ft = F.greatest(
        F.lit(0.0), 1.0 - F.try_divide(F.col("_vr"), F.col("_vtr"))
    )
    fs = F.greatest(
        F.lit(0.0), 1.0 - F.try_divide(F.col("_vr"), F.col("_vsr"))
    )
    return agg.select(
        *series_cols,
        "n",
        ft.alias("trend_strength"),
        fs.alias("seasonal_strength"),
    )
