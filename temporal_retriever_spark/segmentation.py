"""Offline changepoint detection: binary segmentation over mean
shifts (Scott & Knott 1974; the standard baseline in the changepoint
literature, cf. Killick & Eckley's PELT paper for the taxonomy —
public literature).

Complements the ONLINE detectors (`rolling.cusum_drift` flags shifts
as they happen; `rolling.anomaly_*` flag points): binary segmentation
answers the retrospective question — "where did the level change, and
into which segments does this series split?"

Model: piecewise-constant mean. Splitting a segment [lo, hi] at k
reduces the squared error by

    gain(k) = (n_L·n_R / n) · (mean_L − mean_R)²

(the between-group sum of squares). The segment splits at the
best k when ``gain > penalty`` — with penalty-only stopping the final
breakpoint set is order-independent, so the batched distributed
recursion below computes exactly the classic sequential algorithm.

Scale design:

* Per-series prefix sums are computed ONCE (one window pass); every
  round's gains are pure expressions over them — no per-round windows,
  no re-scan of values.
* Each ROUND evaluates ALL open segments of ALL series in ONE job:
  the (tiny) segment table broadcasts against the prefix-sum rows, a
  rank window picks each segment's best split, and one small collect
  (one row per open segment) lets the driver update boundaries — the
  same bounded-driver-state round pattern as ``llm.dedup``'s
  connected components and ``llm.similarity.kmeans_fit``. Rounds are
  ≤ log₂(segments) for balanced splits, ≤ max_changepoints always.
* Driver state is segment boundaries only (ids + two ints each).

Determinism: ties in the argmax break toward the smallest k via an
explicit rank ordering, and the gain arithmetic uses one fixed
prefix-sum formula — the DuckDB oracle replays the identical
recursion (recursive CTE over a precomputed best-split table) and
matches bit-for-bit.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rfm_scores","binseg_changepoints", "segment_means"]


def _prefix(df, series_cols, ts_col, value_col):
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.select(
        *series_cols,
        F.col(ts_col),
        F.col(value_col).cast("double").alias("_y"),
        F.row_number().over(w).alias("_rn"),
        F.sum(F.col(value_col).cast("double")).over(run).alias("_ps"),
    )


def binseg_changepoints(
    df: DataFrame,
    *,
    penalty: float,
    min_segment: int = 2,
    max_changepoints: int = 32,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
    max_series: int = 100_000,
) -> DataFrame:
    """Detect mean-shift changepoints per series.

    Output: one row per accepted changepoint —
    ``(*series_cols, ts_col, cp_index, gain, seg_lo, seg_hi)`` where
    ``cp_index`` is the 1-based position of the LAST row of the left
    segment, ``ts_col`` its timestamp, and (seg_lo, seg_hi) the
    segment that was split. Empty result = no shift cleared
    ``penalty``.

    ``penalty`` is in squared-value units (the BSS gain is compared
    directly); a data-driven choice is ``c·σ̂²·ln n`` (BIC-style) with
    σ̂² a robust noise estimate — pass it explicitly so runs are
    deterministic and engine-mirrorable.

    NULL values are excluded from the index (they carry no mean
    information); ``min_segment`` keeps both children at least that
    long.

    DRIVER-STATE NOTE: segment bookkeeping (which (lo, hi) ranges are
    still open, per series) lives on the driver across rounds —
    O(n_series × max_changepoints) tuples plus one collect of
    per-series lengths. The per-round Spark work is fully distributed
    (the split evaluation never shuffles the rows), but the driver
    footprint grows linearly with series count, so ``max_series``
    (default 100k ≈ tens of MB of driver state) raises before a
    million-series frame silently OOMs the driver. Raise the cap
    explicitly if you have the driver memory for it.
    """
    if not penalty > 0:
        raise ValueError(f"penalty must be > 0: {penalty}")
    if min_segment < 1:
        raise ValueError(f"min_segment must be >= 1: {min_segment}")
    if max_changepoints < 1:
        raise ValueError(f"max_changepoints must be >= 1: {max_changepoints}")
    series_cols = list(series_cols)
    spark = df.sparkSession
    drop_key = False
    if not series_cols:
        # keyless global series: inject a constant key internally (the
        # split evaluation single-partitions one series — inherent to a
        # global ordered series, same note as rolling's keyless mode)
        df = df.withColumn("_series", F.lit(1))
        series_cols = ["_series"]
        drop_key = True
    rows = _prefix(
        df.filter(F.col(value_col).isNotNull()), series_cols, ts_col, value_col
    ).persist()
    try:
        lens = rows.groupBy(*series_cols).agg(F.max("_rn").alias("_n")).collect()
        if len(lens) > max_series:
            raise ValueError(
                f"binseg_changepoints: {len(lens)} series exceeds max_series="
                f"{max_series}; per-series segment bookkeeping lives on the "
                f"driver (see docstring) — raise max_series explicitly if the "
                f"driver has memory for it"
            )
        # segments keyed by the series tuple
        segs: dict[tuple, list[tuple[int, int]]] = {
            tuple(r[c] for c in series_cols): [(1, r["_n"])] for r in lens
        }
        accepted: dict[tuple, list[tuple[int, float, int, int]]] = {
            k: [] for k in segs
        }
        key_fields = ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}" for c in series_cols
        )
        for _round in range(max_changepoints):
            open_rows = [
                (*k, lo, hi)
                for k, lst in segs.items()
                for (lo, hi) in lst
                if hi - lo + 1 >= 2 * min_segment
                and len(accepted[k]) < max_changepoints
            ]
            if not open_rows:
                break
            seg_df = spark.createDataFrame(
                open_rows, f"{key_fields}, _lo int, _hi int"
            )
            # enrich the tiny segment table with ps[lo-1] and ps[hi]
            # (two id-keyed joins against the prefix rows), THEN
            # broadcast it once against the rows — candidate split
            # positions never shuffle
            ps_at = rows.select(
                *series_cols, F.col("_rn").alias("_at"), F.col("_ps").alias("_psv")
            )
            seg_full = (
                seg_df.withColumn("_at", F.col("_lo") - 1)
                .join(ps_at, on=[*series_cols, "_at"], how="left")
                .drop("_at")
                .withColumnRenamed("_psv", "_ps_lo")
                .withColumn("_ps_lo", F.coalesce("_ps_lo", F.lit(0.0)))
                .withColumn("_at", F.col("_hi"))
                .join(ps_at, on=[*series_cols, "_at"])
                .drop("_at")
                .withColumnRenamed("_psv", "_ps_hi")
            )
            j = rows.join(F.broadcast(seg_full), on=series_cols).filter(
                (F.col("_rn") >= F.col("_lo") + min_segment - 1)
                & (F.col("_rn") <= F.col("_hi") - min_segment)
            )
            n = (F.col("_hi") - F.col("_lo") + 1).cast("double")
            n_l = (F.col("_rn") - F.col("_lo") + 1).cast("double")
            n_r = (F.col("_hi") - F.col("_rn")).cast("double")
            sum_l = F.col("_ps") - F.col("_ps_lo")
            sum_all = F.col("_ps_hi") - F.col("_ps_lo")
            mean_l = sum_l / n_l
            mean_r = (sum_all - sum_l) / n_r
            gain = (n_l * n_r / n) * (mean_l - mean_r) * (mean_l - mean_r)
            wrank = Window.partitionBy(*series_cols, "_lo", "_hi").orderBy(
                F.col("_gain").desc(), F.col("_rn").asc()
            )
            best = (
                j.select(
                    *series_cols, "_lo", "_hi", "_rn", gain.alias("_gain")
                )
                .withColumn("_rank", F.row_number().over(wrank))
                .filter((F.col("_rank") == 1) & (F.col("_gain") > penalty))
                .collect()
            )
            if not best:
                break
            # driver update: replace each split segment with its
            # children. DETERMINISTIC order — highest gain first, ties
            # to the smaller split index — so a binding
            # max_changepoints cap always keeps the same set (collect()
            # row order is arbitrary). NOTE: the recursive-CTE oracle
            # mirror applies only while the cap does NOT bind (penalty-
            # only stopping); a binding cap keeps the top-gain splits.
            for r in sorted(best, key=lambda r: (-r["_gain"], r["_rn"])):
                k = tuple(r[c] for c in series_cols)
                if len(accepted[k]) >= max_changepoints:
                    continue
                lo, hi, cp, g = r["_lo"], r["_hi"], r["_rn"], r["_gain"]
                segs[k].remove((lo, hi))
                segs[k].extend([(lo, cp), (cp + 1, hi)])
                accepted[k].append((cp, g, lo, hi))
        cp_rows = [
            (*k, cp, g, lo, hi)
            for k, lst in accepted.items()
            for (cp, g, lo, hi) in lst
        ]
        if not cp_rows:
            out = (
                rows.select(*series_cols, ts_col)
                .limit(0)
                .select(
                    *series_cols,
                    ts_col,
                    F.lit(0).alias("cp_index"),
                    F.lit(0.0).alias("gain"),
                    F.lit(0).alias("seg_lo"),
                    F.lit(0).alias("seg_hi"),
                )
            )
            return out.drop("_series") if drop_key else out
        cp_df = spark.createDataFrame(
            cp_rows,
            f"{key_fields}, cp_index int, gain double, seg_lo int, seg_hi int",
        )
        out = (
            cp_df.join(
                rows.select(
                    *series_cols, F.col("_rn").alias("cp_index"), ts_col
                ),
                on=[*series_cols, "cp_index"],
            ).select(
                *series_cols, ts_col, "cp_index", "gain", "seg_lo", "seg_hi"
            )
        )
        return out.drop("_series") if drop_key else out
    finally:
        rows.unpersist()


def segment_means(
    df: DataFrame,
    changepoints: DataFrame,
    *,
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """Piecewise-constant fit implied by detected changepoints:
    (series, segment, start_rn, end_rn, n, mean).

    One range join of the (tiny, broadcast) sorted breakpoints against
    the rows + one aggregation — the companion that turns breakpoints
    into the segmentation itself.
    """
    series_cols = list(series_cols)
    rows = _prefix(
        df.filter(F.col(value_col).isNotNull()), series_cols, ts_col, value_col
    )
    bps = (
        changepoints.groupBy(*series_cols)
        .agg(F.array_sort(F.collect_list("cp_index")).alias("_bps"))
    )
    seg_of = F.size(
        F.filter(F.col("_bps"), lambda b: b < F.col("_rn"))
    )  # 0-based segment index = breakpoints strictly before rn
    return (
        rows.join(F.broadcast(bps), on=series_cols, how="left")
        .withColumn("_bps", F.coalesce(F.col("_bps"), F.array().cast("array<int>")))
        .withColumn("segment", seg_of)
        .groupBy(*series_cols, "segment")
        .agg(
            F.min("_rn").alias("start_rn"),
            F.max("_rn").alias("end_rn"),
            F.count("*").alias("n"),
            F.avg("_y").alias("mean"),
        )
    )


def rfm_scores(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 5,
) -> DataFrame:
    """RFM customer segmentation — the retention-marketing classic:
    Recency (days since last activity, vs the global observation
    end), Frequency (event count) and Monetary (value sum) per user,
    each scored 1..n_bins against the population's quantile
    boundaries, plus the standard segment labels on the (R, F) grid.

    Scale design: NO global ntile sort — the boundaries are ONE
    percentile aggregation over the user table (4 doubles per metric)
    broadcast back as literal comparisons, so scoring is a codegen'd
    projection; ties at a boundary all land in the lower bin
    (deterministic on any engine; mirrors `quantile_cont`).

    Output: (user, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    u = (
        events.filter(F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.max(ts_col).alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            F.coalesce(
                F.sum(F.col(value_col).cast("double")), F.lit(0.0)
            ).alias("monetary"),
        )
    )
    obs = events.agg(F.max(ts_col).alias("_obs_end"))
    u = u.crossJoin(F.broadcast(obs)).withColumn(
        "recency_days",
        F.floor(
            (
                F.unix_timestamp("_obs_end") - F.unix_timestamp("_last")
            )
            / F.lit(86400)
        ).cast("long"),
    ).drop("_last", "_obs_end")
    qs = [i / n_bins for i in range(1, n_bins)]
    qlit = "array(" + ", ".join(repr(q) for q in qs) + ")"
    bounds = u.agg(
        F.expr(f"percentile(recency_days, {qlit})").alias("_br"),
        F.expr(f"percentile(frequency, {qlit})").alias("_bf"),
        F.expr(f"percentile(monetary, {qlit})").alias("_bm"),
    )
    d = u.crossJoin(F.broadcast(bounds))

    def score(metric, bcol, reverse):
        s = F.lit(1)
        for i in range(1, n_bins):
            b = F.element_at(F.col(bcol), i)
            s = s + (
                (metric < b) if reverse else (metric > b)
            ).cast("int")
        return s

    rd = F.col("recency_days").cast("double")
    d = (
        d.withColumn("r_score", score(rd, "_br", reverse=True))
        .withColumn(
            "f_score", score(F.col("frequency").cast("double"), "_bf", False)
        )
        .withColumn("m_score", score(F.col("monetary"), "_bm", False))
    )
    hi = max(2, int(round(n_bins * 0.8)))
    lo = max(1, int(round(n_bins * 0.4)))
    seg = (
        F.when(
            (F.col("r_score") >= hi) & (F.col("f_score") >= hi), "champion"
        )
        .when(F.col("f_score") >= hi, "loyal")
        .when(
            (F.col("r_score") <= lo) & (F.col("f_score") >= lo), "at_risk"
        )
        .when(F.col("r_score") <= lo, "hibernating")
        .when(F.col("r_score") >= hi, "recent")
        .otherwise("regular")
    )
    return d.select(
        user_col,
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )
