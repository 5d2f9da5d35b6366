"""Series-level characterization features over bucketed series.

The triage layer of a forecasting fleet: given 100k bucketed series,
these per-series scalars (SAX words, autocorrelation/trend/stability
batteries, Hurst exponents) are what routes each series to the right
model tier, dedups near-identical shapes, and feeds drift monitors —
the series-shaped complement of the document-level
``llm.text.text_stats``.

* ``sax_words`` — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi
  & Chiu 2003): z-normalize, Piecewise Aggregate Approximation to
  ``word_len`` segments, discretize segment means by equiprobable
  Gaussian breakpoints into an ``alphabet``-letter word. Two series
  with the same SAX word have the same coarse shape — the standard
  pre-filter for whole-series clustering and motif grouping.
* ``ts_features`` — the tsfeatures/catch22-style battery (Hyndman et
  al.'s feature set, re-derived for relational evaluation): lag-1
  autocorrelation, linear-trend R², tiled stability/lumpiness, median
  crossing points, longest flat spot.
* ``hurst_rs`` — classic rescaled-range Hurst exponent (Hurst 1951,
  Mandelbrot & Wallis 1969): slope of ln(mean R/S) against ln(block
  size). H≈0.5 random walk / no memory, H>0.5 persistent trends,
  H<0.5 mean-reverting.

Scale design (the 100-TB contract):

* Everything is per-series windows + aggregations keyed by the series
  columns — series are independent, so every pass distributes across
  series with no global sort or driver state. Per-series row counts
  are observation-window-bounded (a daily series is ~10³ rows/decade).
* SAX is one indexing window + ONE (series, segment) aggregation +
  ONE series aggregation; the word is assembled with sort_array over
  the word_len-sized struct list, never a cross-row UDF.
* ``ts_features`` is one indexing window, one lag window, one tile
  aggregation and one final reduce — four narrow passes producing one
  row per series regardless of series length.
* ``hurst_rs`` explodes each row into its |block_sizes| resolutions
  (bounded fan-out), runs ONE cumulative window over (series, size,
  block) and two aggregations; the final log-log slope is closed-form
  moment arithmetic on |block_sizes| rows per series.

Reference scope: the reference's analyze surface stops at
ACF/PACF/describe (app.py:95-121); this module is part of the
beyond-reference fleet-operations surface, with conventions documented
per function (average-based PAA with floor segment assignment,
population variances in tiles, strict-above median crossing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .stats import norm_ppf

__all__ = ["sax_words", "ts_features", "hurst_rs"]


def _check_series_cols(series_cols) -> list:
    series_cols = list(series_cols)
    if not series_cols:
        raise ValueError("series_cols must name at least one column")
    return series_cols


def sax_breakpoints(alphabet: int) -> list[float]:
    """The alphabet-1 equiprobable N(0,1) breakpoints (SAX Table 3),
    computed via the engine-neutral Acklam probit so Spark and any SQL
    oracle can bake the identical literals."""
    if not 2 <= alphabet <= 26:
        raise ValueError(f"alphabet must be in [2, 26], got {alphabet}")
    return [norm_ppf(i / alphabet) for i in range(1, alphabet)]


def sax_words(
    df: DataFrame,
    *,
    series_cols=("event_type",),
    order_col: str = "ds",
    value_col: str = "y",
    word_len: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """One SAX word per series: ``(*series_cols, n, sax_word)``.

    Conventions (each the simplest deterministic choice, shared with
    the oracle): z-normalization uses the population std (z=0
    everywhere for constant series → the middle-low symbol); PAA
    assigns row ``i`` (0-based in ``order_col`` order) to segment
    ``floor(i * word_len / n)`` — the floor variant, exact for any n,
    no fractional row splitting; breakpoint comparison is strict
    (``z < bp`` stays in the lower symbol, the boundary value takes
    the upper); symbols are ``a..z`` from low to high. Series shorter
    than ``word_len`` yield a shorter word (one letter per non-empty
    segment) rather than padding with invented values.
    """
    series_cols = _check_series_cols(series_cols)
    if word_len < 1:
        raise ValueError(f"word_len must be >= 1, got {word_len}")
    bps = sax_breakpoints(alphabet)

    w_ord = Window.partitionBy(*series_cols).orderBy(order_col)
    w_all = Window.partitionBy(*series_cols)
    idx = F.row_number().over(w_ord) - F.lit(1)
    n = F.count(F.lit(1)).over(w_all)
    mu = F.avg(value_col).over(w_all)
    # population std: sqrt(E[y^2] - E[y]^2), clamped for fp negatives
    sig = F.sqrt(
        F.greatest(
            F.avg(F.col(value_col) * F.col(value_col)).over(w_all) - mu * mu,
            F.lit(0.0),
        )
    )
    z = F.when(sig > 0, (F.col(value_col) - mu) / sig).otherwise(F.lit(0.0))
    seg = F.floor(idx * F.lit(word_len) / n)
    indexed = df.select(
        *series_cols, z.alias("_z"), seg.alias("_seg"), n.alias("_n")
    )

    paa = indexed.groupBy(*series_cols, "_seg").agg(
        F.avg("_z").alias("_pz"), F.max("_n").alias("_n")
    )
    sym: Column = F.lit(len(bps))  # top symbol unless a breakpoint catches it
    for j in range(len(bps) - 1, -1, -1):
        sym = F.when(F.col("_pz") < F.lit(bps[j]), F.lit(j)).otherwise(sym)
    lettered = paa.select(
        *series_cols,
        "_seg",
        "_n",
        F.chr(sym + F.lit(97)).alias("_sym"),
    )
    return (
        lettered.groupBy(*series_cols)
        .agg(
            F.max("_n").cast("long").alias("n"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_seg", "_sym"))),
                    lambda s: s["_sym"],
                ),
            ).alias("sax_word"),
        )
    )


def ts_features(
    df: DataFrame,
    *,
    series_cols=("event_type",),
    order_col: str = "ds",
    value_col: str = "y",
    tile_width: int = 7,
    flat_bins: int = 10,
) -> DataFrame:
    """Per-series shape battery, one row per series.

    Columns: ``n``, ``mean``, ``std`` (sample, ddof=1), ``cv``
    (std/|mean|, NULL at mean 0), ``acf1`` (lag-1 autocorrelation with
    the standard ACF denominator Σ(y−ȳ)² — matches
    ``diagnostics.acf``), ``trend_r2`` (R² of the OLS fit on the
    0-based time index), ``stability`` (population variance of
    complete-tile means of the z-scaled series (y−ȳ)/s — the
    tsfeatures convention; scale-free; tiles of ``tile_width``
    consecutive buckets; NULL below 2 complete tiles), ``lumpiness``
    (population variance of complete-tile population variances of the
    z-scaled series), ``crossing_points``
    (adjacent pairs where strictly-above-median flips; median is the
    interpolated percentile both engines share), ``flat_spots``
    (longest run of consecutive buckets in the same of ``flat_bins``
    equal-width value bins; constant series → run = n).
    """
    series_cols = _check_series_cols(series_cols)
    if tile_width < 2:
        raise ValueError(f"tile_width must be >= 2, got {tile_width}")
    w_ord = Window.partitionBy(*series_cols).orderBy(order_col)
    w_all = Window.partitionBy(*series_cols)

    y = F.col(value_col).cast("double")
    med = F.expr(f"percentile({value_col}, 0.5)").over(w_all)
    mn = F.min(y).over(w_all)
    mx = F.max(y).over(w_all)
    span = mx - mn
    # equal-width value bin; top edge belongs to the last bin
    binned = F.when(span > 0,
        F.least(
            F.floor((y - mn) * F.lit(flat_bins) / span),
            F.lit(flat_bins - 1),
        ),
    ).otherwise(F.lit(0))
    idx = F.row_number().over(w_ord) - F.lit(1)
    base = df.select(
        *series_cols,
        y.alias("_y"),
        idx.alias("_i"),
        F.lag(y).over(w_ord).alias("_ylag"),
        (y > med).cast("int").alias("_above"),
        F.lag((y > med).cast("int")).over(w_ord).alias("_above_lag"),
        binned.alias("_bin"),
    )
    # gaps-and-islands: same-bin runs share (_i - per-bin row_number)
    w_bin = Window.partitionBy(*series_cols, "_bin").orderBy("_i")
    base = base.withColumn(
        "_run", F.col("_i") - F.row_number().over(w_bin)
    )

    per_series = base.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("_y").alias("mean"),
        F.stddev_samp("_y").alias("std"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_i").cast("double")).alias("_si"),
        F.sum(F.col("_i") * F.col("_i").cast("double")).alias("_sii"),
        F.sum(F.col("_i") * F.col("_y")).alias("_siy"),
        F.sum(F.col("_y") * F.col("_ylag")).alias("_sylag_xy"),
        F.sum(F.when(F.col("_ylag").isNotNull(), F.col("_y"))).alias("_sy1"),
        F.sum(F.when(F.col("_ylag").isNotNull(), F.col("_ylag"))).alias(
            "_sylag"
        ),
        F.sum(
            F.when(F.col("_above") != F.col("_above_lag"), 1).otherwise(0)
        ).cast("long").alias("crossing_points"),
    )

    runs = (
        base.groupBy(*series_cols, "_bin", "_run")
        .agg(F.count(F.lit(1)).alias("_rl"))
        .groupBy(*series_cols)
        .agg(F.max("_rl").cast("long").alias("flat_spots"))
    )

    # Tile stats on the Z-SCALED series (the tsfeatures convention):
    # stability/lumpiness become scale-free O(1) shape ratios instead
    # of unit-dependent magnitudes. That is also what makes them
    # cross-engine stable: on raw daily sums the absolute values reach
    # ~1e11 where last-ulp drift survives any rounding; on z-scores
    # with CENTERED tile moments every squared term is deviation-sized
    # and two engines agree to ~1e-14.
    w_ser_all = Window.partitionBy(*series_cols)
    ser_mu = F.avg("_y").over(w_ser_all)
    ser_sd = F.stddev_samp("_y").over(w_ser_all)
    scaled = base.withColumn(
        "_z",
        F.when(ser_sd > 0, (F.col("_y") - ser_mu) / ser_sd).otherwise(
            F.lit(0.0)
        ),
    )
    w_tile = Window.partitionBy(*series_cols, "_tile")
    tile_rows = (
        scaled.withColumn("_tile", F.floor(F.col("_i") / F.lit(tile_width)))
        .withColumn("_tmu", F.avg("_z").over(w_tile))
        .withColumn("_tn", F.count(F.lit(1)).over(w_tile))
        .filter(F.col("_tn") == tile_width)
    )
    dev = F.col("_z") - F.col("_tmu")
    tile_stats = tile_rows.groupBy(*series_cols, "_tile").agg(
        F.avg(dev * dev).alias("_tvar"),
        F.max("_tmu").alias("_tmean"),
    )
    w_ser = Window.partitionBy(*series_cols)
    tile_stats = tile_stats.withColumn(
        "_gm", F.avg("_tmean").over(w_ser)
    ).withColumn("_gv", F.avg("_tvar").over(w_ser))
    dm = F.col("_tmean") - F.col("_gm")
    dv = F.col("_tvar") - F.col("_gv")
    tiles = tile_stats.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("_ntiles"),
        F.avg(dm * dm).alias("_stab"),
        F.avg(dv * dv).alias("_lump"),
    )

    nn = F.col("n").cast("double")
    # acf1 with the ACF convention: numerator over n-1 lagged pairs
    # centred at the FULL-series mean, denominator Σ(y-ȳ)² (n terms)
    dev_den = F.col("_syy") - F.col("_sy") * F.col("_sy") / nn
    acf_num = (
        F.col("_sylag_xy")
        - F.col("mean") * (F.col("_sy1") + F.col("_sylag"))
        + (nn - 1) * F.col("mean") * F.col("mean")
    )
    sxx = F.col("_sii") - F.col("_si") * F.col("_si") / nn
    sxy = F.col("_siy") - F.col("_si") * F.col("_sy") / nn
    trend_r2 = F.when(
        (sxx > 0) & (dev_den > 0), (sxy * sxy) / (sxx * dev_den)
    )
    out = (
        per_series.join(runs, series_cols)
        .join(tiles, series_cols, "left")
        .select(
            *series_cols,
            "n",
            "mean",
            "std",
            F.when(F.abs(F.col("mean")) > 0, F.col("std") / F.abs(F.col("mean"))).alias("cv"),
            F.when(dev_den > 0, acf_num / dev_den).alias("acf1"),
            trend_r2.alias("trend_r2"),
            F.when(F.col("_ntiles") >= 2, F.col("_stab")).alias("stability"),
            F.when(F.col("_ntiles") >= 2, F.col("_lump")).alias("lumpiness"),
            "crossing_points",
            "flat_spots",
        )
    )
    return out


def hurst_rs(
    df: DataFrame,
    *,
    series_cols=("event_type",),
    order_col: str = "ds",
    value_col: str = "y",
    block_sizes=(16, 32, 64),
) -> DataFrame:
    """Rescaled-range Hurst exponent per series.

    For each block size m: partition the series (in ``order_col``
    order) into complete blocks of m consecutive points, per block
    compute R = range of the cumulative deviations from the block
    mean and S = population std, average R/S over blocks with S>0,
    then fit ln(mean R/S) = c + H·ln(m) by OLS across the block
    sizes. Returns ``(*series_cols, n_sizes, hurst)`` — ``n_sizes``
    the number of block sizes that produced a usable mean R/S,
    ``hurst`` NULL below 2 usable sizes.
    """
    series_cols = _check_series_cols(series_cols)
    sizes = sorted(set(int(m) for m in block_sizes))
    if len(sizes) < 2 or sizes[0] < 2:
        raise ValueError(
            f"need >= 2 distinct block sizes, all >= 2: {block_sizes}"
        )

    w_ord = Window.partitionBy(*series_cols).orderBy(order_col)
    idx = F.row_number().over(w_ord) - F.lit(1)
    base = df.select(
        *series_cols,
        F.col(value_col).cast("double").alias("_y"),
        idx.alias("_i"),
    )
    sized = base.select(
        *series_cols,
        "_y",
        "_i",
        F.explode(
            F.array(*[F.lit(m) for m in sizes])
        ).alias("_m"),
    ).select(
        *series_cols,
        "_y",
        "_m",
        F.floor(F.col("_i") / F.col("_m")).alias("_b"),
        F.col("_i").alias("_i"),
    )
    w_cum = Window.partitionBy(*series_cols, "_m", "_b").orderBy("_i")
    w_blk = Window.partitionBy(*series_cols, "_m", "_b")
    blk_n = F.count(F.lit(1)).over(w_blk)
    blk_mu = F.avg("_y").over(w_blk)
    cum = F.sum(F.col("_y") - blk_mu).over(w_cum)
    devs = sized.select(
        *series_cols,
        "_m",
        "_b",
        blk_n.alias("_bn"),
        cum.alias("_w"),
        F.col("_y").alias("_y"),
    ).filter(F.col("_bn") == F.col("_m"))

    per_block = devs.groupBy(*series_cols, "_m", "_b").agg(
        (F.max("_w") - F.min("_w")).alias("_r"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("_y") * F.col("_y")) - F.avg("_y") * F.avg("_y"),
                F.lit(0.0),
            )
        ).alias("_s"),
    )
    per_size = (
        per_block.filter(F.col("_s") > 0)
        .groupBy(*series_cols, "_m")
        .agg(F.avg(F.col("_r") / F.col("_s")).alias("_rs"))
        .filter(F.col("_rs") > 0)
        .select(
            *series_cols,
            F.log(F.col("_m").cast("double")).alias("_lx"),
            F.log("_rs").alias("_ly"),
        )
    )
    k = F.count(F.lit(1)).cast("double")
    slope = (
        (k * F.sum(F.col("_lx") * F.col("_ly")) - F.sum("_lx") * F.sum("_ly"))
        / (k * F.sum(F.col("_lx") * F.col("_lx")) - F.sum("_lx") * F.sum("_lx"))
    )
    return per_size.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sizes"),
        F.when(k >= 2, slope).alias("hurst"),
    )
