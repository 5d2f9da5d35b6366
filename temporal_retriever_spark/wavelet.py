"""Haar discrete wavelet transform over bucketed series.

Multi-resolution decomposition (Mallat 1989's pyramid with the Haar
pair): at each level the series of length n becomes n/2 *approximation*
coefficients (pairwise means — the series seen at half the resolution)
and n/2 *detail* coefficients (half the pairwise differences — what
was lost). Detail energy per level is the classic scale-localized
variance decomposition: level 1 captures day-to-day jitter, level k
captures structure at 2^k buckets — the time-domain complement of the
periodogram (``diagnostics.periodogram``), and a standard feature for
regime detection and series fingerprinting.

Convention: ``a[k] = (x[2k] + x[2k+1]) / 2``, ``d[k] = (x[2k] −
x[2k+1]) / 2`` (average/difference, not the orthonormal 1/√2 scaling —
so approximations stay in the series' units; energies differ from the
orthonormal ones by a known 2^level factor, documented here rather
than silently rescaled).

Each series is truncated to its largest power-of-two prefix (in bucket
order) before decomposition — the deterministic choice that keeps
every level an exact pairing (no padding values invented).

Scale design:

* Level ℓ is ONE aggregation ``groupBy(series, k = idx div 2)`` with
  the even/odd members separated by conditional max — rows HALVE every
  level, so the whole L-level pyramid shuffles ~2n rows total per
  series (geometric series), each keyed by (series, position): fully
  distributed across series, never a single-partition sort.
* The position index is a per-series ``row_number`` window —
  partitioned by the series columns, so the sort is per-series and
  parallel.
* L is ≤ log2(series length): the driver loop builds one lazy plan of
  L chained aggregations (aggregations break Catalyst's projection
  collapse, so no CollapseProject blowup), a dozen stages at most.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["haar_dwt", "haar_energy"]

# guards floor(log2(2^k)) against one-ulp-low libm log results — the
# same epsilon the DuckDB oracle uses, so truncation agrees exactly
_LOG2_EPS = 1e-9


def _indexed(df: DataFrame, series_cols, order_col: str, value_col: str):
    w = Window.partitionBy(*series_cols).orderBy(order_col)
    idx = (F.row_number().over(w) - 1).alias("_idx")
    n = F.count(F.lit(1)).over(Window.partitionBy(*series_cols)).alias("_n")
    out = df.select(*series_cols, F.col(value_col).alias("_y"), idx, n)
    # largest power-of-two prefix: 2^floor(log2(n))
    pow2 = F.pow(F.lit(2.0), F.floor(F.log2(F.col("_n")) + F.lit(_LOG2_EPS)))
    return out.filter(F.col("_idx") < pow2).drop("_n")


def haar_dwt(
    df: DataFrame,
    *,
    series_cols=("event_type",),
    order_col: str = "ds",
    value_col: str = "y",
    levels: int = 4,
) -> DataFrame:
    """Haar pyramid coefficients: one row per (series, level, k).

    Returns ``(*series_cols, level, k, approx, detail)`` — at level ℓ
    there are n/2^ℓ rows per series, ``approx`` the running mean
    coefficient and ``detail`` the difference coefficient. Series
    whose (truncated) length is shorter than 2^levels simply stop
    producing rows at their maximum level.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    series_cols = list(series_cols)
    cur = _indexed(df, series_cols, order_col, value_col)
    per_level = []
    for lvl in range(1, levels + 1):
        even = F.max(F.when(F.col("_idx") % 2 == 0, F.col("_y")))
        odd = F.max(F.when(F.col("_idx") % 2 == 1, F.col("_y")))
        paired = (
            cur.groupBy(*series_cols, (F.col("_idx") / 2).cast("long").alias("k"))
            .agg(
                ((even + odd) / 2).alias("approx"),
                ((even - odd) / 2).alias("detail"),
                F.count(F.lit(1)).alias("_members"),
            )
            # power-of-two truncation guarantees full pairs; the filter
            # is belt-and-braces for odd-length inputs fed in directly
            .filter(F.col("_members") == 2)
            .drop("_members")
        )
        per_level.append(
            paired.select(
                *series_cols,
                F.lit(lvl).alias("level"),
                "k",
                "approx",
                "detail",
            )
        )
        cur = paired.select(
            *series_cols, F.col("k").alias("_idx"), F.col("approx").alias("_y")
        )
    return reduce(lambda a, b: a.unionByName(b), per_level)


def haar_energy(
    df: DataFrame,
    *,
    series_cols=("event_type",),
    order_col: str = "ds",
    value_col: str = "y",
    levels: int = 4,
) -> DataFrame:
    """Detail energy per (series, level): ``sum(detail²)`` and its
    share of the total detail energy across the computed levels — the
    scale-localized variance profile."""
    coeffs = haar_dwt(
        df,
        series_cols=series_cols,
        order_col=order_col,
        value_col=value_col,
        levels=levels,
    )
    series_cols = list(series_cols)
    per = coeffs.groupBy(*series_cols, "level").agg(
        F.sum(F.col("detail") * F.col("detail")).alias("energy")
    )
    tot = per.groupBy(*series_cols).agg(F.sum("energy").alias("_tot"))
    return (
        per.join(tot, on=series_cols)
        .select(
            *series_cols,
            "level",
            "energy",
            F.when(F.col("_tot") > 0, F.col("energy") / F.col("_tot"))
            .otherwise(F.lit(0.0))
            .alias("energy_share"),
        )
    )
