"""Shape-based series comparison: DTW distances and matrix profiles.

The whole-series and subsequence similarity layer over bucketed
series — what powers "find series that behave like this one"
(fleet clustering, incident correlation) and "find repeated /
anomalous subsequences" (motif & discord discovery):

* ``dtw_pairs`` — Dynamic Time Warping distance (Sakoe & Chiba 1978)
  between series pairs: the minimal sum of squared pointwise costs
  over monotone alignments, tolerant to local time shifts that make
  plain Euclidean distance useless on phase-shifted series.
* ``matrix_profile`` — the z-normalized subsequence nearest-neighbor
  profile (Yeh et al. 2016, "Matrix Profile I"): for every length-m
  window, the distance to its nearest non-trivial match in the same
  series. Low values = motifs (repeated structure), high values =
  discords (the classic anomaly definition that needs no model).

Numerics contract (shared with SQL oracles): the DTW row recurrence
``cur[j] = c_j + min(prev[j], prev[j-1], cur[j-1])`` carries a
sequential dependency, but substituting ``m_j = min(prev[j],
prev[j-1])`` gives the closed form

    cur[j] = S_j + min_{k<=j} (m_k - S_{k-1}),   S_j = sum_{t<=j} c_t

— a prefix-sum plus prefix-min. That form is what this module
computes (``np.minimum.accumulate`` per row, no inner Python loop)
and what a relational oracle can replay with list expressions,
since nothing in it is sequentially dependent.

Scale design (the 100-TB contract):

* Series are collected to per-series arrays with ONE sort-free
  aggregation (sort_array over (order, value) structs); arrays are
  observation-window-bounded (a daily series is ~10³ values/decade),
  so a "series row" is kilobytes, not the raw event volume.
* ``dtw_pairs`` joins the array table to itself; unblocked all-pairs
  is O(#series²) BY DEFINITION, so ``block_col`` equi-joins within
  caller-provided blocks (a SAX word from ``tsfeatures.sax_words``
  is the natural blocking key — same coarse shape, then exact DTW).
  The DP itself runs in an Arrow ``mapInPandas`` pass directly on
  the join output: no extra shuffle beyond the pair join.
* ``matrix_profile`` is per-series independent work in one grouped
  Arrow pass: O(n_w² · m) vectorized as ONE windows×windows matmul
  per series. For multi-million-point single series the STOMP
  O(n²) streaming-dot refinement drops in behind the same API;
  at bucketed-series lengths the matmul is already sub-millisecond.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["dtw_numpy", "dtw_pairs", "matrix_profile", "matrix_profile_numpy"]


def dtw_numpy(a: np.ndarray, b: np.ndarray, band: int | None = None) -> float:
    """DTW with squared-difference cost via the prefix-min closed form.

    ``band`` is the Sakoe-Chiba radius on |i·m/n − j| (None = full).
    Returns the accumulated cost D(n-1, m-1).
    """
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    inf = math.inf
    prev = np.empty(m)
    c0 = (a[0] - b) ** 2
    prev[:] = np.cumsum(c0)
    if band is not None:
        j = np.arange(m)
        mask0 = np.abs(0 * m / n - j) > band + abs(n - m)
        prev[mask0] = inf
    for i in range(1, n):
        c = (a[i] - b) ** 2
        mj = np.empty(m)
        mj[0] = prev[0]
        np.minimum(prev[1:], prev[:-1], out=mj[1:])
        if band is not None:
            j = np.arange(m)
            mask = np.abs(i * m / n - j) > band + abs(n - m)
            mj[mask] = inf
            c = np.where(mask, 0.0, c)  # keep sums finite inside the mask
        s = np.cumsum(c)
        g = mj - np.concatenate(([0.0], s[:-1]))
        cur = s + np.minimum.accumulate(g)
        if band is not None:
            cur[mask] = inf
        prev = cur
    return float(prev[-1])


def dtw_pairs(
    df: DataFrame,
    *,
    series_col: str = "event_type",
    order_col: str = "ds",
    value_col: str = "y",
    znorm: bool = True,
    band: int | None = None,
    block_col: str | None = None,
) -> DataFrame:
    """DTW distance for every unordered series pair (id_a < id_b).

    ``znorm`` z-normalizes each series (population std; constant
    series map to all-zeros) so the distance measures shape, not
    scale — also what keeps the values O(series length) instead of
    O(value²·length), i.e. stable under 6-dp rounding. ``block_col``
    (a column of ``df``, constant per series) restricts pairs to
    equal blocks — the scale path; without it the pair join is the
    full cross product of series, which is fine for dozens of series
    and wrong for millions (documented above).

    Returns ``(id_a, id_b, n_a, n_b, dtw)``.
    """
    agg_cols = [F.col(series_col).cast("string").alias("_sid")]
    if block_col is not None:
        agg_cols.append(F.col(block_col).alias("_blk"))
    base = df.groupBy(*agg_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
            ),
            lambda s: s[value_col].cast("double"),
        ).alias("_vals")
    )
    a = base.select(
        F.col("_sid").alias("id_a"),
        F.col("_vals").alias("_va"),
        *([F.col("_blk")] if block_col is not None else []),
    )
    b = base.select(
        F.col("_sid").alias("id_b"),
        F.col("_vals").alias("_vb"),
        *([F.col("_blk").alias("_blk_b")] if block_col is not None else []),
    )
    if block_col is not None:
        pairs = a.join(
            b,
            (F.col("_blk") == F.col("_blk_b"))
            & (F.col("id_a") < F.col("id_b")),
        ).drop("_blk", "_blk_b")
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))

    out_schema = StructType(
        [
            StructField("id_a", StringType()),
            StructField("id_b", StringType()),
            StructField("n_a", LongType()),
            StructField("n_b", LongType()),
            StructField("dtw", DoubleType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in range(len(pdf)):
                va = np.asarray(pdf["_va"].iloc[k], float)
                vb = np.asarray(pdf["_vb"].iloc[k], float)
                if znorm:
                    sa, sb = va.std(), vb.std()
                    va = (va - va.mean()) / sa if sa > 0 else np.zeros_like(va)
                    vb = (vb - vb.mean()) / sb if sb > 0 else np.zeros_like(vb)
                rows.append(
                    (
                        pdf["id_a"].iloc[k],
                        pdf["id_b"].iloc[k],
                        len(va),
                        len(vb),
                        dtw_numpy(va, vb, band=band),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id_a", "id_b", "n_a", "n_b", "dtw"]
            )

    return pairs.mapInPandas(compute, out_schema)


def matrix_profile_numpy(
    y: np.ndarray, m: int, exclusion: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Z-normalized Euclidean matrix profile of one series.

    Returns (dist, index) arrays of length n−m+1; windows with zero
    variance (flat) get NaN and are excluded as neighbors. Distances
    use d = sqrt(2m(1 − ρ)) with ρ the window Pearson product built
    from the windows×windows Gram matrix (one matmul).
    """
    n = len(y)
    nw = n - m + 1
    if nw < 2:
        return np.full(max(nw, 0), np.nan), np.full(max(nw, 0), -1)
    excl = max(1, m // 2) if exclusion is None else int(exclusion)
    win = np.lib.stride_tricks.sliding_window_view(y, m)
    mu = win.mean(axis=1)
    sd = win.std(axis=1)
    gram = win @ win.T
    with np.errstate(invalid="ignore", divide="ignore"):
        rho = (gram - m * np.outer(mu, mu)) / (m * np.outer(sd, sd))
        d2 = np.clip(2 * m * (1 - rho), 0.0, None)
        dist = np.sqrt(d2)
    bad = sd <= 0
    dist[bad, :] = np.nan
    dist[:, bad] = np.nan
    ii, jj = np.indices(dist.shape)
    dist[np.abs(ii - jj) < excl] = np.nan
    # round to 6 dp before argmin: the tie-break (smallest j) is then
    # deterministic across engines whose raw distances differ in ulps
    dist = np.round(dist + 1.234567e-07, 6)
    prof = np.full(nw, np.nan)
    idx = np.full(nw, -1)
    finite = ~np.isnan(dist)
    any_f = finite.any(axis=1)
    safe = np.where(np.isnan(dist), np.inf, dist)
    prof[any_f] = safe[any_f].min(axis=1)
    idx[any_f] = safe[any_f].argmin(axis=1)
    return prof, idx


def matrix_profile(
    df: DataFrame,
    *,
    m: int = 8,
    series_cols=("event_type",),
    order_col: str = "ds",
    value_col: str = "y",
    exclusion: int | None = None,
) -> DataFrame:
    """Matrix profile per series: ``(*series_cols, i, mp_dist,
    mp_index)`` — for each 0-based window start i, the 6-dp-rounded
    z-normalized Euclidean distance to the nearest window at least
    ``exclusion`` (default m//2, min 1) starts away, and that
    neighbor's start (ties → smallest index). Flat (zero-variance)
    windows yield NULL/−1 and are excluded as neighbors."""
    series_cols = list(series_cols)
    if not series_cols:
        raise ValueError("series_cols must name at least one column")
    if m < 2:
        raise ValueError(f"window m must be >= 2, got {m}")
    key_fields = [df.schema[c] for c in series_cols]
    out_schema = StructType(
        key_fields
        + [
            StructField("i", LongType()),
            StructField("mp_dist", DoubleType()),
            StructField("mp_index", LongType()),
        ]
    )
    narrow = df.select(
        *series_cols,
        F.col(order_col).alias("_ord"),
        F.col(value_col).cast("double").alias("_y"),
    )

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        yv = pdf.sort_values("_ord")["_y"].to_numpy(float)
        prof, idx = matrix_profile_numpy(yv, m, exclusion)
        out = pd.DataFrame(
            {
                "i": np.arange(len(prof), dtype=np.int64),
                "mp_dist": prof,
                "mp_index": idx.astype(np.int64),
            }
        )
        for k_i, c in enumerate(series_cols):
            out[c] = key[k_i]
        return out[series_cols + ["i", "mp_dist", "mp_index"]]

    return narrow.groupBy(*series_cols).applyInPandas(compute, out_schema)
