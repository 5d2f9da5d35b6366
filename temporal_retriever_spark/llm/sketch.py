"""Mergeable frequency/membership/cardinality sketches: Count-Min,
Bloom, and HyperLogLog.

The published recipes are Cormode & Muthukrishnan 2005 ("An improved
data stream summary: the count-min sketch and its applications"),
Bloom 1970, and Flajolet et al. 2007 ("HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm"). All three are the
workhorse *mergeable* summaries of a 100-TB profiling pass: each data
shard builds its own tiny sketch with one aggregation, sketches
add/union/max across shards, and the merged summary answers
point-frequency ("how often does this token appear?"), membership
("did we ever see this id?"), or cardinality ("how many distinct
users?") queries without a second scan of the data.

Representation choice — a sketch IS a DataFrame here, not a driver-side
bitmap:

* Count-Min: ``(row_idx, bucket, cnt)`` — at most ``depth × width``
  rows regardless of input size. Merging is ``union → groupBy → sum``
  (counter matrices add element-wise); querying is a broadcast join +
  ``min`` over the ``depth`` rows. Estimates satisfy the CM guarantee
  ``true ≤ est`` always (counters only over-count on collisions).
* Bloom: the SPARSE set of set bit positions, ``(bit,)`` distinct —
  at most ``num_bits`` rows. Merging is ``union → distinct`` (bitwise
  OR); probing is a broadcast join counting how many of an item's
  ``num_hashes`` positions are present (all present ⇒ maybe member,
  any absent ⇒ definitely not). No false negatives by construction.

Scale design:

* Building either sketch is ONE aggregation whose group cardinality is
  bounded by the sketch geometry (``depth × width`` / ``num_bits``),
  not by the data: map-side partial aggregation collapses each input
  partition to at most that many rows before the shuffle, so the
  shuffle volume is O(partitions × sketch size) no matter how many
  input rows there are. Raw values never shuffle.
* The hash family is the engine-portable md5 draw (first 8 hex digits
  of ``md5(seed ':' value)`` as an integer — same idiom as
  ``corpus.sample_hash_expr``): deterministic across engines,
  partitioning layouts, and re-runs, which is what makes the DuckDB
  oracle an EXACT mirror (the oracle reproduces the identical
  counters, including collision noise, not just the guarantee).
* Querying broadcasts the sketch (≤ depth × width counters — a few
  thousand rows) against the probe set, so probe frequency estimation
  is a map-side join on the probes.

Spark's built-in ``DataFrame.stat.bloomFilter`` / Catalyst's
``BloomFilterAggregate`` collect one opaque driver-side bitmap; the
relational form here stays distributed, shard-mergeable across jobs
and days (persist the sketch table, union tomorrow's), and
cross-engine queryable — the right shape for incremental 100-TB
corpus bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sketch_hash_expr",
    "cms_build",
    "cms_merge",
    "cms_query",
    "bloom_build",
    "bloom_merge",
    "bloom_contains",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "hist_build",
    "hist_merge",
    "hist_quantiles",
]


def sketch_hash_expr(value: Column, seed: int, modulus: int) -> Column:
    """Deterministic bucket draw: first 8 hex digits of
    ``md5(seed ':' value)`` mod ``modulus``.

    32 bits of md5 as an integer — uniform enough for sketch bucketing,
    reproducible on any engine with md5 (Spark, DuckDB, Trino), and
    independent draws per seed.
    """
    key = F.concat(F.lit(f"{seed}:"), value.cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % modulus).cast(
        "int"
    )


def _row_buckets(value: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` structs ``(row_idx, bucket)`` for one value."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                sketch_hash_expr(value, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of ``df[col]`` as ``(row_idx, bucket, cnt)``.

    ``depth`` independent hash rows of ``width`` counters; standard
    accuracy ε ≈ e/width (additive, × total count) with failure
    probability e^-depth. ``weight_col`` sums that column instead of
    counting rows (item frequencies weighted by e.g. token counts).

    One explode + one bounded-cardinality aggregation; see module
    docstring for why the shuffle stays sketch-sized.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    cell = F.explode(_row_buckets(F.col(col), depth, width)).alias("cell")
    return (
        df.select(cell, w.alias("_w"))
        .groupBy(F.col("cell.row_idx").alias("row_idx"), F.col("cell.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("double").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CM sketches built with identical geometry: counters add."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]``.

    Appends ``est_col`` = min over the ``depth`` rows of the counter at
    the item's bucket (0 when a row has no counter — the item was never
    seen by that hash row). Always ``>=`` the true frequency. The
    sketch side is broadcast (≤ depth × width rows).
    """
    probe_cells = probes.select(
        F.col(col),
        F.explode(_row_buckets(F.col(col), depth, width)).alias("cell"),
    ).select(col, "cell.row_idx", "cell.bucket")
    joined = probe_cells.join(
        F.broadcast(sketch), on=["row_idx", "bucket"], how="left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0.0)))
    est = joined.groupBy(col).agg(F.min("cnt").alias(est_col))
    return probes.join(F.broadcast(est), on=col, how="left").withColumn(
        est_col, F.coalesce(F.col(est_col), F.lit(0.0))
    )


def _bit_positions(value: Column, num_bits: int, num_hashes: int) -> Column:
    return F.array_distinct(
        F.array(*[sketch_hash_expr(value, i, num_bits) for i in range(num_hashes)])
    )


def bloom_build(
    df: DataFrame,
    col: str,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Bloom filter of ``df[col]`` as the sparse DataFrame of set bit
    positions ``(bit,)``.

    Null values are ignored (a NULL is not a member). False-positive
    rate ≈ (1 − e^(−kn/m))^k for n distinct items, m ``num_bits``,
    k ``num_hashes`` — size m at ~10 bits per expected distinct item
    for ~1% FP.
    """
    if num_bits < 1 or num_hashes < 1:
        raise ValueError(f"num_bits/num_hashes must be >= 1, got {num_bits}/{num_hashes}")
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.explode(_bit_positions(F.col(col), num_bits, num_hashes)).alias("bit")
        )
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union of set bits == bitwise OR of the filters."""
    if not filters:
        raise ValueError("need at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
    flag_col: str = "maybe_present",
) -> DataFrame:
    """Membership probe: appends boolean ``flag_col``.

    True ⇔ every one of the item's bit positions is set (may be a
    false positive — collisions); False is definitive (no false
    negatives). The filter side is broadcast (≤ num_bits rows).
    """
    probe_bits = probes.select(
        F.col(col),
        F.posexplode(_bit_positions(F.col(col), num_bits, num_hashes)).alias(
            "_i", "bit"
        ),
    )
    hit = probe_bits.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), on="bit", how="left"
    )
    verdict = hit.groupBy(col).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("_set"), F.lit(0)))).alias(
            flag_col
        )
    )
    return probes.join(F.broadcast(verdict), on=col, how="left").withColumn(
        flag_col, F.coalesce(F.col(flag_col), F.lit(False))
    )


# --- HyperLogLog (Flajolet et al. 2007, with the HLL small-range
# correction) — the mergeable DISTINCT-COUNT sketch completing the
# family: CMS answers frequency, Bloom membership, HLL cardinality. ---


def _hll_rank_expr(value: Column) -> Column:
    """Leading-zero rank of a 60-bit md5 draw, 1..61, computed
    NIBBLE-WISE on the hex string so both engines agree bit-exactly
    (no float log2 at power-of-two boundaries): strip leading '0'
    nibbles, then the first non-zero hex digit fixes the remaining
    zero count via its bit length."""
    s = F.substring(
        F.md5(F.concat(F.lit("1:"), value.cast("string"))), 1, 15
    )
    rest = F.regexp_replace(s, "^0+", "")
    z = F.lit(15) - F.length(rest)  # whole-zero nibbles
    first = F.substring(rest, 1, 1)
    bl = (
        F.when(first == "1", 1)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 3)
        .otherwise(4)  # 8..f
    )
    return (
        F.when(F.length(rest) == 0, F.lit(61))
        .otherwise(z * 4 + (F.lit(4) - bl) + F.lit(1))
        .cast("int")
    )


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_build(
    df: DataFrame,
    col: str,
    *,
    p: int = 12,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog sketch of ``df[col]`` (optionally per key) as
    ``(*key_cols, register, max_rank)`` — at most ``2**p`` rows per
    key regardless of input size.

    Register = independent md5 draw mod ``2**p`` (seed 0 of
    ``sketch_hash_expr``); rank = leading-zero count of a second
    60-bit md5 draw + 1 (nibble-exact, see ``_hll_rank_expr``). One
    bounded-cardinality aggregation: map-side partial ``max`` collapses
    each input partition to ≤ m rows before the shuffle — raw values
    never shuffle. Standard error ≈ 1.04/√(2**p). NULLs are ignored.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    keys = list(key_cols)
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *keys,
            sketch_hash_expr(F.col(col), 0, m).alias("register"),
            _hll_rank_expr(F.col(col)).alias("_rank"),
        )
        .groupBy(*keys, "register")
        .agg(F.max("_rank").alias("max_rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL sketches built with identical geometry: register-wise
    max — exactly the sketch of the unioned inputs."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    keys = [c for c in out.columns if c not in ("register", "max_rank")]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "register").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_estimate(
    sketch: DataFrame,
    *,
    p: int = 12,
    est_col: str = "hll_est",
) -> DataFrame:
    """Cardinality estimate from an HLL sketch: one row per key
    (``(*key_cols, hll_est)``), or a single global row for unkeyed
    sketches.

    Raw estimator αₘ·m²/Σ2^(−Mⱼ) (absent registers contribute 2⁰),
    with the standard small-range linear-counting correction
    E ≤ 2.5m ∧ V>0 → m·ln(m/V). The 32-bit large-range correction is
    unnecessary: the rank draw has 60 bits of headroom.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    alpha = _hll_alpha(m)
    keys = [c for c in sketch.columns if c not in ("register", "max_rank")]
    g = sketch.groupBy(*keys) if keys else sketch.groupBy()
    agg = g.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_sp"),
        F.count(F.lit(1)).cast("double").alias("_used"),
    )
    raw = F.lit(alpha * m * m) / (
        F.col("_sp") + (F.lit(float(m)) - F.col("_used"))
    )
    v = F.lit(float(m)) - F.col("_used")  # zero registers
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((raw <= 2.5 * m) & (v > 0), small).otherwise(raw)
    return agg.select(*keys, est.alias(est_col))


# --- Fixed-bin histogram quantile sketch -------------------------------
# The fourth mergeable summary: CMS frequency, Bloom membership, HLL
# cardinality, histogram QUANTILES. Fixed equi-width bins over a
# declared [lo, hi) domain: deterministic (no sampling), exactly
# mergeable across shards/days (counters add), and bounded at `bins`
# rows per key — unlike Spark's `percentile_approx`, whose KLL-ish
# state is an opaque driver-side blob you can't persist as a table,
# union tomorrow, or read from another engine. Accuracy is the usual
# histogram bound: a quantile is off by at most one bin width.


def hist_build(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 128,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Equi-width histogram sketch of ``df[col]`` as
    ``(*key_cols, bin, cnt)`` — at most ``bins`` rows per key.

    Values are CLAMPED into [lo, hi): below-range rows land in bin 0,
    above-range in bin ``bins-1`` (documented edge semantics — the
    sketch never drops mass, it saturates). NULLs are ignored. One
    bounded-cardinality aggregation; raw values never shuffle.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    keys = list(key_cols)
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit((hi - lo) / bins))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.filter(x.isNotNull())
        .select(*keys, b.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches built with identical geometry:
    counters add."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    keys = [c for c in out.columns if c not in ("bin", "cnt")]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    qs: tuple[float, ...],
    *,
    lo: float,
    hi: float,
    bins: int = 128,
    est_col: str = "q_est",
) -> DataFrame:
    """Quantile estimates from a histogram sketch: one row per
    (key, q) — ``(*key_cols, q, q_est)``.

    For each q, the target rank ``q·N`` is located in the cumulative
    bin counts (ONE window pass ordered by bin) and interpolated
    uniformly within the owning bin:
    ``est = lo + (bin + (target − cum_below)/cnt) · bin_width``.
    Deterministic; error ≤ one bin width. Empty sketches yield no
    rows (there is no quantile of nothing).
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantiles must be in [0, 1], got {q}")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    keys = [c for c in sketch.columns if c not in ("bin", "cnt")]
    width = (hi - lo) / bins
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bin") if keys else Window.partitionBy(F.lit(1)).orderBy("bin")
    wk = Window.partitionBy(*[F.col(k) for k in keys]) if keys else Window.partitionBy(F.lit(1))
    cum = sketch.select(
        *keys,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(wk).alias("_n"),
    )
    qdf = F.broadcast(
        sketch.sparkSession.createDataFrame(
            [(float(q),) for q in qs], "q double"
        )
    )
    # owning bin: the FIRST bin whose cumulative count reaches the
    # target rank (min over qualifying bins — a pre-aggregated
    # min_by keeps it one exchange after the window)
    hit = (
        cum.crossJoin(qdf)
        .withColumn("_target", F.col("q") * F.col("_n"))
        .filter(F.col("_cum") >= F.col("_target"))
        .groupBy(*keys, "q")
        .agg(
            F.min_by(
                F.struct("bin", "cnt", "_cum", "_target"), F.col("bin")
            ).alias("_hit")
        )
        .select(
            *keys,
            "q",
            (
                F.lit(float(lo))
                + (
                    F.col("_hit.bin")
                    + (
                        F.col("_hit._target")
                        - (F.col("_hit._cum") - F.col("_hit.cnt"))
                    )
                    / F.col("_hit.cnt")
                )
                * F.lit(width)
            ).alias(est_col),
        )
    )
    return hit
