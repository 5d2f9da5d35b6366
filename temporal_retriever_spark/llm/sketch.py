"""Mergeable frequency/membership sketches: Count-Min and Bloom.

The published recipes are Cormode & Muthukrishnan 2005 ("An improved
data stream summary: the count-min sketch and its applications") and
Bloom 1970. Both are the workhorse *mergeable* summaries of a 100-TB
profiling pass: each data shard builds its own tiny sketch with one
aggregation, sketches add/union across shards, and the merged summary
answers point-frequency ("how often does this token appear?") or
membership ("did we ever see this id?") queries without a second scan
of the data.

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sketch_hash_expr",
    "cms_build",
    "cms_merge",
    "cms_query",
    "bloom_build",
    "bloom_merge",
    "bloom_contains",
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
