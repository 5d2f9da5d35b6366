"""Output layout helpers for the 100-TB path.

* ``write_partitioned`` — date-partitioned parquet: grain-bucketed
  tables laid out by bucket date give free partition pruning for
  time-range queries (the engine's dominant access pattern).
* ``write_bucketed`` — hash-bucketed table on the join key: two tables
  bucketed identically on ``series_id`` (or ``(series_id)``+sorted ds)
  join without a shuffle — the co-located join layout for repeated
  covariate alignment at scale.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: Iterable[str] = ("ds",),
    mode: str = "overwrite",
) -> None:
    """Date-partitioned parquet; readers pruning on the partition column
    scan only matching directories (verify via PartitionFilters in
    .explain)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Iterable[str] = ("series_id",),
    sort_cols: Iterable[str] = ("ds",),
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed + sorted managed table (``bucketBy`` requires
    ``saveAsTable``). Two tables bucketed the same way equi-join on the
    bucket key with zero shuffle."""
    bucket_cols = list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
    )
    writer.saveAsTable(table, format="parquet")


def write_training_shards(
    df,
    path: str,
    *,
    token_col: str = "n_tokens",
    max_tokens_per_shard: int = 1_000_000,
    order_col: str = "doc_id",
    fmt: str = "parquet",
    mode: str = "overwrite",
):
    """Final pipeline step: write documents into token-budgeted shards
    with a manifest.

    Shard assignment is a deterministic cumulative-token cut: rows in
    ``order_col`` order accumulate ``token_col`` and break to a new
    shard when the running total crosses ``max_tokens_per_shard`` —
    shard i holds a contiguous ordered slice, every shard except the
    last is ≥ the budget's floor, and re-running on the same input
    yields identical shards (no ``rand()``, no partition-layout
    dependence). Files land under ``path`` partitioned by ``shard``
    (one directory per shard — a training loader streams shard dirs in
    order), and the returned MANIFEST DataFrame has one row per shard:
    (shard, n_rows, n_tokens, min/max order key).

    The cumulative sum is one global-ordering window — the one
    operation here that genuinely needs a total order. At 100 TB,
    pre-aggregate to one row per document first (this writer runs
    AFTER packing, so rows ≈ sequences, not raw events), and Spark's
    range-partitioned window sort handles the rest.
    """
    from pyspark.sql import Window

    if max_tokens_per_shard < 1:
        raise ValueError(
            f"max_tokens_per_shard must be >= 1: {max_tokens_per_shard}"
        )
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    sharded = df.withColumn(
        "shard",
        F.floor(
            (F.sum(token_col).over(w) - F.lit(1))
            / F.lit(float(max_tokens_per_shard))
        ).cast("int"),
    )
    (
        sharded.write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    spark = df.sparkSession
    return (
        spark.read.format(fmt).load(path)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(token_col).alias("n_tokens"),
            F.min(order_col).alias("first_key"),
            F.max(order_col).alias("last_key"),
        )
        .orderBy("shard")
    )
