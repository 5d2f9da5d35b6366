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
