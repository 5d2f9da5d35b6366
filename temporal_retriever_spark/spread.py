"""Scan-parallelism guard for compute-heavy per-row passes.

A small parquet input (one ~100 MB file, or the whole corpus at test
scale factors) arrives as ONE scan partition, so any operator whose
cost is per-row expression work — n-gram HOFs, regex chains, pandas
UDF decoders — serializes on a single core while the rest of the box
idles (guide §2.5 "input skew": fix at the source or repartition
immediately after the read). The fix is a round-robin spread of the
*narrow* input before the expensive projection; the guard makes it a
no-op at real partition counts, so at cluster scale (where a 100 TB
scan is tens of thousands of partitions already) the exchange never
fires and plans are unchanged.

This is the same conditional-spread pattern ``llm.similarity`` has
used since round 8 for probe scans, factored out so every text / LM /
codec operator shares one audited implementation.

Scale-adaptivity note: the target is ``defaultParallelism`` (the
actual core count of the session), never a constant — so the same
code is right under ``local[2]``, ``local[32]`` and a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_scan"]


def spread_scan(df: DataFrame, *, factor: int = 1) -> DataFrame:
    """Return ``df`` repartitioned to ``factor × defaultParallelism``
    iff it currently has fewer partitions than that; otherwise return
    it unchanged (the cluster-scale no-op path).

    Call it on the *narrow* projection feeding a compute-heavy pass so
    the exchange moves only the columns that pass needs. The exchange
    is round-robin (keyless ``repartition(n)``) — deterministic under
    task retry because Spark sorts before repartition by default
    (SPARK-23207), and balanced regardless of key skew.
    """
    if df.isStreaming:  # no .rdd on a streaming frame; micro-batch
        return df       # sources set their own parallelism
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism * max(1, factor)
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
