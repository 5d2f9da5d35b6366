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

Probe cost note (r10, VERDICT r9 items): the guard used to call
``df.rdd.getNumPartitions()``, which forces FULL physical planning of
the upstream plan plus an RDD-conversion lineage on the driver at
every operator-construction call — repeated in nested compositions
like prepare_corpus → gopher/shingle paths — and for post-shuffle
inputs reports the pre-AQE count (``spark.sql.shuffle.partitions``),
not the runtime layout. The guard now estimates the scan partition
count from the plan's input files and the session's split confs
(mirroring Spark's ``FilePartition`` packing), which needs analysis
only; the physical probe remains as the fallback for non-file inputs.
Keep call sites SCAN-LEVEL (a narrow projection over a file read, as
every current caller is): for a frame downstream of a shuffle the
file-based estimate describes the leaf scan, not the frame's current
partitioning — same caveat the old probe had, in the other direction.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

__all__ = ["spread_scan"]

_UNITS = {
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
}


def _parse_bytes(text: object, default: int) -> int:
    """Parse a Spark byte-size conf value ("128m", "4194304b", 134217728)."""
    if text is None:
        return default
    s = str(text).strip().lower()
    try:
        return int(s)
    except ValueError:
        pass
    for suffix in sorted(_UNITS, key=len, reverse=True):
        if s.endswith(suffix):
            try:
                return int(float(s[: -len(suffix)]) * _UNITS[suffix])
            except ValueError:
                return default
    return default


def _estimate_scan_partitions(df: DataFrame) -> int | None:
    """Scan partition count for a plan over local file sources, WITHOUT
    physically planning it.

    Mirrors Spark's split computation (``FilePartition.maxSplitBytes`` +
    size-descending bin packing): each file is charged
    ``openCostInBytes``, split at ``min(maxPartitionBytes,
    max(openCost, totalBytes/minPartitionNum))`` and packed greedily.
    Returns None when the frame reads no files (in-memory relations,
    non-local URIs) — callers fall back to the physical probe.
    """
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — any analysis hiccup → fallback
        return None
    if not files:
        return None
    sizes = []
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        try:
            sizes.append(os.path.getsize(unquote(parsed.path)))
        except OSError:
            return None
    spark = df.sparkSession
    conf = spark.conf
    max_split = _parse_bytes(
        conf.get("spark.sql.files.maxPartitionBytes", None), 128 * 1024**2
    )
    open_cost = _parse_bytes(
        conf.get("spark.sql.files.openCostInBytes", None), 4 * 1024**2
    )
    min_num_raw = conf.get("spark.sql.files.minPartitionNum", None) or conf.get(
        "spark.sql.leafNodeDefaultParallelism", None
    )
    min_num = (
        int(min_num_raw) if min_num_raw else spark.sparkContext.defaultParallelism
    )
    total = sum(s + open_cost for s in sizes)
    split = min(max_split, max(open_cost, total // max(min_num, 1)))
    pieces: list[int] = []
    for s in sizes:
        while s > split:
            pieces.append(split)
            s -= split
        if s > 0:
            pieces.append(s)
    pieces.sort(reverse=True)
    parts = 0
    acc = None
    for p in pieces:
        if acc is None or acc + p + open_cost > split:
            parts += 1
            acc = p
        else:
            acc += p + open_cost
    return max(parts, 1)


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
    parts = _estimate_scan_partitions(df)
    if parts is None:
        # non-file input: pay the physical probe (rare on engine paths)
        parts = df.rdd.getNumPartitions()
    if parts >= want:
        return df
    return df.repartition(want)
