"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

Single-column sort gives parquet min/max pruning on ONE predicate
column; real workloads filter on several (time AND user, domain AND
quality). Interleaving the bits of range-normalized column indexes
(the Morton / Z-order curve — Morton 1966; the same layout Delta
Lake's OPTIMIZE ZORDER and Hudi clustering use) makes rows that are
close in EVERY dimension land in the same files, so row-group
min/max stats stay tight on all z-columns at once and the scan
planner can skip row groups for predicates on any of them.

Everything is native expressions:

* ``zvalue_expr`` — per-column normalize to a ``bits``-wide integer
  index ``floor((x − min)/(max − min) · 2^bits)`` (clamped), then
  bit-interleave the indexes into one BIGINT via shift/AND/OR terms
  (``bits × n_cols`` codegen'd terms, no UDF). NULL in any z-column
  maps to index 0 — nulls cluster first, the Delta convention.
* ``zorder_write`` — ``repartitionByRange`` on the z-value (one
  range exchange; Spark samples the range bounds) + in-partition
  sort, then parquet. At 100 TB this is exactly one shuffle of the
  data — the same cost as any global sort — and the returned layout
  turns every later multi-predicate scan into a row-group-pruned
  one.

Column min/max come from one driver-side aggregation (2·k doubles)
unless the caller passes them (a catalog would).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue_expr", "zorder_write", "column_ranges"]


def column_ranges(
    df: DataFrame, cols: Sequence[str]
) -> dict[str, tuple[float, float]]:
    """(min, max) per column from ONE aggregation — 2·k doubles to the
    driver."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in cols}


def zvalue_expr(
    cols: Sequence[str],
    ranges: dict[str, tuple[float, float]],
    *,
    bits: int = 16,
) -> Column:
    """Morton z-value of ``cols`` as a BIGINT expression.

    Each column normalizes to ``idx = clamp(floor((x − mn)/(mx − mn)
    · 2^bits), 0, 2^bits − 1)`` (constant columns and NULLs → 0),
    then bit ``b`` of column ``i`` lands at output bit
    ``b·n_cols + i`` — the standard interleave, identical and
    reproducible in plain SQL for the oracle.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits * k <= 62:
        raise ValueError(
            f"bits*len(cols) must fit a signed BIGINT: got {bits}*{k}"
        )
    top = (1 << bits) - 1
    idxs = []
    for c in cols:
        mn, mx = ranges[c]
        if mn is None or mx is None or mx == mn:
            idxs.append(F.lit(0).cast("long"))
            continue
        scaled = (
            (F.col(c).cast("double") - F.lit(float(mn)))
            / F.lit(float(mx) - float(mn))
            * F.lit(float(1 << bits))
        )
        # explicit NULL branch first: least/greatest SKIP nulls (they
        # return the least/greatest non-null), so a null floor would
        # otherwise clamp to `top` instead of 0
        idxs.append(
            F.when(F.col(c).isNull(), F.lit(0).cast("long")).otherwise(
                F.greatest(
                    F.lit(0).cast("long"),
                    F.least(F.floor(scaled), F.lit(top).cast("long")),
                )
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, idx in enumerate(idxs):
            bit = F.shiftright(idx, b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    *,
    zorder_by: Iterable[str],
    num_files: int = 32,
    bits: int = 16,
    ranges: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    ``zorder_by``: one range exchange on the z-value + in-partition
    sort, so row-group min/max stats stay tight on every z-column."""
    cols = list(zorder_by)
    if ranges is None:
        ranges = column_ranges(df, cols)
    z = zvalue_expr(cols, ranges, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
