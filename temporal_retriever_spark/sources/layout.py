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

__all__ = ["column_ranges", "hilbert_expr", "hilbert_stages", "hilbert_write", "with_hilbert", "zorder_write", "zvalue_expr"]


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


def hilbert_stages(bits: int) -> list[tuple[str, str]]:
    """Shared SQL stages computing the 2-D Hilbert index from integer
    grid coordinates ``hx0``/``hy0`` (each < 2^bits): the classic
    xy2d bit transform unrolled — per scale s the quadrant digit
    ``(3·rx) XOR ry`` (emitted as the arithmetic ``3rx + ry − 2rx·ry``
    since DuckDB's ``^`` is exponentiation) and the reflect+swap
    rotation. Emitted as sequential (name, expr) stages because each
    round's (x, y) feed the next — pure column nesting would
    duplicate subtrees exponentially (the same staging rule as the
    Cholesky emitters). The SAME strings drive the Spark plan and the
    DuckDB oracle. Final index column: ``hd{bits}``.

    Property-tested (tests/test_layout.py): the mapping is a
    bijection on the 2^bits × 2^bits grid and consecutive indexes are
    Manhattan-adjacent cells — the Hilbert locality guarantee that
    beats Z-order's diagonal jumps for 2-D range predicates.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    stages: list[tuple[str, str]] = [("hd0", "CAST(0 AS BIGINT)")]
    # hd0 seeds the chain; rounds run from the top bit down. The C
    # formulation tests bits with `&` (high bits are simply ignored);
    # the arithmetic version must keep the invariant x, y ∈ [0, 2s)
    # explicitly, so each round strips the tested bit (xl = x − rx·s)
    # before the reflect+swap — verified equal to the masked reference
    # cell-for-cell in tests.
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx, ry = f"rx{i}", f"ry{i}"
        stages.append((rx, f"CAST(FLOOR(hx{i} / {s}) AS BIGINT) % 2"))
        stages.append((ry, f"CAST(FLOOR(hy{i} / {s}) AS BIGINT) % 2"))
        stages.append(
            (
                f"hd{i + 1}",
                f"hd{i} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})",
            )
        )
        xl = f"(hx{i} - {rx} * {s})"
        yl = f"(hy{i} - {ry} * {s})"
        stages.append(
            (
                f"hx{i + 1}",
                f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                f"THEN {s - 1} - {yl} ELSE {yl} END) ELSE {xl} END",
            )
        )
        stages.append(
            (
                f"hy{i + 1}",
                f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                f"THEN {s - 1} - {xl} ELSE {xl} END) ELSE {yl} END",
            )
        )
    return stages


def _range_index(
    c: str, mn: float | None, mx: float | None, bits: int
) -> Column:
    """clamp(floor((x − mn)/(mx − mn) · 2^bits)) — the zvalue_expr
    normalization as a reusable piece (NULL/constant → 0)."""
    top = (1 << bits) - 1
    if mn is None or mx is None or mx == mn:
        return F.lit(0).cast("long")
    scaled = (
        (F.col(c).cast("double") - F.lit(float(mn)))
        / F.lit(float(mx) - float(mn))
        * F.lit(float(1 << bits))
    )
    return F.when(F.col(c).isNull(), F.lit(0).cast("long")).otherwise(
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.floor(scaled), F.lit(top).cast("long")),
        )
    )


def hilbert_expr(x_idx: Column, y_idx: Column, *, bits: int = 16) -> Column:
    """2-D Hilbert index of two integer grid coordinates as ONE
    runtime `aggregate` HOF fold over the scale sequence.

    Why a fold and not the `hilbert_stages` chain on the Spark side:
    each round's (x, y) feed the next, and Catalyst's CollapseProject
    substitutes aliases when it merges the per-stage Projects — at 16
    bits the statically-unrolled tree duplicates subtrees
    exponentially and OOMs the driver during analysis (measured). The
    fold keeps the round body as ONE lambda evaluated iteratively at
    runtime — codegen'd, zero Python, constant plan size. The DuckDB
    oracle replays `hilbert_stages` (same masked arithmetic, CTE
    chain) — the two are asserted cell-for-cell equal in tests.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    scales = F.array(
        *[F.lit(1 << (bits - 1 - i)).cast("long") for i in range(bits)]
    )

    def step(acc: Column, s: Column) -> Column:
        rx = F.floor(acc["x"] / s).cast("long") % 2
        ry = F.floor(acc["y"] / s).cast("long") % 2
        d = acc["d"] + s * s * (3 * rx + ry - 2 * rx * ry)
        xl = acc["x"] - rx * s
        yl = acc["y"] - ry * s
        refl = rx == 1
        swap = ry == 0
        nx = F.when(swap, F.when(refl, s - 1 - yl).otherwise(yl)).otherwise(xl)
        ny = F.when(swap, F.when(refl, s - 1 - xl).otherwise(xl)).otherwise(yl)
        return F.struct(nx.alias("x"), ny.alias("y"), d.alias("d"))

    init = F.struct(
        x_idx.cast("long").alias("x"),
        y_idx.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    return F.aggregate(scales, init, step, lambda acc: acc["d"])


def with_hilbert(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 16,
    ranges: dict[str, tuple[float, float]] | None = None,
    out_col: str = "hvalue",
) -> DataFrame:
    """Append the 2-D Hilbert index of two range-normalized columns.

    Hilbert beats Morton for layout because the curve never jumps
    across the space (consecutive indexes are ADJACENT cells — see
    `hilbert_stages`), so range predicates on either column cut even
    tighter row-group envelopes. Pure codegen'd arithmetic
    (`hilbert_expr` fold), no UDF, one pass.
    """
    cols = list(cols)
    if len(cols) != 2:
        raise ValueError(f"Hilbert layout is 2-D: need exactly 2 cols, got {cols}")
    if ranges is None:
        ranges = column_ranges(df, cols)
    return df.withColumn(
        out_col,
        hilbert_expr(
            _range_index(cols[0], *ranges[cols[0]], bits),
            _range_index(cols[1], *ranges[cols[1]], bits),
            bits=bits,
        ),
    )


def hilbert_write(
    df: DataFrame,
    path: str,
    *,
    hilbert_by: Sequence[str],
    num_files: int = 32,
    bits: int = 16,
    ranges: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Hilbert curve of two columns —
    `zorder_write` with the locality-tighter curve: one range
    exchange on the index + in-partition sort."""
    d = with_hilbert(df, list(hilbert_by), bits=bits, ranges=ranges)
    (
        d.repartitionByRange(num_files, "hvalue")
        .sortWithinPartitions("hvalue")
        .drop("hvalue")
        .write.mode(mode)
        .parquet(path)
    )
