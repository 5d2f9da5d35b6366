"""Tabular null imputation — the feature-prep step between ingest and
modeling (scikit-learn's SimpleImputer semantics, distributed).

``gap_fill`` (rolling.py) interpolates ordered time series; this
module fills unordered tabular nulls from group statistics: mean /
median / mode per optional group key, or a constant. The fill values
are a tiny per-group table broadcast back onto the scan — one
aggregation pass for all mean/median columns together, plus one small
(group, value) count aggregation per mode column (modes cannot share
the moments aggregate), then a single join + coalesce projection.

Determinism: mode ties break on the smallest value (explicit
ordering), median is Spark's exact median — both mirror in SQL.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["impute"]

_STATS = ("mean", "median", "mode")


def impute(
    df: DataFrame,
    strategy: Mapping[str, Any],
    *,
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """Fill nulls per ``strategy``: col → "mean" | "median" | "mode" |
    ("constant", value).

    With ``group_cols``, fills come from each row's own group (e.g.
    per-source medians); groups whose statistic is undefined (all-null
    column) keep their nulls — imputation never invents values.
    Adds one ``{col}_imputed`` boolean per strategy column.
    """
    strategy = dict(strategy)
    if not strategy:
        raise ValueError("strategy must be non-empty")
    group_cols = list(group_cols)
    for col, how in strategy.items():
        if col not in df.columns:
            raise ValueError(f"unknown column: {col!r}")
        if isinstance(how, str):
            if how not in _STATS:
                raise ValueError(
                    f"unknown strategy {how!r} for {col!r} "
                    f"(use {_STATS} or ('constant', value))"
                )
        elif not (
            isinstance(how, tuple) and len(how) == 2 and how[0] == "constant"
        ):
            raise ValueError(f"bad strategy for {col!r}: {how!r}")

    moment_cols = {
        c: h for c, h in strategy.items() if h in ("mean", "median")
    }
    mode_cols = [c for c, h in strategy.items() if h == "mode"]
    const_cols = {
        c: h[1] for c, h in strategy.items() if isinstance(h, tuple)
    }

    out = df
    fills: DataFrame | None = None
    if moment_cols:
        aggs = [
            (F.avg(c) if h == "mean" else F.median(c)).alias(f"_f_{c}")
            for c, h in moment_cols.items()
        ]
        fills = (
            df.groupBy(*group_cols).agg(*aggs)
            if group_cols
            else df.agg(*aggs)
        )
    for c in mode_cols:
        mc = (
            df.filter(F.col(c).isNotNull())
            .groupBy(*group_cols, c)
            .agg(F.count("*").alias("_n"))
            .groupBy(*group_cols)
            .agg(
                F.min_by(
                    c, F.struct((-F.col("_n")).alias("a"), F.col(c).alias("b"))
                ).alias(f"_f_{c}")
            )
        )
        if fills is None:
            fills = mc
        elif group_cols:
            # null-safe merge: the NULL group's moment and mode fills
            # must land on ONE row (plain `on=` would keep two
            # null-keyed rows and later double-match)
            renamed = mc
            for g in group_cols:
                renamed = renamed.withColumnRenamed(g, f"_mk_{g}")
            cond = None
            for g in group_cols:
                eq = F.col(g).eqNullSafe(F.col(f"_mk_{g}"))
                cond = eq if cond is None else cond & eq
            fills = (
                fills.join(renamed, on=cond, how="full")
                .withColumns(
                    {
                        g: F.coalesce(F.col(g), F.col(f"_mk_{g}"))
                        for g in group_cols
                    }
                )
                .drop(*[f"_mk_{g}" for g in group_cols])
            )
        else:
            fills = fills.crossJoin(mc)
    if fills is not None:
        if group_cols:
            # null-SAFE key equality: a NULL group is a real group with
            # its own statistics; plain `on=` would never match it and
            # silently leave those rows unfilled
            renamed = fills
            for g in group_cols:
                renamed = renamed.withColumnRenamed(g, f"_gk_{g}")
            cond = None
            for g in group_cols:
                eq = F.col(g).eqNullSafe(F.col(f"_gk_{g}"))
                cond = eq if cond is None else cond & eq
            out = out.join(F.broadcast(renamed), on=cond, how="left").drop(
                *[f"_gk_{g}" for g in group_cols]
            )
        else:
            out = out.crossJoin(F.broadcast(fills))
    proj = []
    for c in df.columns:
        if c in const_cols:
            proj.append(F.coalesce(F.col(c), F.lit(const_cols[c])).alias(c))
        elif c in strategy:
            proj.append(F.coalesce(F.col(c), F.col(f"_f_{c}")).alias(c))
        else:
            proj.append(F.col(c))
    flags = [
        (F.col(c).isNull() & (
            F.lit(True) if c in const_cols else F.col(f"_f_{c}").isNotNull()
        )).alias(f"{c}_imputed")
        for c in strategy
    ]
    return out.select(*proj, *flags)
