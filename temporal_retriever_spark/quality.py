"""Data-quality constraint validation — the deequ-style expectation
suite (Schelter et al. 2018, "Automating Large-Scale Data Quality
Verification", VLDB — public) as a single aggregation pass.

Every check compiles to an aggregate expression over the SAME
``df.agg(...)`` call, so a suite of N checks costs ONE job and one
scan regardless of N (count-distinct checks ride the same aggregation
via Spark's Expand). The result is a tidy (check, column, metric,
threshold, passed) frame — gate a pipeline stage on
``passed = all``, or store the metrics time series and alert on
drift.

Checks:

* ``completeness(col, min_ratio)`` — non-null fraction ≥ threshold
* ``uniqueness(cols, min_ratio)`` — distinct/total ≥ threshold (1.0 =
  primary key)
* ``bounds(col, min/max)`` — observed min/max inside limits
* ``contained_in(col, values, min_ratio)`` — fraction of rows whose
  value is in the allowed set
* ``row_count(min/max)`` — table size window
* ``non_negative(col)`` — shorthand bounds(col, min=0)
"""

from __future__ import annotations

from typing import Any, NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporal_retriever_spark.spread import spread_scan

__all__ = [
    "benford_test",
    "completeness",
    "uniqueness",
    "bounds",
    "contained_in",
    "row_count",
    "non_negative",
    "check_constraints",
    "key_skew_report",
    "profile_table",
]


class Check(NamedTuple):
    name: str
    column: str
    metric: Column
    threshold: float
    # metric `op` threshold ⇒ passed
    op: str  # ">=" or "<="


def completeness(col: str, *, min_ratio: float = 1.0) -> Check:
    m = F.try_divide(
        F.count(col).cast("double"), F.count(F.lit(1)).cast("double")
    )
    return Check("completeness", col, m, float(min_ratio), ">=")


def uniqueness(cols: list[str] | tuple[str, ...] | str, *, min_ratio: float = 1.0) -> Check:
    """distinct(cols)/rows. SQL COUNT DISTINCT semantics: tuples with
    any NULL component don't count as distinct values — pair with
    ``completeness`` when the key must also be non-null."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    m = F.try_divide(
        F.count_distinct(*[F.col(c) for c in cols]).cast("double"),
        F.count(F.lit(1)).cast("double"),
    )
    return Check("uniqueness", ",".join(cols), m, float(min_ratio), ">=")


def bounds(col: str, *, minimum: float | None = None, maximum: float | None = None) -> list[Check]:
    out = []
    if minimum is not None:
        out.append(
            Check("min_bound", col, F.min(col).cast("double"), float(minimum), ">=")
        )
    if maximum is not None:
        out.append(
            Check("max_bound", col, F.max(col).cast("double"), float(maximum), "<=")
        )
    if not out:
        raise ValueError("bounds needs minimum and/or maximum")
    return out


def contained_in(col: str, values, *, min_ratio: float = 1.0) -> Check:
    values = list(values)
    if not values:
        raise ValueError("values must be non-empty")
    m = F.try_divide(
        F.sum(F.col(col).isin(values).cast("long")).cast("double"),
        F.count(F.lit(1)).cast("double"),
    )
    return Check("contained_in", col, m, float(min_ratio), ">=")


def row_count(*, minimum: int = 1, maximum: int | None = None) -> list[Check]:
    out = [
        Check("row_count_min", "*", F.count(F.lit(1)).cast("double"), float(minimum), ">=")
    ]
    if maximum is not None:
        out.append(
            Check("row_count_max", "*", F.count(F.lit(1)).cast("double"), float(maximum), "<=")
        )
    return out


def non_negative(col: str) -> list[Check]:
    return bounds(col, minimum=0.0)


def _flatten(checks) -> list[Check]:
    flat: list[Check] = []
    for c in checks:
        if isinstance(c, Check):
            flat.append(c)
        else:
            flat.extend(c)
    if not flat:
        raise ValueError("no checks given")
    names = [(c.name, c.column) for c in flat]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate checks: {names}")
    return flat


def check_constraints(df: DataFrame, checks) -> DataFrame:
    """Evaluate a suite in ONE aggregation: (check, column, metric,
    threshold, passed). ``checks`` is any mix of Check values and the
    lists returned by ``bounds``/``row_count``/``non_negative``."""
    flat = _flatten(checks)
    aggs = [
        c.metric.alias(f"_m{i}") for i, c in enumerate(flat)
    ]
    row = df.agg(*aggs)
    parts = []
    for i, c in enumerate(flat):
        m = F.col(f"_m{i}")
        ok = (m >= F.lit(c.threshold)) if c.op == ">=" else (m <= F.lit(c.threshold))
        parts.append(
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                m.alias("metric"),
                F.lit(c.threshold).alias("threshold"),
                F.coalesce(ok, F.lit(False)).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*parts)).alias("_c")).select(
        "_c.check", "_c.column", "_c.metric", "_c.threshold", "_c.passed"
    )


def key_skew_report(
    df: DataFrame, key_cols: list[str] | tuple[str, ...]
) -> DataFrame:
    """Shuffle-skew diagnostics per candidate join/groupBy key.

    Before keying a 100 TB join on a column, ask this table whether
    one key value owns the partition: per column it reports
    ``n_rows, n_keys`` (NULL keys counted as a key), the heaviest
    value (``top_key`` as string, ``top_count, top_share``) and
    ``skew_factor`` = top_count / mean-count — the multiplier the
    slowest reducer pays vs the average. skew_factor ≳ 20 is the
    "salt this key or let AQE split it" signal.

    One count aggregation + one key-cardinality-sized reduction per
    column (tie on the heavy key breaks by key string for engine
    determinism); columns are independent jobs unioned.
    """
    outs = []
    for col in key_cols:
        per_key = df.groupBy(
            F.col(col).cast("string").alias("_k")
        ).agg(F.count("*").alias("_c"))
        agg = per_key.agg(
            F.lit(col).alias("key_col"),
            F.sum("_c").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max(F.struct(F.col("_c"), F.col("_k"))).alias("_top"),
        )
        outs.append(
            agg.select(
                "key_col",
                "n_rows",
                "n_keys",
                F.col("_top._k").alias("top_key"),
                F.col("_top._c").cast("long").alias("top_count"),
                (
                    F.col("_top._c")
                    / F.col("n_rows").cast("double")
                ).alias("top_share"),
                (
                    F.col("_top._c").cast("double")
                    * F.col("n_keys")
                    / F.col("n_rows")
                ).alias("skew_factor"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def benford_test(
    df: DataFrame,
    value_col: str,
    *,
    keys: list[str] | None = None,
) -> DataFrame:
    """Benford's-law conformance test — the forensic data-quality
    screen: naturally-occurring multiplicative quantities (prices,
    populations, trade volumes) put first significant digit d at
    frequency log10(1 + 1/d); fabricated, truncated, or synthetically
    capped data doesn't. A high chi-square here flags a column worth
    auditing BEFORE it trains anything.

    First digit of |x| via floor(|x| / 10^floor(log10 |x|)) — exact
    at any magnitude; zeros, NULLs and NaN excluded. Per key:

        chi2 = N * SUM_d (obs_d/N - p_d)^2 / p_d      (dof = 8)

    summed over ALL nine digits (absent digits contribute their full
    expected mass — the digit grid is exploded explicitly so the
    oracle mirrors row-for-row), plus ``max_dev`` =
    max_d |obs_d/N - p_d|, the practitioner's MAD-style screen.
    Exact dof-8 chi-square p via the engine-neutral `chi2_sf_sql`
    string. NULL statistic on empty input.

    Plan shape: groupBy(keys, digit) count — one map-side-combined
    shuffle bounded by keys x 9 — then the literal 9-digit grid joins
    in (key-sized) and one key-sized reduction finishes.

    Output per key: ``n, chi2_stat, max_dev, p_value``.
    """
    import math as _m

    from temporal_retriever_spark.diagnostics import chi2_sf_sql

    kcols = list(keys or [])
    xd = F.col(value_col).cast("double")
    x = F.abs(xd)
    ok = F.col(value_col).isNotNull() & ~F.isnan(xd) & (x > 0)
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    per_d = (
        df.filter(ok)
        .groupBy(*kcols, digit.alias("_d"))
        .agg(F.count("*").cast("double").alias("_c"))
    )
    grid = (
        per_d.select(*kcols).distinct()
        .select(*kcols, F.explode(F.array(*[F.lit(d) for d in range(1, 10)])).alias("_d"))
    )
    full = grid.join(per_d, on=[*kcols, "_d"], how="left").withColumn(
        "_c", F.coalesce(F.col("_c"), F.lit(0.0))
    )
    p = F.element_at(
        F.array(*[F.lit(_m.log10(1.0 + 1.0 / d)) for d in range(1, 10)]),
        F.col("_d"),
    )
    full = full.withColumn("_p", p)
    from pyspark.sql import Window as _W

    n = F.sum("_c").over(_W.partitionBy(*(kcols or [F.lit(1)])))
    dev = F.col("_c") / n - F.col("_p")
    scored = full.withColumn("_n", n).withColumn("_dev", dev)
    agg = scored.groupBy(*kcols).agg(
        F.max("_n").cast("long").alias("n"),
        (
            F.max("_n")
            * F.sum(F.col("_dev") * F.col("_dev") / F.col("_p"))
        ).alias("chi2_stat"),
        F.max(F.abs(F.col("_dev"))).alias("max_dev"),
    )
    return agg.withColumn(
        "p_value",
        F.when(
            F.col("chi2_stat").isNotNull(),
            F.expr(chi2_sf_sql("chi2_stat", 8)),
        ),
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | tuple[str, ...] | None = None,
) -> DataFrame:
    """One-pass column profile — the data-quality census a corpus
    intake runs before anything else: per column
    ``(column, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    mean, min_str, max_str)``.

    Numeric columns report min/max/mean as doubles; everything else
    reports min/max as strings (dates/timestamps via their canonical
    string cast) with the numeric slots NULL. ``n_distinct`` is the
    EXACT count of distinct non-null values.

    Scale: every statistic for every column rides ONE ``df.agg``
    (single scan; the multi-column count-distincts compile to Spark's
    Expand strategy — one shuffle carrying #cols × rows expanded
    records, the standard cost of exact multi-distinct; swap in the
    md5-HLL sketch from ``llm.sketch`` when approximate is fine at
    100 TB). The wide one-row result is unpivoted to per-column rows
    with a pure projection.
    """
    numeric = {"int", "bigint", "smallint", "tinyint", "float", "double", "decimal"}
    fields = [
        f
        for f in df.schema.fields
        if columns is None or f.name in set(columns)
    ]
    if not fields:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, f in enumerate(fields):
        c = F.col(f.name)
        is_num = f.dataType.simpleString().split("(")[0] in numeric
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias(f"_null{i}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"_dist{i}"))
        if is_num:
            aggs.append(F.min(c).cast("double").alias(f"_min{i}"))
            aggs.append(F.max(c).cast("double").alias(f"_max{i}"))
            aggs.append(F.avg(c.cast("double")).alias(f"_mean{i}"))
        else:
            aggs.append(F.min(c.cast("string")).alias(f"_smin{i}"))
            aggs.append(F.max(c.cast("string")).alias(f"_smax{i}"))
    # the multi-distinct Expand multiplies rows x#cols in the scan
    # stage; spread an under-partitioned scan first or it runs serial
    row = spread_scan(df.select(*[f.name for f in fields])).agg(*aggs)
    parts = []
    for i, f in enumerate(fields):
        is_num = f.dataType.simpleString().split("(")[0] in numeric
        parts.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null{i}").alias("n_null"),
                F.col(f"_dist{i}").alias("n_distinct"),
                (F.col(f"_min{i}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"_max{i}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"_mean{i}") if is_num else F.lit(None).cast("double")).alias("mean"),
                (F.lit(None).cast("string") if is_num else F.col(f"_smin{i}")).alias("min_str"),
                (F.lit(None).cast("string") if is_num else F.col(f"_smax{i}")).alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*parts)).alias("_p")).select("_p.*")
