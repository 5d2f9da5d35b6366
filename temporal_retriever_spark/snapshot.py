"""Snapshot diffing: what changed between two versions of a table.

Training-data governance runs on this question — "what moved between
corpus v3 and v4?" — and the answer must come from one keyed
full-outer join, not a driver loop:

* `snapshot_diff` tags every key as added / removed / changed /
  unchanged in ONE full-outer join on the key (the only data-sized
  shuffle; AQE handles the skewed-key case). Column comparison is
  null-safe (`eqNullSafe`), so NULL→value and value→NULL are
  changes, NULL→NULL is not.
* `snapshot_diff_summary` reduces that to the release-note numbers:
  per-status counts plus per-column change counts (how many changed
  rows touched each compared column) — computed from the SAME join
  output, map-side combined, no second scan of either input.

Works for corpus snapshots (key = doc_id), dimension audits
(key = business key), and feature-store versions alike. For
*history* (when did each key change, validity ranges) use
``history.scd2_history``; this module compares exactly two states.

Reference parity: no versioning surface in the reference engine
(``/root/reference/temporal_retriever/app.py``); extends the
data-quality family (``quality.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "snapshot_diff",
    "snapshot_diff_summary",
]


def _resolve_compare_cols(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols
) -> list[str]:
    shared = [
        c for c in old.columns if c in set(new.columns) and c not in keys
    ]
    if compare_cols is None:
        return shared
    missing = [c for c in compare_cols if c not in shared]
    if missing:
        raise ValueError(
            f"compare_cols not present in both frames: {missing}"
        )
    return list(compare_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two table versions.

    Output: the key columns, ``diff_status`` in
    {'added','removed','changed','unchanged'}, ``changed_cols``
    (sorted array of differing column names, empty unless changed),
    and ``<col>_old`` / ``<col>_new`` for every compared column.

    Duplicate keys in either input make row-level diffing ill-posed;
    this joins as-is (a key duplicated n×m ways yields n·m rows) —
    enforce key uniqueness upstream (`quality.uniqueness`) when that
    matters.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    cols = _resolve_compare_cols(old, new, keys, compare_cols)
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"{c}_old") for c in cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"{c}_new") for c in cols],
    )
    j = o.join(n, on=keys, how="full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")),
                        F.lit(c),
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    ) if cols else F.array().cast("array<string>")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("diff_status"),
        F.when(status == "changed", changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
        *[F.col(f"{c}_old") for c in cols],
        *[F.col(f"{c}_new") for c in cols],
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """Release-note rollup of a `snapshot_diff` output.

    One row per status with ``n_keys``; 'changed' rows additionally
    carry ``col_changes`` — a sorted array of (column, count) structs
    over the compared columns that differed. Single aggregation over
    the diff (explode only the changed rows' column lists).
    """
    per_status = diff.groupBy("diff_status").agg(
        F.count("*").alias("n_keys")
    )
    col_counts = (
        diff.filter(F.col("diff_status") == "changed")
        .select(F.explode("changed_cols").alias("col"))
        .groupBy("col")
        .agg(F.count("*").alias("n"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("col"), F.col("n")))
            ).alias("col_changes")
        )
        .withColumn("diff_status", F.lit("changed"))
    )
    return per_status.join(col_counts, on="diff_status", how="left").select(
        "diff_status",
        "n_keys",
        F.coalesce(
            "col_changes",
            F.array().cast("array<struct<col:string,n:bigint>>"),
        ).alias("col_changes"),
    )
