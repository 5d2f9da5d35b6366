"""Slowly-changing-dimension (SCD type-2) history from a change log,
and point-in-time snapshots over it.

The warehouse classic (Kimball's type-2 dimension): given a stream of
observed states (key, ts, attributes…), produce one row per VERSION —
``valid_from`` / ``valid_to`` half-open ranges, ``is_current``,
``version`` — collapsing consecutive observations whose attributes
did not change. ``snapshot_at`` then answers "what did the dimension
look like at time T?" — the join partner for as-of enrichment
(``asof.asof_join`` is the event-side view of the same idea; this is
the dimension-side one).

Plan shape: ONE window exchange per key does everything — change
detection is a ``lag`` comparison, ``valid_to`` is ``lead``,
``version`` is a running count of change points (all share the same
(key, order) window). Snapshots are a pure range filter on the
history — partition the stored history by ``valid_to IS NULL`` and
current-state reads never touch closed versions.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apply_cdc", "merge_cdc_snapshot", "scd2_history", "snapshot_at"]


def scd2_history(
    changes: DataFrame,
    *,
    key_cols: Iterable[str],
    ts_col: str = "ts",
    attr_cols: Iterable[str] | None = None,
    tiebreak_cols: Iterable[str] = (),
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Build the type-2 history.

    Output: key cols + attr cols + (valid_from, valid_to, is_current,
    version). Ranges are half-open ``[valid_from, valid_to)`` with
    NULL ``valid_to`` on the current version; ``version`` counts from
    1 per key in time order. ``tiebreak_cols`` make same-timestamp
    observations deterministic (pass a change-log sequence/id column).
    ``collapse_unchanged=False`` keeps every observation as a version.
    """
    key_cols = list(key_cols)
    tiebreak_cols = list(tiebreak_cols)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if attr_cols is None:
        attr_cols = [
            c
            for c in changes.columns
            if c not in key_cols and c != ts_col and c not in tiebreak_cols
        ]
    attr_cols = list(attr_cols)
    if not attr_cols:
        raise ValueError("no attribute columns to track")
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak_cols)
    cur = F.struct(*[F.col(c) for c in attr_cols])
    # eqNullSafe: NULL attribute values compare as equal to NULL (no
    # spurious versions), and the first row (lag NULL) is a change
    changed = (
        ~F.lag(cur).over(w).eqNullSafe(cur)
        if collapse_unchanged
        else F.lit(True)
    )
    marked = changes.select(
        *key_cols,
        F.col(ts_col),
        *tiebreak_cols,
        *attr_cols,
        changed.alias("_chg"),
    )
    versions = marked.filter(F.col("_chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak_cols)
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).alias("version"),
    )


def snapshot_at(history: DataFrame, ts, *, ts_type: str = "timestamp") -> DataFrame:
    """Point-in-time view: the version of each key valid at ``ts``
    (half-open ranges: ``valid_from <= ts < valid_to``). Keys that did
    not exist yet are absent. A pure filter — rides the history scan,
    prunes to current-only when ``ts`` ≥ every close time."""
    t = F.lit(ts).cast(ts_type)
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("is_current")


def apply_cdc(
    changelog: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
    delete_value: str = "delete",
    seq_col: str | None = None,
) -> DataFrame:
    """Collapse a CDC changelog into the current state (upsert/delete).

    Last-writer-wins per key: the newest record (by ``ts_col``, then
    ``seq_col`` for same-timestamp ordering — pass the log offset
    when you have one) decides; a delete as the newest record removes
    the key entirely. The rank filter compiles to the pre-shuffle
    ``WindowGroupLimit``, so each map task forwards one candidate row
    per key it sees — the shuffle carries ~keys rows, not the full
    changelog. This is the lakehouse MERGE-flatten; for full validity
    history use `scd2_history` instead.

    NULL timestamps are rejected loudly (a changelog row without a
    time has no position in last-writer-wins).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    # the guard lives inside the ordering expression itself, so
    # Catalyst cannot prune it away: a NULL timestamp fails the job
    ts_guarded = F.when(F.col(ts_col).isNotNull(), F.col(ts_col)).otherwise(
        F.assert_true(
            F.lit(False), F.lit(f"NULL {ts_col} in CDC changelog")
        ).cast(changelog.schema[ts_col].dataType)
    )
    order = [ts_guarded.desc()]
    if seq_col is not None:
        order.append(F.col(seq_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_value))
        .drop("_rn", op_col)
    )


def merge_cdc_snapshot(
    snapshot: DataFrame,
    changelog: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
    delete_value: str = "delete",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a changelog on top of an existing snapshot.

    The snapshot's rows enter the race as upserts that lose every
    timestamp tie (seq −1 vs the log's non-negative sequence; when no
    ``seq_col`` exists one is synthesized: 0 for log rows, −1 for
    snapshot rows), so a log row AT the snapshot timestamp supersedes
    it — the semantics of "snapshot as of T, log from T onward".
    """
    seq = seq_col or "_seq"
    log = changelog
    if seq_col is None:
        log = log.withColumn(seq, F.lit(0))
    snap = snapshot.select(
        *[
            F.col(c)
            for c in snapshot.columns
            if c not in (op_col, seq)
        ],
        F.lit("upsert").alias(op_col),
        F.lit(-1).cast(log.schema[seq].dataType).alias(seq),
    )
    merged = snap.unionByName(log, allowMissingColumns=False)
    out = apply_cdc(
        merged,
        keys=keys,
        ts_col=ts_col,
        op_col=op_col,
        delete_value=delete_value,
        seq_col=seq,
    )
    return out.drop(seq) if seq_col is None else out
