"""As-of joins and sessionization — event-time operators beyond the
reference's equi-join surface.

The reference aligns series only by exact bucket equality (pandas
``merge`` on ``ds``, app.py:144-149, 180-188). Real time-series joins
at ingest grain need *as-of* semantics — "latest covariate observation
at or before each target timestamp" — which the reference sidesteps by
forcing both series through the same bucket grid first. We provide the
general operator.

Scale design:

* ``asof_join`` is NOT implemented as a range join (which Spark plans
  as a broadcast-nested-loop or a cartesian-with-filter at worst). It
  is the classic union + partitioned-sort formulation: tag both inputs,
  union them, and run ONE window pass per key ordered by time, carrying
  the most recent right-side row forward with
  ``last_value(..., ignorenulls)``. Cost: a single shuffle on the join
  keys for rows from both sides, then a per-partition sort — the same
  shape as a sort-merge join, with no risk of a nested-loop fallback
  and no row explosion on duplicate timestamps.
* ``sessionize`` is one window pass per key (lag + running sum), the
  textbook gaps-and-islands plan; the streaming variant in
  ``streaming.streaming_sessionize`` uses native ``F.session_window``
  so batch and stream share gap semantics.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from temporal_retriever_spark.grains import interval_seconds

#: internal column names — prefixed to stay out of user namespaces and
#: validated against both inputs before use
_SIDE = "__asof_side"
_PAY = "__asof_pay"
_MB = "__asof_mb"
_MF = "__asof_mf"
_M = "__asof_m"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Iterable[str] = (),
    ts_col: str = "ds",
    right_ts_col: str | None = None,
    value_cols: Iterable[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "",
    keep_match_ts: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the right-side values
    from the closest right row (same equi-keys ``on``) in the given
    ``direction``:

    * ``"backward"`` (default) — latest right row with rts ≤ lts
      (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``)
    * ``"forward"`` — earliest right row with rts ≥ lts
    * ``"nearest"`` — whichever of those two is closer in time; exact
      matches win, and a distance tie resolves backward (the earlier
      row), matching a deterministic reading of ``merge_asof``.

    Semantics match pandas ``merge_asof`` with
    ``allow_exact_matches=True``: a right row at exactly the left
    timestamp matches in every direction. Left rows with no candidate
    get nulls (left join).

    ``tolerance`` (an INTERVAL string like ``"2 days"``) nulls matches
    farther than the interval in the match direction, mirroring
    ``merge_asof``'s tolerance.

    ``value_cols`` defaults to every right column that is neither a key
    nor the right timestamp. ``suffix`` renames attached columns (e.g.
    ``suffix="_r"``) when they collide with left columns.

    Plan shape: union both sides (right rows carry a struct payload,
    left rows a null payload), one shuffle+sort on ``on`` ordered by
    ``(ts, side)`` with right-before-left at timestamp ties, then
    ``last_value(payload, ignorenulls)`` over the unbounded-preceding
    frame (and, for forward/nearest, ``first_value`` over the following
    frame — the SAME sort serves both directions, still one shuffle).
    Filtering back to left rows yields exactly one output row per left
    row — duplicate right timestamps resolve to the row that sorts
    last among them (latest payload), never a fanout.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction: {direction!r}")
    on = list(on)
    rts = right_ts_col or ts_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*on, rts)]
    value_cols = list(value_cols)

    # fail fast on output-name collisions: an attached column landing on
    # an existing left name would silently produce a duplicate column
    clashes = sorted(
        {f"{c}{suffix}" for c in value_cols} & set(left.columns)
    )
    if clashes:
        raise ValueError(
            f"asof_join output column(s) {clashes} already exist on the "
            f"left side; pass suffix= (e.g. suffix='_r') or value_cols= "
            f"to disambiguate"
        )
    if keep_match_ts and f"matched{suffix}_ts" in left.columns:
        raise ValueError(
            f"asof_join match-timestamp column 'matched{suffix}_ts' "
            f"already exists on the left side; pass a different suffix"
        )
    taken = set(left.columns) | set(right.columns)
    for internal in (_SIDE, _PAY, _MB, _MF, _M):
        if internal in taken:
            raise ValueError(
                f"column name {internal!r} is reserved by asof_join "
                f"internals; rename it before joining"
            )
    if "_ats" in value_cols:
        raise ValueError(
            "value column name '_ats' is reserved by asof_join internals; "
            "rename it before joining"
        )

    payload = F.struct(
        F.col(rts).alias("_ats"), *[F.col(c).alias(c) for c in value_cols]
    )
    right_tagged = right.select(
        *on,
        F.col(rts).alias(ts_col).cast(dict(left.dtypes)[ts_col]),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAY),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in (*on, ts_col)],
    )
    left_tagged = left.select(
        *on,
        ts_col,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right_tagged.schema[_PAY].dataType).alias(_PAY),
        *[c for c in left.columns if c not in (*on, ts_col)],
    )
    unioned = left_tagged.unionByName(right_tagged)

    # one sort serves both directions: (ts, side) with right-before-left
    # at ties, so the backward frame catches exact matches and the
    # forward frame sees strictly-later rights (exact matches are
    # recovered from the backward candidate below)
    if not on:
        from temporal_retriever_spark.rolling import warn_keyless

        warn_keyless("asof_join")
    part = Window.partitionBy(*on) if on else Window.partitionBy(F.lit(1))
    wbase = part.orderBy(ts_col, _SIDE)
    w_bwd = wbase.rowsBetween(Window.unboundedPreceding, 0)
    # forward lookup = backward lookup under the REVERSED sort: Spark
    # rescans unboundedFollowing frames per row (O(n^2) per key
    # partition); the reversed growing frame is incremental. At equal
    # ts the desc side order puts rights AFTER the left row, so the
    # forward frame still sees strictly-later rights only — same
    # semantics as the ascending [current, following) frame.
    w_fwd = part.orderBy(F.desc(ts_col), F.desc(_SIDE)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.withColumn(
        _MB, F.last(_PAY, ignorenulls=True).over(w_bwd)
    )
    if direction != "backward":
        carried = carried.withColumn(
            _MF, F.last(_PAY, ignorenulls=True).over(w_fwd)
        )
    lts = F.col(ts_col).cast("timestamp")
    if direction == "backward":
        carried = carried.withColumn(_M, F.col(_MB))
    elif direction == "forward":
        # exact-ts right sorts before the left row -> surfaces as the
        # backward candidate with zero distance; prefer it
        exact = F.col(_MB).isNotNull() & (
            F.col(f"{_MB}._ats").cast("timestamp") == lts
        )
        carried = carried.withColumn(
            _M, F.when(exact, F.col(_MB)).otherwise(F.col(_MF))
        )
    else:
        db = F.abs(lts.cast("double") - F.col(f"{_MB}._ats").cast("timestamp").cast("double"))
        df_ = F.abs(F.col(f"{_MF}._ats").cast("timestamp").cast("double") - lts.cast("double"))
        carried = carried.withColumn(
            _M,
            F.when(F.col(_MB).isNull(), F.col(_MF))
            .when(F.col(_MF).isNull(), F.col(_MB))
            .when(db <= df_, F.col(_MB))  # tie -> backward (earlier)
            .otherwise(F.col(_MF)),
        )
    match_ok = F.col(_M).isNotNull()
    if tolerance is not None:
        dist = F.abs(
            F.col(f"{_M}._ats").cast("timestamp").cast("double") - lts.cast("double")
        )
        # Python-side parse: epoch arithmetic on a timestamp literal is
        # session-timezone-dependent (shifts by the UTC offset)
        match_ok = match_ok & (dist <= F.lit(interval_seconds(tolerance)))
    out_cols = [c for c in left.columns]
    attached = [
        F.when(match_ok, F.col(f"{_M}.{c}")).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    if keep_match_ts:
        attached.append(F.when(match_ok, F.col(f"{_M}._ats")).alias(f"matched{suffix}_ts"))
    return carried.filter(F.col(_SIDE) == 1).select(*out_cols, *attached)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    *,
    on: Iterable[str] = (),
    ts_col: str = "ds",
    start_col: str = "start",
    end_col: str = "end",
    closed: str = "left",
    bucket: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: attach every interval row containing
    each event's timestamp (same equi-keys ``on``), without ever
    planning a nested-loop join.

    ``closed`` picks the boundary semantics: ``"left"`` = [start, end)
    (the streaming/window convention), ``"right"`` = (start, end],
    ``"both"`` = [start, end], ``"neither"`` = (start, end).

    ``how="inner"`` keeps matched events only; ``how="left"`` also
    keeps unmatched events with null interval columns.

    Scale design — the published range-join binning strategy: a naive
    ``events.join(intervals, start <= ts < end)`` has no equi-condition,
    so Spark plans BroadcastNestedLoopJoin (or a cartesian) — O(n·m)
    and a driver OOM risk at scale. Instead both sides are binned into
    fixed-width ``bucket`` cells: each event lands in exactly ONE cell
    (``floor(epoch/width)``), each interval is exploded to every cell
    it overlaps (a per-row ``sequence`` — distributed, bounded by
    span/width), and the join becomes an EQUI-join on
    ``(*on, cell)`` + a residual range filter. Every (event, interval)
    pair meets exactly once (in the event's cell), so no dedup pass is
    needed. Pick ``bucket`` near the typical interval length: the
    interval side is duplicated ~span/width times while the event side
    never duplicates. Two shuffles (one per side, co-partitioned on
    the join key) — the same cost as any distributed equi-join.
    """
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError(f"unsupported closed mode: {closed!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how!r}")
    on = list(on)
    reserved = {"__iv_cell", "__iv_c0", "__iv_c1"}
    if reserved & (set(events.columns) | set(intervals.columns)):
        raise ValueError(
            f"column names {sorted(reserved)} are reserved by interval_join"
        )
    overlap = set(intervals.columns) - set(on) & set(events.columns)
    if overlap:
        raise ValueError(
            f"interval column(s) {sorted(overlap)} collide with event "
            f"columns; rename before joining"
        )
    width_us = int(interval_seconds(bucket) * 1_000_000)
    ev_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lo_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    hi_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    ev = events.withColumn("__iv_cell", F.floor(ev_us / width_us))
    iv = (
        intervals.withColumn("__iv_c0", F.floor(lo_us / width_us))
        .withColumn("__iv_c1", F.floor(hi_us / width_us))
        .withColumn(
            "__iv_cell", F.explode(F.sequence(F.col("__iv_c0"), F.col("__iv_c1")))
        )
        .drop("__iv_c0", "__iv_c1")
    )
    ge = ev_us >= lo_us if closed in ("left", "both") else ev_us > lo_us
    le = ev_us <= hi_us if closed in ("right", "both") else ev_us < hi_us
    joined = ev.join(iv, on=[*on, "__iv_cell"], how="inner").filter(ge & le)
    out_cols = [*events.columns, *[c for c in intervals.columns if c not in on]]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    # null-safe anti-join: plain column equality treats NULL = NULL as
    # unknown, so a matched event carrying a NULL column would ALSO be
    # emitted as unmatched (one event, two output rows)
    matched_ev = matched.select(*events.columns)
    cond = None
    for c in events.columns:
        eq = events[c].eqNullSafe(matched_ev[c])
        cond = eq if cond is None else cond & eq
    missed = events.join(matched_ev, on=cond, how="left_anti")
    for c in intervals.columns:
        if c not in on:
            missed = missed.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
    return matched.unionByName(missed.select(*out_cols))


def sessionize(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
) -> DataFrame:
    """Assign gap-based session numbers to an event stream (batch).

    A new session starts when the time since the previous event of the
    same key is ``>= gap``. This matches ``F.session_window``'s
    half-open [first_event, last_event + gap) windows: an event landing
    exactly at the previous session's end timestamp falls outside that
    window and opens a new session, so the batch and streaming variants
    agree on boundaries.

    Output: input rows plus ``session_seq`` (1-based per key, ordered
    by time). One window shuffle on the key; the running sum is the
    gaps-and-islands plan every SQL engine uses.
    """
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) >= prev + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*series_cols).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn("_new", is_new).withColumn(
        "session_seq", F.sum("_new").over(run)
    ).drop("_new")


def session_stats(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates: start, end, duration (sec), event count,
    and (optionally) the summed value. The sessionize window shuffle is
    on the same key as this groupBy, so Catalyst reuses the exchange —
    one shuffle total.
    """
    series_cols = list(series_cols)
    sess = sessionize(events, gap=gap, series_cols=series_cols, ts_col=ts_col)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        # double seconds (exact at micro precision): sub-second-truncating
        # unix_timestamp would disagree with SQL engines' epoch()
        (
            F.max(ts_col).cast("double") - F.min(ts_col).cast("double")
        ).alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("session_value"))
    return sess.groupBy(*series_cols, "session_seq").agg(*aggs)
