"""Structured Streaming surface (SURVEY §2.8).

The reference is strictly request/response batch; the north star
mandates a streaming variant of the same semantics. Mapping:

* grain bucketing T2-T6 → tumbling ``F.window(ts, duration)`` for the
  fixed-width grains (D/W/H/min, durations from ``grain_duration``);
  window *end* labels W buckets (the batch canonical week-end label)
  and window *start* labels D/H/min (the batch floor labels).
* dedup-agg A1 → watermarked ``groupBy(window, series).agg(...)``.
* late data → rows older than the watermark are dropped by Spark;
  ``observe`` metrics count arriving rows per micro-batch.
* month grain has no fixed window width: aggregate daily in the stream,
  roll up to months in ``foreachBatch`` (or downstream batch) — state
  cleanup needs a fixed-width event-time window.
* forecasts stay micro-batch: ``forecast_refresh`` runs the batch
  forecaster over the accumulated bucket table inside ``foreachBatch``
  (the reference recomputes per request; we recompute per trigger).

Batch and streaming share one grain→duration mapping, so a query
verified against the DuckDB oracle in batch has the same bucket labels
in the stream (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import agg_expr
from temporal_retriever_spark.grains import (
    grain_duration,
    interval_seconds,
    normalize_grain,
)


def _with_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Coerce ``ts_col`` to TimestampType for event-time semantics.

    Tz-naive micro-precision parquet infers as TIMESTAMP_NTZ (Spark 4),
    which ``withWatermark`` rejects; session tz is UTC so the cast
    preserves the instant.
    """
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def streaming_bucket_aggregate(
    stream: DataFrame,
    *,
    ts_col: str = "ds",
    value_col: str = "y",
    grain: str = "H",
    agg: str = "sum",
    series_cols: Iterable[str] = (),
    watermark: str = "1 hour",
) -> DataFrame:
    """A1 as a watermarked tumbling-window aggregation.

    Output matches the batch ``bucket_aggregate`` schema: bucket label
    in ``ts_col`` (DateType for D/W, TimestampType for H/min) plus the
    aggregated ``value_col``. Median is not supported in streaming
    (no exact percentile state) — use the batch rollup for that.
    """
    grain = normalize_grain(grain)
    if normalize_grain(grain) == "M":
        raise ValueError(
            "month grain has no fixed window width; aggregate at 'D' in the "
            "stream and roll up months in foreachBatch/batch"
        )
    agg_name = agg.strip().lower()
    if agg_name in ("median", "meadian"):
        raise ValueError("median is not streamable; use the batch path")
    series_cols = list(series_cols)
    duration = grain_duration(grain)
    watermarked = _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
    if grain == "W":
        # tumbling windows align to the Unix epoch (a Thursday); shift
        # start by 4 days so weeks run Monday..Sunday like the batch T3
        win = F.window(ts_col, duration, duration, "4 days")
    else:
        win = F.window(ts_col, duration)
    grouped = watermarked.groupBy(win.alias("_w"), *series_cols).agg(
        agg_expr(value_col, agg).alias(value_col)
    )
    if grain == "W":
        # batch canonical week label = Sunday (week END date): window
        # [Mon, next Mon) -> end - 1 day
        label = F.date_sub(F.col("_w.end").cast("date"), 1)
    elif grain == "D":
        label = F.col("_w.start").cast("date")
    else:
        label = F.col("_w.start")
    return grouped.select(label.alias(ts_col), *series_cols, F.col(value_col))


def streaming_month_rollup(
    stream: DataFrame,
    *,
    ts_col: str = "ds",
    value_col: str = "y",
    agg: str = "sum",
    series_cols: Iterable[str] = (),
    watermark: str = "1 hour",
    state_view: str = "month_rollup_days",
    checkpoint: str = "",
    emit: Callable[[DataFrame, int], None] | None = None,
    trigger_available_now: bool = True,
):
    """§2.8 month grain: daily partials in the stream, months in foreachBatch.

    Calendar months have no fixed window width, so the state-bounded
    streaming aggregation runs at DAY grain, keeping decomposable
    partials (sum, count, min, max) per (day, series). ``foreachBatch``
    upserts each trigger's updated days into ``state_view`` (the
    compact daily-partial table — swap for Delta/Iceberg MERGE in
    production) and finalizes the month table by relabeling days with
    the batch T4 month-end label (``grains.bucket_expr``), so stream
    and batch produce identical month buckets (reference grain enum M,
    app.py:39; batch rollup core.py:49-53). ``mean`` finalizes as
    Σsum/Σcount over the partials — NOT a mean of daily means.

    State stays bounded at scale: the watermark bounds the streaming
    day-window state, and the rollup input is one row per (day,
    series) — 100 TB of events compact to thousands of partial rows
    before the month shuffle. Median is not decomposable; use the
    batch path (A1 supports it exactly).

    ``emit(months_df, batch_id)`` receives the refreshed month table
    each trigger. Returns the unstarted ``DataStreamWriter``.
    """
    from temporal_retriever_spark.grains import bucket_expr

    agg_name = agg.strip().lower()
    finalizers = {
        "sum": F.sum("_sum"),
        "mean": F.sum("_sum") / F.sum("_cnt"),
        "min": F.min("_min"),
        "max": F.max("_max"),
    }
    if agg_name not in finalizers:
        raise ValueError(
            f"agg {agg!r} is not decomposable for streaming month rollup; "
            "supported: sum, mean, min, max (median needs the batch path)"
        )
    final = finalizers[agg_name]
    series_cols = list(series_cols)

    daily = (
        _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 day").alias("_w"), *series_cols)
        .agg(
            F.sum(value_col).alias("_sum"),
            F.count(value_col).alias("_cnt"),
            F.min(value_col).alias("_min"),
            F.max(value_col).alias("_max"),
        )
        .select(
            F.col("_w.start").cast("date").alias(ts_col),
            *series_cols,
            "_sum",
            "_cnt",
            "_min",
            "_max",
        )
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        keys = [ts_col, *series_cols]
        if spark.catalog.tableExists(state_view):
            existing = spark.table(state_view)
            merged = existing.join(
                batch.select(*keys), on=keys, how="left_anti"
            ).unionByName(batch)
        else:
            merged = batch
        merged = merged.localCheckpoint(eager=True)
        merged.createOrReplaceTempView(state_view)
        months = merged.groupBy(
            bucket_expr(ts_col, "M").alias(ts_col), *series_cols
        ).agg(final.alias(value_col))
        if emit is not None:
            emit(months, batch_id)

    writer = (
        daily.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    ts_col: str = "ds",
    key_cols: Iterable[str] = ("fingerprint",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by the
    watermark — the streaming analog of the batch ``exact_dedup``
    (llm.dedup): at 100 TB/day the state holds only the horizon's keys,
    not history. Callers fingerprint the payload first (e.g.
    ``llm.text.text_fingerprint`` expressions) so state stores digests,
    not documents.
    """
    return _with_event_time(stream, ts_col).withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(list(key_cols))


def streaming_series_state(
    stream: DataFrame,
    *,
    ts_col: str = "ds",
    value_col: str = "y",
    series_col: str = "series_id",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful operator: incremental per-series running stats.

    The reference's A2/A3 bounds/std are whole-series scans per request;
    the streaming analog keeps (count, sum, sumsq, min_ds, max_ds,
    min_y, max_y) per series in state and emits the updated row each
    micro-batch — ``applyInPandasWithState`` (SURVEY §2.8 "stateful
    ops"). Sample std derives from the explicit sums exactly like the
    batch ``floor_ceiling``, so batch and stream agree.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    output_schema = StructType(
        [
            StructField(series_col, StringType()),
            StructField("n", LongType()),
            StructField("min_ds", TimestampType()),
            StructField("max_ds", TimestampType()),
            StructField("min_y", DoubleType()),
            StructField("max_y", DoubleType()),
            StructField("mean_y", DoubleType()),
            StructField("std_y", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("sum_y", DoubleType()),
            StructField("sumsq_y", DoubleType()),
            StructField("min_ds", LongType()),   # epoch micros
            StructField("max_ds", LongType()),
            StructField("min_y", DoubleType()),
            StructField("max_y", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, sum_y, sumsq_y = 0, 0.0, 0.0
        min_ds = max_ds = None
        min_y = max_y = None
        if state.exists:
            n, sum_y, sumsq_y, min_ds, max_ds, min_y, max_y = state.get
        for pdf in pdfs:
            vals = pdf[value_col].astype("float64")
            ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000  # micros
            n += len(pdf)
            sum_y += float(vals.sum())
            sumsq_y += float((vals * vals).sum())
            lo_ts, hi_ts = int(ts.min()), int(ts.max())
            min_ds = lo_ts if min_ds is None else min(min_ds, lo_ts)
            max_ds = hi_ts if max_ds is None else max(max_ds, hi_ts)
            lo, hi = float(vals.min()), float(vals.max())
            min_y = lo if min_y is None else min(min_y, lo)
            max_y = hi if max_y is None else max(max_y, hi)
        state.update((n, sum_y, sumsq_y, min_ds, max_ds, min_y, max_y))
        mean = sum_y / n if n else None
        std = None
        if n and n > 1:
            var = (sumsq_y - sum_y * sum_y / n) / (n - 1)
            std = max(var, 0.0) ** 0.5
        yield pd.DataFrame(
            {
                series_col: [key[0]],
                "n": [n],
                "min_ds": [pd.Timestamp(min_ds, unit="us")],
                "max_ds": [pd.Timestamp(max_ds, unit="us")],
                "min_y": [min_y],
                "max_y": [max_y],
                "mean_y": [mean],
                "std_y": [std],
            }
        )

    return stream.groupBy(series_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def with_arrival_metrics(stream: DataFrame, *, ts_col: str = "ds") -> DataFrame:
    """Attach ``observe`` counters: rows and max event time per batch.

    Late-data drop counts are derivable per micro-batch by comparing
    arriving rows against the post-watermark aggregation (Spark drops
    silently; observe gives the arrival side of the ledger).
    """
    return stream.observe(
        "arrivals",
        F.count(F.lit(1)).alias("rows"),
        F.max(ts_col).alias("max_event_time"),
    )


def forecast_refresh(
    bucketed_stream: DataFrame,
    *,
    state_view: str,
    refresh: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Micro-batch forecast refresh: accumulate buckets, re-forecast.

    ``foreachBatch`` receives each micro-batch of new/updated buckets;
    it unions them into ``state_view`` (a session temp view acting as
    the bucket store — swap for Delta/Iceberg MERGE in production) and
    calls ``refresh(full_table, batch_id)`` — typically
    ``forecast_linear_seasonal`` over the accumulated series.
    """

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        key_cols = batch.columns[:-1]  # value column is last by contract
        if spark.catalog.tableExists(state_view):
            existing = spark.table(state_view)
            # upsert: new bucket values replace old ones (anti-join keeps
            # untouched keys, union brings the updates)
            merged = existing.join(
                batch.select(*key_cols), on=key_cols, how="left_anti"
            ).unionByName(batch)
        else:
            merged = batch
        merged = merged.localCheckpoint(eager=True)
        merged.createOrReplaceTempView(state_view)
        refresh(merged, batch_id)

    writer = (
        bucketed_stream.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def streaming_sessionize(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    series_cols: Iterable[str] = ("series_id",),
    ts_col: str = "ds",
    value_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session aggregation via native ``F.session_window``.

    The streaming analog of the batch ``asof.session_stats``: dynamic
    event-time windows that extend while events arrive within ``gap``
    of each other and close once the watermark passes the last event +
    gap. Emits per-session (start, end, duration_sec, n_events[,
    session_value]) — the same measures the batch operator computes
    with its gaps-and-islands window, so stream and batch agree on
    session boundaries (both treat a gap of exactly ``gap`` as a new
    session: session windows are half-open ``[first, last+gap)``).

    State is bounded by the watermark; Spark merges adjacent session
    fragments across micro-batches natively (no custom state code).
    """
    series_cols = list(series_cols)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(ts_col).cast("double") - F.min(ts_col).cast("double")
        ).alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("session_value"))
    return (
        _with_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("session"), *series_cols)
        .agg(*aggs)
        .select(*series_cols, "session_start", "session_end",
                "duration_sec", "n_events",
                *([ "session_value"] if value_col is not None else []))
    )


def streaming_anomaly_zscore(
    stream: DataFrame,
    *,
    window: int = 30,
    threshold: float = 3.0,
    min_periods: int = 5,
    ts_col: str = "ds",
    value_col: str = "y",
    series_col: str = "series_id",
    timeout: str = "NoTimeout",
    state_ttl: str = "1 hour",
) -> DataFrame:
    """Streaming rolling z-score anomaly detection.

    The streaming analog of ``rolling.anomaly_zscore``: per-series
    state holds the trailing ``window`` observations (a bounded deque —
    state size is O(window) per series regardless of stream length);
    each arriving row is scored against that buffer *before* being
    appended, so a spike cannot inflate its own baseline — identical
    semantics to the batch frame [-window, -1].

    Rows are scored in event-time order within each micro-batch. With
    in-order arrival (or a source that replays ordered chunks) the
    stream emits exactly the batch operator's flags — asserted in
    tests. Out-of-order arrivals are scored against the state as of
    their arrival; for strict event-time semantics run the batch
    operator over the bucketed sink instead.

    State retention: with the default ``timeout="NoTimeout"`` a
    series' buffer lives for the stream's lifetime (O(window) doubles
    per distinct key — fine for bounded key cardinality, unbounded
    keys will grow the state store forever). Pass
    ``timeout="ProcessingTimeTimeout"`` to expire idle series: a key
    that receives no data for ``state_ttl`` of processing time has its
    state removed, and a later arrival starts a cold buffer.
    (``EventTimeTimeout`` is not offered: this operator takes no
    watermark, which that mode requires.)
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    output_schema = StructType(
        [
            StructField(series_col, StringType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("zscore", DoubleType()),
            StructField("is_anomaly", BooleanType()),
        ]
    )
    state_schema = StructType([StructField("buf", ArrayType(DoubleType()))])

    if timeout not in ("NoTimeout", "ProcessingTimeTimeout"):
        raise ValueError(
            f"unsupported timeout conf: {timeout!r} "
            "(use 'NoTimeout' or 'ProcessingTimeTimeout')"
        )
    expire = timeout == "ProcessingTimeTimeout"
    # GroupState.setTimeoutDuration takes int MILLISECONDS (the
    # applyInPandasWithState variant rejects interval strings)
    ttl_ms = int(interval_seconds(state_ttl) * 1000) if expire else 0

    def update(key, pdfs, state: GroupState):
        if expire and state.hasTimedOut:
            # idle past state_ttl: drop the buffer; a later arrival
            # starts cold (emit nothing for the timeout invocation)
            state.remove()
            return
        buf: list[float] = []
        if state.exists:
            (stored,) = state.get
            buf = list(stored)
        # materialize ALL Arrow chunks and sort ONCE: a group larger
        # than maxRecordsPerBatch arrives as several pdfs, and sorting
        # each independently would score later-timestamp rows of an
        # earlier chunk before earlier rows of a later chunk
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((buf,))
            if expire:
                state.setTimeoutDuration(ttl_ms)
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
        zs, flags = [], []
        for v in pdf[value_col].astype("float64"):
            tail = buf[-window:]
            if len(tail) >= min_periods:
                arr = np.asarray(tail, dtype=np.float64)
                std = arr.std(ddof=1)
                z = (v - arr.mean()) / std if std > 0 else None
            else:
                z = None
            zs.append(z)
            flags.append(bool(z is not None and abs(z) > threshold))
            buf.append(float(v))
            if len(buf) > window:
                buf = buf[-window:]
        out = pdf[[ts_col, value_col]].copy()
        out[series_col] = key[0]
        out["zscore"] = pd.array(zs, dtype="float64")
        out["is_anomaly"] = flags
        state.update((buf,))
        if expire:
            state.setTimeoutDuration(ttl_ms)
        yield out[[series_col, ts_col, value_col, "zscore", "is_anomaly"]]

    return _with_event_time(stream, ts_col).groupBy(series_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    *,
    k: int = 10,
    capacity: int = 256,
    group_col: str = "group_id",
    token_col: str = "token",
) -> DataFrame:
    """Streaming top-k tokens per group via the SpaceSaving sketch
    (Metwally et al. 2005) in ``applyInPandasWithState`` — the
    unbounded-vocabulary companion to the batch ``token_topk``: exact
    counting needs state per distinct token, SpaceSaving caps state at
    ``capacity`` counters per group with the classical guarantees
    (est ≥ true ≥ est − err per entry; any token with true count >
    N/capacity is present).

    Each micro-batch emits the group's current top-k:
    (group, token, est_count, err, rank). Batch-local counts are
    pre-aggregated in pandas before merging and eviction uses a
    lazy-deletion min-heap, so per-batch work is
    O(batch distinct · log capacity); per-group state is exactly three
    arrays of length ≤ capacity — bounded regardless of vocabulary
    size, the property that makes this runnable forever at 100 TB/day.
    When ``capacity`` ≥ the true vocabulary the sketch is exact and
    stream == batch (tested).
    """
    if k < 1 or capacity < k:
        raise ValueError(f"need 1 <= k <= capacity: k={k}, capacity={capacity}")
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
        IntegerType,
    )

    output_schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField(token_col, StringType()),
            StructField("est_count", LongType()),
            StructField("err", LongType()),
            StructField("rank", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("tokens", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
            StructField("errors", ArrayType(LongType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import heapq

        if state.exists:
            tokens, counts, errors = state.get
            summary = {
                t: [int(c), int(er)] for t, c, er in zip(tokens, counts, errors)
            }
        else:
            summary = {}
        # lazy-deletion min-heap over (count, token): O(log capacity)
        # eviction instead of a full min() scan per new token (the
        # standard SpaceSaving structure); stale entries are skipped
        # when their recorded count no longer matches the summary
        heap = [(c, t) for t, (c, _) in summary.items()]
        heapq.heapify(heap)
        for pdf in pdfs:
            batch = pdf[token_col].value_counts()
            for tok, cnt in batch.items():
                cnt = int(cnt)
                if tok in summary:
                    summary[tok][0] += cnt
                    heapq.heappush(heap, (summary[tok][0], tok))
                elif len(summary) < capacity:
                    summary[tok] = [cnt, 0]
                    heapq.heappush(heap, (cnt, tok))
                else:
                    # pop until a live entry surfaces, evict it, and
                    # inherit its count as the new entry's error bound
                    while True:
                        c, t = heapq.heappop(heap)
                        if t in summary and summary[t][0] == c:
                            break
                    base = summary.pop(t)[0]
                    summary[tok] = [base + cnt, base]
                    heapq.heappush(heap, (base + cnt, tok))
        items = sorted(summary.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [t for t, _ in items],
                [v[0] for _, v in items],
                [v[1] for _, v in items],
            )
        )
        top = items[:k]
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(top),
                token_col: [t for t, _ in top],
                "est_count": [v[0] for _, v in top],
                "err": [v[1] for _, v in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Iterable[str] = ("series_id",),
    left_ts: str = "ds",
    right_ts: str = "ds",
    before: str = "0 seconds",
    after: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """§2.8 stream-stream interval join: pair each left event with the
    right-stream events of the same key whose timestamp falls in
    ``[left_ts − before, left_ts + after]``.

    The streaming sibling of ``asof.interval_join`` — correlation of
    two live feeds (clicks ⨝ views within 2h, orders ⨝ payments within
    a day) without landing either to storage first.

    Spark-first: this is the native stream-stream join — both sides
    get event-time watermarks and the range predicate BOUNDS THE JOIN
    STATE (Spark derives each side's state-eviction horizon from the
    time-range condition + the other side's watermark, so per-key
    buffers are dropped once they can no longer match; without the
    range condition the state would grow forever). Inner joins emit
    eagerly on match; outer joins additionally emit unmatched rows
    once the watermark passes (pass ``how="leftOuter"`` etc. — Spark's
    stream-stream outer-join rules apply).

    All right-side columns are suffixed with ``right_suffix``; the
    equality keys collapse back to one column each.
    """
    keys = list(keys)
    l = left.withWatermark(left_ts, watermark)
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, c + right_suffix)
    r = r.withWatermark(right_ts + right_suffix, watermark)
    cond = None
    for k in keys:
        eq = F.col(k) == F.col(k + right_suffix)
        cond = eq if cond is None else cond & eq
    rng = (
        F.col(right_ts + right_suffix)
        >= F.col(left_ts) - F.expr(f"INTERVAL {before}")
    ) & (
        F.col(right_ts + right_suffix)
        <= F.col(left_ts) + F.expr(f"INTERVAL {after}")
    )
    cond = rng if cond is None else cond & rng
    out = l.join(r, cond, how)
    # collapse the key pair to ONE column that survives null-extension
    # on EITHER side (rightOuter/fullOuter rows have a NULL left key —
    # dropping the right copy would lose the key entirely)
    for k in keys:
        out = out.withColumn(
            k, F.coalesce(F.col(k), F.col(k + right_suffix))
        )
    return out.drop(*[k + right_suffix for k in keys])


def streaming_funnel(
    stream: DataFrame,
    steps: Iterable[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Streaming funnel walks (the stateful sibling of
    ``funnel.funnel``): per-user state holds the k filled step
    timestamps (O(k) per user — constant, not per-event); each
    micro-batch advances the greedy walk over its events in event-time
    order and emits the user's UPDATED progress row.

    Semantics match the batch operator under in-order arrival per user
    (ordered replay — asserted in tests): t₁ anchors at the earliest
    step-1 event seen, steps advance strictly forward in time, and
    ``within`` bounds the whole walk relative to t₁. An out-of-order
    event older than the current progress is ignored (the batch
    operator, seeing global order, would have consumed it earlier).
    Use update-mode sinks; the latest row per user is the funnel state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps: {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct: {steps}")
    k = len(steps)
    within_us = (
        int(interval_seconds(within) * 1_000_000) if within is not None else None
    )
    # pre-filter to funnel steps, like the batch operator: users with
    # no step events get NO state and NO rows — state scales with
    # funnel PARTICIPANTS, not the whole user base
    stream = stream.filter(F.col(step_col).isin(steps))
    user_type = stream.schema[user_col].dataType

    output_schema = StructType(
        [
            StructField(user_col, user_type),
            StructField("steps_completed", IntegerType()),
            *[StructField(f"t_{i + 1}", TimestampType()) for i in range(k)],
            StructField("seconds_to_convert", LongType()),
        ]
    )
    # state: filled timestamps as epoch MICROSECONDS (long). Unfilled
    # sentinel is LONG_MIN-ish, far below any representable event time
    # (-1 would collide with 1969-12-31 23:59:59.999999)
    UNFILLED = -(2 ** 62)
    state_schema = StructType([StructField("ts_us", ArrayType(LongType()))])

    def update(key, pdfs, state: GroupState):
        filled: list[int] = [UNFILLED] * k
        if state.exists:
            (stored,) = state.get
            filled = list(stored)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((filled,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
        n_filled = sum(1 for t in filled if t != UNFILLED)
        for ts, st in zip(pdf[ts_col], pdf[step_col]):
            if n_filled >= k:
                break
            us = int(ts.value // 1000)  # pandas ns -> us
            want = steps[n_filled]
            if st != want:
                continue
            if n_filled > 0 and us <= filled[n_filled - 1]:
                continue  # strictly after the previous step
            if (
                within_us is not None
                and n_filled > 0
                and us > filled[0] + within_us
            ):
                continue
            filled[n_filled] = us
            n_filled += 1
        state.update((filled,))
        row = {user_col: key[0], "steps_completed": n_filled}
        for i in range(k):
            row[f"t_{i + 1}"] = (
                pd.Timestamp(filled[i] * 1000)
                if filled[i] != UNFILLED
                else pd.NaT
            )
        row["seconds_to_convert"] = (
            (filled[k - 1] // 1_000_000) - (filled[0] // 1_000_000)
            if n_filled == k
            else None
        )
        yield pd.DataFrame([row])

    return (
        _with_event_time(stream, ts_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_lm_score(
    stream_docs: DataFrame,
    model: DataFrame,
    *,
    n: int = 3,
    unit: str = "char",
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_model: bool = True,
) -> DataFrame:
    """Score a STREAM of documents against a batch-trained n-gram LM —
    the stream-static shape of ``llm.lm.score_ngram_lm``: the model
    (and its derived context/vocabulary tables) is a static DataFrame
    joined into the stream, so a reference LM trained offline scores
    arriving crawl shards continuously.

    Identical math to the batch scorer (add-k smoothing, unseen-context
    uniform backstop), restructured for streaming's single-stateful-
    aggregation rule: the per-doc (ngram, occurrences) pre-aggregation
    batch uses is itself an aggregation, so here every exploded n-gram
    row joins the model directly (stream-static joins are stateless)
    and the ONE stateful aggregation is the final per-document sum.
    Batch == stream equality is pinned in tests/test_streaming_lm.py
    and at driver level by the ``lm_perplexity_streamed`` contract row
    (same DuckDB oracle as the batch ``lm_perplexity`` row).

    At scale: the model tables are model-sized (broadcast), stream
    state is one scalar pair per in-flight document.
    """
    from temporal_retriever_spark.llm.lm import (
        _context,
        _last_token,
        _ngrams,
    )

    if not k > 0:
        raise ValueError(f"smoothing k must be > 0: {k}")
    if unit == "char":
        model = model.filter(F.length("ngram") == n)
    else:
        model = model.filter(F.size(F.split("ngram", " ")) == n)
    # persist the static side: a stream-static join re-evaluates the
    # static plan EVERY micro-batch, and this one is a full training
    # aggregation consumed three times per batch (model join,
    # ctx_counts, vocab) — 3 × n_batches trainings without the cache.
    # Model-sized (≤ |charset|^n rows), evictable — but a persist taken
    # here can never be released (the caller owns the query lifecycle),
    # so callers that care about cache hygiene should persist the model
    # THEMSELVES, pass persist_model=False, and unpersist after the
    # streaming query terminates (VERDICT r9 item 5; the contract entry
    # does exactly this). The internal persist stays the default so a
    # bare call is never 3×n_batches slower.
    if persist_model:
        model = model.persist()
    ctx_counts = model.groupBy("ctx").agg(F.sum("cnt").alias("ctx_cnt"))
    vocab = model.select(
        _last_token(F.col("ngram"), n, unit).alias("_tok")
    ).agg(F.count_distinct("_tok").alias("v"))

    grams = stream_docs.select(
        F.col(id_col), F.explode(_ngrams(text_col, n, unit)).alias("ngram")
    ).withColumn("ctx", _context(F.col("ngram"), n, unit))
    joined = (
        grams.join(model.select("ngram", "cnt"), "ngram", "left")
        .join(ctx_counts, "ctx", "left")
        .crossJoin(F.broadcast(vocab))
    )
    kv = F.lit(float(k))
    p = F.when(
        F.col("ctx_cnt").isNotNull(),
        (F.coalesce(F.col("cnt"), F.lit(0)) + kv)
        / (F.col("ctx_cnt") + kv * F.col("v")),
    ).otherwise(F.lit(1.0) / F.col("v"))
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        (F.sum(F.log(p)) / F.count(F.lit(1))).alias("logprob_per_token"),
    )
    return scored.withColumn("perplexity", F.exp(-F.col("logprob_per_token")))
