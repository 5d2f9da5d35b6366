"""Property-based tests (hypothesis) for bucketing/parsing invariants."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from temporal_retriever_spark.grains import bucket_expr, normalize_grain

TS = st.datetimes(
    min_value=datetime.datetime(1980, 1, 5),
    max_value=datetime.datetime(2100, 12, 20),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TS, min_size=1, max_size=30))
def test_bucket_label_invariants(spark, tss):
    df = spark.createDataFrame([(t,) for t in tss], "ts timestamp")
    rows = df.select(
        "ts",
        bucket_expr("ts", "D").alias("d"),
        bucket_expr("ts", "W").alias("w"),
        bucket_expr("ts", "M").alias("m"),
        bucket_expr("ts", "H").alias("h"),
        bucket_expr("ts", "min").alias("mi"),
    ).collect()
    for r in rows:
        ts, d, w, m = r["ts"], r["d"], r["w"], r["m"]
        assert d == ts.date()
        # W: Sunday on/after the date, within 6 days
        assert w.isoweekday() == 7
        assert 0 <= (w - ts.date()).days <= 6
        # M: last day of the same month
        assert m.month == ts.month and m.year == ts.year
        assert (m + datetime.timedelta(days=1)).day == 1
        # H/min: floors within grain width
        assert r["h"] <= ts and (ts - r["h"]).total_seconds() < 3600
        assert r["mi"] <= ts and (ts - r["mi"]).total_seconds() < 60


@settings(max_examples=5, deadline=None)
@given(st.lists(TS, min_size=1, max_size=20))
def test_parse_iso_roundtrip(spark, tss):
    from temporal_retriever_spark.timeparse import parse_timestamp

    tss = [t.replace(microsecond=0) for t in tss]
    df = spark.createDataFrame(
        [(t.strftime("%Y-%m-%dT%H:%M:%SZ"),) for t in tss], "s string"
    )
    got = [r[0] for r in df.select(parse_timestamp("s")).collect()]
    assert got == tss


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=8))
def test_normalize_grain_total(s):
    # every input either raises ValueError or returns a canonical grain
    try:
        out = normalize_grain(s)
        assert out in ("D", "W", "M", "H", "min")
    except ValueError:
        pass


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(TS, st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=2,
        max_size=40,
    )
)
def test_bucket_aggregate_conserves_sum(spark, rows):
    from temporal_retriever_spark.aggregate import bucket_aggregate

    df = spark.createDataFrame(rows, "ds timestamp, y double")
    total = sum(v for _, v in rows)
    for grain in ("D", "W", "M"):
        agged = bucket_aggregate(df, grain=grain, agg="sum")
        got = sum(r["y"] for r in agged.collect())
        assert abs(got - total) < 1e-6 * max(1.0, abs(total))
