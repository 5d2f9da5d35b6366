from __future__ import annotations

from pyspark.sql import functions as F

from temporal_retriever_spark.timeparse import parse_timestamp, to_long_format


def test_parse_iso8601_z(spark):
    # reference spec: ISO8601 with Z -> naive UTC (tests/test_prepare_data.py:5-12)
    df = spark.createDataFrame([("2024-03-12T23:59:59Z",)], "s string")
    [(ts,)] = df.select(parse_timestamp("s")).collect()
    assert str(ts) == "2024-03-12 23:59:59"


def test_parse_tz_offset_normalized_to_utc(spark):
    # +02:00 -> 08:00Z (reference commented spec, test_prepare_data.py:15-69)
    df = spark.createDataFrame([("2024-01-01T10:00:00+02:00",)], "s string")
    [(ts,)] = df.select(parse_timestamp("s")).collect()
    assert str(ts) == "2024-01-01 08:00:00"


def test_parse_mixed_dayfirst_fallback(spark):
    # electricity_demand.json format: "03-01-2015 01:00" (day-first)
    df = spark.createDataFrame(
        [("03-01-2015 01:00",), ("2015-01-03T02:00:00",)], "s string"
    )
    got = sorted(str(r[0]) for r in df.select(parse_timestamp("s")).collect())
    assert got == ["2015-01-03 01:00:00", "2015-01-03 02:00:00"]


def test_parse_invalid_is_null(spark):
    # NaT pass-through, not an exception (reference spec)
    df = spark.createDataFrame([("not a date",), (None,)], "s string")
    vals = [r[0] for r in df.select(parse_timestamp("s")).collect()]
    assert vals == [None, None]


def test_to_long_format(spark):
    df = spark.createDataFrame(
        [("2024-01-01T00:00:00Z", 5), ("2024-01-02T00:00:00Z", 7)], "d string, v int"
    )
    out = to_long_format(
        df, series_id="sales", ts_col="d", value_col="v", parse=True
    )
    assert out.columns == ["series_id", "ds", "y"]
    rows = out.collect()
    assert {r["series_id"] for r in rows} == {"sales"}
    assert [r["y"] for r in sorted(rows, key=lambda r: r["ds"])] == [5.0, 7.0]
    assert dict(out.dtypes)["y"] == "double"
