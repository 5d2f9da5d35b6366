from __future__ import annotations

import pytest

from temporal_retriever_spark.grains import (
    bucket_expr,
    grain_duration,
    grain_interval,
    normalize_grain,
)
from tests.conftest import assert_matches_oracle


def test_normalize_grain_spellings():
    assert normalize_grain("D") == "D"
    assert normalize_grain("d") == "D"
    assert normalize_grain("day") == "D"
    assert normalize_grain("W") == "W"
    assert normalize_grain("M") == "M"
    assert normalize_grain("month") == "M"
    assert normalize_grain("H") == "H"
    assert normalize_grain("hour") == "H"
    # reference enum says "min" (app.py:39) but core matches "m"
    # (core.py:34): we accept both, same bucket
    assert normalize_grain("min") == "min"
    assert normalize_grain("m") == "min"
    assert normalize_grain("minute") == "min"


@pytest.mark.parametrize("bad", ["", "fortnight", "y", None, 3])
def test_normalize_grain_rejects(bad):
    with pytest.raises(ValueError):
        normalize_grain(bad)


def test_grain_interval_and_duration():
    assert grain_interval("D") == "INTERVAL 1 DAY"
    assert grain_interval("min") == "INTERVAL 1 MINUTE"
    assert grain_duration("H") == "1 hour"
    with pytest.raises(ValueError):
        grain_duration("M")  # variable width


GRAIN_ORACLE = {
    "D": "CAST(ts AS DATE)",
    "W": "CAST(date_trunc('week', ts) AS DATE) + 6",
    "M": "last_day(CAST(ts AS DATE))",
    "H": "date_trunc('hour', ts)",
    "min": "date_trunc('minute', ts)",
}


@pytest.mark.parametrize("grain", ["D", "W", "M", "H", "min"])
def test_bucket_labels_match_duckdb(spark, tables, duck, grain):
    got = tables["events"].select(bucket_expr("ts", grain).alias("bucket")).distinct()
    sql = f"SELECT DISTINCT {GRAIN_ORACLE[grain]} AS bucket FROM events"
    assert_matches_oracle(got, duck, sql)


def test_week_bucket_is_sunday(spark):
    # pandas to_period("W").end_time labels a week by its Sunday
    # (reference core.py:43-47); 2024-01-03 is a Wednesday -> Sunday 2024-01-07
    df = spark.sql(
        "SELECT CAST('2024-01-03 10:00:00' AS TIMESTAMP) AS ts "
        "UNION ALL SELECT CAST('2024-01-07 23:59:59' AS TIMESTAMP) "
        "UNION ALL SELECT CAST('2024-01-08 00:00:00' AS TIMESTAMP)"
    )
    rows = sorted(
        str(r[0]) for r in df.select(bucket_expr("ts", "W").alias("w")).collect()
    )
    assert rows == ["2024-01-07", "2024-01-07", "2024-01-14"]


def test_month_bucket_is_last_day(spark):
    df = spark.sql("SELECT CAST('2024-02-11' AS TIMESTAMP) AS ts")
    [(b,)] = df.select(bucket_expr("ts", "M").alias("m")).collect()
    assert str(b) == "2024-02-29"  # leap year
