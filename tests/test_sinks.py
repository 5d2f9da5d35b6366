"""S6/S7: JSON records sink and CSV/JSON file-format round-trips."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.aggregate import bucket_aggregate


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="trs-sink-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _daily(tables):
    return bucket_aggregate(
        tables["events"].withColumnRenamed("ts", "ds").withColumnRenamed("value", "y"),
        grain="D",
        agg="sum",
        series_cols=("event_type",),
    )


def test_json_sink_roundtrip(spark, tables, tmpd):
    daily = _daily(tables)
    daily.write.mode("overwrite").json(f"{tmpd}/out-json")
    back = spark.read.json(f"{tmpd}/out-json").select(
        "event_type", F.to_date("ds").alias("ds"), "y"
    )
    a = {(r["event_type"], str(r["ds"])): r["y"] for r in daily.collect()}
    b = {(r["event_type"], str(r["ds"])): r["y"] for r in back.collect()}
    assert a == b


def test_csv_roundtrip(spark, tables, tmpd):
    daily = _daily(tables)
    daily.write.mode("overwrite").option("header", True).csv(f"{tmpd}/out-csv")
    back = spark.read.option("header", True).option("inferSchema", True).csv(
        f"{tmpd}/out-csv"
    )
    assert back.count() == daily.count()
    assert set(back.columns) == {"event_type", "ds", "y"}


def test_tojson_records(spark, tables):
    # the reference's .to_dict(orient="records") sink (app.py:246-247)
    daily = _daily(tables).limit(5)
    records = [json.loads(s) for s in daily.toJSON().collect()]
    assert len(records) == 5
    assert {"event_type", "ds", "y"} <= set(records[0])
