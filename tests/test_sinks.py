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


def test_read_any_orc_round_trip(spark, tables, tmp_path):
    """S7 ORC: write the events table as ORC, read via read_any, get
    identical rows; the ORC scan must push filters like parquet."""
    from temporal_retriever_spark.sources.parquet import read_any

    ev = tables["events"].select("event_type", "ts", "value")
    path = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(path)
    back = read_any(spark, path, format="orc")
    assert back.count() == ev.count()
    a = sorted(map(str, ev.collect()))
    b = sorted(map(str, back.collect()))
    assert a == b
    plan = (
        back.filter(F.col("event_type") == "click").select("value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "event_type" in plan


def test_read_any_csv_json_and_sniffing(spark, tmp_path):
    from temporal_retriever_spark.sources.parquet import read_any

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    csv_path = str(tmp_path / "t.csv")
    json_path = str(tmp_path / "t.json")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(csv_path)
    df.coalesce(1).write.mode("overwrite").json(json_path)
    got_csv = read_any(spark, csv_path)
    got_json = read_any(spark, json_path)
    assert sorted((r["id"], r["s"]) for r in got_csv.collect()) == [(1, "a"), (2, "b")]
    assert sorted((r["id"], r["s"]) for r in got_json.collect()) == [(1, "a"), (2, "b")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="format"):
        read_any(spark, str(tmp_path / "unknown.xyz"))


class TestTrainingShards:
    def test_shard_budget_and_manifest(self, spark, tmp_path):
        from temporal_retriever_spark.sources.writers import write_training_shards

        rows = [(i, 100 + (i % 7) * 10) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        manifest = write_training_shards(
            df, str(tmp_path / "shards"), max_tokens_per_shard=3000
        ).collect()
        total = sum(r["n_tokens"] for r in manifest)
        assert total == sum(t for _, t in rows)
        assert sum(r["n_rows"] for r in manifest) == 200
        # every shard but possibly the last respects the budget closely:
        # a shard closes when the running total crosses the budget, so
        # n_tokens <= budget + max_row_tokens
        for r in manifest:
            assert r["n_tokens"] <= 3000 + 160
        # shards are contiguous ordered slices
        ordered = sorted(manifest, key=lambda r: r["shard"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["last_key"] < b["first_key"]

    def test_deterministic_assignment(self, spark, tmp_path):
        from temporal_retriever_spark.sources.writers import write_training_shards

        rows = [(i, 50 + i % 13) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        m1 = write_training_shards(
            df.repartition(8), str(tmp_path / "a"), max_tokens_per_shard=1000
        ).collect()
        m2 = write_training_shards(
            df.repartition(3), str(tmp_path / "b"), max_tokens_per_shard=1000
        ).collect()
        assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))

    def test_validation(self, spark):
        from temporal_retriever_spark.sources.writers import write_training_shards

        df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_tokens_per_shard"):
            write_training_shards(df, "/tmp/x", max_tokens_per_shard=0)
