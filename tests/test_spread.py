"""spread_scan — the guarded round-robin scan spread (r9).

Pins the three behaviors the optimization ledger relies on:
under-partitioned frames spread to defaultParallelism, already-wide
frames pass through untouched (the cluster-scale no-op), and
streaming frames are returned unchanged (no .rdd on a stream).
"""

from temporal_retriever_spark.spread import spread_scan


def test_spreads_underpartitioned_frame(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread_scan(df)
    want = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == want
    # same rows, only the layout changed
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_noop_on_wide_frame(spark):
    want = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(want + 3)
    out = spread_scan(df)
    assert out is df  # unchanged object: no exchange added


def test_factor_multiplies_target(spark):
    df = spark.range(100).coalesce(1)
    want = spark.sparkContext.defaultParallelism
    assert spread_scan(df, factor=2).rdd.getNumPartitions() == 2 * want


def test_streaming_frame_passes_through(spark):
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert spread_scan(stream) is stream
