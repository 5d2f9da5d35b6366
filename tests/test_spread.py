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


def test_file_scan_estimate_matches_physical_probe(spark, sf_dir):
    # r10: the guard derives the partition count from the plan's input
    # files instead of df.rdd (which forces physical planning per call,
    # VERDICT r9 item 5). Pin estimate == physical on real parquet scans,
    # wide and narrow, so a Spark split-logic change can't drift silently.
    from temporal_retriever_spark.spread import _estimate_scan_partitions

    for table in ("documents", "events", "lineitem"):
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        assert _estimate_scan_partitions(df) == df.rdd.getNumPartitions()
        narrow = df.select(df.columns[0])
        assert _estimate_scan_partitions(narrow) == narrow.rdd.getNumPartitions()


def test_non_file_input_falls_back(spark):
    # in-memory relations have no input files: the estimate abstains and
    # the guard falls back to the physical probe (same behavior as r9)
    from temporal_retriever_spark.spread import _estimate_scan_partitions

    df = spark.range(1000).coalesce(1)
    assert _estimate_scan_partitions(df) is None
    assert (
        spread_scan(df).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
