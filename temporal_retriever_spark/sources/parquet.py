"""Parquet source (S7) with nanosecond-timestamp normalization.

Spark supports only MILLIS/MICROS parquet timestamps; files written with
nanosecond precision (pandas/pyarrow default) fail with
PARQUET_TYPE_ILLEGAL. With ``spark.sql.legacy.parquet.nanosAsLong=true``
(session.py) Spark reads them as epoch-nanos LongType; this module
detects which columns are nano-timestamps from the parquet footer
(driver-side metadata read, O(1)) and casts them back to TimestampType
at microsecond precision — the same truncation DuckDB applies, so
oracle comparisons agree.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nano_timestamp_columns(path: str) -> list[str]:
    """Column names stored as TIMESTAMP(NANOS) — from one file's footer."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return []
        path = files[0]
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_table(spark: SparkSession, path: str, **options) -> DataFrame:
    """``spark.read.parquet`` + nano→micro timestamp restoration.

    Sets the required runtime confs defensively: the caller's session may
    not come from ``session.get_spark`` (e.g. the driver harness builds
    its own), and both confs are runtime-settable SQLConfs. Reader
    ``options`` (mergeSchema, pathGlobFilter, …) pass through.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.parquet(path)
    nano_cols = _nano_timestamp_columns(path)
    for name in nano_cols:
        if dict(df.dtypes).get(name) == "bigint":
            # integer-divide (DIV, not /: epoch-nanos exceed double's exact
            # int range) to micros, then micros -> timestamp (UTC session tz)
            df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` DIV 1000")))
    # micro-precision tz-naive parquet timestamps infer as TIMESTAMP_NTZ in
    # Spark 4; normalize to TimestampType (session tz = UTC, so the instant is
    # unchanged and DuckDB — which reads the same file as naive-UTC — agrees).
    # NTZ breaks event-time watermarks and differs from the engine's canonical
    # TimestampType, so the source is the right place to unify.
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the driver's star schema from a scale-factor directory."""
    out = {}
    for name in names:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            out[name] = read_table(spark, path)
    return out


#: extension -> Spark reader format for read_any
_FORMAT_BY_EXT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def read_any(
    spark: SparkSession,
    path: str,
    *,
    format: str | None = None,
    **options,
) -> DataFrame:
    """S7 generalized: read parquet/ORC/CSV/JSON by explicit ``format``
    or file-extension sniffing.

    Parquet routes through :func:`read_table` (nano-timestamp
    normalization); ORC is Spark-native columnar (same predicate
    pushdown and column pruning as parquet — ``PushedFilters`` shows in
    the scan); CSV defaults to header+inferSchema (override via
    ``options``); JSON reads line-delimited records. All formats apply
    the NTZ→TimestampType normalization so event-time operators and
    oracle comparisons behave identically regardless of source format.
    """
    if format is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        format = _FORMAT_BY_EXT.get(ext)
        if format is None:
            raise ValueError(
                f"cannot infer source format from {path!r}; pass format="
            )
    format = format.lower()
    if format == "parquet":
        # forward reader options — silently dropping them would make the
        # parquet branch disobey the documented options contract
        return read_table(spark, path, **options)
    if format not in ("orc", "csv", "json"):
        raise ValueError(f"unsupported source format: {format!r}")
    reader = spark.read
    if format == "csv":
        opts = {"header": "true", "inferSchema": "true", **options}
    else:
        opts = dict(options)
    for k, v in opts.items():
        reader = reader.option(k, v)
    df = reader.format(format).load(path)
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df
