"""Timestamp parsing (T1) and document → long-format normalization.

Reference: ``pd.to_datetime(s, format="ISO8601", utc=True)`` with a
retry at ``format="mixed"`` on ValueError (core.py:37, app.py:79-87,
376-385); tz normalized to UTC then dropped (app.py:428).

Spark-first design: instead of an eager try/except re-parse of the whole
series, parsing is a per-row ``F.coalesce`` over candidate format
expressions — strictly better than the reference's all-or-nothing retry
(SURVEY §4) and fully codegen'd. The session timezone is UTC
(session.py), so ``to_timestamp`` both interprets offset-less strings as
UTC and normalizes offsets (``+02:00``) to UTC — matching the
reference's parse-as-UTC / store-naive-UTC convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: non-ISO formats seen in the reference fixtures, tried in order after
#: ISO8601. "03-01-2015 01:00" (electricity_demand.json) is day-first.
_FALLBACK_FORMATS = (
    "dd-MM-yyyy HH:mm",
    "dd-MM-yyyy HH:mm:ss",
    "MM/dd/yyyy HH:mm",
    "MM/dd/yyyy",
    "yyyyMMdd",
)


def parse_timestamp(col: Column | str, *, formats: tuple[str, ...] = ()) -> Column:
    """ISO8601-first timestamp parse with mixed-format fallback.

    ``try_to_timestamp`` (Spark ≥3.5) returns NULL instead of raising on
    a mismatch, so the coalesce chain implements "try ISO, then each
    fallback" per row. Unparseable strings end as NULL (NaT pass-through,
    reference tests/test_prepare_data.py:15-69 spec).
    """
    col = F.col(col) if isinstance(col, str) else col
    candidates = [F.try_to_timestamp(col)]
    for fmt in formats or _FALLBACK_FORMATS:
        candidates.append(F.try_to_timestamp(col, F.lit(fmt)))
    return F.coalesce(*candidates)


def to_long_format(
    df: DataFrame,
    *,
    series_id: str | Column,
    ts_col: str,
    value_col: str | Column,
    parse: bool = False,
    formats: tuple[str, ...] = (),
) -> DataFrame:
    """Project any table into the canonical long format (series_id, ds, y).

    Reference internal model: every pipeline normalizes to Prophet's
    ``(ds, y)`` two-column frame (app.py:70-78, 374-375); we add
    ``series_id`` so one plan handles millions of series (SURVEY §1.2).
    """
    sid = F.lit(series_id) if isinstance(series_id, str) else series_id
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    ds = parse_timestamp(ts_col, formats=formats) if parse else F.col(ts_col)
    return df.select(
        sid.alias("series_id"),
        ds.alias("ds"),
        val.cast("double").alias("y"),
    )
