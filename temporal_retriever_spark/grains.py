"""Grain bucketing — the reference's signature operator (T2-T6).

Reference: ``reset_time_index`` (core.py:30-59; near-duplicate method at
app.py:417-440). Semantics re-expressed as native Spark expressions so
bucketing stays inside whole-stage codegen and never leaves the JVM:

* ``D``  → calendar date                      (core.py:41)
* ``W``  → week period END date, i.e. Sunday  (core.py:43-47 —
  ``to_period("W").end_time`` labels a week by its Sunday; we canonicalize
  to the Sunday *date*, dropping pandas' 23:59:59.999999999 time part)
* ``M``  → month period END date (last day)   (core.py:49-53)
* ``H``  → floor to hour                      (core.py:55)
* ``min``/``m`` → floor to minute             (core.py:57; the reference
  enum says "min" (app.py:39) but its bucketer matches "m" (core.py:34) —
  a real "min" request 500s. We accept both spellings, same bucket.)

Unsupported grains raise ``ValueError`` (core.py:58-59).

Streaming note: each grain is exactly a tumbling window; ``grain_duration``
feeds ``F.window(ts, duration)`` so batch and Structured Streaming share
one mapping (SURVEY §2.8). W/M have no fixed duration — streaming uses
the same bucket expression with ``ds`` as event time instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GRAINS = ("D", "W", "M", "H", "min")

#: lower-cased spelling -> canonical grain ("M"/"m" handled case-sensitively)
_SPELLINGS = {
    "d": "D", "day": "D", "date": "D",
    "w": "W", "week": "W",
    "month": "M",
    "h": "H", "hour": "H",
    "min": "min", "minute": "min", "t": "min",
}


def normalize_grain(grain: str) -> str:
    """Map user grain spellings to a canonical grain.

    Case matters only for the pandas-style single letters: "M" is month
    (core.py:49) while "m" is minute (core.py:57). Longer spellings are
    case-insensitive.
    """
    if not isinstance(grain, str) or not grain:
        raise ValueError(f"unsupported grain: {grain!r}")
    if grain == "M":
        return "M"
    if grain == "m":
        return "min"
    try:
        return _SPELLINGS[grain.lower()]
    except KeyError:
        raise ValueError(f"unsupported grain: {grain!r}") from None


def bucket_expr(ts: Column | str, grain: str) -> Column:
    """Native bucket label expression for one timestamp column.

    Returns ``DateType`` for D/W/M (calendar-valued grains) and
    ``TimestampType`` for H/min (clock-valued grains) — the canonical
    labels fixed in SURVEY §2.3.
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    grain = normalize_grain(grain)
    if grain == "D":
        return F.to_date(col)
    if grain == "W":
        # ISO week starts Monday (Spark and DuckDB date_trunc agree);
        # label = week end = Monday + 6 days = Sunday.
        return F.date_add(F.date_trunc("week", col).cast("date"), 6)
    if grain == "M":
        return F.last_day(col)
    if grain == "H":
        return F.date_trunc("hour", col)
    if grain == "min":
        return F.date_trunc("minute", col)
    raise ValueError(f"unsupported grain: {grain!r}")  # pragma: no cover


def grain_interval(grain: str) -> str:
    """SQL INTERVAL literal advancing one bucket — feeds W6 future grids."""
    return {
        "D": "INTERVAL 1 DAY",
        "W": "INTERVAL 7 DAY",
        "M": "INTERVAL 1 MONTH",
        "H": "INTERVAL 1 HOUR",
        "min": "INTERVAL 1 MINUTE",
    }[normalize_grain(grain)]


def grain_duration(grain: str) -> str:
    """Tumbling-window duration for Structured Streaming (fixed-width grains).

    W is expressible as "7 days" (aligned to the epoch Monday via
    ``startTime``); M has no fixed duration — callers fall back to
    ``bucket_expr`` on event time for month grain.
    """
    durations = {"D": "1 day", "W": "7 days", "H": "1 hour", "min": "1 minute"}
    grain = normalize_grain(grain)
    if grain not in durations:
        raise ValueError(f"grain {grain!r} has no fixed window duration (use bucket_expr)")
    return durations[grain]


#: interval-unit spellings -> seconds (fixed-width units only)
_INTERVAL_UNITS = {
    "day": 86400.0, "days": 86400.0, "hour": 3600.0, "hours": 3600.0,
    "minute": 60.0, "minutes": 60.0, "second": 1.0, "seconds": 1.0,
    "week": 604800.0, "weeks": 604800.0,
}


def interval_seconds(interval: str) -> float:
    """Parse a fixed-width INTERVAL string ("2 hours", "1 day 12 hours")
    to seconds, engine-side.

    Used wherever a literal bound is needed (range frames, as-of
    tolerances): parsing in Python keeps the value independent of the
    session timezone — the epoch-arithmetic alternative
    (CAST(TIMESTAMP '1970-01-01' + INTERVAL ... AS DOUBLE)) shifts by
    the UTC offset in non-UTC sessions. Month/year units are variable
    width and rejected.
    """
    parts = interval.split()
    if not parts or len(parts) % 2 != 0:
        raise ValueError(
            f"malformed interval: {interval!r} (use pairs like '2 hours 30 minutes')"
        )
    total = 0.0
    for qty, unit in zip(parts[::2], parts[1::2]):
        try:
            total += float(qty) * _INTERVAL_UNITS[unit.lower()]
        except (KeyError, ValueError):
            raise ValueError(
                f"unsupported interval {interval!r}: fixed-width units only "
                "(days/hours/minutes/seconds/weeks)"
            ) from None
    if total <= 0:
        raise ValueError(f"interval must be positive: {interval!r}")
    return total
