"""Datetime parsing / formatting exactly matching the reference API layer.

- ``parse_iso_date``: 5-format fallback chain (reference
  src/api/routes/data.py:129-147).
- ``format_timestamp_col``: ISO-8601 with exactly millisecond precision,
  microseconds TRUNCATED (not rounded), literal ``Z`` (reference
  data.py:150-153; golden test tests/unit/test_validation.py:89-94).
- ``normalize_range``: both bounds truncated to midnight; a date-only
  ``to`` is inclusive (+1 day), a ``to`` with any time component is
  exclusive at its midnight (reference data.py:104-108).
"""

from __future__ import annotations

from datetime import date, datetime, timedelta, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The five formats tried in order by the reference (data.py:133-139),
#: translated from strptime to Spark datetime patterns.
ISO_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
)

#: Python-side equivalents, used at the driver-side query boundary.
_PY_FORMATS = (
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%Y-%m-%dT%H:%M:%SZ",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d",
)


def parse_iso_date_col(col: Column) -> Column:
    """Column version of the 5-format fallback chain:
    ``try_to_timestamp`` returns NULL on mismatch (plain ``to_timestamp``
    THROWS under Spark 4's default ANSI mode), mirroring the reference's
    try/continue."""
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in ISO_FORMATS])


def parse_iso_date(value: str | None) -> datetime | None:
    """Driver-side parse (query-boundary arguments, not data-path).
    Naive results are assumed UTC (reference data.py:144-145)."""
    if not value:
        return None
    for fmt in _PY_FORMATS:
        try:
            parsed = datetime.strptime(value, fmt)
        except ValueError:
            continue
        if parsed.tzinfo is None:
            parsed = parsed.replace(tzinfo=timezone.utc)
        return parsed
    return None


def normalize_range(from_str: str, to_str: str) -> tuple[date, date] | None:
    """F8 range snapping (reference data.py:104-114): truncate both to
    midnight; date-only ``to`` (no 'T') is inclusive → +1 day. Returns
    (from_date, to_date_exclusive) or None if either bound unparseable."""
    from_dt = parse_iso_date(from_str)
    to_dt = parse_iso_date(to_str)
    if from_dt is None or to_dt is None:
        return None
    to_d = to_dt.date()
    if "T" not in to_str:
        to_d = to_d + timedelta(days=1)
    return from_dt.date(), to_d


def format_timestamp_col(col: Column) -> Column:
    """``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` — Spark's date_format truncates
    to the pattern's precision, matching the reference's µs→ms
    truncation (data.py:150-153)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
