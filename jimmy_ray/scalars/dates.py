"""Date/time scalars (SURVEY.md §2.2 M23).

Behavioral ports of /root/reference/src/jimmy/common.py:530-573: every
parse normalizes to UTC-naive datetimes (Arrow timestamps are UTC-naive,
matching DuckDB).  Vectorized variants operate on Arrow timestamp
columns via pyarrow.compute casts."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.compute as pc


def iso_to_datetime(iso: str) -> dt.datetime:
    """
    >>> iso_to_datetime('2011-11-04T03:00:00')
    datetime.datetime(2011, 11, 4, 3, 0)
    >>> iso_to_datetime('2011-11-04T03:00:00+02:00')
    datetime.datetime(2011, 11, 4, 1, 0)
    """
    d = dt.datetime.fromisoformat(iso)
    if d.tzinfo is None or d.tzinfo.utcoffset(d) is None:
        return d.replace(tzinfo=None)
    return d.astimezone(dt.timezone.utc).replace(tzinfo=None)


def timestamp_to_datetime(ts_s: int | float) -> dt.datetime:
    """
    >>> timestamp_to_datetime(0)
    datetime.datetime(1970, 1, 1, 0, 0)
    """
    return dt.datetime.fromtimestamp(ts_s, dt.timezone.utc).replace(tzinfo=None)


def datetime_to_ms(d: dt.datetime) -> int:
    """
    >>> datetime_to_ms(dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc))
    0
    """
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1000)


def date_to_unix_ms(date: dt.date) -> int:
    """
    >>> date_to_unix_ms(dt.date(1970, 1, 2))
    86400000
    """
    return datetime_to_ms(dt.datetime(date.year, date.month, date.day))


def timestamp_col_to_ms(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized: timestamp[us] column -> int64 epoch milliseconds."""
    as_us = pc.cast(col, pa.int64())
    return pc.divide(as_us, 1000)


def sql_utc_strftime(epoch_s_expr: str, fmt: str) -> str:
    """DuckDB strftime over epoch seconds, independent of the session
    TimeZone setting (to_timestamp renders in the session TZ; the Ray
    side always pins UTC, so mirrors must use make_timestamp)."""
    return (f"strftime(make_timestamp(CAST(({epoch_s_expr}) AS BIGINT) "
            f"* 1000000), '{fmt}')")
