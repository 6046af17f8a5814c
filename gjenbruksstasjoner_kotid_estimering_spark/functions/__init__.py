"""Shared scalar helpers used across plans/operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Exact integer epoch microseconds of a TIMESTAMP column.

    The single place that converts event time to integer µs for gap /
    tolerance arithmetic (sessionize_gaps, join_asof_tolerance). Relies on
    io.load_table having normalized the column to plain TIMESTAMP — a type
    drift in the testdata breaks HERE (and tests/test_io.py) rather than in
    every query that does time arithmetic. DuckDB twin: ``epoch_us(ts)``.
    """
    return F.unix_micros(F.col(col) if isinstance(col, str) else col)


def md5_long_col(col: Column, start: int = 1, length: int = 14) -> Column:
    """Portable md5-derived integer: ``length`` hex chars of md5 as a
    non-negative BIGINT (56 bits at the default — fits both engines).

    The cross-engine hash contract used by the LSH/sampling/winnowing
    lanes; the DuckDB twin is
    ``('0x' || substring(md5(x), start, length))::BIGINT``. Centralized
    (like [[epoch_us]]) so the Spark and SQL sides can't drift
    independently.
    """
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")
