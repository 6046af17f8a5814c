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
