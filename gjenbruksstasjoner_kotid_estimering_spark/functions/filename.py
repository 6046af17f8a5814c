"""Filename-encoded metadata parsing (reference estimate_queue.py:31-61).

The reference regex-parses ``station_id_X_T.bin`` filenames one at a time —
X an integer station id, T a *naive* ISO-8601 timestamp interpreted in
Europe/Oslo — and converts to epoch seconds
(``isoparse(T).replace(tzinfo=Europe/Oslo).timestamp()``,
estimate_queue.py:49-51; golden: ``station_id_41_20200506T094000.bin`` →
``(41, 1588750800)``, estimate_queue_test.py:30).

Here the same parse is a columnar expression over a ``filename`` column:
``regexp_extract`` + ``to_timestamp`` + ``to_utc_timestamp`` — all JVM-side,
whole-stage-codegen'd, no Python in the loop. Malformed names yield NULL
(set-oriented analog of the reference's raised ValueError: the engine
filters/flags instead of aborting the batch).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference regex (estimate_queue.py:38). `re.match` anchors at the start
# only; the trailing `.bin` uses `.` as "any char" in the reference, kept
# verbatim for parity. The reference parses only intermediate `.bin` names;
# the raw camera frames are `.jpg` — same stem, parameterized extension.
FILENAME_RE = r"^station_id_([0-9]+)_([0-9T]+).bin"
TS_FORMAT = "yyyyMMdd'T'HHmmss"
REFERENCE_TZ = "Europe/Oslo"


def _pattern(ext: str) -> str:
    return rf"^station_id_([0-9]+)_([0-9T]+).{ext}"


def station_id_col(filename: Column, ext: str = "bin") -> Column:
    """Station id as long; NULL when the name doesn't match."""
    s = F.regexp_extract(filename, _pattern(ext), 1)
    return F.when(s != "", s.cast("long")).otherwise(F.lit(None).cast("long"))


def timestamp_col(
    filename: Column, tz: str = REFERENCE_TZ, ext: str = "bin"
) -> Column:
    """Wall-time T parsed in ``tz`` → UTC timestamp; NULL on mismatch.

    ``to_utc_timestamp`` reinterprets the naive parse as ``tz`` wall time,
    matching the reference's ``replace(tzinfo=...)``.
    """
    raw = F.regexp_extract(filename, _pattern(ext), 2)
    naive = F.to_timestamp(F.when(raw != "", raw), TS_FORMAT)
    return F.to_utc_timestamp(naive, tz)


def epoch_col(filename: Column, tz: str = REFERENCE_TZ, ext: str = "bin") -> Column:
    """Epoch seconds (long), the reference's ``.timestamp()`` output."""
    return F.unix_timestamp(timestamp_col(filename, tz, ext))
