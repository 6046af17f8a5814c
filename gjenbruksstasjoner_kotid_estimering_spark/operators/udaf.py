"""Custom grouped aggregation via ``applyInPandas`` (SURVEY.md §2 "UDAF").

The escape hatch for aggregates Catalyst can't express (here: interpolated
quantiles per group, numpy-side). Arrow moves whole groups into pandas in
columnar batches — this is the *slow path* by design; everything that CAN
be a built-in aggregate lives in plans/aggregates.py. Grouping key count
per station is small and bounded, so group-at-a-time memory is safe; at
100 TB the shuffle is on the group key exactly like a built-in agg.

Oracle note: numpy's linear-interpolation percentile matches DuckDB's
``quantile_cont`` arithmetic, so this UDAF is oracle-checked — a deliberate
demonstration that even Python-side operators can be held to exact parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_SCHEMA = (
    "user_id long, n long, median_value double, q1 double, q3 double, "
    "trimmed_mean_cents bigint"
)


def _quantile_cont(v: np.ndarray, q: float) -> float:
    """Linear-interpolated quantile with DuckDB quantile_cont's exact
    arithmetic: lo*(1-frac) + hi*frac (np.percentile computes
    lo + (hi-lo)*frac, which differs by an ulp on some inputs)."""
    h = (len(v) - 1) * q
    fl = int(np.floor(h))
    frac = h - fl
    if frac == 0.0:
        return float(v[fl])
    return float(v[fl] * (1.0 - frac) + v[fl + 1] * frac)


def _grouped_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    v = np.sort(pdf["value"].to_numpy(dtype=np.float64))
    q1, med, q3 = (_quantile_cont(v, q) for q in (0.25, 0.50, 0.75))
    # interior mean in exact cents (order-insensitive integer sum)
    lo, hi = _quantile_cont(v, 0.10), _quantile_cont(v, 0.90)
    interior = v[(v >= lo) & (v <= hi)]
    cents = np.round(interior * 100.0).astype(np.int64)
    trimmed = int(cents.sum() // max(len(cents), 1))
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n": [len(v)],
            "median_value": [med],
            "q1": [q1],
            "q3": [q3],
            "trimmed_mean_cents": [trimmed],
        }
    )


@register(
    "udaf_grouped_stats",
    oracle="""
        WITH bounds AS (
          SELECT user_id,
                 quantile_cont(value, 0.10) AS lo,
                 quantile_cont(value, 0.90) AS hi
          FROM events GROUP BY user_id
        )
        SELECT e.user_id,
               count(*) AS n,
               quantile_cont(e.value, 0.50) AS median_value,
               quantile_cont(e.value, 0.25) AS q1,
               quantile_cont(e.value, 0.75) AS q3,
               CAST(sum(CAST(round(e.value * 100.0, 0) AS BIGINT))
                        FILTER (WHERE e.value >= b.lo AND e.value <= b.hi)
                    // count(*) FILTER (WHERE e.value >= b.lo AND e.value <= b.hi)
                    AS BIGINT) AS trimmed_mean_cents
        FROM events e JOIN bounds b ON e.user_id = b.user_id
        GROUP BY e.user_id
    """,
    doc="Custom grouped aggregate (per-station interpolated quantiles + "
    "10-90% trimmed mean) via applyInPandas — the Arrow-grouped UDAF "
    "surface, still held to oracle-exact parity (numpy linear percentile "
    "≡ quantile_cont).",
    tags=("udaf", "pandas"),
)
def udaf_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import fan_out

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    # Keyed fan_out: AQE would coalesce the small-by-bytes shuffle to ~1
    # partition and funnel every group through a single Python worker;
    # applyInPandas reuses the explicit hash partitioning (no extra
    # exchange), so groups spread across all workers.
    ev = fan_out(ev, keys=["user_id"])
    return ev.groupBy("user_id").applyInPandas(_grouped_stats, schema=_SCHEMA)


@register(
    "agg_approx_quantile",
    oracle=None,  # sketch-based → rows-only; bounds pytest-checked
    doc="approx_percentile (t-digest-style sketch): the built-in 100 TB "
    "path for quantiles — one pass, mergeable state, no per-group "
    "materialization; the exact quantiles live in udaf_grouped_stats. "
    "Error bounds vs exact are pytest-asserted.",
    tags=("agg", "approx", "quantile"),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
        F.percentile_approx("value", 0.9, 10000).alias("approx_p90"),
        F.count(F.lit(1)).alias("n"),
    )
