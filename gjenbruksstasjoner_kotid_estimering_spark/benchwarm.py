"""The fixed bench warm-up, shared by bench.py and scripts/ab_isolated.py.

Sweep totals are only comparable warm (round-5 finding: fresh-JVM C2
cold starts spread identical code 163-282s), so bench.py runs this FIXED
set untimed before its sweep — and the isolated-warm triage harness
(scripts/ab_isolated.py) must run the *same* set or its per-query times
aren't comparable to the sweep's (round-11 review finding: the two
warmups drifted apart within one PR). One implementation, two callers.

The set covers the hot plan shapes (scan+agg, hash join, sort/window,
broadcast top-k, mapInPandas), the Python DataSource read AND write
lanes (each pays its own one-time planner/worker setup — r9/r10), and
one true-streaming drain (the session's first streaming query pays ~2s
of one-time MicroBatchExecution/state-store infra the batch warmup
doesn't touch — measured r11 via scripts/ab_isolated.py:
stream_tumbling_window_true 3.91s first run → 1.78-1.89s steady).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves string type hints in warm_python_lanes

# Registry rows run untimed before the sweep. Their timed sweep entries
# carry a JIT/cache advantage by design — bench.py records them under
# "prewarmed" so per-query readers discount them.
WARMUP: tuple[str, ...] = (
    "agg_basic",
    "join_inner",
    "window_rank",
    "tpch_q1",
    "tpch_q10",
    "text_token_counts",
    "stream_tumbling_window_true",
)

# Rows whose one-time Python DataSource planner/worker setup is paid by
# the graft_series read / graft_jsonl write below — also "prewarmed".
# stream_python_datasource_true is deliberately NOT listed: its
# readStream source/worker path is distinct from the batch lane, and an
# isolated fresh-JVM A/B (r11, scripts/ab_isolated.py: with-warm
# 5.68/5.35s vs no-warm 7.14/3.06s) showed no prewarming effect above
# run-to-run variance, so labeling it prewarmed would over-discount its
# timed entry (r10 advice).
PYDS_WARMED: tuple[str, ...] = (
    "scan_python_datasource",
    "sink_python_datasource",
)


def settle(
    read_counts,
    baseline: tuple[int, int],
    expect_events: bool,
    deadline_s: float = 1.0,
    tick_s: float = 0.05,
) -> None:
    """Wait (bounded) for async StreamingQueryListener delivery to catch
    up before reading per-row drain deltas. Returns immediately when the
    counts already match the baseline and no events are expected (batch
    rows pay zero sleep); otherwise polls until the counts hold still for
    two consecutive ticks or the deadline passes. Without this, a late
    start event attributes a stream row's drain to the FOLLOWING row
    (r11 review). ``read_counts`` is a zero-arg callable returning the
    current (starts, batches) tuple."""
    import time

    if not expect_events and read_counts() == baseline:
        return
    end = time.perf_counter() + deadline_s
    prev = read_counts()
    still = 0
    while time.perf_counter() < end and still < 2:
        time.sleep(tick_s)
        cur = read_counts()
        still = still + 1 if cur == prev else 0
        prev = cur


def cpu_ticks() -> dict | None:
    """Aggregate CPU tick counters from /proc/stat's first line, or None
    where unreadable (non-Linux). ``busy`` excludes idle AND iowait so a
    steal ratio against it reads "fraction of time the host wanted CPU
    but the hypervisor gave it to someone else"."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        # Fields: user nice system idle iowait irq softirq steal guest
        # guest_nice. user/nice ALREADY include guest/guest_nice, so the
        # total must stop at steal (vals[:8]) or guest time counts twice
        # and deflates steal_of_busy on a KVM host (r16 review).
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        steal = vals[7] if len(vals) > 7 else 0
        return {"steal": steal, "busy": sum(vals[:8]) - idle}
    except Exception:  # noqa: BLE001 — diagnostics must never break a bench
        return None


def steal_stats(before: dict | None, after: dict | None) -> dict | None:
    """Hypervisor-steal summary between two cpu_ticks() readings, or None.

    The round-16 adjudication measured ~25% of non-idle ticks stolen
    during an above-band sweep window (vs 0.45% on the quiet r13 host) —
    recording the ratio in every bench artifact turns that one-off
    manual measurement into standing triage evidence: a sweep with a
    high steal_of_busy is contention BY MEASUREMENT, not by inference
    from the same-code band."""
    if not before or not after:
        return None
    busy = after["busy"] - before["busy"]
    steal = after["steal"] - before["steal"]
    return {
        "steal_ticks": steal,
        "busy_ticks": busy,
        "steal_of_busy": round(steal / busy, 4) if busy > 0 else None,
    }


def warm_python_lanes(spark) -> None:
    """Pay each Python-eval operator class's one-time worker/plan-class
    setup on 64 synthetic rows, untimed (r17 optimization round, guide
    §1: measure the computation, not the harness cold start).

    The r16 driver sweep's only two floor breaches were exactly this
    cost: ``udaf_grouped_stats`` timed 4.87s vs 0.80s on its same-session
    rerun and ``udtf_polymorphic_split`` 4.13s vs 0.49s — the sidecar's
    own ``first_run_overhead_s`` attributed 4.07s/3.64s to the session's
    FIRST use of the FlatMapGroupsInPandas / PythonUDTF lanes (worker
    pool spin-up + JVM plan-class load), not to the queries. The batch
    warm-up set covers the scan/join/window/stream shapes but, before
    this round, no applyInPandas, no grouped-agg pandas UDF, no
    mapInPandas/mapInArrow, no UDTF and no pickled-UDF lane — so
    whichever registry row alphabetically reached each lane first ate
    its setup inside the timed region. One tiny query per lane here
    moves that one-time cost into session setup where it belongs; the
    per-row timings then measure steady-state plans for every row of
    those families alike.
    """
    # Module-level ``pd`` (below) is required: with ``from __future__
    # import annotations`` every hint is a string, and pandas_udf resolves
    # them against the function's module globals — a function-local
    # ``import pandas as pd`` leaves 'pd.Series' unresolvable
    # (UNSUPPORTED_SIGNATURE at session warmup, r17 inherited-state fix).
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf, udf, udtf

    base = spark.range(64).select(
        (F.col("id") % 8).alias("k"), F.col("id").cast("double").alias("v")
    )

    def _gstats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "m": [pdf["v"].mean()]})

    base.groupBy("k").applyInPandas(_gstats, schema="k long, m double").write.format(
        "noop"
    ).mode("overwrite").save()

    @pandas_udf("double")
    def _gsum(v: pd.Series) -> float:
        return float(v.sum())

    base.groupBy("k").agg(_gsum("v").alias("s")).write.format("noop").mode(
        "overwrite"
    ).save()

    @pandas_udf("double")
    def _sq(v: pd.Series) -> pd.Series:
        return v * v

    @udf("double")
    def _halve(x: float) -> float:
        return x / 2.0

    def _mip(it):
        for pdf in it:
            yield pdf

    base.select(_sq("v").alias("a"), _halve("v").alias("b")).write.format(
        "noop"
    ).mode("overwrite").save()
    base.mapInPandas(_mip, schema="k long, v double").write.format("noop").mode(
        "overwrite"
    ).save()
    base.mapInArrow(lambda it: it, schema="k long, v double").write.format(
        "noop"
    ).mode("overwrite").save()

    @udtf(returnType="x: long")
    class _Dup:
        def eval(self, k: int):  # noqa: D102
            yield (k,)
            yield (k,)

    _Dup(F.lit(1)).write.format("noop").mode("overwrite").save()


def run_warmup(spark, sf_dir: str, pyds: bool = True) -> None:
    """Run the fixed warm-up set untimed. ``pyds=False`` skips the Python
    DataSource read/write warm (the A/B arm for prewarm attribution)."""
    from gjenbruksstasjoner_kotid_estimering_spark import registry
    from gjenbruksstasjoner_kotid_estimering_spark.io import load_table

    specs = registry.all_specs()
    # One trivial action pays session startup before the warmup queries.
    load_table(spark, sf_dir, "region").count()
    for name in WARMUP:
        if name in specs:
            specs[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    warm_python_lanes(spark)
    if not pyds:
        return

    # Python DataSource plan class (r9): the session's FIRST DataSource
    # query pays one-time Python-planner/worker infra (measured 4-8s)
    # that belongs to session setup, not the query. A 64-row
    # graft_series read moves it out of the timed region; the write side
    # pays its OWN one-time setup (r9 verdict #4), so a 64-row
    # graft_jsonl write to a throwaway scratch dir follows.
    import shutil

    from gjenbruksstasjoner_kotid_estimering_spark.scratch import new_scratch_dir
    from gjenbruksstasjoner_kotid_estimering_spark.sources.pyds import (
        register_graft_jsonl,
        register_graft_series,
    )

    register_graft_series(spark)
    register_graft_jsonl(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    series = (
        spark.read.format("graft_series")
        .option("rows", 64)
        .option("partitions", 2)
        .load()
    )
    series.write.format("noop").mode("overwrite").save()
    warm_sink = new_scratch_dir("bench_warm_sink")
    try:
        series.write.format("graft_jsonl").option("path", warm_sink).mode(
            "append"
        ).save()
    finally:
        shutil.rmtree(warm_sink, ignore_errors=True)
