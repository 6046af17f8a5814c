"""Benchmark harness (driver contract, BASELINE.md).

Runs the registered queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

The printed line is kept compact on purpose: round 1's full 93-entry
per-query map overflowed the driver's stdout tail capture (BENCH_r01.json
``"parsed": null``), so the final line carries only the totals plus the 5
slowest queries, and the full per-query timing map is written to
``bench_full.json`` next to this script.

Each query executes to completion through a ``noop`` sink — full plan runs
(scan → shuffle → sink) without driver-side collection, which is what a
cluster deployment would measure.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Fixed warm-up convention (round-5 VERDICT: identical-code sweep
    # totals varied 163-282s on fresh JVMs — C2-compiler cold starts, not
    # plan changes). One trivial action pays session startup, then a
    # FIXED set of representative plan shapes (scan+agg, hash join, sort/
    # window, broadcast top-k, mapInPandas) runs untimed so whole-stage-
    # codegen classes and the hot JIT paths exist before the first timed
    # query. Keeps sidecar totals comparable across rounds.
    specs = registry.all_specs()
    warmup = (
        "agg_basic",
        "join_inner",
        "window_rank",
        "tpch_q1",
        "tpch_q10",
        "text_token_counts",
        # The session's FIRST streaming query pays ~2s of one-time
        # streaming infra (MicroBatchExecution/state-store/JIT) that the
        # batch warmup doesn't touch — measured r11 via
        # scripts/ab_isolated.py (stream_tumbling_window_true 3.91s
        # first run → 1.78-1.89s steady in the same JVM). In the
        # alphabetical sweep that cost landed on whichever stream_* row
        # ran first; pay it here untimed instead.
        "stream_tumbling_window_true",
    )
    # These aren't run as warmup queries, but the graft_series read /
    # graft_jsonl write below pays their one-time Python DataSource
    # planner+worker setup, so their timed entries carry the same
    # advantage as the explicitly warmed set — record them in
    # "prewarmed" so per-query readers discount them too.
    # stream_python_datasource_true is deliberately NOT listed: its
    # readStream source/worker path is distinct from the batch lane, and
    # an isolated fresh-JVM A/B (r11, scripts/ab_isolated.py: with-warm
    # 5.68/5.35s vs no-warm 7.14/3.06s) showed no prewarming effect
    # above run-to-run variance, so labeling it prewarmed would
    # over-discount its timed entry (r10 advice).
    pyds_warmed = (
        "scan_python_datasource",
        "sink_python_datasource",
    )
    try:
        load_table(spark, sf_dir, "region").count()
        for name in warmup:
            if name in specs:
                specs[name].builder(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
        # Python DataSource plan class (r9): the session's FIRST
        # DataSource query pays one-time Python-planner/worker infra
        # (measured 4-8s) that belongs to session setup, not the query —
        # the same rationale as the JIT warm-up above. A 64-row
        # graft_series read moves it out of the timed region.
        from gjenbruksstasjoner_kotid_estimering_spark.sources.pyds import (
            register_graft_series,
        )

        register_graft_series(spark)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        (
            spark.read.format("graft_series")
            .option("rows", 64)
            .option("partitions", 2)
            .load()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        # Python DataSource SINK twin (r9 verdict #4): the write side pays
        # its own one-time worker/plan setup that the scan warmup doesn't
        # touch (sink_python_datasource was the slowest sweep row at
        # 5.99s driver / ~0.9s isolated-warm). A 64-row graft_jsonl write
        # to a throwaway scratch dir moves that setup out of the timed
        # region too.
        import shutil

        from gjenbruksstasjoner_kotid_estimering_spark.scratch import (
            new_scratch_dir,
        )
        from gjenbruksstasjoner_kotid_estimering_spark.sources.pyds import (
            register_graft_jsonl,
        )

        register_graft_jsonl(spark)
        warm_sink = new_scratch_dir("bench_warm_sink")
        try:
            (
                spark.read.format("graft_series")
                .option("rows", 64)
                .option("partitions", 2)
                .load()
                .write.format("graft_jsonl")
                .option("path", warm_sink)
                .mode("append")
                .save()
            )
        finally:
            shutil.rmtree(warm_sink, ignore_errors=True)
        warmup_ok = True
    except Exception as exc:  # noqa: BLE001
        warmup_ok = False
        print(f"bench: warmup failed: {exc}", file=sys.stderr)
    # Per-row streaming drain stats (r10 verdict #4): when a stream_* row
    # regresses only inside a driver sweep, the first triage question is
    # "did it run more micro-batches, or the same batches slower?" — make
    # that answerable from the artifact alone. One session-level listener
    # counts query starts / progress events; each timed row records the
    # delta. Listener delivery is ASYNC, so a tail event can bleed into
    # the next row's delta — the counts are diagnostic, not exact.
    stream_stats: dict[str, dict[str, int]] = {}
    try:
        from pyspark.sql.streaming.listener import StreamingQueryListener

        class _DrainCounter(StreamingQueryListener):
            def __init__(self) -> None:
                self.starts = 0
                self.batches = 0

            def onQueryStarted(self, event) -> None:  # noqa: N802
                self.starts += 1

            def onQueryProgress(self, event) -> None:  # noqa: N802
                self.batches += 1

            def onQueryIdle(self, event) -> None:  # noqa: N802
                pass

            def onQueryTerminated(self, event) -> None:  # noqa: N802
                pass

        counter = _DrainCounter()
        spark.streams.addListener(counter)
    except Exception as exc:  # noqa: BLE001 — stats are optional
        counter = None
        print(f"bench: stream listener unavailable: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(specs):
        # builder() inside the timed region: some builders do real work
        # (MLlib fits, iterative collects, count() scalars) before the
        # plan exists — timing only the final action would under-report
        # them.
        #
        # Per-query exception guard: one broken query must never kill the
        # whole sweep (round 2: a single AnalysisException crashed the run
        # and the driver got NO bench artifact — rc 1, parsed null).
        # Record the error, keep sweeping, always exit 0 with the JSON line.
        t0 = time.perf_counter()
        starts0 = counter.starts if counter else 0
        batches0 = counter.batches if counter else 0
        try:
            df = specs[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            if counter and counter.starts > starts0:
                stream_stats[name] = {
                    "queries": counter.starts - starts0,
                    "microbatches": counter.batches - batches0,
                }
        except Exception as exc:  # noqa: BLE001 — sweep must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
        finally:
            # Several operators localCheckpoint intermediates; the JVM
            # storage blocks are only released when the py4j cleaner runs
            # after Python GC. Without this, blocks from 150+ queries
            # accumulate and the late heavy queries (clusters, kmeans) pay
            # memory pressure that standalone runs don't — observed as
            # 2.7s → 11.6s drift inside the sweep.
            df = None
            gc.collect()

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "full queries() sweep wall time",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "errors": errors,
        # The warm-up set runs untimed BEFORE the sweep, so exactly these
        # queries carry a JIT/cache advantage in their timed entries —
        # cross-query comparisons against them are skewed by design (the
        # warm-up exists to stabilize the TOTAL across rounds). Recorded
        # here so per-query readers can discount them.
        "prewarmed": sorted(
            n for n in warmup + pyds_warmed if n in specs
        ),
        # False = the warm-up block died and the sweep ran cold: totals
        # are NOT comparable to warm rounds (r5 finding: fresh-JVM C2
        # cold starts alone spread identical code 163-282s). Readers
        # should triage "regressions" in such a sweep as cold-start
        # artifacts first.
        "warmup_ok": warmup_ok,
        # Per-row streaming drain stats (async listener deltas — see the
        # _DrainCounter note above): {"queries": started, "microbatches":
        # progress events} for every timed row that started a streaming
        # query. A sweep-time blip with UNCHANGED counts points at the
        # host/environment; a count change points at the drain itself.
        "stream_stats": stream_stats,
        "sf": sf_val,
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    line = {
        "metric": "full queries() sweep wall time",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": slowest,
        "warmup_ok": warmup_ok,
        "sf": sf_val,
    }
    if errors:
        line["n_errors"] = len(errors)
        line["errors"] = {k: v[:80] for k, v in list(errors.items())[:3]}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
