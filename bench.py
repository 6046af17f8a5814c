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
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gjenbruksstasjoner_kotid_estimering_spark import benchwarm, registry
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark

# Slowest-row count for the untimed second-run pass (first-execution
# overhead measurement — see the sidecar's first_run_overhead_s note).
# All stream_* rows join the pass too, so ~25 rows × 1-5s ≈ 60-90s extra
# wall outside the timed total.
RERUN_TOP_K = 10


def summary_line(timings, errors, warmup_ok, sf_val, cpu_steal=None) -> dict:
    """The ONE JSON line the driver parses (BENCH_r{N}.json).

    Kept compact on purpose — round 1's full per-query map overflowed the
    driver's stdout tail capture ("parsed": null) — and schema-pinned by
    tests/test_benchwarm.py: metric/value/unit/n_queries/queries/
    warmup_ok/sf always present, n_errors/errors only when a row failed,
    steal_of_busy (the timed-sweep hypervisor-steal ratio) only when
    /proc/stat was measurable.
    With >3 failures the "errors" preview shows the first 3 in sweep
    (alphabetical) order, not by relevance — n_errors carries the true
    count and the complete error map is in bench_full.json.
    """
    line = {
        "metric": "full queries() sweep wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5]),
        "warmup_ok": warmup_ok,
        "sf": sf_val,
    }
    if errors:
        line["n_errors"] = len(errors)
        line["errors"] = {k: v[:80] for k, v in list(errors.items())[:3]}
    # One scalar of contention evidence in the DRIVER-FACING line (r16
    # review: bench_full.json is overwritten by the next run, so the
    # driver's BENCH_rNN.json wrapper is the only PERSISTENT per-round
    # carrier — without this, floor_check can never flag a driver
    # sidecar as contended). Omitted (not null) when /proc/stat is
    # unavailable, keeping the base schema unchanged.
    if cpu_steal and cpu_steal.get("steal_of_busy") is not None:
        line["steal_of_busy"] = cpu_steal["steal_of_busy"]
    return line


def measure_harness_floor(spark, sf_dir: str, repeats: int = 5) -> dict:
    """Per-row fixed harness cost in THIS warm session (r17 verdict #7).

    Every timed row pays a floor that has nothing to do with its plan's
    data work: builder call + Catalyst analysis/optimization + codegen +
    noop-sink job launch. Measure it directly with two trivial probes —
    a JVM-only row (range → noop: pure plan-compile + job-launch cost)
    and a one-file parquet scan row (adds file-listing + scan-task cost,
    the floor every registry row actually stands on). min over
    ``repeats`` (the floor is a lower bound; max/median carry scheduler
    noise). Runs UNTIMED between warmup and the sweep; the numbers let a
    sidecar reader discount the ~60-row 1–2s mid-band instead of
    hunting plan waste inside what is mostly fixed per-query overhead."""
    from gjenbruksstasjoner_kotid_estimering_spark.io import load_table

    def time_min(build) -> float:
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 4)

    try:
        from pyspark.sql import functions as F

        jvm_only = time_min(
            lambda: spark.range(64).select(
                F.col("id"), (F.col("id") % 7).alias("m")
            )
        )
        scan = time_min(
            lambda: load_table(spark, sf_dir, "region").select("r_regionkey")
        )
        return {"jvm_noop_min_s": jvm_only, "parquet_scan_min_s": scan,
                "repeats": repeats}
    except Exception as exc:  # noqa: BLE001 — diagnostics only
        print(f"bench: harness-floor probe failed: {exc}", file=sys.stderr)
        return {}


def round_sidecar_path(repo_dir: str) -> str | None:
    """Per-round persistent copy of the full sidecar (r17 verdict #2a).

    bench_full.json is overwritten by every run, so the driver's PERF
    comparison has historically seen only the summary line's 5 slowest
    rows (n_common=1 in PERF_r17). The driver commits BENCH_r{N}.json
    sidecars per round; the round a fresh bench run belongs to is
    therefore 1 + the newest committed BENCH round. Returns None when no
    BENCH_r*.json exists (e.g. unit-test tmpdirs)."""
    rounds = []
    for n in os.listdir(repo_dir):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", n)
        if m:
            rounds.append(int(m.group(1)))
    if not rounds:
        return None
    return os.path.join(repo_dir, f"bench_full_r{max(rounds) + 1:02d}.json")


def _sweep(
    spark, specs, sf_dir, counter, stream_stats, tag="", row_steal=None
) -> tuple[dict, dict]:
    """Time every query; return ({name: sec}, {name: error}).

    Extracted from main() so the per-row guard contract is unit-testable
    (tests/test_benchwarm.py): a row appears in EXACTLY one of timings /
    errors, and the listener settle runs even for failed rows. ``tag``
    prefixes stderr failure lines so a rerun-pass failure is not
    mistaken for a timed-sweep failure in the log.

    ``row_steal`` (optional out-param, same style as ``stream_stats``):
    per-row hypervisor-steal ratio over each row's own timed window.
    The whole-sweep ratio can't say WHICH rows a mid-sweep steal burst
    hit (r17: three sweeps read 311/397/342s with whole-sweep steal
    6-18% after quiet-host launch probes — the burst arrived mid-sweep
    each time); the per-row ratio makes a polluted sweep self-triaging
    at row granularity. Two /proc/stat reads per row (~10µs) — noise
    next to the cheapest 0.1s row.
    """
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(specs):
        ticks_row = benchwarm.cpu_ticks() if row_steal is not None else None
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
        except Exception as exc:  # noqa: BLE001 — sweep must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {tag}{name} FAILED: {errors[name]}", file=sys.stderr)
        finally:
            # Read the per-row steal window FIRST in the finally — before
            # the settle poll below, whose up-to-1s of untimed waiting
            # would dilute the ratio for the timed region it describes.
            # Own narrow try, same convention as the settle block below:
            # diagnostics raised inside a finally would REPLACE an
            # in-flight builder exception and kill the sweep (the
            # round-2 no-artifact failure mode).
            if row_steal is not None:
                try:
                    st = benchwarm.steal_stats(
                        ticks_row, benchwarm.cpu_ticks()
                    )
                    row_steal[name] = st["steal_of_busy"] if st else None
                except Exception as exc:  # noqa: BLE001 — diagnostics only
                    row_steal[name] = None
                    print(f"bench: {tag}{name} row-steal capture failed:"
                          f" {exc}", file=sys.stderr)
            # settle OUTSIDE the timed region: the drain already finished;
            # this only waits for the listener bus to catch up. It runs in
            # the finally so a FAILED row's in-flight listener tail drains
            # too (otherwise it bleeds into the NEXT row's delta — the
            # exact misattribution the settle was added to fix), and in
            # its own narrow try so a stats failure can never mark a
            # successfully timed row as errored.
            if counter:
                try:
                    benchwarm.settle(
                        lambda: (counter.starts, counter.batches),
                        (starts0, batches0),
                        name.startswith("stream_"),
                    )
                    if counter.starts > starts0:
                        stream_stats[name] = {
                            "queries": counter.starts - starts0,
                            "microbatches": counter.batches - batches0,
                        }
                except Exception as exc:  # noqa: BLE001 — stats are optional
                    print(
                        f"bench: {name} stream-stats settle failed: {exc}",
                        file=sys.stderr,
                    )
            # Several operators localCheckpoint intermediates; the JVM
            # storage blocks are only released when the py4j cleaner runs
            # after Python GC. Without this, blocks from 150+ queries
            # accumulate and the late heavy queries (clusters, kmeans) pay
            # memory pressure that standalone runs don't — observed as
            # 2.7s → 11.6s drift inside the sweep.
            df = None
            gc.collect()
    return timings, errors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Fixed warm-up convention (round-5 VERDICT: identical-code sweep
    # totals varied 163-282s on fresh JVMs — C2-compiler cold starts, not
    # plan changes). The set itself lives in benchwarm.py, SHARED with the
    # isolated-warm triage harness (scripts/ab_isolated.py) so sweep rows
    # and isolated re-times stay comparable (r11 review: the two warmups
    # drifted apart when duplicated).
    specs = registry.all_specs()
    try:
        benchwarm.run_warmup(spark, sf_dir)
        warmup_ok = True
    except Exception as exc:  # noqa: BLE001
        warmup_ok = False
        print(f"bench: warmup failed: {exc}", file=sys.stderr)
    # Per-row streaming drain stats (r10 verdict #4): when a stream_* row
    # regresses only inside a driver sweep, the first triage question is
    # "did it run more micro-batches, or the same batches slower?" — make
    # that answerable from the artifact alone. One session-level listener
    # counts query starts / progress events; each timed row records the
    # delta. Listener delivery is ASYNC: after each row that moved the
    # counters (or any stream_* row, whose start event may still be in
    # flight), _settle polls untimed until the counts hold still for two
    # consecutive 50ms ticks (1s cap) before the delta is read — without
    # it a tail event bleeds into the NEXT row's delta and a batch row
    # can be recorded as having run a stream (r11 review). Rows that end
    # with events still undelivered past the cap remain approximate —
    # the counts are diagnostic, not exact.
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

    # Untimed, after warmup: the fixed per-row harness floor this warm
    # session pays (plan compile + noop job launch [+ scan]), so sidecar
    # readers can discount the mid-band rows (r17 verdict #7).
    harness_floor = measure_harness_floor(spark, sf_dir)

    # Steal window = the TIMED sweep only (r16 review): warmup and the
    # untimed rerun pass add 60-120s of wall that would dilute a steal
    # burst confined to the sweep — the ratio must describe the same
    # window as the total the triage rule reads.
    ticks0 = benchwarm.cpu_ticks()
    row_steal: dict[str, float | None] = {}
    timings, errors = _sweep(
        spark, specs, sf_dir, counter, stream_stats, row_steal=row_steal
    )
    cpu_steal = benchwarm.steal_stats(ticks0, benchwarm.cpu_ticks())

    # Second-run pass over the slowest rows (UNTIMED — not in "value"):
    # every heavy row's isolated-warm A/B has shown a 0.5-1.5s first-
    # execution overhead (per-operator JIT/class-load the fixed warmup
    # doesn't reach, PROGRESS.md r11). Re-running the top rows once in the
    # same session measures that overhead directly, so a sidecar reader
    # can split a heavy row into steady-state cost (second_run_s) vs
    # first-execution overhead (first_run_overhead_s) without an external
    # ab_isolated.py run. Same-session reruns are safe: every scratch-
    # writing row is hermetic (per-invocation uuid dirs, scratch.py).
    rerun_names = [n for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])][
        :RERUN_TOP_K
    ]
    # Every stream_* row joins the rerun pass regardless of rank (r13
    # verdict #7): a stream row's first_run_overhead_s is only readable
    # against its rerun drain count, and a stream row OUTSIDE the slowest-K
    # that moves in a later sweep would otherwise have no rerun drain
    # record to triage against. Untimed, so the extra rows never touch
    # "value".
    rerun_names += [
        n for n in sorted(timings)
        if n.startswith("stream_") and n not in rerun_names
    ]
    second_run_stream_stats: dict[str, dict[str, int]] = {}
    # The rerun window gets its own per-row steal map (r17 review):
    # floor_check's breach verdict keys on second_run_s — a burst
    # confined to a row's RERUN would inflate the steady reading while
    # the timed-window map read quiet, mis-adjudicating the exact case
    # the capture exists for.
    second_run_row_steal: dict[str, float | None] = {}
    second_run, rerun_errors = _sweep(
        spark,
        {n: specs[n] for n in rerun_names},
        sf_dir,
        counter,
        second_run_stream_stats,
        tag="rerun:",
        row_steal=second_run_row_steal,
    )
    first_run_overhead = overhead_map(timings, second_run)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    line = summary_line(timings, errors, warmup_ok, sf_val, cpu_steal)
    full = full_sidecar(
        line,
        timings=timings,
        errors=errors,
        prewarmed=sorted(
            n for n in benchwarm.WARMUP + benchwarm.PYDS_WARMED if n in specs
        ),
        warmup_ok=warmup_ok,
        stream_stats=stream_stats,
        second_run=second_run,
        first_run_overhead=first_run_overhead,
        rerun_errors=rerun_errors,
        second_run_stream_stats=second_run_stream_stats,
        sf_val=sf_val,
        cpu_steal=cpu_steal,
        row_steal=row_steal,
        second_run_row_steal=second_run_row_steal,
        harness_floor=harness_floor,
    )
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(repo_dir, "bench_full.json")
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    # Per-round persistent copy (r17 verdict #2a): bench_full.json is
    # clobbered by the next run, so the full per-query map of the
    # driver's round-N sweep survives as bench_full_r{N}.json and PERF
    # can compare every row instead of the summary line's slowest 5.
    per_round = round_sidecar_path(repo_dir)
    if per_round is not None:
        with open(per_round, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)

    print(json.dumps(line))


def overhead_map(timings: dict, second_run: dict) -> dict:
    """first_run_overhead_s = timed entry − untimed rerun, per rerun row.

    A NEGATIVE delta means the untimed rerun came out slower than the
    timed first run — that row measured host noise, not warm-in overhead
    (r13 advice: graph_triangle_count −10.3s in one committed sweep).
    Record null so a sidecar reader can't mistake noise for negative JIT
    cost; the raw pair survives in queries / second_run_s.
    """
    out = {}
    for n, s in second_run.items():
        d = round(timings[n] - s, 3)
        out[n] = d if d >= 0 else None
    return out


def full_sidecar(
    line,
    *,
    timings,
    errors,
    prewarmed,
    warmup_ok,
    stream_stats,
    second_run,
    first_run_overhead,
    rerun_errors,
    second_run_stream_stats,
    sf_val,
    cpu_steal=None,
    row_steal=None,
    second_run_row_steal=None,
    harness_floor=None,
) -> dict:
    """The bench_full.json sidecar (schema-pinned in tests/test_benchwarm.py).

    The totals are single-sourced from the already-built summary line so
    the two artifacts can never disagree (r12 review).
    """
    return {
        "metric": "full queries() sweep wall time",
        "value": line["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "errors": errors,
        # The warm-up set runs untimed BEFORE the sweep, so exactly these
        # queries carry a JIT/cache advantage in their timed entries —
        # cross-query comparisons against them are skewed by design (the
        # warm-up exists to stabilize the TOTAL across rounds). Recorded
        # here so per-query readers can discount them.
        "prewarmed": prewarmed,
        # False = the warm-up block died and the sweep ran cold: totals
        # are NOT comparable to warm rounds (r5 finding: fresh-JVM C2
        # cold starts alone spread identical code 163-282s). Readers
        # should triage "regressions" in such a sweep as cold-start
        # artifacts first.
        "warmup_ok": warmup_ok,
        # Per-row streaming drain stats (async listener deltas — see the
        # _DrainCounter note above): {"queries": started, "microbatches":
        # progress events} for every row that started a streaming query,
        # including errored rows (cross-ref "errors"). A sweep-time blip
        # with UNCHANGED counts points at the host/environment; a count
        # change points at the drain itself.
        "stream_stats": stream_stats,
        # Untimed second runs of the RERUN_TOP_K slowest rows (same
        # session, after the timed sweep). first_run_overhead_s =
        # timed entry − second run: the per-operator first-execution
        # JIT/class-load cost. A heavy row whose second run is fast is
        # paying one-time overhead, not plan waste; a row that stays
        # heavy on the second run has intrinsic cost worth a plan look.
        # A null overhead means the rerun was SLOWER than the timed run —
        # host noise, unusable for warm-in triage. A row in
        # second_run_errors failed its UNTIMED rerun (flake under a
        # 300-query-old session) — it is absent from second_run_s and
        # does NOT count toward the summary line's error fields.
        "second_run_s": second_run,
        "first_run_overhead_s": first_run_overhead,
        "second_run_errors": rerun_errors,
        # Drain deltas for the rerun pass, same shape as stream_stats
        # (r12 advice): a heavy stream_* row's first_run_overhead_s is
        # only meaningful if its rerun drained the SAME batch count —
        # compare the row here against its stream_stats entry; a count
        # change means the rerun measured a different drain, not
        # steady-state cost.
        "second_run_stream_stats": second_run_stream_stats,
        # Hypervisor steal across the TIMED sweep window (warmup and the
        # untimed rerun pass excluded — the ratio describes the same
        # window as "value"), from /proc/stat deltas: {steal_ticks,
        # busy_ticks, steal_of_busy}. The r16 adjudication measured ~25%
        # of non-idle ticks stolen during an above-band window (quiet
        # r13 host: 0.45%) — a high steal_of_busy marks the sweep
        # contended BY MEASUREMENT, so its total must not be read
        # against the same-code band nor committed as a record. None
        # where /proc/stat is unavailable. The scalar steal_of_busy is
        # also on the driver-facing summary line (the persistent
        # per-round carrier).
        "cpu_steal": cpu_steal,
        # Per-row steal ratio over each timed row's own window (same
        # /proc/stat source, captured inside _sweep). The whole-sweep
        # ratio above can't say WHICH rows a mid-sweep burst hit (r17:
        # three launch-probe-quiet sweeps came back 311/397/342s with
        # 6-18% whole-sweep steal — the burst arrived mid-sweep every
        # time); with this map, a breach row whose own window was
        # stolen is adjudicated from the artifact alone. None per row
        # where /proc/stat is unavailable; {} when capture was off.
        "row_steal": row_steal if row_steal is not None else {},
        # Same map for the untimed rerun pass: floor_check's breach
        # verdict keys on second_run_s, so the steal evidence for a
        # steady reading must come from the RERUN window, not the timed
        # one (r17 review).
        "second_run_row_steal": (
            second_run_row_steal if second_run_row_steal is not None else {}
        ),
        # Fixed per-row harness cost measured in THIS session (r17
        # verdict #7): {"jvm_noop_min_s", "parquet_scan_min_s",
        # "repeats"} — the floor a trivial plan pays for builder +
        # Catalyst + codegen + noop job launch (+ one-file scan). A
        # mid-band row near parquet_scan_min_s + its shuffle count ×
        # jvm_noop_min_s is harness-floored, not plan-wasteful. {} when
        # the probe failed.
        "harness_floor_s": harness_floor if harness_floor is not None else {},
        "sf": sf_val,
    }


if __name__ == "__main__":
    main()
