"""Per-query job-level profiler (optimization round tooling, guide §1).

Runs the named queries through the same noop-sink methodology as bench.py
but with the Spark event log enabled, then parses the log into a per-query
job/stage breakdown: job wall spans, task time, shuffle bytes, and the
top stages — the local[32] stand-in for the Spark UI's Stages tab (the UI
is disabled in this harness).

Usage: python scripts/profile_query.py <query> [query ...] [--sf DIR]
       [--repeat N]

Each query runs ``--repeat`` times (default 2) so first-execution
JIT/class-load overhead is visible as the run-1 vs run-2 delta.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gjenbruksstasjoner_kotid_estimering_spark import benchwarm, registry
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark

EVDIR = "/tmp/spark-events-profile"


def get_profiled_spark():
    """get_spark()'s exact confs + the event log — same session shape as
    bench.py, so job/stage numbers here explain bench rows."""
    import shutil

    os.makedirs(EVDIR, exist_ok=True)
    for f in glob.glob(os.path.join(EVDIR, "*")):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    import tempfile

    from pyspark.sql import SparkSession

    from gjenbruksstasjoner_kotid_estimering_spark.session import (
        RUNTIME_CONFS,
        tune,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        # Spark 4 defaults to zstd-compressed rolling (v2 directory)
        # logs; this parser wants one plain-text file
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            tempfile.mkdtemp(prefix="spark-warehouse-"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)


def _eventlog_lines(path: str):
    """Yield event-log JSON lines from either layout: a single file
    (eventLog v1) or the rolling v2 DIRECTORY (Spark 4 writes
    ``eventlog_v2_<app>/events_*`` part files plus an appstatus marker)."""
    if os.path.isdir(path):
        parts = sorted(
            p
            for p in glob.glob(os.path.join(path, "events_*"))
            if os.path.isfile(p)
        )
        for p in parts:
            yield from open(p)
    else:
        yield from open(path)


def parse_eventlog(path: str):
    jobs = {}
    stages = {}
    for line in _eventlog_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "desc": ev.get("Properties", {}).get(
                    "spark.job.description", ""
                ),
                "start": ev["Submission Time"],
                "stages": ev.get("Stage IDs", []),
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            taskms = 0
            sread = swrite = inbytes = 0
            for acc in si.get("Accumulables", []):
                n = acc.get("Name")
                v = acc.get("Value", 0)
                if n == "internal.metrics.executorRunTime":
                    taskms = v
                elif n == "internal.metrics.shuffle.read.remoteBytesRead":
                    sread += v
                elif n == "internal.metrics.shuffle.read.localBytesRead":
                    sread += v
                elif n == "internal.metrics.shuffle.write.bytesWritten":
                    swrite = v
                elif n == "internal.metrics.input.bytesRead":
                    inbytes = v
            stages[sid] = {
                "name": si.get("Stage Name", "")[:70],
                "tasks": si.get("Number of Tasks", 0),
                "wall_ms": (si.get("Completion Time") or 0)
                - (si.get("Submission Time") or 0),
                "task_ms": taskms,
                "shuffle_read": sread,
                "shuffle_write": swrite,
                "input": inbytes,
            }
    return jobs, stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_profiled_spark()
    specs = registry.all_specs()
    if not args.no_warm:
        benchwarm.run_warmup(spark, args.sf)

    wall = {}
    for name in args.queries:
        for rep in range(args.repeat):
            tag = f"{name}#r{rep}"
            spark.sparkContext.setJobDescription(tag)
            t0 = time.perf_counter()
            df = specs[name].builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            wall[tag] = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            import gc

            df = None
            gc.collect()

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)
    logs = glob.glob(os.path.join(EVDIR, f"{app_id}*"))
    if not logs:
        logs = sorted(glob.glob(os.path.join(EVDIR, "*")))
    jobs, stages = parse_eventlog(logs[-1])

    for tag, w in wall.items():
        tagged = {
            jid: j for jid, j in jobs.items() if j["desc"].startswith(tag)
        }
        njobs = len(tagged)
        jspan = sum(
            (j.get("end", j["start"]) - j["start"]) for j in tagged.values()
        )
        print(f"\n=== {tag}: wall {w:.3f}s, {njobs} jobs, "
              f"job-span sum {jspan/1000:.3f}s ===")
        for jid in sorted(tagged):
            j = tagged[jid]
            dur = (j.get("end", j["start"]) - j["start"]) / 1000
            st = [stages[s] for s in j["stages"] if s in stages]
            stxt = "; ".join(
                f"{s['name'].split()[0]}[{s['tasks']}t "
                f"wall={s['wall_ms']}ms task={s['task_ms']}ms"
                + (f" sw={s['shuffle_write']//1024}K" if s["shuffle_write"] else "")
                + (f" sr={s['shuffle_read']//1024}K" if s["shuffle_read"] else "")
                + (f" in={s['input']//1024}K" if s["input"] else "")
                + "]"
                for s in st
            )
            print(f"  job {jid}: {dur:6.3f}s  {stxt}")


if __name__ == "__main__":
    main()
