"""Isolated-warm A/B harness for per-query sweep-time triage.

The full bench.py sweep runs 303 queries back-to-back in one JVM, so a
single query's sweep time can carry neighborhood effects (GC pressure,
host contention, state left by the previous query). When a sweep row
regresses, the triage rule (PROGRESS.md, r5 onward) is: re-time the query
ISOLATED in a fresh JVM after the same fixed warm-up bench.py uses — if
the isolated-warm time matches the committed record, the sweep number was
environment, not plan.

Usage (each invocation is one fresh JVM — run once per query/arm):

    python scripts/ab_isolated.py q1 [q2 ...]          # bench warmup, time each
    python scripts/ab_isolated.py --no-pyds-warm q1    # skip the Python
        # DataSource batch read/write warm-up (A/B arm for deciding whether
        # a pyds query's timed entry is actually prewarmed by it)
    python scripts/ab_isolated.py --repeat 3 q1        # time q1 three times

Prints one JSON line: {"queries": {name: [sec, ...]}, "pyds_warm": bool}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark

WARMUP = (
    "agg_basic",
    "join_inner",
    "window_rank",
    "tpch_q1",
    "tpch_q10",
    "text_token_counts",
)


def run_warmup(spark, sf_dir: str, pyds: bool) -> None:
    """The same fixed warm-up set bench.py runs untimed before its sweep."""
    specs = registry.all_specs()
    load_table(spark, sf_dir, "region").count()
    for name in WARMUP:
        specs[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    if not pyds:
        return
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
    warm_sink = new_scratch_dir("ab_warm_sink")
    try:
        series.write.format("graft_jsonl").option("path", warm_sink).mode(
            "append"
        ).save()
    finally:
        shutil.rmtree(warm_sink, ignore_errors=True)


def main() -> int:
    args = sys.argv[1:]
    pyds = True
    repeat = 1
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--no-pyds-warm":
            pyds = False
        elif a == "--repeat":
            repeat = int(next(it))
        else:
            names.append(a)
    if not names:
        print("usage: ab_isolated.py [--no-pyds-warm] [--repeat N] query ...")
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_isolated")
    specs = registry.all_specs()
    missing = [n for n in names if n not in specs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2
    run_warmup(spark, sf_dir, pyds)

    timings: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = specs[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            df = None
            gc.collect()
        timings[name] = runs
    print(json.dumps({"queries": timings, "pyds_warm": pyds, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
