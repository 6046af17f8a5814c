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

Prints one JSON line: {"queries": {name: [sec, ...]}, "pyds_warm": bool,
"sf_dir": str, "cpu_steal": {steal_ticks, busy_ticks, steal_of_busy} |
null} — cpu_steal spans this JVM's lifetime so an A/B taken inside a
hypervisor-steal window is visibly contended in the artifact itself.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gjenbruksstasjoner_kotid_estimering_spark import benchwarm, registry
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark

USAGE = "usage: ab_isolated.py [--no-pyds-warm] [--repeat N>=1] query ..."


def main() -> int:
    args = sys.argv[1:]
    pyds = True
    repeat = 1
    names: list[str] = []
    it = iter(args)
    try:
        for a in it:
            if a == "--no-pyds-warm":
                pyds = False
            elif a == "--repeat":
                repeat = int(next(it))
            else:
                names.append(a)
    except (StopIteration, ValueError):
        print(USAGE, file=sys.stderr)
        return 2
    if not names or repeat < 1:
        print(USAGE, file=sys.stderr)
        return 2

    # Validate names BEFORE paying JVM startup — all_specs() needs no session.
    specs = registry.all_specs()
    missing = [n for n in names if n not in specs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ticks0 = benchwarm.cpu_ticks()
    spark = get_spark("ab_isolated")
    # The SAME fixed warm-up bench.py runs (shared module — the two sets
    # drifted apart when duplicated, r11 review): isolated times are only
    # comparable to sweep rows if the warm state matches.
    benchwarm.run_warmup(spark, sf_dir, pyds=pyds)

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
    print(json.dumps({
        "queries": timings,
        "pyds_warm": pyds,
        "sf_dir": sf_dir,
        # Hypervisor steal across this JVM's lifetime (r16: an A/B taken
        # inside a steal window reads high without being a regression —
        # the ratio makes that visible in the artifact itself).
        "cpu_steal": benchwarm.steal_stats(ticks0, benchwarm.cpu_ticks()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
