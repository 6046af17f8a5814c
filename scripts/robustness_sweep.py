"""Config-robustness sweep: every registered query vs its DuckDB oracle
under a DELIBERATELY de-tuned session.

The engine's own sessions (session.get_spark / tune()) turn on AQE, raise
the broadcast threshold, and size shuffle partitions — all performance
posture. Correctness must not depend on any of it: on a 1000-executor
cluster the operator can't assume a broadcast fits, a particular shuffle
width, or AQE being enabled (it's disabled inside stateful streaming, for
one). This sweep inverts every tuning knob and asserts the full registry
still hash-matches the oracle:

- ``spark.sql.adaptive.enabled=false``            — no runtime re-planning,
  no AQE partition coalescing, no skew-join splitting;
- ``spark.sql.autoBroadcastJoinThreshold=1MB``    — joins that normally
  broadcast degrade to sort-merge/shuffled-hash unless the plan *pins* the
  broadcast with an explicit hint (which stays legal — hints override);
- ``spark.sql.shuffle.partitions=7``              — odd, small, and unequal
  to any input partition count, so every exchange re-buckets rows;
- ``spark.sql.files.maxPartitionBytes=128k``      — forces many input
  splits, approximating high-parallelism scans: every scan-side assumption
  about rows-per-partition or partition ordering gets shaken out.

Only correctness-relevant confs stay (UTC session timezone, Arrow
transport, the nanosAsLong testdata guard): those are declared engine
semantics, not tuning. A pass means the registry's results are a pure
function of the data — partitioning-, join-strategy-, and AQE-invariant —
which is the portability contract a driver-owned cluster session needs.

Usage: python scripts/robustness_sweep.py [sf_dir] [query ...]
       (defaults to sf0.001; ~4 min for all 303 keys)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    from gjenbruksstasjoner_kotid_estimering_spark import registry
    from scripts.compare import compare, duck_con

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        args = args[1:]

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("robustness-sweep")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "1MB")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.files.maxPartitionBytes", "131072")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    con = duck_con(sf_dir)
    specs = registry.all_specs()
    unknown = [n for n in args if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown} (see registry.queries())")
        return 2
    names = args or sorted(specs)

    failures: list[str] = []
    t0 = time.time()
    for name in names:
        spec = specs[name]
        try:
            sdf = spec.builder(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}", flush=True)
            failures.append(name)
            continue
        if spec.oracle is None:
            # rows-only keys keep their declared non-empty gate here too
            if len(sdf) == 0:
                print(f"FAIL  {name}: zero rows [rows-only]", flush=True)
                failures.append(name)
            else:
                print(f"rows  {name}: {len(sdf)} [rows-only]", flush=True)
            continue
        try:
            ddf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}", flush=True)
            failures.append(name)
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures.append(name)
            print(f"FAIL  {name}:", flush=True)
            for p in problems:
                print(f"      {p}", flush=True)
        else:
            print(f"ok    {name}: {len(sdf)} rows", flush=True)
    print(
        f"\nDE-TUNED SWEEP {sf_dir}: {len(names) - len(failures)}/{len(names)}"
        f" pass in {time.time() - t0:.1f}s; failures: {failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
