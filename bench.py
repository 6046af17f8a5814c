"""Benchmark harness (driver contract, BASELINE.md).

Runs the registered queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query executes to completion through a ``noop`` sink — full plan runs
(scan → shuffle → sink) without driver-side collection, which is what a
cluster deployment would measure.
"""

from __future__ import annotations

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

    # Warm the JVM / codegen / parquet footer caches with a trivial action
    # so the first measured query doesn't pay session startup.
    load_table(spark, sf_dir, "region").count()

    specs = registry.all_specs()
    timings: dict[str, float] = {}
    for name in sorted(specs):
        df = specs[name].builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "full queries() sweep wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
