"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Optimization-round evidence tooling (guide §1/§7.2): the judge cannot run
Spark, so every touched query's before/after physical plan is committed.
Plans are captured at sf0.001 with AQE disabled for static visibility —
the same convention as scripts/plan_report.py / PLANS.md.

Usage: python scripts/dump_plans.py <tag> <query> [query ...]
       (tag is usually "before" or "after")
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark

SF = "/root/testdata/sf0.001"
OUT = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r18"))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    specs = registry.all_specs()
    rc = 0
    for name in names:
        try:
            df = specs[name].builder(spark, SF)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("(Exchange") + plan.count(") Exchange")
        print(f"{name}: wrote {path}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
