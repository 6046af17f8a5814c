"""Audit: how many times does each registry query's plan re-scan the
same source table?

The round-9 text_pmi find: a count relation consumed by several
downstream operators re-runs its whole lineage per consumer unless
materialized — the executed plan shows the SAME parquet table scanned
3-5 times, i.e. 3-5 full corpus passes for one query. Self-joins
legitimately scan a table twice (basket pairs, wedge joins), so the
audit flags >= 3 scans of one table inside one plan as a
materialize-once candidate and prints the full list for triage.

CAVEAT (measured, r9): a flag is a CANDIDATE, never a verdict. The
static pre-execution plan overcounts whenever the repeated subtrees are
IDENTICAL — at runtime AQE's ReusedExchange computes the subtree once
and replays the shuffle output for every occurrence (dedup_ngram_jaccard
shows documents x4 statically but tokenizes once; adding checkpoints
there REGRESSED it 2.5x by breaking the reuse and paying eager
serialization of array-heavy rows). The materialize-once fix only wins
when the consumers are NON-identical subtrees (text_pmi: different
aggregates/projections over the same base — no reuse possible) and the
materialized relation is REDUCED (counts, signatures), not exploded
row-level data. Always isolated-warm A/B each flagged op before and
after; keep only measured wins.

Run: python scripts/rescan_audit.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # Anchor the match on the FULL source path (r9 advice): a basename
    # regex plus a plan-wide `sf_dir/<table>.parquet in plan` check would
    # count a builder's SCRATCH file named like a source table (e.g. a
    # scratch events.parquet feed) toward the source tally whenever the
    # real source also appears anywhere in the plan.
    table_re = re.compile(re.escape(sf_dir.rstrip("/")) + r"/(\w+)\.parquet")
    spark = get_spark("rescan-audit")
    flagged: list[tuple[str, str, int]] = []
    errors: list[str] = []
    for name, spec in registry.all_specs().items():
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must finish
            errors.append(f"{name}: {type(exc).__name__}")
            continue
        # count only SOURCE-TABLE scans (paths under the testdata dir) —
        # scratch files a builder wrote itself (feeds, stores, bucketed
        # copies) never match the sf_dir-anchored pattern, even when they
        # share a source table's basename
        counts = Counter(m.group(1) for m in table_re.finditer(plan))
        for table, n in counts.items():
            if n >= 3:
                flagged.append((name, table, n))
                print(f"FLAG {name}: {table} scanned {n}x")
    print(f"audited {len(registry.all_specs()) - len(errors)} plans, "
          f"{len(errors)} builder errors, {len(flagged)} flags")
    for e in errors:
        print("ERR", e)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
