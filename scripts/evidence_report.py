"""Evidence-freshness report over the driver's CORRECTNESS sidecars.

Every verdict since r11 computes the same numbers by hand: per-key
newest driver-evidence round (union of CORRECTNESS_r01..rN), the
freshness histogram, the stalest cohort, and any never-sampled keys.
This prints all of it in one command so the per-round hygiene goal
("min evidence round >= X, stalest cohort <= Y keys") is a lookup, and
cross-checks the registry's _PRIORITY head against the stalest cohort
(the head should lead with exactly the stalest keys — the rotation
contract the tripwire test enforces).

Usage: python scripts/evidence_report.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.evidence import newest_evidence

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    evidence = newest_evidence(REPO)
    keys = list(registry.all_specs())
    never = sorted(k for k in keys if k not in evidence)
    rounds = {k: evidence[k] for k in keys if k in evidence}

    hist = Counter(rounds.values())
    print(f"registry keys: {len(keys)}; with driver evidence: {len(rounds)};"
          f" never sampled: {len(never)}")
    for r in sorted(hist):
        print(f"  r{r:02d}: {hist[r]:3d} keys")
    if never:
        print("never sampled:", ", ".join(never))

    if rounds:
        stalest_round = min(hist)
        cohort = sorted(k for k, r in rounds.items() if r == stalest_round)
        print(f"\nstalest cohort (r{stalest_round}): {len(cohort)} keys")
        for k in cohort[:60]:
            print(f"  {k}")
        if len(cohort) > 60:
            print(f"  ... and {len(cohort) - 60} more")

        # The rotation contract places never-sampled keys at the very
        # head (zero evidence beats stale evidence), so the stalest
        # cohort legitimately sits AFTER them (r14 advice).
        misplaced_never = [k for k in never if k not in keys[: len(never)]]
        if misplaced_never:
            print(f"\nWARNING: {len(misplaced_never)} never-sampled keys are"
                  f" NOT at the _PRIORITY head (rotation due?):"
                  f" {misplaced_never[:10]}")
            return 1
        head = keys[: len(never) + len(cohort)]
        off_head = [k for k in cohort if k not in head]
        if off_head:
            print(f"\nWARNING: {len(off_head)} stalest keys are NOT at the"
                  f" _PRIORITY head (rotation due?): {off_head[:10]}")
            return 1
        print("\n_PRIORITY head leads with the full stalest cohort — rotation ok")

        # Copy-paste check for NEXT round's rotation commit (r14 verdict
        # item 8): assuming the driver samples the head-SAMPLE_N keys
        # this round, the following cohort becomes the stalest and must
        # lead the next rotation.
        SAMPLE_N = 50
        sampled = set(keys[:SAMPLE_N]) | set(never)
        remaining = {k: r for k, r in rounds.items() if k not in sampled}
        if remaining:
            nxt = min(remaining.values())
            nxt_cohort = sorted(k for k, r in remaining.items() if r == nxt)
            print(f"\nexpected next-round head (post-sweep stalest, r{nxt}):"
                  f" {len(nxt_cohort)} keys")
            for k in nxt_cohort[:10]:
                print(f"  {k}")
            if len(nxt_cohort) > 10:
                print(f"  ... and {len(nxt_cohort) - 10} more")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
