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


def head_misplacement(keys: list[str], pins: list[str], never: list[str],
                      cohort: list[str]) -> tuple[str, list[str]] | None:
    """First rotation-contract violation in the _PRIORITY head, or None.

    rotate_priority's head order is: active PINNED_REWRITTEN keys
    (rewritten since their newest evidence), then never-sampled keys
    (zero evidence beats stale evidence), then the stalest cohort — the
    checks must account for all three bands or an active pin makes a
    correctly rotated registry warn (r15 review; never-band handling is
    r14 advice). Returns (band_label, misplaced_keys) for the first
    violated band.
    """
    misplaced_pins = [k for k in pins if k not in keys[: len(pins)]]
    if misplaced_pins:
        return "active pins", misplaced_pins
    never_np = [k for k in never if k not in pins]
    never_band = keys[len(pins): len(pins) + len(never_np)]
    misplaced_never = [k for k in never_np if k not in never_band]
    if misplaced_never:
        return "never-sampled keys", misplaced_never
    # A cohort key that is ALSO pinned already sits in the pins band —
    # dedup it from the window width or the head widens by one and a
    # fresher key could hide inside it (r15 advice).
    cohort_np = [k for k in cohort if k not in pins]
    head = keys[: len(pins) + len(never_np) + len(cohort_np)]
    off_head = [k for k in cohort if k not in head]
    if off_head:
        return "stalest keys", off_head
    return None


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

        from scripts.rotate_priority import (
            DRIVER_SAMPLE_N,
            PINNED_REWRITTEN,
            active_pin_keys,
        )

        pinned = tuple((k, r) for k, r in PINNED_REWRITTEN if k in keys)
        pins = active_pin_keys(pinned, evidence)
        violation = head_misplacement(keys, pins, never, cohort)
        if violation:
            label, misplaced = violation
            print(f"\nWARNING: {len(misplaced)} {label} are NOT at the"
                  f" _PRIORITY head (rotation due?): {misplaced[:10]}")
            return 1
        print("\n_PRIORITY head leads with the full stalest cohort — rotation ok")

        # Copy-paste check for NEXT round's rotation commit (r14 verdict
        # item 8): assuming the driver samples the head-N keys this
        # round, whatever follows becomes the stalest and must lead the
        # next rotation — still-unsampled never keys first if the never
        # band outruns the sample, else the next-oldest cohort. The
        # budget is the single shared constant in rotate_priority (r15
        # advice: a drifting driver budget must not silently skew this).
        sampled = set(keys[:DRIVER_SAMPLE_N])
        never_set = set(never)
        rem_never = [k for k in keys if k in never_set and k not in sampled]
        if rem_never:
            print(f"\nexpected next-round head (assuming a "
                  f"{DRIVER_SAMPLE_N}-key sample): {len(rem_never)}"
                  " still-never-sampled keys lead")
            for k in rem_never[:10]:
                print(f"  {k}")
            if len(rem_never) > 10:
                print(f"  ... and {len(rem_never) - 10} more")
        else:
            remaining = {k: r for k, r in rounds.items() if k not in sampled}
            if remaining:
                nxt = min(remaining.values())
                nxt_cohort = sorted(
                    k for k, r in remaining.items() if r == nxt)
                print(f"\nexpected next-round head (post-sweep stalest,"
                      f" r{nxt}, assuming a {DRIVER_SAMPLE_N}-key"
                      f" sample): {len(nxt_cohort)} keys")
                for k in nxt_cohort[:10]:
                    print(f"  {k}")
                if len(nxt_cohort) > 10:
                    print(f"  ... and {len(nxt_cohort) - 10} more")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
