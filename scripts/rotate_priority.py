"""Regenerate registry._PRIORITY stalest-first from driver evidence.

The driver's per-round correctness sample walks ``queries()`` in
dict-insertion order under a ~50-key budget, so after every driver round
the `_PRIORITY` head must be rebuilt or the budget re-verifies keys the
driver just confirmed (r7 verdict #2). This script encodes the rotation
contract mechanically:

1. newest driver evidence per key = max round over CORRECTNESS_r*.json
   that sampled it (zero if never sampled);
2. order = zero-evidence keys first, then ascending newest-evidence
   round, alphabetical within a round;
3. rewrite the `_PRIORITY` tuple in registry.py in that order, with one
   comment line per evidence group.

Run from the repo root after a new CORRECTNESS_r{N}.json lands:

    python scripts/rotate_priority.py        # rewrites registry.py
    python -m pytest tests/test_registry.py -q   # must be green after

tests/test_registry.py::test_priority_head_is_rotated is the guard that
fails when this script hasn't been run.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY_PY = os.path.join(
    REPO, "gjenbruksstasjoner_kotid_estimering_spark", "registry.py"
)


def build_block(order: list[str], evidence: dict[str, int]) -> str:
    lines = [
        "# The driver's correctness sweep walks ``queries()`` in dict-insertion",
        "# order under a ~50-query-per-round budget. Rotation contract (encoded",
        "# in tests/test_registry.py::test_priority_head_is_rotated): after each",
        "# driver round the head is rebuilt STALEST-FIRST from the union of",
        "# CORRECTNESS_r01..rNN — keys with zero driver evidence first, then by",
        "# oldest newest-evidence round (alphabetical within a round).",
        "# Regenerate with: python scripts/rotate_priority.py",
        "_PRIORITY: tuple[str, ...] = (",
    ]
    cur: int | None = None
    for key in order:
        rnd = evidence.get(key, 0)
        if rnd != cur:
            cur = rnd
            label = (
                "zero driver evidence"
                if rnd == 0
                else f"newest driver evidence r{rnd}"
            )
            n = sum(1 for k in order if evidence.get(k, 0) == rnd)
            lines.append(f"    # --- {label} ({n} keys) ---")
        lines.append(f'    "{key}",')
    lines.append(")")
    return "\n".join(lines)


def main() -> int:
    sys.path.insert(0, REPO)
    from gjenbruksstasjoner_kotid_estimering_spark import registry
    from gjenbruksstasjoner_kotid_estimering_spark.evidence import newest_evidence

    names = list(registry.all_specs())
    evidence = newest_evidence(REPO)
    order = sorted(names, key=lambda k: (evidence.get(k, 0), k))
    block = build_block(order, evidence)

    src = open(REGISTRY_PY).read()
    pattern = re.compile(
        r"# The driver's correctness sweep walks.*?^_PRIORITY: tuple\[str, \.\.\.\] = \(.*?^\)",
        re.S | re.M,
    )
    if not pattern.search(src):
        print("rotate_priority: could not locate the _PRIORITY block", file=sys.stderr)
        return 1
    open(REGISTRY_PY, "w").write(pattern.sub(lambda _: block, src, count=1))
    never = [k for k in order if k not in evidence]
    print(
        f"rotate_priority: {len(order)} keys reordered; "
        f"{len(never)} never-sampled at head: {never[:10]}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
