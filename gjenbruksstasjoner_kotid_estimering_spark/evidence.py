"""Shared parser for the driver's CORRECTNESS_r{N}.json sidecars.

Both scripts/rotate_priority.py (rewrites registry._PRIORITY stalest-first)
and tests/test_registry.py::test_priority_head_is_rotated (the tripwire that
fails on an unrotated head) need "newest driver evidence round per key".
Keeping one parser here stops the two from drifting (r8 advice) and makes the
accepted sidecar shapes explicit instead of duck-typed.

Accepted shapes, in order of appearance across rounds:
- flat dict: {"<query_key>": {...per-key result...}, ...}  (r1+)
- wrapped dict: {"queries": {"<query_key>": ...}, ...}     (defensive)

Anything else (a list, a wrapped non-dict) raises ValueError naming the file,
so a driver format change surfaces loudly instead of recording wrong keys.
"""

from __future__ import annotations

import glob
import json
import os
import re

#: Filename pattern the driver uses for per-round correctness sidecars.
SIDECAR_GLOB = "CORRECTNESS_r*.json"


def sidecar_round(path: str) -> int:
    """Round number encoded in a sidecar filename (CORRECTNESS_r08.json -> 8)."""
    m = re.search(r"r(\d+)", os.path.basename(path))
    if not m:
        raise ValueError(f"not a CORRECTNESS sidecar filename: {path}")
    return int(m.group(1))


def sidecar_keys(path: str) -> set[str]:
    """Query keys sampled by one sidecar, with explicit shape validation."""
    with open(path) as fh:
        data = json.load(fh)
    if isinstance(data, dict) and isinstance(data.get("queries"), dict):
        data = data["queries"]
    if not isinstance(data, dict):
        raise ValueError(
            f"{path}: expected a dict of query keys (flat or under 'queries'), "
            f"got {type(data).__name__}"
        )
    # A flat-shaped sidecar may carry scalar METADATA entries next to the
    # per-query dicts (e.g. {"tpch_q1": {...}, "sf": 0.01}); only dict
    # values are query records — letting scalars through would rotate the
    # priority head around phantom keys (r9 advice: the duck-typing gap
    # existed for the flat shape, not just the wrapped one). But a
    # non-empty sidecar with ZERO dict values is a driver format change
    # (e.g. per-key scalar verdicts), and silently returning no keys
    # would both starve newest_evidence and let the rotation tripwire
    # pass vacuously — that must stay a loud failure.
    keys = {k for k, v in data.items() if isinstance(v, dict)}
    if data and not keys:
        raise ValueError(
            f"{path}: no dict-valued query records found — every entry is "
            "scalar metadata, which means the driver's sidecar format "
            "changed; update evidence.sidecar_keys for the new shape"
        )
    return keys


def sidecar_files(repo_root: str) -> list[str]:
    """All sidecars under repo_root, sorted by round ascending."""
    files = glob.glob(os.path.join(repo_root, SIDECAR_GLOB))
    return sorted(files, key=sidecar_round)


def newest_evidence(repo_root: str) -> dict[str, int]:
    """Max round each query key was sampled in; keys never sampled are absent."""
    evidence: dict[str, int] = {}
    for f in sidecar_files(repo_root):
        rnd = sidecar_round(f)
        for key in sidecar_keys(f):
            evidence[key] = max(evidence.get(key, 0), rnd)
    return evidence
