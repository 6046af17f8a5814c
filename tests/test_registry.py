"""Registry invariants: the priority prefix must stay loud about drift."""

from __future__ import annotations

from gjenbruksstasjoner_kotid_estimering_spark import registry


def test_priority_names_all_exist():
    specs = registry.all_specs()
    missing = [n for n in registry._PRIORITY if n not in specs]
    assert not missing, (
        f"_PRIORITY names not in registry (typo or rename?): {missing} — "
        "the driver's budget would silently land on already-verified "
        "operators instead"
    )


def test_priority_prefix_orders_queries():
    names = list(registry.all_specs())
    assert names[: len(registry._PRIORITY)] == list(registry._PRIORITY)


def test_every_oracle_name_is_registered():
    specs = registry.all_specs()
    assert set(registry.oracle_sql()) <= set(specs)


def test_survey_manifest_matches_registry():
    """SURVEY.md §2 is the grading contract: its fenced registry-keys
    manifest must equal queries() exactly (r06 verdict: the survey had
    drifted 26 operators behind the registry)."""
    import re

    survey = open("SURVEY.md").read()
    m = re.search(r"```registry-keys\n(.*?)```", survey, re.S)
    assert m, "SURVEY.md is missing the ```registry-keys``` manifest"
    manifest = set(m.group(1).split())
    keys = set(registry.all_specs())
    assert manifest == keys, (
        f"survey manifest drift — missing from SURVEY: "
        f"{sorted(keys - manifest)}; stale in SURVEY: "
        f"{sorted(manifest - keys)}"
    )


def test_priority_head_is_rotated():
    """Rotation contract (r7 verdict #2/#7): the ~50-key driver budget samples
    the _PRIORITY head, so after each driver round the head must be rebuilt
    stalest-first. Concretely: no key in the first 50 slots may appear in the
    NEWEST CORRECTNESS_r*.json while keys with older (or zero) driver
    evidence exist — otherwise the next round's entire sample budget
    re-verifies rows the driver just confirmed."""
    import glob
    import json
    import re

    files = sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda f: int(re.search(r"r(\d+)", f).group(1)),
    )
    if not files:  # fresh checkout without driver artifacts
        return
    evidence: dict[str, int] = {}
    for f in files:
        rnd = int(re.search(r"r(\d+)", f).group(1))
        data = json.load(open(f))
        for key in data.get("queries", data):
            evidence[key] = max(evidence.get(key, 0), rnd)
    newest_round = int(re.search(r"r(\d+)", files[-1]).group(1))
    newest_keys = set(json.load(open(files[-1])).get("queries", json.load(open(files[-1]))))
    all_keys = set(registry.all_specs())
    staler_exist = any(evidence.get(k, 0) < newest_round for k in all_keys)
    if not staler_exist:
        return  # everything equally fresh — no rotation needed
    head = [k for k in registry._PRIORITY[:50] if k in evidence or k in all_keys]
    wasted = [k for k in head if k in newest_keys]
    assert not wasted, (
        f"_PRIORITY head re-samples keys the driver just confirmed in "
        f"{files[-1]}: {wasted} — rotate stalest-first before committing"
    )
