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
