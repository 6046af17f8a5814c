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
