"""The local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB exactly (row count, columns, order-insensitive
values) at sf0.001; rows-only queries must be non-empty."""

from __future__ import annotations

import pytest

from gjenbruksstasjoner_kotid_estimering_spark import registry

import scripts.compare as cmp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = cmp.duck_con(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.all_specs()))
def test_query_matches_oracle(spark, duck, name):
    spec = registry.all_specs()[name]
    sdf = spec.builder(spark, SF).toPandas()
    if spec.oracle is None:
        assert len(sdf) > 0, f"{name}: rows-only query returned no rows"
        return
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = cmp.compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {
        "station_id",
        "ts",
        "cars",
        "expected_queue_time",
    }
    oracles = E.oracle_sql()
    queries = E.queries()
    assert set(oracles) <= set(queries)


def test_approx_quantile_close_to_exact(spark):
    approx = {
        r.user_id: r.approx_median
        for r in registry.all_specs()["agg_approx_quantile"]
        .builder(spark, SF)
        .collect()
    }
    exact = {
        r.user_id: r.median_value
        for r in registry.all_specs()["udaf_grouped_stats"]
        .builder(spark, SF)
        .collect()
    }
    assert set(approx) == set(exact)
    for uid in approx:
        assert abs(approx[uid] - exact[uid]) / max(exact[uid], 1.0) < 0.05
