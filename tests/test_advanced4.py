"""Round-6 additions: runtime bloom filter, blocked fuzzy/geo joins,
Z-order skipping, weighted median, OHLC resample, DQ suite, skew profile.

Each test pins the property the registry oracle CANNOT see: plan shape
(bloom injection), blocking recall (fuzzy/geo losslessness vs brute
force), and file-skipping effectiveness (Z-order vs single-dim layout).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced4 as a4

from conftest import SF0001, SF001


def test_bloom_filter_injected_in_plan(spark):
    """Under the scoped confs, the optimizer must inject the runtime
    bloom filter: might_contain on the fact side, bloom_filter_agg on
    the creation side."""

    def build():
        li = load_table(spark, SF001, "lineitem").select(
            "l_orderkey", "l_returnflag"
        )
        od = load_table(spark, SF001, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")
        return li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "l_returnflag"
        ).count()

    saved = {}
    for k, v in a4._BLOOM_SCOPED_CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        plan = build()._jdf.queryExecution().optimizedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan


def test_bloom_query_matches_plain_join(spark):
    """The bloom filter is semantically transparent: the registry result
    equals the same aggregation under default confs."""
    got = a4.join_runtime_bloom(spark, SF0001).toPandas()
    li = load_table(spark, SF0001, "lineitem")
    od = load_table(spark, SF0001, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    want = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("revenue_cents"),
        )
        .toPandas()
    )
    got = got.sort_values("l_returnflag").reset_index(drop=True)
    want = want.sort_values("l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_fuzzy_blocking_is_lossless(spark):
    """Two-pass token blocking finds EVERY edit-distance-≤2 name pair
    that brute-force all-pairs finds on this vocabulary."""
    blocked = {
        (r["name_a"], r["name_b"])
        for r in a4.join_fuzzy_levenshtein(spark, SF0001).collect()
    }
    names = (
        load_table(spark, SF0001, "part").select("p_name").distinct()
    )
    brute = (
        names.alias("a")
        .crossJoin(names.selectExpr("p_name AS p_name_b").alias("b"))
        .where(F.col("p_name") < F.col("p_name_b"))
        .where(
            F.levenshtein(F.col("p_name"), F.col("p_name_b"))
            <= a4._FUZZY_MAX_DIST
        )
        .collect()
    )
    brute_pairs = {(r["p_name"], r["p_name_b"]) for r in brute}
    assert blocked == brute_pairs
    assert len(brute_pairs) > 0


def test_geo_blocking_is_lossless(spark):
    """Grid blocking (cell size = radius, 3×3 neighborhood) returns the
    same per-supplier counts as the unblocked all-pairs distance join."""
    got = {
        r["s_suppkey"]: (r["n_within"], r["min_dist2"])
        for r in a4.join_geo_gridblock(spark, SF0001).collect()
    }
    cust = a4._geo_points(
        load_table(spark, SF0001, "customer"), "c_custkey", 48271, 11, 69621, 7
    ).selectExpr("x AS cx2", "y AS cy2")
    supp = a4._geo_points(
        load_table(spark, SF0001, "supplier"), "s_suppkey", 40692, 3, 50653, 13
    )
    d2 = (F.col("x") - F.col("cx2")) * (F.col("x") - F.col("cx2")) + (
        F.col("y") - F.col("cy2")
    ) * (F.col("y") - F.col("cy2"))
    brute = (
        supp.crossJoin(cust)
        .select("s_suppkey", d2.alias("d2"))
        .where(F.col("d2") <= a4._GEO_R2)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n"), F.min("d2").alias("m"))
        .collect()
    )
    want = {r["s_suppkey"]: (r["n"], r["m"]) for r in brute}
    assert got == want
    assert len(want) > 0


def test_zorder_skips_files_and_beats_single_dim(spark):
    """(a) the 2-d box reads fewer files than the snapshot holds under
    the Z-order layout; (b) on a NATION-only predicate the Z-order
    layout skips files while custkey-only clustering must read all of
    them — the multi-dimensional-skipping claim."""
    z_scratch, z_files, z_stats = a4.zorder_layout_stats(
        spark,
        SF001,
        lambda df: a4.zorder_bucketed_expr(df, "c_custkey", "c_nationkey"),
        "ztest",
    )
    lin_scratch, lin_files, lin_stats = a4.zorder_layout_stats(
        spark, SF001, lambda df: F.col("c_custkey"), "lintest"
    )
    try:
        # (a) 2-d box prunes under Z-order
        z_chosen = a4.zbox_prune(z_files, z_stats)
        assert 0 < len(z_chosen) < len(z_files)

        # (b) nation-only predicate: prune on dims 2 only
        def nation_prune(files, stats):
            out = []
            for f in files:
                st = stats.get(f)
                if st is None or st[2] is None:
                    out.append(f)
                elif (
                    st[2] <= a4._ZBOX_NATION_HI
                    and st[3] >= a4._ZBOX_NATION_LO
                ):
                    out.append(f)
            return out

        z_nation = nation_prune(z_files, z_stats)
        lin_nation = nation_prune(lin_files, lin_stats)
        assert len(lin_nation) == len(lin_files)  # linear layout: no skip
        assert len(z_nation) < len(lin_nation)  # z-order: real skip
    finally:
        import shutil

        shutil.rmtree(z_scratch, ignore_errors=True)
        shutil.rmtree(lin_scratch, ignore_errors=True)


def test_weighted_median_matches_bruteforce(spark):
    got = {
        r["l_returnflag"]: (r["weighted_median_price"], r["total_weight"])
        for r in a4.agg_weighted_median(spark, SF0001).collect()
    }
    pdf = (
        load_table(spark, SF0001, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    for flag, grp in pdf.groupby("l_returnflag"):
        grp = grp.sort_values("l_extendedprice")
        w = grp["l_quantity"].astype("int64")
        cum = w.cumsum()
        total = int(w.sum())
        median = grp.loc[2 * cum >= total, "l_extendedprice"].iloc[0]
        assert got[flag] == (median, total), flag


def test_ohlc_open_close_are_first_last(spark):
    out = a4.timeseries_resample_ohlc(spark, SF0001).toPandas()
    ev = (
        load_table(spark, SF0001, "events")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
    )
    ev["bucket"] = ev["ts"].dt.floor("15min")
    sample = out.sort_values(["event_type", "bucket_start"]).head(20)
    for _, row in sample.iterrows():
        grp = ev[
            (ev["event_type"] == row["event_type"])
            & (ev["bucket"] == row["bucket_start"])
        ].sort_values(["ts", "event_id"])
        assert row["open"] == grp["value"].iloc[0]
        assert row["close"] == grp["value"].iloc[-1]
        assert row["high"] == grp["value"].max()
        assert row["low"] == grp["value"].min()
        assert row["n_events"] == len(grp)


def test_dq_suite_verdicts(spark):
    out = {
        r["constraint_name"]: (r["violations"], r["passed"])
        for r in a4.dq_constraint_checks(spark, SF0001).collect()
    }
    assert set(out) == {
        "completeness_custkey",
        "uniqueness_orderkey",
        "range_totalprice",
        "domain_orderstatus",
        "size_nonempty",
    }
    # the synthetic corpus is clean: zero violations everywhere, and the
    # size check passes with the full row count
    for name, (violations, passed) in out.items():
        if name == "size_nonempty":
            assert passed and violations > 0
        else:
            assert passed and violations == 0, name


def test_skew_profile_math(spark):
    rows = a4.profile_skew_keys(spark, SF0001).collect()
    assert len(rows) == a4._SKEW_TOP_N
    counts = (
        load_table(spark, SF0001, "events")
        .groupBy("user_id")
        .count()
        .toPandas()
    )
    n_keys, n_rows = len(counts), int(counts["count"].sum())
    top = counts.sort_values(
        ["count", "user_id"], ascending=[False, True]
    ).head(a4._SKEW_TOP_N)
    for r, (_, want) in zip(rows, top.iterrows()):
        assert r["user_id"] == want["user_id"]
        assert r["cnt"] == want["count"]
        assert r["n_keys"] == n_keys and r["n_rows"] == n_rows
        assert r["skew_ratio"] == pytest.approx(
            want["count"] * n_keys / n_rows
        )
    # counts are sorted descending: top-1 is the hottest key
    assert rows[0]["cnt"] == counts["count"].max()
