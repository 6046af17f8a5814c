"""Wave N: rank statistics, exact Lloyd step, URL canonical dedup,
heavy hitters, nested pruning — value invariants + plan pins."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced17 as A

from conftest import SF0001


# --- Spearman ---------------------------------------------------------------


def _avg_ranks_x2(vals):
    """Doubled average ranks (competition avg over ties) — integer."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r2 = [0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        # positions i..j-1 (0-based) share avg rank ((i+1)+(j))/2
        for k in range(i, j):
            r2[order[k]] = (i + 1) + j
        i = j
    return r2


def test_spearman_matches_bruteforce(spark):
    got = {
        r.grp: r for r in A.stat_spearman_rank_exact(spark, SF0001).collect()
    }
    li = (
        load_table(spark, SF0001, "lineitem")
        .select(
            "l_returnflag",
            "l_quantity",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    groups: dict[str, tuple[list, list]] = {}
    for r in li:
        xs, ys = groups.setdefault(r.l_returnflag, ([], []))
        xs.append(r.l_quantity)
        ys.append(r.y)
    for g, (xs, ys) in groups.items():
        rx2, ry2 = _avg_ranks_x2(xs), _avg_ranks_x2(ys)
        d2 = sum((a - b) ** 2 for a, b in zip(rx2, ry2))
        row = got[g]
        assert row.n == len(xs)
        assert row.d2_sum_x4 == d2
        # sanity: the derived rho is a plausible correlation
        n = row.n
        denom = n * (n * n - 1)
        rho = 1 - 6 * (row.d2_sum_x4 / 4) / denom  # tie-free approximation
        assert -1.1 < rho < 1.1


def test_spearman_reuses_one_group_exchange(spark):
    df = A.stat_spearman_rank_exact(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # x-ranks and y-ranks both partition by grp; the sorts differ but
    # the hash partitioning must not be repeated per window
    assert plan.count("Exchange hashpartitioning(grp") <= 2


# --- Kendall ----------------------------------------------------------------


def test_kendall_counts_partition_the_pairs(spark):
    rows = A.stat_kendall_tau_exact(spark, SF0001).collect()
    cust = (
        load_table(spark, SF0001, "customer")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    expect_pairs = {r.c_nationkey: r["count"] * (r["count"] - 1) // 2 for r in cust}
    for r in rows:
        assert r.n_pairs == expect_pairs[r.nationkey]
        assert r.concordant + r.discordant + r.tied == r.n_pairs


def test_kendall_one_nation_bruteforce(spark):
    nation0 = (
        load_table(spark, SF0001, "customer")
        .where(F.col("c_nationkey") == 0)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        )
        .collect()
    )
    pts = [(r.c_custkey, r.x, (r.c_custkey * 2654435761) % 1048576) for r in nation0]
    nc = nd = nt = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            s = (pts[i][1] - pts[j][1]) * (pts[i][2] - pts[j][2])
            if s > 0:
                nc += 1
            elif s < 0:
                nd += 1
            else:
                nt += 1
    row = [
        r
        for r in A.stat_kendall_tau_exact(spark, SF0001).collect()
        if r.nationkey == 0
    ][0]
    assert (row.concordant, row.discordant, row.tied) == (nc, nd, nt)


# --- k-means one step ---------------------------------------------------------


def test_kmeans_step_matches_numpy(spark):
    import numpy as np

    rows = {
        r.centroid_id: r
        for r in A.ml_kmeans_one_step_exact(spark, SF0001).collect()
    }
    emb = load_table(spark, SF0001, "embeddings").collect()
    vecs = {
        r.vec_id: np.array(
            [round(float(x) * 1000000.0) for x in r.embedding], dtype=np.int64
        )
        for r in emb
    }
    cents = {cid: vecs[cid] for cid in range(8)}
    n = {c: 0 for c in range(8)}
    inertia = {c: 0 for c in range(8)}
    coord = {c: 0 for c in range(8)}
    for vid, v in vecs.items():
        best = min(
            (int(((v - cv) ** 2).sum()) * 8 + cid, cid)
            for cid, cv in cents.items()
        )
        cid = best[1]
        n[cid] += 1
        inertia[cid] += best[0] // 8
        coord[cid] += int(v.sum())
    for cid in range(8):
        if n[cid] == 0:
            assert cid not in rows
            continue
        r = rows[cid]
        assert (r.n_assigned, r.inertia_micro2, r.coord_sum_micro) == (
            n[cid],
            inertia[cid],
            coord[cid],
        )
    assert sum(n.values()) == len(vecs)


def test_kmeans_step_stays_jvm_side(spark):
    plan = (
        A.ml_kmeans_one_step_exact(spark, SF0001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    for py_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert py_node not in plan


# --- URL canonicalization ------------------------------------------------------


def test_url_canonical_is_clean_and_mass_preserving(spark):
    rows = A.text_url_canonical_dedup(spark, SF0001).collect()
    orders = load_table(spark, SF0001, "orders")
    assert sum(r.n_dups for r in rows) == orders.count()
    assert len(rows) == orders.select("o_custkey").distinct().count()
    for r in rows:
        u = r.canonical_url
        assert u == u.lower()
        assert ":443" not in u and "#" not in u and "utm_" not in u
        # params sorted
        q = u.split("?", 1)[1].split("&")
        assert q == sorted(q)


# --- heavy hitters -------------------------------------------------------------


def test_heavy_hitters_are_exactly_the_frequent_tokens(spark):
    got = {
        r.token: r.cnt
        for r in A.text_heavy_hitter_tokens(spark, SF0001).collect()
    }
    docs = load_table(spark, SF0001, "documents").collect()
    counts: dict[str, int] = {}
    for d in docs:
        for t in d.text.lower().split(" "):
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    expect = {t: c for t, c in counts.items() if c * 50 > total}
    assert got == expect


# --- nested pruning --------------------------------------------------------------


def test_nested_scan_prunes_text_from_read_schema(spark):
    import shutil

    df, path = A.nested_prune_query(spark, SF0001)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
        assert scan, plan
        readschema = scan[0].split("ReadSchema:")[1]
        assert "text" not in readschema
        assert "lang" in readschema and "n_chars" in readschema
        # values survive the nested round trip
        got = {r.lang: (r.n_docs, r.chars_sum) for r in df.collect()}
        base = (
            load_table(spark, SF0001, "documents")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("s"),
            )
            .collect()
        )
        assert got == {r.lang: (r.n, r.s) for r in base}
    finally:
        shutil.rmtree(path, ignore_errors=True)
