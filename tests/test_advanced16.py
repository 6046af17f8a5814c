"""Round-9 wave L: KS and Mann-Whitney exact statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced16 as a16

from conftest import SF0001


def _samples(spark, types):
    ev = (
        load_table(spark, SF0001, "events")
        .where(F.col("event_type").isin(*types) & F.col("value").isNotNull())
        .collect()
    )
    out: dict[str, list[int]] = {t: [] for t in types}
    for r in ev:
        out[r.event_type].append(round(r.value * 100))
    return out


def test_ks_matches_python_ecdf(spark):
    row = a16.stat_ks_two_sample_exact(spark, SF0001).collect()[0]
    s = _samples(spark, [a16.KS_A, a16.KS_B])
    a = sorted(c // a16.KS_BIN for c in s[a16.KS_A])
    b = sorted(c // a16.KS_BIN for c in s[a16.KS_B])
    n, m = len(a), len(b)
    assert (row.n, row.m) == (n, m)
    support = sorted(set(a) | set(b))
    best, best_bin = -1, None
    for x in support:
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        d = abs(ca * m - cb * n)
        if d > best:
            best, best_bin = d, x
    assert row.d_num == best
    assert row.at_bin == best_bin


def test_mann_whitney_matches_python_midranks(spark):
    row = a16.stat_mann_whitney_u_exact(spark, SF0001).collect()[0]
    s = _samples(spark, [a16.MW_A, a16.MW_B])
    a, b = s[a16.MW_A], s[a16.MW_B]
    pooled = sorted(
        [(v, 0) for v in a] + [(v, 1) for v in b]
    )
    # doubled midranks: for a tie group spanning positions [i, j]
    # (1-based), every member gets i + j
    r2 = {}
    i = 0
    while i < len(pooled):
        j = i
        while j + 1 < len(pooled) and pooled[j + 1][0] == pooled[i][0]:
            j += 1
        for k in range(i, j + 1):
            r2[k] = (i + 1) + (j + 1)
        i = j + 1
    r2sum = sum(r2[k] for k, (_, side) in enumerate(pooled) if side == 0)
    n1, n2 = len(a), len(b)
    assert (row.n1, row.n2) == (n1, n2)
    assert row.u1_x2 == r2sum - n1 * (n1 + 1)
    # 2·U ranges over [0, 2·n1·n2]
    assert 0 <= row.u1_x2 <= 2 * n1 * n2


def _u1_x2_closed_form(a: list[int], b: list[int]) -> int:
    """2·U₁ from the tie-correction closed form: U₁ = n1·n2 + n1(n1+1)/2
    − R₁, with R₁ the tie-averaged rank sum — computed here directly
    from per-value counts (no sort-and-walk), independent of the
    Spark implementation's prefix-sum derivation."""
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    support = sorted(set(ca) | set(cb))
    cum = 0
    r2sum = 0
    for v in support:
        c = ca[v] + cb[v]
        # every row in this bin has doubled midrank 2·cum + c + 1
        r2sum += ca[v] * (2 * cum + c + 1)
        cum += c
    return r2sum - len(a) * (len(a) + 1)


def test_mann_whitney_bin_form_on_heavy_ties(spark, tmp_path):
    """Synthetic frame with heavy ties (every value shared across both
    groups) — pins the bin-level cumulative-count derivation against an
    independent per-value closed form."""
    a = [5, 5, 5, 7, 9, 9, 12, 12, 12, 12, 30]
    b = [5, 7, 7, 7, 9, 12, 12, 18, 18, 30, 30, 30]
    rows = [
        (i, "2020-05-06 07:00:00", 1, v / 100.0, a16.MW_A)
        for i, v in enumerate(a)
    ] + [
        (1000 + i, "2020-05-06 07:00:00", 2, v / 100.0, a16.MW_B)
        for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double, event_type string"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "value",
        "event_type",
    )
    sf = str(tmp_path / "sf_ties")
    df.write.parquet(f"{sf}/events.parquet")
    row = a16.stat_mann_whitney_u_exact(spark, sf).collect()[0]
    assert (row.n1, row.n2) == (len(a), len(b))
    assert row.u1_x2 == _u1_x2_closed_form(a, b)


def test_mann_whitney_window_is_bin_sized(spark):
    """The one ordered window must consume the post-aggregate bin
    relation, never raw event rows: the plan's Window node sits ABOVE
    the HashAggregate (plan lines are printed children-first below
    parents, so the Window's line index is smaller)."""
    plan = a16.stat_mann_whitney_u_exact(
        spark, SF0001
    )._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    win_idx = [
        i
        for i, l in enumerate(lines)
        if "windowspecdefinition" in l.lower() or "Window" in l.split("+-")[-1]
    ]
    assert win_idx, plan
    win = min(win_idx)
    agg = [i for i, l in enumerate(lines) if "Aggregate" in l]
    assert agg, plan
    # at least one Aggregate (the groupBy cents) below the Window
    assert any(i > win for i in agg), plan
