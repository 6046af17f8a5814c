"""Round-7 wave 3: dynamic partition pruning, feature hashing,
permissive CSV, Zipf vocab stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.functions.text import tokens_col
from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
import shutil

from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced8 as a8

from conftest import SF0001


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    """The SAME join reads 5 partition-files without DPP and only the
    dim-selected 2 with it — runtime numFiles, not the static listing."""
    scratch = a8._write_dpp_fixture(spark, SF0001)
    try:
        def run(dpp_on: bool):
            spark.conf.set(
                "spark.sql.optimizer.dynamicPartitionPruning.enabled",
                str(dpp_on).lower(),
            )
            j = a8._dpp_join(spark, scratch)
            rows = sorted(map(tuple, j.collect()))
            return rows, a8.final_scan_metric(j, f"{scratch}/fact", "numFiles")

        rows_off, files_off = run(False)
        rows_on, files_on = run(True)
        assert rows_on == rows_off  # pruning never changes the answer
        assert files_off == 5  # one file per event_type partition
        assert files_on == 2  # only the two 'conversion' partitions
    finally:
        spark.conf.unset(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled"
        )
        shutil.rmtree(scratch, ignore_errors=True)


def test_feature_hashing_conserves_tokens(spark):
    out = a8.text_feature_hashing(spark, SF0001).collect()
    docs = load_table(spark, SF0001, "documents")
    total_tokens = docs.select(
        F.sum(F.size(tokens_col(F.col("text")))).alias("n")
    ).collect()[0].n
    n_docs = docs.count()
    assert sum(r.n_tokens for r in out) == total_tokens
    for r in out:
        assert 0 <= r.bucket < a8.N_FEATURE_BUCKETS
        assert 1 <= r.n_docs <= n_docs


def test_permissive_csv_quarantines_exactly_the_bad_lines(spark):
    out = {r.status: (r.n_rows, r.cents_sum)
           for r in a8.scan_csv_permissive_corrupt(spark, SF0001).collect()}
    orders = load_table(spark, SF0001, "orders")
    want = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out["_corrupt"] == (a8.N_BAD_LINES, None)
    for status, n in want.items():
        assert out[status][0] == n


def test_csv_column_pruning_hides_unreferenced_corruption(spark, tmp_path):
    """Regression-documenting test for the gotcha the builder routes
    around: a line malformed ONLY in an unreferenced position parses
    clean under required-schema pruning — the quarantine sees nothing."""
    p = tmp_path / "feed.csv"
    p.write_text("1,100,O\nnot_a_number,200,F\n")
    parsed = (
        spark.read.schema(
            "o_orderkey long, cents long, status string, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    # query referencing only (cents, status, _corrupt): the bad first
    # field is never converted, so NO row is quarantined
    pruned = parsed.select("cents", "status", "_corrupt").collect()
    assert all(r._corrupt is None for r in pruned)
    # the full-width read converts every field and catches it
    full = parsed.collect()
    assert sum(r._corrupt is not None for r in full) == 1


def test_zipf_ranks_partition_and_cover_the_corpus(spark):
    out = sorted(
        a8.text_vocab_zipf_stats(spark, SF0001).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    cnts = [r.cnt for r in out]
    assert cnts == sorted(cnts, reverse=True)
    running = 0
    for r in out:
        running += r.cnt
        assert r.cum_cnt == running
    total_tokens = (
        load_table(spark, SF0001, "documents")
        .select(F.sum(F.size(tokens_col(F.col("text")))).alias("n"))
        .collect()[0]
        .n
    )
    # full corpus coverage only holds while the vocabulary fits inside the
    # top-K bound; the fixture vocab (~31 tokens) is far below ZIPF_VOCAB_K
    assert len(out) < a8.ZIPF_VOCAB_K
    assert out[-1].cum_cnt == total_tokens


def test_zipf_window_input_is_topk_bounded(spark):
    """The rank/cumsum window must consume the TakeOrdered top-K prefix,
    never the unbounded distinct-token relation (r7 verdict: the global
    single-partition sort over a 100 TB corpus vocabulary is the shape
    text_vocab_encode explicitly refuses). Executed-plan lines print
    children BELOW parents, so the bounding TakeOrderedAndProject must
    appear at a larger line index than the Window that reads it."""
    plan = (
        a8.text_vocab_zipf_stats(spark, SF0001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    take_idx = [i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l]
    assert take_idx, plan
    win_idx = [i for i, l in enumerate(lines) if "Window" in l]
    assert win_idx, plan
    assert min(win_idx) < min(take_idx), plan


def test_bfs_distances_match_brute_force(spark):
    """Spark BFS equals a driver-side BFS over the same edge set."""
    from collections import deque

    from gjenbruksstasjoner_kotid_estimering_spark.operators import graph

    li = load_table(spark, SF0001, "lineitem")
    edges = {
        (r.l_suppkey, r.l_partkey)
        for r in li.select("l_suppkey", "l_partkey").distinct().collect()
    }
    adj = {}
    for s, p in edges:
        adj.setdefault(f"s:{s}", set()).add(f"p:{p}")
        adj.setdefault(f"p:{p}", set()).add(f"s:{s}")
    want = {f"s:{graph.BFS_SEED_SUPPKEY}": 0}
    q = deque([(f"s:{graph.BFS_SEED_SUPPKEY}", 0)])
    while q:
        node, d = q.popleft()
        if d == graph.BFS_MAX_DEPTH:
            continue
        for nxt in adj.get(node, ()):
            if nxt not in want:
                want[nxt] = d + 1
                q.append((nxt, d + 1))
    got = {
        r.node: r.dist
        for r in graph.graph_bfs_distance(spark, SF0001).collect()
    }
    assert got == want


def test_stream_jsonl_ingest_matches_batch(spark):
    """The multi-micro-batch streaming aggregate equals the batch one."""
    from gjenbruksstasjoner_kotid_estimering_spark.streaming import jsonl

    got = sorted(
        map(tuple, jsonl.stream_jsonl_ingest_true(spark, SF0001).collect())
    )
    want = sorted(
        map(
            tuple,
            load_table(spark, SF0001, "documents")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("chars_sum"),
                F.sum(
                    F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast(
                        "long"
                    )
                ).alias("text_fp_sum"),
            )
            .collect(),
        )
    )
    assert got == want
