"""Round-8 wave B: BPE merge training, positive-PMI collocations,
mapInArrow."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.functions.text import tokens_col
from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.operators import traindata6 as t6

from conftest import SF0001


def _naive_bpe_from_stream(tokens: list[str], n_merges: int):
    """Independent BPE reference: re-counts pairs from the FULL token
    stream every round (no word-frequency table, no incremental state) —
    structurally different from the production path it checks."""
    reps = [tuple(w) + (t6.EOW,) for w in tokens]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for rep in reps:
            for i in range(len(rep) - 1):
                counts[(rep[i], rep[i + 1])] += 1
        if not counts:
            break
        best_n = max(counts.values())
        pair = min(p for p, c in counts.items() if c == best_n)
        merges.append((rank, pair[0], pair[1], pair[0] + pair[1], best_n))
        reps = [t6._merge_rep(r, pair) for r in reps]
    return merges


def test_bpe_training_matches_independent_stream_implementation(spark):
    got = [
        tuple(r)
        for r in t6.bpe_train_merges(spark, SF0001)
        .orderBy("rank")
        .collect()
    ]
    tokens = [
        r.w
        for r in load_table(spark, SF0001, "documents")
        .select(F.explode(tokens_col(F.col("text"))).alias("w"))
        .where(F.col("w") != "")
        .collect()
    ]
    want = _naive_bpe_from_stream(tokens, t6.N_MERGES)
    assert got == want


def test_bpe_chosen_pair_count_never_increases(spark):
    rows = (
        t6.bpe_train_merges(spark, SF0001).orderBy("rank").collect()
    )
    assert len(rows) == t6.N_MERGES
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # every merged symbol concatenates its parts
    assert all(r.merged == r.left + r.right for r in rows)


def test_pmi_pair_counts_bounded_by_marginals(spark):
    rows = t6.text_pmi_positive_pairs(spark, SF0001).collect()
    assert len(rows) == t6.TOP_COLLOCATIONS
    for r in rows:
        assert r.c_pair <= min(r.c_left, r.c_right)


def test_pmi_sign_matches_recomputed_cross_multiplication(spark):
    docs = load_table(spark, SF0001, "documents")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("w")).where(
        F.col("w") != ""
    )
    m = toks.count()
    n = m - docs.count()  # pairs per doc = tokens per doc - 1
    for r in t6.text_pmi_positive_pairs(spark, SF0001).collect():
        want = r.c_pair * m * m > r.c_left * r.c_right * n
        assert r.positive_pmi == want


def test_map_in_arrow_matches_builtin_expressions(spark):
    got = {
        r.doc_id: (r.n_chars, r.n_tokens, r.prefix_upper)
        for r in t6.udf_map_in_arrow(spark, SF0001).collect()
    }
    want = {
        r.doc_id: (r.n_chars, r.n_tokens, r.prefix_upper)
        for r in load_table(spark, SF0001, "documents")
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
            F.upper(F.substring("text", 1, 16)).alias("prefix_upper"),
        )
        .collect()
    }
    assert got == want


def test_map_in_arrow_plan_is_single_arrow_exchange(spark):
    df = t6.udf_map_in_arrow(spark, SF0001)
    jqe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = jqe.explainString(mode)
    assert plan.count("MapInArrow") == 1
    # no pandas path anywhere in the plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


def test_pmi_count_relations_materialize_once(spark):
    """The unigram/bigram count relations feed multiple consumers; they
    must be materialized (localCheckpoint -> ExistingRDD scans), so the
    final plan contains NO parquet re-scan of documents - without this
    each consumer re-ran the full-corpus tokenize+groupBy from lineage
    (up to five corpus passes per query, r9 fix)."""
    plan = (
        t6.text_pmi_positive_pairs(spark, SF0001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "documents" not in plan, plan  # no file re-scan survives
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
