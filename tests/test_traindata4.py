"""Invariants for the round-4 second-batch corpus operators (segment
dedup, BM25 ranking, MAD anomalies, Gopher flags). Oracle parity is
covered by the parametrized sweep in test_correctness.py; these tests pin
the SEMANTICS on hand-built corpora where the right answer is known by
construction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata4 import (
    BM25_B,
    BM25_K1,
    BM25_QUERY,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MIN_TOKENS,
    MAD_SIGMAS,
    SEG_TOKENS,
    events_anomaly_mad,
    text_bm25_rank,
    text_gopher_quality_flags,
    text_segment_dedup,
)

from conftest import HYP_EXAMPLES

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, schema=DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_segment_dedup_keep_first(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(SEG_TOKENS))  # one full segment
    rows = [
        (1, shared + " tail1 tail2", "en", "x", 0),  # segment 0 = shared
        (2, shared, "en", "x", 0),  # exact duplicate of doc 1's segment 0
        (3, "unique only here", "en", "x", 0),
        (4, "", "en", "x", 0),  # empty doc: zero segments
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in text_segment_dedup(spark, sf).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 1 is the first occurrence: keeps both its segments
    assert (out[1].n_segments, out[1].n_kept) == (2, 2)
    assert out[1].text_clean == shared + " tail1 tail2"
    # doc 2's only segment was already seen in doc 1 → dropped
    assert (out[2].n_segments, out[2].n_kept) == (1, 0)
    assert out[2].text_clean == ""
    # doc 3 untouched, doc 4 empty
    assert (out[3].n_segments, out[3].n_kept) == (1, 1)
    assert out[3].text_clean == "unique only here"
    assert (out[4].n_segments, out[4].n_kept, out[4].text_clean) == (0, 0, "")


def test_segment_dedup_global_invariant(spark):
    """Across the corpus, every distinct segment value survives exactly
    once: Σ n_kept == |distinct segments|."""
    out = text_segment_dedup(spark, SF)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    docs = load_table(spark, SF, "documents")
    toks = F.split(F.col("text"), r"\s+")
    n = F.size(toks)
    segs = docs.where(F.col("text") != "").select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n, F.lit(SEG_TOKENS)),
                lambda s: F.concat_ws(" ", F.slice(toks, s, SEG_TOKENS)),
            )
        ).alias("seg")
    )
    assert total_kept == segs.distinct().count()


def test_bm25_matches_reference_formula(spark, tmp_path):
    t1, t2, _ = BM25_QUERY
    rows = [
        (1, f"{t1} {t1} {t2} filler filler", "en", "x", 0),
        (2, f"{t1} filler filler filler filler", "en", "x", 0),
        (3, "filler filler filler filler filler", "en", "x", 0),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.doc_id: r for r in text_bm25_rank(spark, sf).collect()}
    n_docs, avgdl = 3, 5.0

    def score(tf, df, dl):
        if tf == 0:
            return 0.0
        idf = (n_docs - df + 0.5) / (df + 0.5)
        return idf * (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        )

    # df: t1 in docs 1,2 → 2; t2 in doc 1 → 1; t3 nowhere → 0
    exp1 = score(2, 2, 5) + score(1, 1, 5)
    exp2 = score(1, 2, 5)
    assert math.isclose(got[1].score, exp1, rel_tol=1e-12)
    assert math.isclose(got[2].score, exp2, rel_tol=1e-12)
    assert got[3].score == 0.0
    assert exp1 > exp2 > 0.0  # ranking order is meaningful


def test_bm25_output_is_ranked(spark):
    rows = text_bm25_rank(spark, SF).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0.0 for s in scores)


def test_anomaly_mad_against_pandas(spark):
    got = {r.event_type: r for r in events_anomaly_mad(spark, SF).collect()}
    pdf = load_table(spark, SF, "events").select("event_type", "value").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        vals = sorted(grp["value"].tolist())
        n = len(vals)
        med = vals[(n + 1) // 2 - 1]  # lower median, 1-based rank → 0-based
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(n + 1) // 2 - 1]
        n_anom = sum(1 for d in devs if d > MAD_SIGMAS * mad)
        r = got[etype]
        assert r.n == n
        assert r.med == med
        assert r.mad == mad
        assert r.n_anomalies == n_anom
        assert r.max_dev == devs[-1]


def test_anomaly_mad_cents_encoding_is_lossless(spark):
    """events_anomaly_mad's first-stage bin key is integer cents; its
    carried min(value)-per-bin representative is exact only while the
    cents encoding is injective on raw values (the 2dp-quantized
    telemetry contract). Guard every sf dir the driver can point at, the
    way the watermark-boundary fixture guard does — a regenerated events
    table with sub-cent values must fail HERE, not as a silent oracle
    mismatch."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        e = load_table(spark, f"/root/testdata/{sf}", "events")
        row = e.select(
            F.countDistinct("value").alias("nv"),
            F.countDistinct(
                F.round(F.col("value") * 100).cast("long")
            ).alias("nc"),
            F.max(
                (
                    F.col("value")
                    != F.round(F.col("value") * 100) / F.lit(100.0)
                ).cast("int")
            ).alias("inexact"),
        ).collect()[0]
        assert row.nv == row.nc, f"{sf}: cents encoding not injective"
        assert row.inexact == 0, f"{sf}: value != cents/100 bit-exactly"


def test_anomaly_mad_windows_are_bin_sized(spark):
    """Both ordered windows must consume post-aggregate bin relations,
    never raw event rows: every Window node sits ABOVE an Aggregate in
    the optimized plan (children print below parents), and the
    first-stage Aggregate groups on the integer cents key — the
    domain-bounded support the r8 verdict asked for.

    Run with ``materialize=False`` so the full logical plan is visible:
    the shipped (default) form lazily checkpoints the bin relations
    (r17 optimization — one aggregate pass instead of one per
    consumer), which replaces the windows' subtrees with the
    materialized-RDD scan; test_anomaly_mad_materialized_windows_read_bins
    pins THAT form's property."""
    plan = (
        events_anomaly_mad(spark, SF, materialize=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    lines = plan.splitlines()
    # Anchor on the OPERATOR token, not substring matches (r9 advice: a
    # Project line can reference windowspecdefinition expressions, and
    # "any Aggregate below" is satisfied by unrelated branches). The tree
    # prefix is spaces/':'/'+'/'-'; indentation width orders the tree, so
    # a node's subtree = the consecutive following nodes with strictly
    # greater indent.
    nodes = []
    for i, line in enumerate(lines):
        m = re.match(r"^([ :+\-]*)([A-Za-z]\w*)", line)
        if m:
            nodes.append((i, len(m.group(1)), m.group(2)))
    windows = [(i, d) for i, d, t in nodes if t == "Window"]
    assert windows, plan
    for wi, wd in windows:
        subtree = []
        for i, d, t in nodes:
            if i <= wi:
                continue
            if d <= wd:
                break
            subtree.append((i, t))
        # bin-sized input: the window's own subtree aggregates, and the
        # bins are keyed on the integer cents domain
        assert any(t == "Aggregate" for _, t in subtree), (
            f"Window at line {wi} has no Aggregate in its subtree\n{plan}"
        )
        assert any(
            t == "Aggregate" and "cents#" in lines[i] for i, t in subtree
        ), f"Window at line {wi}: no cents-keyed Aggregate below\n{plan}"
    # the first-stage groupBy is keyed on cents, not raw value
    assert any(
        t == "Aggregate"
        and "cents#" in lines[i].split("], [")[0]
        for i, _, t in nodes
    ), plan


def test_anomaly_mad_materialized_windows_read_bins(spark):
    """The shipped form (materialize=True, the registry row) replaces
    each reused bin relation with ONE lazily checkpointed RDD: every
    Window in the optimized plan must read a materialized bin relation
    (LogicalRDD carrying the bin count column), and no raw event
    column (event_id/user_id/ts) may appear anywhere in the final
    plan's leaves — the window support stays domain-bounded AND is
    computed exactly once."""
    plan = (
        events_anomaly_mad(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LogicalRDD" in plan, plan  # bins materialized exactly once
    for raw_col in ("event_id#", "user_id#", "ts#"):
        assert raw_col not in plan, (
            f"raw event column {raw_col} leaked into the final plan\n{plan}"
        )
    import re

    # every Window's direct subtree bottoms out in a checkpointed
    # relation that carries the bin count column c#, not raw rows
    lines = plan.splitlines()
    nodes = []
    for i, line in enumerate(lines):
        m = re.match(r"^([ :+\-]*)([A-Za-z]\w*)", line)
        if m:
            nodes.append((i, len(m.group(1)), m.group(2)))
    windows = [(i, d) for i, d, t in nodes if t == "Window"]
    assert windows, plan
    for wi, wd in windows:
        subtree = [
            (i, t)
            for i, d, t in nodes
            if i > wi and d > wd
        ]
        # stop at the first sibling boundary
        cut = len(subtree)
        for j, (i, _) in enumerate(subtree):
            if any(i2 == i and d2 <= wd for i2, d2, _ in nodes):
                cut = j
                break
        subtree = subtree[:cut]
        assert any(
            t == "LogicalRDD" and "c#" in lines[i] for i, t in subtree
        ), f"Window at line {wi} does not read a materialized bin relation\n{plan}"


def test_anomaly_mad_cents_form_on_random_2dp_corpora_hypothesis(spark, tmp_path):
    """Property test (hypothesis): on ANY 2dp-quantized corpus the
    cents-binned form must agree with the naive per-row lower-median/MAD
    reference — heavy ties, single-row groups, and multi-type splits
    included. Catches rank bookkeeping errors the fixed fixture can't."""
    from hypothesis import given, settings, strategies as st

    counter = [0]

    @settings(max_examples=HYP_EXAMPLES, deadline=None)
    @given(
        cents=st.lists(st.integers(0, 5000), min_size=1, max_size=60),
        ntypes=st.integers(1, 3),
    )
    def check(cents, ntypes):
        rows = [
            (i, "2020-05-06 07:00:00", i, v / 100.0, f"t{i % ntypes}")
            for i, v in enumerate(cents)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, value double, "
            "event_type string",
        ).select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "value",
            "event_type",
        )
        counter[0] += 1
        sf = str(tmp_path / f"sf_mad_{counter[0]}")
        df.write.parquet(f"{sf}/events.parquet")
        got = {
            r.event_type: r for r in events_anomaly_mad(spark, sf).collect()
        }
        by_type: dict[str, list[float]] = {}
        for i, v in enumerate(cents):
            by_type.setdefault(f"t{i % ntypes}", []).append(v / 100.0)
        assert set(got) == set(by_type)
        for etype, vals in by_type.items():
            vals = sorted(vals)
            n = len(vals)
            med = vals[(n + 1) // 2 - 1]
            devs = sorted(abs(v - med) for v in vals)
            mad = devs[(n + 1) // 2 - 1]
            r = got[etype]
            assert r.n == n and r.med == med and r.mad == mad
            assert r.max_dev == devs[-1]
            assert r.n_anomalies == sum(
                1 for d in devs if d > MAD_SIGMAS * mad
            )

    check()


def test_gopher_flags_logic(spark, tmp_path):
    rows = [
        (1, "the " + " ".join(f"w{i}" for i in range(20)), "en", "x", 0),
        (2, "too short", "en", "x", 0),  # < GOPHER_MIN_TOKENS
        (3, "the " + "!!!! " * 20, "en", "x", 0),  # symbol-heavy
        (4, " ".join("zz" for _ in range(20)), "en", "x", 0),  # no stopword
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in text_gopher_quality_flags(spark, sf).collect()}
    assert out[1].keep and not any(
        [out[1].flag_length, out[1].flag_mean_len, out[1].flag_no_stopword,
         out[1].flag_symbols]
    )
    assert out[2].flag_length and not out[2].keep
    assert out[2].n_tokens < GOPHER_MIN_TOKENS
    assert out[3].flag_symbols and not out[3].keep
    assert out[3].symbol_ratio > GOPHER_MAX_SYMBOL_RATIO
    assert out[4].flag_no_stopword and not out[4].keep
    # keep is exactly the conjunction of no-flags (corpus-wide)
    full = text_gopher_quality_flags(spark, SF)
    bad = full.where(
        F.col("keep")
        != ~(
            F.col("flag_length")
            | F.col("flag_mean_len")
            | F.col("flag_no_stopword")
            | F.col("flag_symbols")
        )
    ).count()
    assert bad == 0


def test_new_ops_registered_with_oracles():
    specs = registry.all_specs()
    for name in (
        "text_segment_dedup",
        "text_bm25_rank",
        "events_anomaly_mad",
        "text_gopher_quality_flags",
    ):
        assert name in specs and specs[name].oracle is not None


def test_bigram_coverage_invariants(spark):
    """text_bigram_coverage: top-count never exceeds total; docs with
    fewer than two tokens report zero bigrams; every document appears."""
    from gjenbruksstasjoner_kotid_estimering_spark import registry

    sf = "/root/testdata/sf0.001"
    rows = (
        registry.all_specs()["text_bigram_coverage"]
        .builder(spark, sf)
        .collect()
    )
    from gjenbruksstasjoner_kotid_estimering_spark.io import load_table

    n_docs = load_table(spark, sf, "documents").count()
    assert len(rows) == n_docs
    assert all(0 <= r.n_top_bigrams <= r.n_bigrams for r in rows)
    assert any(r.n_top_bigrams > 0 for r in rows)


def test_exsub_pos_cap_overflow_raises(spark, tmp_path, monkeypatch):
    """The doc_id*EXSUB_POS_CAP+pos total order silently interleaves
    occurrence keys across documents once any document reaches
    EXSUB_POS_CAP tokens — and the oracle shares the encoding, so the
    hash gate can't catch it (r8 advice). The runtime guard must raise
    naming the offending doc instead. Patched cap keeps the fixture
    small; the guard reads the module global at call time."""
    import pytest

    from gjenbruksstasjoner_kotid_estimering_spark.operators import (
        traindata4 as td4,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(20)), "en", "x", 0),
        (2, "short doc here", "en", "x", 0),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    monkeypatch.setattr(td4, "EXSUB_POS_CAP", 16)
    with pytest.raises(Exception, match="overflows"):
        td4.dedup_exact_substring_spans(spark, sf).collect()
    # under the real cap the same corpus runs clean
    monkeypatch.setattr(td4, "EXSUB_POS_CAP", 1_000_000)
    assert td4.dedup_exact_substring_spans(spark, sf).collect() == []


def test_exact_substring_spans_known_corpus(spark, tmp_path):
    """Hand-built corpus: doc 2 copies an EXSUB_K+2-token run from doc 1
    (span straddles no segment boundary alignment — the case
    text_segment_dedup misses by construction), doc 3 shares nothing.
    Expected: exactly one span in doc 2 covering the copied run; doc 1
    (first occurrence) and doc 3 report nothing."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata4 import (
        EXSUB_K,
        dedup_exact_substring_spans,
    )

    shared = " ".join(f"s{i}" for i in range(EXSUB_K + 2))
    rows = [
        (1, f"a0 a1 a2 {shared} a3 a4", "en", "web", 0),
        (2, f"b0 {shared} b1 b2 b3 b4 b5", "en", "web", 0),
        (3, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", "en", "web", 0),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = dedup_exact_substring_spans(spark, sf).collect()
    assert len(out) == 1
    span = out[0]
    assert span.doc_id == 2
    # shared run sits at 1-based token positions 2 .. 2+EXSUB_K+1 in doc 2
    assert (span.span_start, span.span_end) == (2, 2 + EXSUB_K + 1)
    # windows inside the run: (K+2) - K + 1 = 3
    assert span.n_dup_windows == 3


def test_exact_substring_spans_fixture_invariants(spark):
    """Fixture-corpus properties that hold by construction: every span is
    at least EXSUB_K tokens wide, spans within a doc are disjoint AND
    separated by more than one token of gap-free coverage (maximality:
    two spans closer than that would have merged), and every span fits
    inside its document's token count."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata4 import (
        EXSUB_K,
        dedup_exact_substring_spans,
    )

    out = dedup_exact_substring_spans(spark, SF).collect()
    assert out, "fixture corpus has duplicated windows by construction"
    doc_len = {
        r.doc_id: r.n
        for r in load_table(spark, SF, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), r"\s+")).alias("n"),
        )
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        assert r.span_end - r.span_start + 1 >= EXSUB_K
        assert 1 <= r.span_start <= r.span_end <= doc_len[r.doc_id]
        by_doc.setdefault(r.doc_id, []).append(r)
    for spans in by_doc.values():
        spans.sort(key=lambda r: r.span_start)
        for a, b in zip(spans, spans[1:]):
            # maximality: next span's first WINDOW start must be more than
            # EXSUB_K past the previous span's last window start, i.e. the
            # spans cannot be merge-adjacent
            assert b.span_start > a.span_end + 1


def test_exact_substring_rewrite_known_corpus(spark, tmp_path):
    """Same hand-built corpus as the spans test: doc 2's copied run is
    removed token-exactly, doc 1 (first occurrence) and doc 3 come back
    verbatim (single-space normal form)."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata4 import (
        EXSUB_K,
        text_exact_substring_rewrite,
    )

    shared = " ".join(f"s{i}" for i in range(EXSUB_K + 2))
    doc1 = f"a0 a1 a2 {shared} a3 a4"
    doc2 = f"b0 {shared} b1 b2 b3 b4 b5"
    doc3 = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, doc1, "en", "web", 0),
            (2, doc2, "en", "web", 0),
            (3, doc3, "en", "web", 0),
        ],
    )
    out = {r.doc_id: r for r in text_exact_substring_rewrite(spark, sf).collect()}
    assert out[1].text_clean == doc1 and out[1].n_removed == 0
    assert out[3].text_clean == doc3 and out[3].n_removed == 0
    assert out[2].text_clean == "b0 b1 b2 b3 b4 b5"
    assert out[2].n_removed == EXSUB_K + 2
    assert out[2].n_tokens == len(doc2.split())


def test_exact_substring_rewrite_consistent_with_spans(spark):
    """Cross-operator invariant on the fixture corpus: per doc, the total
    token mass removed by the rewrite equals the union length of the
    detector's spans (spans are disjoint by construction, so the union
    length is the plain sum of widths)."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata4 import (
        dedup_exact_substring_spans,
        text_exact_substring_rewrite,
    )

    spans: dict[int, int] = {}
    for r in dedup_exact_substring_spans(spark, SF).collect():
        spans[r.doc_id] = spans.get(r.doc_id, 0) + (
            r.span_end - r.span_start + 1
        )
    removed = {
        r.doc_id: r.n_removed
        for r in text_exact_substring_rewrite(spark, SF).collect()
        if r.n_removed > 0
    }
    assert removed == spans


def test_exact_substring_plans_are_keyed(spark):
    """Pin the at-scale shape claims: neither exact-substring operator may
    contain an all-pairs join (CartesianProduct / non-broadcast nested
    loop), and the dup-window core costs exactly ONE gram-keyed shuffle
    exchange — the groupBy(gh) aggregation. At this sf the firsts side of
    the keep-first join broadcasts, so a second gh exchange appearing
    here means the core regressed to a window/sort form (r8 advice: count
    the exchanges, don't just ban cartesians)."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata4 import (
        dedup_exact_substring_spans,
        text_exact_substring_rewrite,
    )

    for op in (dedup_exact_substring_spans, text_exact_substring_rewrite):
        plan = (
            op(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan
        gh_exchanges = [
            l
            for l in plan.splitlines()
            if "Exchange hashpartitioning(gh" in l
        ]
        assert len(gh_exchanges) == 1, (
            f"{op.__name__}: expected exactly one gram-keyed shuffle "
            f"(the groupBy(gh) partial-min aggregation), got "
            f"{len(gh_exchanges)}:\n{plan}"
        )
