"""Invariants for the round-2 training-data operators (rows-only surfaces
get their correctness here; oracle-backed ones are covered by the
parametrized DuckDB parity sweep in test_correctness.py)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata import (
    PACK_BUDGET,
)

SF = "/root/testdata/sf0.001"


def test_pack_sequences_invariants(spark):
    rows = registry.all_specs()["doc_pack_sequences"].builder(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    # every doc assigned exactly once
    doc_ids = [r.doc_id for r in rows]
    assert len(doc_ids) == n_docs
    assert len(set(doc_ids)) == n_docs
    # bins respect the budget unless a single doc overflows it alone
    bins = defaultdict(list)
    for r in rows:
        bins[(r.part_id, r.bin_id)].append(r)
    for members in bins.values():
        total = sum(r.n_tokens for r in members)
        assert all(r.bin_tokens == total for r in members)
        assert total <= PACK_BUDGET or len(members) == 1
    # packing is deterministic (hash-derived part_id, stable sort)
    rows2 = (
        registry.all_specs()["doc_pack_sequences"].builder(spark, SF).collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_semantic_dedup_invariants(spark):
    df = registry.all_specs()["dedup_semantic_kmeans"].builder(spark, SF)
    rows = df.collect()
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert len(rows) == n_vecs  # one verdict per vector
    # the lowest vec_id of every cluster always survives (nothing below it)
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster].append(r)
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.keep
    # self-duplicate sanity: identical embeddings in one cluster → one kept.
    # (the synthetic corpus may not contain exact dups; assert keep is a
    # subset, not a specific count)
    assert any(r.keep for r in rows)


def test_pii_redact_scrubs_everything(spark):
    df = registry.all_specs()["text_pii_redact"].builder(spark, SF)
    out = df.collect()
    assert all(r.n_emails >= 1 and r.n_phones >= 1 for r in out)
    assert all("<EMAIL>" in r.redacted_tail for r in out)


def test_tfidf_exact_rare_term_wins(spark):
    # a term appearing in fewer docs must outweigh an equally-frequent
    # common term within the same doc — spot-check the idf ordering
    out = {
        r.doc_id: r
        for r in registry.all_specs()["text_tfidf_exact"]
        .builder(spark, SF)
        .collect()
    }
    docs = load_table(spark, SF, "documents").collect()
    assert len(out) == sum(1 for d in docs if d.text)
    for d in docs[:5]:
        toks = d.text.split()
        assert out[d.doc_id].nnz == len(set(toks))
        assert out[d.doc_id].top_term in toks


def test_scd2_intervals_chain(spark):
    rows = registry.all_specs()["scd2_intervals"].builder(spark, SF).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for seq in by_user.values():
        seq.sort(key=lambda r: (r.valid_from, r.valid_to is None))
        # exactly one open (current) interval per user, and it is the last
        assert sum(1 for r in seq if r.is_current) == 1
        assert seq[-1].is_current
        # intervals chain without gaps: valid_to == next valid_from
        for a, b in zip(seq, seq[1:]):
            assert a.valid_to == b.valid_from


def test_repetition_filter_flags_degenerate_doc(spark):
    # build a degenerate doc inline and run the same operator expressions
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"), (2, "a fresh mix of many words")],
        schema="doc_id long, text string",
    )
    df.createOrReplaceTempView("documents_tmp")
    from gjenbruksstasjoner_kotid_estimering_spark.functions.text import (
        tokens_col,
    )

    counts = (
        df.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .count()
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("count").alias("total"), F.max("count").alias("top")
    )
    got = {r.doc_id: r for r in per_doc.collect()}
    assert got[1].top / got[1].total == 1.0  # all-repeat doc
    assert got[2].top / got[2].total < 0.2


def test_corpus_to_shards_pipeline(spark):
    spec = registry.all_specs()["corpus_to_shards_pipeline"]
    rows = spec.builder(spark, SF).collect()
    assert rows and len(rows) <= 16
    for r in rows:
        assert 0 <= r.part_id < 16
        assert 0.0 < r.mean_fill <= 1.0
        assert r.total_tokens <= r.n_bins * PACK_BUDGET
    # deterministic end to end
    rows2 = spec.builder(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pagerank_invariants(spark):
    from gjenbruksstasjoner_kotid_estimering_spark.operators.graph import (
        cooccurrence_edges,
        pagerank,
    )

    ranks = {
        r.node: r.rank
        for r in registry.all_specs()["graph_pagerank"]
        .builder(spark, SF)
        .collect()
    }
    assert ranks
    # mass conservation: undirected graph has no dangling nodes, so total
    # rank mass stays ~1
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert all(r > 0 for r in ranks.values())
    # a known 3-node line graph: the middle node must outrank the ends
    line = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1)], schema="user_a long, user_b long, weight long"
    )
    lr = {r.node: r.rank for r in pagerank(line, n_iter=30).collect()}
    assert lr[2] > lr[1] and lr[2] > lr[3]
    assert abs(lr[1] - lr[3]) < 1e-9  # symmetry


def test_vocab_encode_known_corpus(spark):
    from unittest import mock

    import gjenbruksstasjoner_kotid_estimering_spark.operators.traindata as td

    docs = spark.createDataFrame(
        [(0, "b a a"), (1, "a c")], schema="doc_id long, text string"
    )
    with mock.patch.object(td, "load_table", lambda s, d, n: docs):
        out = {r.doc_id: r for r in td.text_vocab_encode(spark, "x").collect()}
    # freq: a=3 → id 0; b=1, c=1 → tie broken by term: b=1, c=2
    assert out[0].ids_head == "1,0,0"
    assert out[1].ids_head == "0,2"
    assert out[0].ids_sum == 1 and out[1].ids_sum == 2


def test_chunk_overlap_covers_every_token(spark, tmp_path):
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata2 import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        doc_chunk_overlap,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(50)), "en", "srcX", 0),
        (2, " ".join(f"w{i}" for i in range(32)), "en", "srcX", 0),  # exactly one chunk
        (3, "a b", "en", "srcX", 0),  # shorter than one chunk
    ]
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    chunks = doc_chunk_overlap(spark, str(tmp_path)).collect()
    by_doc: dict = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    # doc 1 (50 tokens): starts 1, 25 → sizes 32, 26; tail covered
    d1 = sorted(by_doc[1], key=lambda c: c.chunk_id)
    assert [c.n_tokens for c in d1] == [32, 26]
    assert d1[-1].chunk_text.endswith("w49")
    # every token of doc 1 appears in some chunk
    covered = set()
    for c in d1:
        covered.update(c.chunk_text.split())
    assert covered == {f"w{i}" for i in range(50)}
    # overlap between consecutive chunks is CHUNK_SIZE - CHUNK_STRIDE
    assert set(d1[0].chunk_text.split()) & set(d1[1].chunk_text.split()) == {
        f"w{i}" for i in range(CHUNK_STRIDE, CHUNK_SIZE)
    }
    # doc 2: one exact chunk; doc 3: one partial chunk
    assert [c.n_tokens for c in by_doc[2]] == [32]
    assert [c.n_tokens for c in by_doc[3]] == [2]


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark, tmp_path):
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata2 import (
        WINNOW_K,
        WINNOW_W,
        text_winnow_fingerprints,
    )

    guarantee = WINNOW_W + WINNOW_K - 1  # any shared run this long must match
    shared = " ".join(f"s{i}" for i in range(guarantee))
    rows = [
        (1, "alpha beta " + shared + " gamma delta", "en", "srcX", 0),
        (2, "one two three four " + shared, "en", "srcX", 0),
        (3, "totally different words with no overlap at all here", "en", "srcX", 0),
    ]
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fps = text_winnow_fingerprints(spark, str(tmp_path)).collect()
    by_doc: dict = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "docs sharing a guarantee-length run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # short doc (< window of k-grams) still fingerprints: its global min
    spark.createDataFrame(
        [(9, "a b c d", "en", "srcX", 0)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    short = text_winnow_fingerprints(spark, str(tmp_path)).collect()
    assert len(short) == 1 and short[0].doc_id == 9


def test_short_and_empty_docs_do_not_crash_text_ops(spark, tmp_path):
    """Regression for the short-doc crash class: sequence(1, 0) counts DOWN
    in Spark, so un-guarded shingle/chunk expressions throw
    INVALID_PARAMETER_VALUE.START on docs shorter than the gram size."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata2 import (
        corpus_mixture_weights,
        doc_chunk_overlap,
        text_decontaminate,
        text_winnow_fingerprints,
    )

    rows = [
        (0, "", "en", "srcX", 0),          # empty
        (1, "one", "en", "srcX", 3),       # 1 token
        (2, "one two", "en", "srcX", 7),   # below shingle k=3
        (97, "a b", "en", "srcX", 3),      # short doc in the benchmark set
        (3, "alpha beta gamma delta epsilon zeta", "en", "srcX", 35),
    ]
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    # none of these may raise; row contents sanity-checked loosely
    assert text_decontaminate(spark, sf).count() >= 0
    fps = text_winnow_fingerprints(spark, sf)
    assert fps.where(fps.doc_id == 0).count() == 0  # empty doc → no fingerprint
    chunks = {r.doc_id: r for r in doc_chunk_overlap(spark, sf).collect()}
    assert chunks[1].n_tokens == 1
    assert 0 not in chunks  # empty doc emits NO chunks (not one empty chunk)
    mix = corpus_mixture_weights(spark, sf).collect()
    assert mix[0].n_tokens == 11  # 0 + 1 + 2 + 2 + 6 (empty doc counts 0)


def test_decontaminate_and_chunker_oracles_on_whitespace_runs(spark, tmp_path):
    """ADVICE r3: the decontamination oracle used string_split(text, ' ')
    while the Spark side tokenizes on \\s+ — divergent on consecutive
    spaces, tabs, newlines. Both oracles now share the guarded
    string_split_regex contract; prove it on an adversarial corpus the
    sf testdata doesn't contain."""
    import duckdb

    from gjenbruksstasjoner_kotid_estimering_spark.registry import all_specs

    rows = [
        (0, "", "en", "srcX", 0),
        (1, "a  b\tc\nd e", "en", "srcX", 10),          # runs + tabs + newlines
        (97, "a  b\tc x y", "en", "srcX", 10),          # benchmark doc, same grams
        (2, "a b c d e", "en", "srcX", 9),              # single-space twin of 1
        (3, " lead and trail ", "en", "srcX", 16),
        (4, " ".join(f"w{i}" for i in range(40)) + "\n\ttail", "en", "srcX", 0),
    ]
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    specs = all_specs()
    for name in ("text_decontaminate", "doc_chunk_overlap"):
        spec = specs[name]
        got = sorted(
            map(tuple, spec.builder(spark, str(tmp_path)).collect())
        )
        want = sorted(map(tuple, con.execute(spec.oracle).fetchall()))
        assert got == want, f"{name}: spark={got[:5]} duck={want[:5]}"
