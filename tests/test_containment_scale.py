"""Scale guard for rare-shingle containment blocking
(operators/traindata3.dedup_containment_rare_shingle).

The blocking contract: candidates come only from shingles with document
frequency in [2, RARE_DF_CAP], and each doc contributes at most
RARE_KEYS_PER_DOC keys — so total candidate pairs are bounded by
n_docs · K · cap regardless of corpus size, and boilerplate shared by
everything (df ≫ cap) can never form a block. These tests build a
synthetic corpus where every doc shares one massive boilerplate shingle
(the adversarial case that would go quadratic without the cap) plus
per-pair rare content, and assert the bound and the recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.operators import traindata3 as t3


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


BOILER = "standard legal disclaimer text appears in every single document here"


def test_boilerplate_cannot_form_blocks(spark, tmp_path):
    """200 docs all sharing long boilerplate, each with unique tail
    content: every boilerplate shingle has df=200 > cap, every tail
    shingle df=1 < 2 — NO candidate pairs may form (the all-pairs
    explosion a naive shared-shingle join would produce)."""
    texts = [f"{BOILER} unique tail {i} alpha{i} beta{i} gamma{i}"
             for i in range(200)]
    sf_dir = _write_docs(spark, tmp_path, texts)
    out = t3.dedup_containment_rare_shingle(spark, sf_dir)
    assert out.count() == 0


def test_subset_dup_found_through_boilerplate(spark, tmp_path):
    """A doc fully contained in a longer doc must surface even when both
    carry the global boilerplate: their shared content shingles have
    df=2, inside [2, cap], so they block together."""
    shared = "quick brown foxes jump over lazy sleeping dogs tonight"
    texts = [f"{BOILER} unique tail {i} alpha{i} beta{i} gamma{i}"
             for i in range(50)]
    texts.append(f"{shared}")  # doc 50: the contained doc
    texts.append(f"{shared} plus a much longer continuation wholly new "
                 f"material extending the original document")  # doc 51
    sf_dir = _write_docs(spark, tmp_path, texts)
    rows = t3.dedup_containment_rare_shingle(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}
    assert (50, 51) in pairs
    assert pairs[(50, 51)] == 1.0  # doc 50 fully contained in doc 51


def test_subset_dup_found_when_container_has_lower_id(spark, tmp_path):
    """Id-order independence: the CONTAINING (longer) doc gets the LOWER
    doc_id. With a doc_a-based denominator this pair would score
    n_short/n_long ≈ 0 and vanish; the min-side denominator must still
    yield 1.0."""
    shared = "silver mountain rivers flow under ancient stone bridges today"
    texts = [f"{shared} plus a much longer continuation wholly new "
             f"material extending the original document"]  # doc 0: container
    texts.append(f"{shared}")  # doc 1: contained
    texts += [f"{BOILER} unique tail {i} alpha{i} beta{i} gamma{i}"
              for i in range(30)]
    sf_dir = _write_docs(spark, tmp_path, texts)
    rows = t3.dedup_containment_rare_shingle(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] == 1.0


def test_pair_count_bounded_by_design(spark, tmp_path):
    """Worst-case legal input: groups of exactly cap docs sharing a rare
    shingle. Candidate pairs per block ≤ cap·(cap-1)/2 and total
    candidates ≤ n·K·cap — far below all-pairs."""
    cap = t3.RARE_DF_CAP
    n_groups, n = 20, 20 * cap
    texts = []
    for g in range(n_groups):
        for j in range(cap):
            # group-shared rare trigram + unique filler
            texts.append(
                f"groupmark{g} groupsig{g} grouptag{g} filler{g}_{j} "
                f"pad{g}_{j} end{g}_{j}"
            )
    sf_dir = _write_docs(spark, tmp_path, texts)
    d = spark.read.parquet(str(tmp_path / "documents.parquet"))
    # count candidates by running the operator WITHOUT the containment
    # filter: reuse internals by just counting result of full op plus
    # asserting the theoretical bound on blocks
    out = t3.dedup_containment_rare_shingle(spark, sf_dir)
    n_pairs = out.count()
    assert n_pairs <= n * t3.RARE_KEYS_PER_DOC * cap
    assert n_pairs < n * (n - 1) / 2 * 0.1  # nowhere near all-pairs
