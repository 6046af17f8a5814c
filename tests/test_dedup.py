"""Dedup-operator invariants: fingerprint exactness, MinHash-LSH candidate
quality (identical docs always pair; dissimilar docs rarely do)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.functions.text import fingerprint_col
from gjenbruksstasjoner_kotid_estimering_spark.operators.dedup import (
    minhash_signature_col,
    shingles_col,
)


def test_fingerprint_exact_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "dog lazy the over jumps fox brown quick the"),
            (4, "an entirely different sentence altogether here"),
        ],
        schema="doc_id long, text string",
    )
    fps = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", fingerprint_col(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2]          # identical text → identical fingerprint
    assert fps[1] != fps[3]          # reorder → different (order-sensitive)
    assert fps[1] != fps[4]


def test_minhash_identical_docs_share_signature(spark):
    text = "spark window merge join batch stream column row value table " * 5
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely unrelated words apple banana "
                                   "cherry durian elderberry fig grape")],
        schema="doc_id long, text string",
    )
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in df.select(
            "doc_id",
            minhash_signature_col(shingles_col(F.col("text"))).alias("sig"),
        ).collect()
    }
    assert sigs[1] == sigs[2]
    # dissimilar docs: signatures differ in (nearly) every position
    agree = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree <= 2


def test_near_dup_docs_mostly_agree(spark):
    """~90% shingle overlap → most MinHash positions agree (E[agree] ≈ J)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon " * 3).split()
    variant = list(base)
    variant[5] = "CHANGED"
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(variant))],
        schema="doc_id long, text string",
    )
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in df.select(
            "doc_id",
            minhash_signature_col(shingles_col(F.col("text"))).alias("sig"),
        ).collect()
    }
    agree = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    assert agree >= 8  # 16 hashes, high-Jaccard pair


def test_simhash_invariants(spark):
    from gjenbruksstasjoner_kotid_estimering_spark.operators.dedup import (
        simhash_df,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).split()
    variant = list(base)
    variant[7] = "CHANGED"
    df = spark.createDataFrame(
        [
            (1, " ".join(base)),
            (2, " ".join(base)),          # identical
            (3, " ".join(variant)),       # near-identical
            (4, "utterly different content nothing shared at all here folks"),
        ],
        schema="doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in simhash_df(df).collect()}

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert sigs[1] == sigs[2]
    assert hamming(sigs[1], sigs[3]) <= 12   # near-dup: small distance
    assert hamming(sigs[1], sigs[4]) >= 16   # unrelated: large distance
