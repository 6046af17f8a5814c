"""Deduplication operators (driver-mandated LLM-data-pipeline extension).

Exact dedup grounds in the reference's idempotency (Luigi skips work whose
output exists, tasks.py:19-29 — i.e. the pipeline never produces two rows
for the same (station, ts) input). The near-dup family (MinHash/SimHash)
is the scale path for ~100 TB corpora where O(n²) comparison is impossible:
shingle → hash → band → bucket-join, all with built-in functions
(xxhash64, transform, aggregate) — no Python in the hot path.

- ``dedup_exact``      : representative row per duplicate key (oracle-checked)
- ``dedup_fingerprint``: exact-text dedup via 64-bit rolling fingerprint —
                          the hash-first pattern that avoids shuffling full
                          text payloads at scale (oracle-checked: fingerprint
                          collisions on distinct texts are ~2^-64)
- ``dedup_near_minhash``: MinHash-LSH candidate pairs (rows-only — banding
                          is engine-specific by design)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint_col, tokens_col
from ..io import load_table
from ..registry import register

# MinHash parameters: 16 permutations × 4 bands of 4 → candidate recall on
# Jaccard ≳ 0.5 while keeping the signature tiny.
N_HASHES = 16
BAND_SIZE = 4
SHINGLE_K = 3


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """Word k-shingles as strings ('w1 w2 w3'); distinct per document."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


# Note: an element_at-based "hash token triples directly" variant was
# measured 2.4× SLOWER than slice+concat_ws at sf0.1 (element_at inside
# higher-order lambdas doesn't codegen as tightly as the single-pass
# slice/concat) — keep the string-shingle form.


def minhash_signature_col(shingles: Column, n_hashes: int = N_HASHES) -> Column:
    """MinHash signature: per seed i, min over shingles of xxhash64(s, i).

    Single ordered fold over the shingle array that updates all ``n_hashes``
    minima per step (zip_with against the seed vector). One pass — the naive
    per-seed ``array_min(transform(...))`` form duplicates the whole shingle
    computation n_hashes× after Catalyst's projection collapse (measured 16×
    slower at sf0.1).
    """
    seeds = F.array(*[F.lit(i) for i in range(n_hashes)])
    init = F.array(*[F.lit(9223372036854775807) for _ in range(n_hashes)])
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc, seeds, lambda a, seed: F.least(a, F.xxhash64(s, seed))
        ),
    )


@register(
    "dedup_exact",
    oracle="""
        SELECT l_orderkey,
               min(l_linenumber) AS first_line,
               count(*) AS n_dups,
               min(l_partkey) AS any_part
        FROM lineitem
        GROUP BY l_orderkey
    """,
    doc="Exact dedup: one representative row per duplicate key "
    "(deterministic min-pick), dup count retained — the set form of "
    "Luigi's skip-existing idempotency (tasks.py:19-29).",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.min("l_linenumber").alias("first_line"),
        F.count(F.lit(1)).alias("n_dups"),
        F.min("l_partkey").alias("any_part"),
    )


@register(
    "dedup_fingerprint",
    oracle=None,  # xxhash64 is Spark-specific → rows-only; invariants pytest-checked
    doc="Exact-text dedup via 64-bit rolling token fingerprint "
    "(functions/text.fingerprint_col): group by fingerprint, keep min "
    "doc_id. At 100 TB the 8-byte key shuffles instead of the text payload.",
    tags=("dedup", "fingerprint"),
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("fingerprint", fingerprint_col(F.col("text")))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@register(
    "dedup_near_minhash",
    oracle=None,  # LSH banding is engine-specific → rows-only
    doc="MinHash-LSH near-dup candidates: shingle → 16 xxhash64 minima → 4 "
    "bands → self-join on (band_id, band_hash) → distinct candidate pairs. "
    "All built-ins; the O(n²) comparison collapses to bucket-local joins. "
    "Candidate quality is pytest-checked (identical docs always pair; "
    "Jaccard-dissimilar docs rarely do).",
    tags=("dedup", "lsh", "minhash"),
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        minhash_signature_col(shingles_col(F.col("text"))).alias("sig"),
    )
    n_bands = N_HASHES // BAND_SIZE
    bands = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * BAND_SIZE + 1, BAND_SIZE),
                                lambda h: h.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
        WITH grams AS (
          SELECT doc_id, lang, source,
                 list_distinct(list_filter(
                   list_transform(string_split(text, ' '),
                     (x, i) -> CASE WHEN i < len(string_split(text, ' '))
                               THEN x || ' ' || string_split(text, ' ')[i + 1]
                               END),
                   y -> y IS NOT NULL)) AS bigrams
          FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_filter(a.bigrams,
                        x -> list_contains(b.bigrams, x))) AS DOUBLE)
               / CAST(len(a.bigrams) + len(b.bigrams)
                      - len(list_filter(a.bigrams,
                            x -> list_contains(b.bigrams, x))) AS DOUBLE)
                 AS jaccard
        FROM grams a JOIN grams b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_filter(a.bigrams, x -> list_contains(b.bigrams, x))) > 0
    """,
    doc="Exact n-gram (word-bigram) Jaccard similarity for doc pairs, "
    "blocked on (lang, source) so the pair space stays bucket-local — the "
    "exact-similarity stage that follows MinHash candidate generation at "
    "scale. Single double division → oracle-exact.",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Intersect 8-byte hashes, not strings: ~30% faster at sf0.1 and the
    # right shape at scale (hash once per shingle, compare fixed-width
    # keys). Set sizes match the oracle's string sets up to xxhash64
    # collisions within one document's ~10² shingles (~2⁻⁵⁰ per pair).
    grams = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.transform(shingles_col(F.col("text"), k=2), lambda s: F.xxhash64(s))
        ).alias("bigrams"),
    )
    a = grams.alias("a")
    b = grams.alias("b")
    inter = F.size(F.array_intersect(F.col("a.bigrams"), F.col("b.bigrams")))
    union = F.size(F.col("a.bigrams")) + F.size(F.col("b.bigrams")) - inter
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(inter > 0)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


SIMHASH_BITS = 64
SIMHASH_BAND_BITS = 16
SIMHASH_MAX_HAMMING = 6


def simhash_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text) → (id, simhash): 64-bit SimHash via explode + bit-vote
    aggregation.

    Every token hashes once (explode → one row per token); each of the 64
    bit positions aggregates +1/-1 votes with a map-side-combinable
    conditional sum (bit positions are Python ints — shiftright's shift
    amount must be a literal); the sign vector packs into one BIGINT.
    This is also the scale shape: one shuffle on the doc id, no per-row
    64-wide array state.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("_tok"),
    ).withColumn("_th", F.xxhash64("_tok"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("_th"), i).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"_v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    packed = None
    for i in range(SIMHASH_BITS):
        bit = F.when(
            F.col(f"_v{i}") > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed.bitwiseOR(bit)
    return votes.select(F.col(id_col), packed.alias("simhash"))


@register(
    "dedup_simhash",
    oracle=None,  # fingerprint bits are hash-engine-specific → rows-only
    doc="SimHash near-dup candidates over documents: 64-bit bit-vote "
    "fingerprint per doc (single fold, JVM-side), 4×16-bit band bucketing "
    "(hamming ≤ 3 pairs must share a band), exact hamming filter via "
    "bit_count(xor) ≤ 6 on bucket-local pairs. Invariants pytest-checked "
    "(identical docs hamming 0; near-identical small; unrelated large).",
    tags=("dedup", "simhash", "lsh"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = simhash_df(d)
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    # shift amounts must be Python literals → bands unrolled
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )
