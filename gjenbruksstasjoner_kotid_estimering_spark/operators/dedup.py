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
from ..io import fan_out, load_table
from ..registry import register

# MinHash parameters: 16 permutations × 4 bands of 4 → candidate recall on
# Jaccard ≳ 0.5 while keeping the signature tiny.
N_HASHES = 16
BAND_SIZE = 4
SHINGLE_K = 3


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """Word k-shingles as strings ('w1 w2 w3'); distinct per document.

    Total over short docs: fewer than k tokens → empty array. The guard
    matters because Spark's sequence(1, 0) counts DOWN to [1, 0] and
    slice(…, 0, k) then throws INVALID_PARAMETER_VALUE.START — so the
    sequence only exists under a when() proving n >= k.
    """
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


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
    # Same signature values as the original HOF-fold form (per seed i,
    # min over shingles of xxhash64(s, i)), but computed as explode →
    # 16-column min hash-aggregate: whole-stage codegen, map-side partial
    # mins, and the per-shingle hashing parallelizes across cores instead
    # of running as one interpreted fold per row (measured ~4x at sf0.1).
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    grams = d.select("doc_id", shingles_col(F.col("text")).alias("shingles"))
    exploded = grams.select("doc_id", F.explode("shingles").alias("s"))
    sigs = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    )
    n_bands = N_HASHES // BAND_SIZE
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"h{b * BAND_SIZE + j}").cast("string")
                                    for j in range(BAND_SIZE)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
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


# Candidate generation for the oracle-checked exact-Jaccard stage uses
# md5-based MinHash: md5 is the one hash both Spark (F.md5) and DuckDB
# (md5()) compute bit-identically, so the LSH banding itself is part of the
# oracle contract — the two engines derive the SAME candidate pair set.
# 15 hashes × 5 bands of 3 → P(candidate) = 1-(1-J³)⁵: ≥ 0.88 at J=0.7,
# ~1.4e-4 at the J≈0.03 noise floor of the synthetic corpus.
MH_SEEDS = 15
MH_BANDS = 5
MH_BAND_SIZE = 3
JACCARD_DUP_THRESHOLD = 0.5


def md5_minhash_sigs(grams: DataFrame, n_hashes: int = MH_SEEDS) -> DataFrame:
    """(doc_id, bigrams) → (doc_id, h0..h{n-1}): engine-portable MinHash.

    ONE md5 per shingle; the hex digest splits into two 56-bit ints
    (hex chars 1-14 and 17-30) and the per-seed hash family is
    h_i = h1 + i·h2 (Kirsch-Mitzenmacher double hashing — the standard
    derivation of k hash functions from one). 56-bit halves keep
    h1 + 14·h2 < 2^60, so the arithmetic cannot overflow in either
    engine (Spark ANSI mode and DuckDB both raise on BIGINT overflow).

    Shape: explode shingles → project (md5 once per shingle) → hash-
    aggregate of n ``min`` columns with map-side partial mins, so the
    per-shingle work parallelizes across cores/executors. (A per-row HOF
    fold measured 4-8× slower — higher-order lambdas don't codegen and
    multi-reference projections re-duplicate the fold under
    CollapseProject; hashing per (shingle, seed) was another ~5× of
    avoidable md5 work.)
    """
    exploded = grams.select("doc_id", F.explode("bigrams").alias("s"))
    digest = F.md5(F.col("s"))
    hashed = exploded.select(
        "doc_id",
        F.conv(F.substring(digest, 1, 14), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(digest, 17, 14), 16, 10).cast("long").alias("h2"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )


_MH_MIN_EXPRS = ",\n                 ".join(
    f"min(h1 + {i} * h2) AS h{i}" for i in range(MH_SEEDS)
)
_MH_BAND_SELECTS = "\n          UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, "
    f"md5(concat_ws(',', "
    + ", ".join(f"h{b * MH_BAND_SIZE + j}" for j in range(MH_BAND_SIZE))
    + ")) AS band_val FROM sigs"
    for b in range(MH_BANDS)
)


# The full candidate-generation + exact-scoring chain as a reusable CTE
# body: dedup_ngram_jaccard's oracle selects from it directly, and
# operators/clusters.py extends it with a recursive-CTE connected
# components so the cluster assignment is oracle-checked end-to-end.
JACCARD_ORACLE_CTES = f"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        grams AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                   list_transform(t,
                     (x, i) -> CASE WHEN i < len(t)
                               THEN x || ' ' || t[i + 1] END),
                   y -> y IS NOT NULL)) AS bigrams
          FROM toks
        ),
        g AS (SELECT * FROM grams WHERE len(bigrams) > 0),
        hashed AS (
          SELECT doc_id,
                 ('0x' || substring(md5(s), 1, 14))::BIGINT AS h1,
                 ('0x' || substring(md5(s), 17, 14))::BIGINT AS h2
          FROM (SELECT doc_id, unnest(bigrams) AS s FROM g)
        ),
        sigs AS (
          SELECT doc_id,
                 {_MH_MIN_EXPRS}
          FROM hashed GROUP BY doc_id
        ),
        bands AS ({_MH_BAND_SELECTS}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id
        ),
        scored AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(len(list_filter(ga.bigrams,
                          x -> list_contains(gb.bigrams, x))) AS DOUBLE)
                 / CAST(len(ga.bigrams) + len(gb.bigrams)
                        - len(list_filter(ga.bigrams,
                              x -> list_contains(gb.bigrams, x))) AS DOUBLE)
                   AS jaccard
          FROM cand c
          JOIN g ga ON ga.doc_id = c.doc_a
          JOIN g gb ON gb.doc_id = c.doc_b
        )"""


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH {JACCARD_ORACLE_CTES}
        SELECT doc_a, doc_b, jaccard FROM scored
        WHERE jaccard >= {JACCARD_DUP_THRESHOLD}
    """,
    doc="Candidate-driven exact n-gram Jaccard dedup: md5-MinHash LSH "
    "banding (engine-portable, so DuckDB derives the identical candidate "
    "set) proposes pairs; exact bigram-set Jaccard is computed ONLY for "
    "candidates and thresholded at 0.5. No quadratic self-join anywhere — "
    "the scale shape is signature shuffle + bucket-local join + candidate-"
    "sized scoring joins.",
    tags=("dedup", "jaccard", "minhash", "lsh"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out BEFORE shingling: on a one-split scan every downstream
    # higher-order-function projection (shingle build, per-shingle md5)
    # would run in a single task (no-op at scale — see io.fan_out).
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    # Filter on token count, NOT on size(bigrams): a size(bigrams)>0 filter
    # gets predicate-pushed below the repartition and drags the whole
    # shingle expression into the single pre-shuffle task. A k=2 shingle
    # array is empty iff the doc has < 2 tokens — same predicate as the
    # oracle's len(bigrams) > 0, but only a cheap split() moves below the
    # exchange.
    # NOTE (r17): a localCheckpoint of this relation was tried (static plan
    # shows the shingle Generate chain 4×) and REVERTED after an isolated
    # sf0.1 A/B — caching the array-heavy bigram rows costs more in
    # serialization/GC than the recompute saves (old 2.3–3.9s vs
    # checkpointed 5.7–17.7s at matched steal), the exact r9 finding
    # recorded in scripts/rescan_audit.py: runtime ReusedExchange already
    # deduplicates the identical aggregate subtrees.
    grams = d.where(F.size(tokens_col(F.col("text"))) >= 2).select(
        "doc_id", shingles_col(F.col("text"), k=2).alias("bigrams")
    )
    sigs = md5_minhash_sigs(grams)
    # Band hashes reference the h* aggregate columns directly (cheap
    # attribute refs — no expression re-duplication under CollapseProject).
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"h{b * MH_BAND_SIZE + j}")
                                    for j in range(MH_BAND_SIZE)
                                ],
                            )
                        ).alias("band_val"),
                    )
                    for b in range(MH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_val")
    lb, rb = bands.alias("lb"), bands.alias("rb")
    cand = (
        lb.join(
            rb,
            (F.col("lb.band_id") == F.col("rb.band_id"))
            & (F.col("lb.band_val") == F.col("rb.band_val"))
            & (F.col("lb.doc_id") < F.col("rb.doc_id")),
        )
        .select(F.col("lb.doc_id").alias("doc_a"), F.col("rb.doc_id").alias("doc_b"))
        .distinct()
    )
    ga, gb = grams.alias("ga"), grams.alias("gb")
    inter = F.size(F.array_intersect(F.col("ga.bigrams"), F.col("gb.bigrams")))
    union = F.size(F.col("ga.bigrams")) + F.size(F.col("gb.bigrams")) - inter
    scored = (
        cand.join(ga, F.col("doc_a") == F.col("ga.doc_id"))
        .join(gb, F.col("doc_b") == F.col("gb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= JACCARD_DUP_THRESHOLD)


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
    # The band bucketing self-joins this frame; without a checkpoint BOTH
    # join sides re-execute the full explode + 64-way bit-vote aggregate
    # (self-joins on different keys get no exchange reuse). The signature
    # frame is doc-count-sized (2 columns), so materializing it once is
    # the cheap side of that trade at any scale.
    sigs = simhash_df(d).localCheckpoint(eager=False)
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
