"""Similarity search over embedding vectors (driver-mandated extension).

Generalizes the reference's feature-vector space (flattened VGG16
activations, preprocess_image.py:195; 58368-float32 arrays) to ANN-style
retrieval over the ``embeddings`` table (64-dim here; the operators are
dimension-agnostic).

- ``similarity_topk``      : exact brute-force cosine top-k against a query
                             vector — the correctness baseline. Broadcast the
                             single query row; dot/norms are ordered folds in
                             double so Spark and DuckDB agree bit-exactly.
- ``similarity_pairs_lsh`` : the scale path — random-hyperplane (SimHash)
                             bucketing; only bucket-local pairs are compared.
                             Rows-only (bucketing is engine-specific).

At 100 TB brute force against one query is still a single pass (fine); the
LSH path is for all-pairs workloads where O(n²) is impossible. An IVF
variant (k-means coarse quantizer via MLlib) is the planned round-2 addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

QUERY_VEC_ID = 0
TOP_K = 10
# Synthetic embeddings are near-orthogonal (max in-label cosine ~0.47 at
# sf0.01); 0.25 marks the top ~1% most-similar pairs as near-dups.
COSINE_DUP_THRESHOLD = 0.25


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Ordered-fold dot product in double (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


@register(
    "similarity_topk",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
          SELECT e.vec_id, e.label,
                 list_aggregate(list_transform(e.embedding,
                     (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
                     'sum')
                 / (sqrt(list_aggregate(list_transform(e.embedding,
                        (x, i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                        'sum'))
                    * sqrt(list_aggregate(list_transform(q.qv,
                        (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
                        'sum'))) AS cosine
          FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, label, cosine
        FROM scored
        ORDER BY cosine DESC, vec_id
        LIMIT {TOP_K}
    """,
    doc=f"Exact brute-force cosine top-{TOP_K} against the vec_id="
    f"{QUERY_VEC_ID} query vector: broadcast 1-row build side, ordered-fold "
    "dot/norms in double, deterministic tie-break on vec_id. "
    "TakeOrderedAndProject — no global sort materialization.",
    tags=("similarity", "topk"),
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("embedding").alias("qv")
        )
    )
    scored = e.crossJoin(q).select(
        "vec_id",
        "label",
        cosine_col(F.col("embedding"), F.col("qv")).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(TOP_K)


@register(
    "similarity_pairs_lsh",
    oracle=None,  # random-hyperplane bucketing is engine-specific → rows-only
    doc="SimHash/random-hyperplane LSH: 12 deterministic pseudo-hyperplanes "
    "(xxhash64-derived ±1 weights), sign pattern → bucket; candidate pairs "
    "join bucket-locally. The all-pairs scale path (O(n²) → bucket-local).",
    tags=("similarity", "lsh"),
)
def similarity_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    n_planes = 12
    # Deterministic ±1 hyperplane weights per (plane, dim) from xxhash64.
    sign_bit = lambda p, i: (  # noqa: E731
        F.when(F.pmod(F.xxhash64(F.lit(p), i), F.lit(2)) == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )
    )
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bucket_bits = F.concat(
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        emb_d,
                        F.transform(
                            F.sequence(F.lit(1), F.size("embedding")),
                            lambda i: sign_bit(p, i),
                        ),
                        lambda x, s: x * s,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(n_planes)
        ]
    )
    bucketed = e.select("vec_id", bucket_bits.alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
        )
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
        WITH emb AS (
          SELECT vec_id, label, embedding,
                 sqrt(list_aggregate(list_transform(embedding,
                     (x, i) -> CAST(x AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                     'sum')) AS norm
          FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               list_aggregate(list_transform(a.embedding,
                   (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                   'sum') / (a.norm * b.norm) AS cosine
        FROM emb a JOIN emb b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_aggregate(list_transform(a.embedding,
                  (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                  'sum') / (a.norm * b.norm) > {COSINE_DUP_THRESHOLD!r}
    """,
    doc="Embedding-cosine near-duplicate pairs, blocked on label (the "
    "cluster/partition key a production pipeline blocks on) — exact ordered-"
    "fold cosine per candidate pair; the all-pairs space collapses to "
    "block-local. The unblocked scale path is similarity_pairs_lsh.",
    tags=("dedup", "similarity", "cosine"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select(
        "vec_id", "label", "embedding", norm_col(F.col("embedding")).alias("norm")
    )
    a, b = emb.alias("a"), emb.alias("b")
    cos = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") > COSINE_DUP_THRESHOLD)
    )
