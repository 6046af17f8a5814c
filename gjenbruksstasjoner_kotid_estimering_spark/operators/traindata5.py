"""Round-7 training-data additions: embedding-health diagnostics and
deterministic importance resampling.

Both are single-scan, integer-exact shapes (the lane's oracle
convention): per-dimension embedding statistics from quantized
micro-unit power sums, and source-balancing resampling whose copy counts
are pure integer arithmetic on (count, hash) — no RNG, no float
accumulation, reproducible under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import md5_long_col
from ..io import load_table
from ..registry import register


@register(
    "embedding_dim_stats",
    oracle="""
        WITH raw AS (
          SELECT unnest(list_transform(embedding,
                        (v, i) -> {'pos': i, 'val': v})) AS e
          FROM embeddings
        ),
        elems AS (
          SELECT CAST(e.pos - 1 AS INT) AS pos,
                 CAST(round(CAST(e.val AS DOUBLE) * 1000000.0, 0) AS BIGINT)
                   AS micro
          FROM raw
        )
        SELECT pos,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(micro) AS BIGINT) AS sum_micro,
               CAST(sum(micro * micro) AS BIGINT) AS sumsq_micro,
               CAST(min(micro) AS BIGINT) AS min_micro,
               CAST(max(micro) AS BIGINT) AS max_micro,
               CAST(count(*) FILTER (WHERE micro = 0) AS BIGINT) AS n_zero,
               CAST(sum(micro) AS DOUBLE) / count(*) AS mean_micro,
               (CAST(sum(micro * micro) AS DOUBLE) / count(*))
                 - (CAST(sum(micro) AS DOUBLE) / count(*))
                   * (CAST(sum(micro) AS DOUBLE) / count(*)) AS var_micro
        FROM elems
        GROUP BY pos
    """,
    doc="Per-dimension embedding health check: mean/variance/min/max and "
    "dead-dimension (exact-zero) counts for every embedding position — "
    "the drift-and-collapse diagnostic run before trusting an embedding "
    "column for dedup or ANN (a near-zero-variance dimension adds no "
    "signal but full storage cost; a drifted mean breaks cosine "
    "assumptions). Same micro-unit quantization as embedding_centroids: "
    "elements become integer micro-units, the power sums are exact "
    "BIGINTs (order-insensitive under any parallelism), and mean/"
    "variance are derived by one fixed division chain — so even the "
    "float outputs hash identically. One posexplode + one shuffle on "
    "dimension id. At 100 TB the micro² sums approach int64 range "
    "around 10^6 vectors per dimension ~O(1) magnitude — switch the "
    "power sums to DECIMAL(38,0) there.",
    tags=("embedding", "profile", "quality", "agg", "traindata"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    elems = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "val"))
        .select(
            F.col("pos").cast("int").alias("pos"),
            F.round(F.col("val").cast("double") * 1000000.0, 0)
            .cast("long")
            .alias("micro"),
        )
    )
    n = F.count(F.lit(1))
    s = F.sum("micro")
    ss = F.sum(F.col("micro") * F.col("micro"))
    mean = s.cast("double") / n
    return elems.groupBy("pos").agg(
        n.alias("n_vecs"),
        s.alias("sum_micro"),
        ss.alias("sumsq_micro"),
        F.min("micro").alias("min_micro"),
        F.max("micro").alias("max_micro"),
        F.count_if(F.col("micro") == 0).alias("n_zero"),
        mean.alias("mean_micro"),
        ((ss.cast("double") / n) - mean * mean).alias("var_micro"),
    )


@register(
    "sample_importance_weighted",
    oracle="""
        WITH per_source AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_s
          FROM documents GROUP BY source
        ),
        tot AS (
          SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
                 CAST(count(*) AS BIGINT) AS n_sources
          FROM per_source
        ),
        weighted AS (
          SELECT d.doc_id, d.source,
                 t.n_total AS num,
                 t.n_sources * s.n_s AS den,
                 ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::BIGINT
                   AS h
          FROM documents d
          JOIN per_source s USING (source)
          CROSS JOIN tot t
        )
        SELECT doc_id, source,
               CAST(num // den
                    + CASE WHEN h % den < num % den THEN 1 ELSE 0 END
                    AS BIGINT) AS n_copies
        FROM weighted
    """,
    doc="Deterministic importance resampling to a source-balanced "
    "mixture: each document's copy count is floor(w) plus one extra "
    "copy with probability frac(w), where w = N/(S·n_source) is the "
    "exact RATIONAL weight that equalizes source mass and the "
    "'probability' is resolved by comparing the doc's md5-derived hash "
    "residue against the weight's integer remainder — no RNG, no "
    "floats, so the resampled corpus is identical under any "
    "partitioning, retry, or engine (the corpus_split_assign hash "
    "contract). The up/down-sampling step that turns "
    "corpus_mixture_weights' analysis into an actual training corpus; "
    "one small aggregate broadcast back over one scan. Copy counts "
    "stay as counts (explode to physical rows only at shard-write "
    "time, corpus_to_shards_pipeline).",
    tags=("traindata", "sampling", "mixture", "deterministic"),
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # Materialize the source-cardinality counts once: consumed by the
    # totals row AND the broadcast join side, each of which re-scanned
    # documents to rebuild it (3 scans total, measured r17).
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s")
    ).localCheckpoint(eager=False)
    tot = per_source.agg(
        F.sum("n_s").alias("n_total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    num = F.col("n_total")
    den = F.col("n_sources") * F.col("n_s")
    h = md5_long_col(F.col("doc_id").cast("string"))
    return (
        docs.join(F.broadcast(per_source), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            num.alias("num"),
            den.alias("den"),
            h.alias("h"),
        )
        .select(
            "doc_id",
            "source",
            (
                F.expr("num div den")
                + F.when(
                    F.col("h") % F.col("den") < F.col("num") % F.col("den"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_copies"),
        )
    )
