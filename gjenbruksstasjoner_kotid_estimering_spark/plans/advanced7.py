"""Round-7 driver-round additions, wave 2: JSONL round-trip, normalized
exact dedup, time-interval rolling windows, and deterministic epoch
resampling.

Grounding: the LLM-training-data lane's remaining everyday surfaces —
JSONL is the interchange format every corpus pipeline reads and writes
(one document per line; schema-on-read), normalize-then-hash is the
dedup step that catches trivially re-encoded copies exact hashing
misses, time-interval rolling aggregates are the event-feature shape
(RANGE frames over real timestamps, not row counts), and fractional
per-source repetition factors are how data mixtures express "2.3
epochs of source X" without an RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir


# --- JSONL round-trip ---------------------------------------------------


@register(
    "scan_jsonl_roundtrip",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(('0x' || substring(md5(text), 1, 12))::BIGINT)
                    AS BIGINT) AS text_fp_sum
        FROM documents
        GROUP BY source
    """,
    doc="JSONL (one JSON document per line) round-trip: documents written "
    "with the JSON sink, read back with an EXPLICIT schema (schema "
    "inference costs a full extra pass at 100 TB — production always "
    "pins the schema), then summarized per source. text_fp_sum is an "
    "order-insensitive exact content fingerprint (sum of 48-bit md5 "
    "prefixes), so the oracle hash proves every document's TEXT "
    "survived JSON escaping bit-for-bit — not just the counts. JSONL "
    "is splittable by line, so the read parallelizes like parquet "
    "minus the column pruning; the row exists because it is the "
    "interchange format every corpus pipeline must ingest.",
    tags=("scan", "json", "roundtrip", "traindata"),
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = new_scratch_dir("jsonl_rt")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(scratch)
    back = spark.read.schema(docs.schema).json(scratch)
    out = back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.sum(
            F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("long")
        ).alias("text_fp_sum"),
    )
    return detach_result(out, scratch)


# --- normalize-then-hash exact dedup ------------------------------------


@register(
    "dedup_text_normalized",
    oracle="""
        WITH normed AS (
          SELECT doc_id,
                 md5(trim(regexp_replace(
                     regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                     ' +', ' ', 'g'))) AS norm_key
          FROM documents
        )
        SELECT CAST(min(doc_id) AS BIGINT) AS kept_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM normed
        GROUP BY norm_key
    """,
    doc="Normalize-then-hash exact dedup: lowercase, strip punctuation, "
    "collapse whitespace, THEN hash — the canonicalization pass that "
    "catches re-encoded/re-punctuated copies plain exact dedup misses "
    "(C4 and RefinedWeb both normalize before hashing). Keep-first = "
    "min(doc_id) per normalized key; output is (survivor, group size). "
    "One hash-shuffle on the 16-byte key — the same cost profile as "
    "dedup_exact, so normalization is free at 100 TB (it rides the "
    "map side).",
    tags=("dedup", "traindata"),
)
def dedup_text_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        docs.select("doc_id", F.md5(norm).alias("norm_key"))
        .groupBy("norm_key")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("norm_key")
    )


# --- time-interval rolling window ----------------------------------------


@register(
    "window_time_range_rolling",
    oracle="""
        SELECT event_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS rolling_cents,
               CAST(count(*) OVER w AS BIGINT) AS rolling_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    """,
    doc="Per-user rolling 1-HOUR aggregate via a RANGE frame over real "
    "event time (both bounds inclusive: [ts - 1h, ts]) — the "
    "time-interval frame that ROWS BETWEEN cannot express when event "
    "density varies. Spark's rangeBetween is numeric-only, so the "
    "plan orders by unix_micros(ts) with a -3.6e9 lower bound — "
    "identical semantics, and the window still parallelizes per user "
    "(one shuffle, no global sort). The standard trailing-feature "
    "shape for fraud/abuse scoring over a 100 TB event stream.",
    tags=("window", "timeseries"),
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.sum("cents").over(w).alias("rolling_cents"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
    )


# --- deterministic fractional epoch resampling ---------------------------


@register(
    "sample_repeat_epochs",
    oracle="""
        WITH planned AS (
          SELECT doc_id, source,
                 8 + (CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT)
                      % 12) AS f_eighths,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id)
                     AS rk
          FROM documents
        )
        SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
               CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy
        FROM (
          SELECT doc_id, source,
                 f_eighths // 8
                 + ((rk * (f_eighths % 8)) // 8
                    - ((rk - 1) * (f_eighths % 8)) // 8) AS n_copies
          FROM planned
        )
    """,
    doc="Deterministic FRACTIONAL repetition ('2.3 epochs of source X'): "
    "each source gets a repeat factor f = (8 + idx%12)/8 in [1.0, "
    "2.375]; every doc contributes floor(f) copies, and the extra "
    "copy is striped Bresenham-style by the doc's per-source rank "
    "(extra iff floor(rk*frac) increments), so the realized per-"
    "source mass is EXACTLY n*floor(f) + floor(n*frac) — always "
    "within one copy of n*f, with NO RNG (same doc, same copies, "
    "every run and every engine; md5-residue acceptance would only "
    "be binomially close). Expansion is explode(sequence(1, n)); the "
    "rank costs one per-source window that parallelizes across "
    "sources. How data-mixture weights become a physical dataset at "
    "100 TB.",
    tags=("sample", "traindata"),
)
def sample_repeat_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f_eighths = 8 + (
        F.regexp_extract("source", r"src(\d+)", 1).cast("long") % 12
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy("doc_id")
    ).cast("long")
    frac8 = f_eighths % 8
    n_copies = (
        F.floor(f_eighths / 8)
        + (F.floor(rk * frac8 / 8) - F.floor((rk - 1) * frac8 / 8))
    )
    planned = docs.select(
        "doc_id", "source", n_copies.cast("long").alias("n_copies")
    )
    return planned.select(
        "doc_id",
        "source",
        "n_copies",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
            "copy"
        ),
    )
