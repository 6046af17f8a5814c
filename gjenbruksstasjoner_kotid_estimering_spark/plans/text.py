"""Text-analysis plans (driver-mandated extension; functions/text.py is the
expression library). All built-ins — the 100 TB text lane never leaves the
JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..io import load_table
from ..registry import register


@register(
    "text_token_counts",
    oracle="""
        SELECT doc_id, lang,
               len(string_split_regex(text, '\\s+')) AS n_tokens,
               length(text) AS n_chars_computed,
               n_chars
        FROM documents
    """,
    doc="Whitespace token counting + char counts per document (BPE-ish "
    "regex variants planned; the reference has no text lane — this "
    "generalizes its scalar-signal extraction, preprocess_image.py:110-136).",
    tags=("text",),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        tx.token_count_col(F.col("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        "n_chars",
    )


@register(
    "text_quality",
    oracle=f"""
        WITH sig AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n_tok,
                 CASE WHEN len(string_split_regex(text, '\\s+')) > 0
                      THEN CAST(len(list_filter(string_split_regex(text, '\\s+'),
                               t -> list_contains({list(tx.STOPWORDS)!r}, t)))
                               AS DOUBLE)
                           / CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE)
                      ELSE 0.0 END AS stop_ratio,
                 CASE WHEN length(text) > 0
                      THEN CAST(length(text) - length(regexp_replace(text,
                               '[^\\w\\s]', '', 'g')) AS DOUBLE)
                           / CAST(length(text) AS DOUBLE)
                      ELSE 0.0 END AS punct_ratio
          FROM documents
        )
        SELECT doc_id, stop_ratio, punct_ratio,
               (LEAST(n_tok / 64.0, 1.0)
                + LEAST(stop_ratio * 4.0, 1.0)
                + GREATEST(1.0 - punct_ratio * 4.0, 0.0)) / 3.0 AS quality
        FROM sig
    """,
    doc="Composite quality score: length / stopword-ratio / punctuation "
    "signals, deterministic arithmetic (functions/text.quality_score_col).",
    tags=("text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.stopword_ratio_col(F.col("text")).alias("stop_ratio"),
        tx.punct_ratio_col(F.col("text")).alias("punct_ratio"),
        tx.quality_score_col(F.col("text")).alias("quality"),
    )


@register(
    "text_lang_agg",
    oracle="""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY lang, source
    """,
    doc="Corpus composition rollup per (lang, source) — the bookkeeping "
    "query every training-data pipeline runs before sampling.",
    tags=("text", "agg"),
)
def text_lang_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
