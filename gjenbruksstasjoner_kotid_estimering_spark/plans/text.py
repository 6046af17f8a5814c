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


# Tiny per-language stopword lexicons for the langid heuristic.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "et", "est"),
}


def _langid_oracle() -> str:
    hit_cols = ",\n                 ".join(
        f"len(list_filter(string_split_regex(text, '\\s+'), "
        f"t -> list_contains({list(words)!r}, t))) AS hits_{lang}"
        for lang, words in LANG_LEXICONS.items()
    )
    langs = list(LANG_LEXICONS)
    # first-max with fixed priority order (en > es > de > fr)
    cond = "CASE "
    for i, lang in enumerate(langs):
        others = [f"hits_{lang} >= hits_{o}" for o in langs[i + 1 :]]
        clause = " AND ".join(others) if others else "TRUE"
        cond += f"WHEN {clause} THEN '{lang}' "
    cond += "END"
    return f"""
        WITH sig AS (
          SELECT doc_id,
                 {hit_cols}
          FROM documents
        )
        SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
               {cond} AS predicted_lang
        FROM sig
    """


@register(
    "text_langid",
    oracle=_langid_oracle(),
    doc="Language-ID heuristic: stopword-hit voting over tiny per-language "
    "lexicons, argmax with fixed priority tie-break — the n-gram-lite "
    "langid stage of a corpus pipeline, fully JVM-side.",
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens_col(F.col("text"))
    df = d.select("doc_id", toks.alias("_toks"))

    def hits(words: tuple[str, ...]):
        # single-arg lambda: a 2-arg lambda would be read as (element, index)
        return F.size(F.filter(F.col("_toks"), lambda t: t.isin(*words)))

    for lang, words in LANG_LEXICONS.items():
        df = df.withColumn(f"hits_{lang}", hits(words))
    langs = list(LANG_LEXICONS)
    expr = None
    for i, lang in enumerate(langs):
        conds = [
            F.col(f"hits_{lang}") >= F.col(f"hits_{o}") for o in langs[i + 1 :]
        ]
        cond = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            cond = cond & c
        expr = (
            F.when(cond, F.lit(lang))
            if expr is None
            else expr.when(cond, F.lit(lang))
        )
    return df.select(
        "doc_id",
        "hits_en",
        "hits_es",
        "hits_de",
        "hits_fr",
        expr.alias("predicted_lang"),
    )


# GPT-2-ish coarse token classes: letter runs, digit runs, punctuation runs.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


@register(
    "text_bpe_tokens",
    oracle=f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))
                    AS BIGINT) AS n_bpe_tokens,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                 AS n_ws_tokens
        FROM documents
    """,
    doc="BPE-ish token counting: letter/digit/punctuation-run classes via "
    "regexp_count (the pre-tokenizer pass of a BPE pipeline), alongside the "
    "whitespace count — both JVM-side regex, no Python.",
    tags=("text", "tokens"),
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_ISH_PATTERN)).cast("long").alias(
            "n_bpe_tokens"
        ),
        tx.token_count_col(F.col("text")).alias("n_ws_tokens"),
    )


@register(
    "posexplode_tokens",
    oracle="""
        WITH expanded AS (
          SELECT doc_id,
                 unnest(list_transform(string_split(text, ' '),
                        (x, i) -> struct_pack(pos := i, tok := x))) AS u
          FROM documents WHERE doc_id < 30
        )
        SELECT doc_id, CAST(u.pos - 1 AS INT) AS pos, u.tok AS token
        FROM expanded
    """,
    doc="posexplode: token stream with ordinal positions (0-based like "
    "Spark's posexplode; the oracle's lambda index is 1-based) — the "
    "position-aware fanout sequence models need for positional features.",
    tags=("explode", "text"),
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    )


@register(
    "regex_extract_all_tokens",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS INT)
                 AS n_a_words,
               array_to_string(regexp_extract_all(text, '[a-z]*a[a-z]*')[1:5],
                               ',') AS first_a_words
        FROM documents
    """,
    doc="regexp_extract_all: every match materialized as an array (count + "
    "canonical joined head) — the multi-match sibling of regexp_extract "
    "(reference estimate_queue.py:38 extracts single groups).",
    tags=("string", "regex"),
)
def regex_extract_all_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    matches = F.regexp_extract_all("text", F.lit("[a-z]*a[a-z]*"), 0)
    return d.select(
        "doc_id",
        F.size(matches).alias("n_a_words"),
        F.array_join(F.slice(matches, 1, 5), ",").alias("first_a_words"),
    )
