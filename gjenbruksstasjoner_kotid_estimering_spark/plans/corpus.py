"""Corpus-preparation pipeline — the LLM-training-data composite.

One declarative plan chaining the extension operators end-to-end over
``documents``: quality scoring → quality gate → language-ID → exact dedup
(representative per duplicate text) → token statistics → per-(predicted
lang, source) corpus rollup. This is the second flagship (the first being
the queue estimator): it demonstrates that the individual operators
compose into the pipeline a 100 TB corpus actually runs, still
oracle-exact end to end.

Plan shape: one scan of documents; the dedup groupBy is the only wide
dependency before the final rollup (2 shuffles total); everything else is
projection-chained inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..io import load_table
from ..registry import register
from .text import LANG_LEXICONS

QUALITY_GATE = 0.5


def _langcase_sql() -> str:
    hit = lambda words: (  # noqa: E731
        f"len(list_filter(string_split_regex(text, '\\s+'), "
        f"t -> list_contains({list(words)!r}, t)))"
    )
    langs = list(LANG_LEXICONS)
    cond = "CASE "
    for i, lang in enumerate(langs):
        others = [
            f"{hit(LANG_LEXICONS[lang])} >= {hit(LANG_LEXICONS[o])}"
            for o in langs[i + 1 :]
        ]
        clause = " AND ".join(others) if others else "TRUE"
        cond += f"WHEN {clause} THEN '{lang}' "
    return cond + "END"


def _langid_expr(df: DataFrame) -> DataFrame:
    toks = tx.tokens_col(F.col("text"))

    def hits(words: tuple[str, ...]):
        # single-arg lambda: a 2-arg lambda is read as (element, index)
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    for lang, words in LANG_LEXICONS.items():
        df = df.withColumn(f"_hits_{lang}", hits(tuple(words)))
    langs = list(LANG_LEXICONS)
    expr = None
    for i, lang in enumerate(langs):
        conds = [F.col(f"_hits_{lang}") >= F.col(f"_hits_{o}") for o in langs[i + 1 :]]
        cond = F.lit(True)
        for c in conds:
            cond = cond & c
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
    return df.withColumn("predicted_lang", expr)


@register(
    "corpus_prep_pipeline",
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, source, text,
                 len(string_split_regex(text, '\\s+')) AS n_tokens,
                 (LEAST(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE)
                        / 64.0, 1.0)
                  + LEAST(
                      CASE WHEN len(string_split_regex(text, '\\s+')) > 0
                           THEN CAST(len(list_filter(
                                    string_split_regex(text, '\\s+'),
                                    t -> list_contains({list(tx.STOPWORDS)!r}, t)))
                                    AS DOUBLE)
                                / CAST(len(string_split_regex(text, '\\s+'))
                                       AS DOUBLE)
                           ELSE 0.0 END * 4.0, 1.0)
                  + GREATEST(1.0 -
                      CASE WHEN length(text) > 0
                           THEN CAST(length(text) - length(regexp_replace(text,
                                    '[^\\w\\s]', '', 'g')) AS DOUBLE)
                                / CAST(length(text) AS DOUBLE)
                           ELSE 0.0 END * 4.0, 0.0)) / 3.0 AS quality
          FROM documents
        ),
        gated AS (SELECT * FROM scored WHERE quality > {QUALITY_GATE!r}),
        langed AS (
          SELECT *,
            {_langcase_sql()} AS predicted_lang
          FROM gated
        ),
        deduped AS (
          SELECT min(doc_id) AS doc_id, text,
                 min(predicted_lang) AS predicted_lang,
                 min(source) AS source,
                 min(n_tokens) AS n_tokens,
                 count(*) AS n_copies
          FROM langed GROUP BY text
        )
        SELECT predicted_lang, source,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               min(n_tokens) AS min_tokens,
               max(n_tokens) AS max_tokens,
               CAST(sum(n_copies) AS BIGINT) AS n_docs_pre_dedup
        FROM deduped
        GROUP BY predicted_lang, source
    """,
    doc="Second flagship: the corpus-prep composite (quality gate → langid "
    "→ exact dedup keeping min doc_id per text → token stats → "
    "per-(predicted lang, source) rollup), one scan + 2 shuffles, "
    "oracle-exact end to end.",
    tags=("flagship", "text", "pipeline"),
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "text",
        tx.token_count_col(F.col("text")).alias("n_tokens"),
        tx.quality_score_col(F.col("text")).alias("quality"),
    )
    gated = scored.where(F.col("quality") > QUALITY_GATE)
    langed = _langid_expr(gated)
    deduped = langed.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("predicted_lang").alias("predicted_lang"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return deduped.groupBy("predicted_lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_copies").alias("n_docs_pre_dedup"),
    )
