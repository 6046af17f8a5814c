"""Python UDTF (table function) surface — SURVEY.md §2 "UDTF (explode-like)".

``explode``/``stack`` cover the declarative one-row-to-many shape
(plans/windows.explode_unpivot); a *Python* UDTF is the escape hatch when
row expansion needs imperative logic. Demonstrated here with positional
bigram emission; the identical result is stated relationally for the
oracle, so even the Python-UDTF path is hash-checked.

Python UDTFs execute row-at-a-time in the Python worker — strictly the
slow path; use explode/transform when the expansion is expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..io import load_table
from ..registry import register


@udtf(returnType="doc_id: long, pos: int, bigram: string")
class BigramEmitter:
    """Yield (doc_id, position, bigram) per adjacent token pair."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        toks = text.split(" ") if text else []
        for i in range(len(toks) - 1):
            yield doc_id, i + 1, f"{toks[i]} {toks[i + 1]}"


@register(
    "udtf_bigrams",
    oracle="""
        WITH expanded AS (
          SELECT doc_id,
                 unnest(list_filter(
                   list_transform(string_split(text, ' '),
                     (x, i) -> CASE WHEN i < len(string_split(text, ' '))
                       THEN struct_pack(pos := i,
                                        bigram := x || ' ' ||
                                                  string_split(text, ' ')[i + 1])
                       END),
                   y -> y IS NOT NULL)) AS u
          FROM documents WHERE doc_id < 50
        )
        SELECT doc_id, CAST(u.pos AS INT) AS pos, u.bigram FROM expanded
    """,
    doc="Python UDTF emitting positional bigrams (doc_id, pos, bigram) for "
    "the first 50 docs — the imperative row-expansion surface, still "
    "oracle-checked against the equivalent relational expansion.",
    tags=("udtf", "text"),
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.lateralJoin(
        BigramEmitter(F.col("doc_id").outer(), F.col("text").outer())
    ).select(d.doc_id, "pos", "bigram")
