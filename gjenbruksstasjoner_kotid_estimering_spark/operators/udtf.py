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


N_SPLIT_COLS = 4


@udtf
class TokenColumnsEmitter:
    """POLYMORPHIC UDTF (Spark 4 ``analyze``): output schema computed at
    plan time from the call's literal argument — here the first
    ``n_cols`` tokens widen into columns ``tok0..tok{n-1}`` plus an
    overflow count. The analyze/AnalyzeResult contract is what lets one
    table function serve any width without a fixed returnType."""

    @staticmethod
    def analyze(doc_id, text, n_cols):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructType,
        )

        if not n_cols.isConstantExpression:
            raise ValueError("n_cols must be a literal")
        n = int(n_cols.value)
        schema = StructType().add("doc_id", LongType())
        for i in range(n):
            schema = schema.add(f"tok{i}", StringType())
        schema = schema.add("n_overflow", IntegerType())
        return AnalyzeResult(schema=schema)

    def eval(self, doc_id: int, text: str, n_cols: int):  # noqa: D102
        toks = text.split(" ") if text else []
        head = toks[:n_cols] + [None] * (n_cols - len(toks))
        yield (doc_id, *head, max(0, len(toks) - n_cols))


def _split_oracle(n: int) -> str:
    tok_cols = ",\n               ".join(
        f"CASE WHEN len(t) >= {i + 1} THEN t[{i + 1}] END AS tok{i}"
        for i in range(n)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split(text, ' ') END AS t
          FROM documents WHERE doc_id < 50
        )
        SELECT doc_id,
               {tok_cols},
               CAST(greatest(len(t) - {n}, 0) AS INT) AS n_overflow
        FROM toks
    """


@register(
    "udtf_polymorphic_split",
    oracle=_split_oracle(N_SPLIT_COLS),
    doc="Polymorphic Python UDTF (Spark 4 analyze()): the output schema "
    "— tok0..tok3 + overflow count — is DERIVED at plan time from the "
    "literal width argument via the AnalyzeResult contract, so one "
    "table function serves any width. Hash-checked against the "
    "relational equivalent; the analyze path (constant-argument "
    "introspection, dynamic StructType) is the part a fixed-returnType "
    "UDTF cannot express.",
    tags=("udtf", "polymorphic", "text"),
)
def udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.lateralJoin(
        TokenColumnsEmitter(
            F.col("doc_id").outer(), F.col("text").outer(), F.lit(N_SPLIT_COLS)
        )
    ).select(
        d.doc_id,
        *[f"tok{i}" for i in range(N_SPLIT_COLS)],
        "n_overflow",
    )
