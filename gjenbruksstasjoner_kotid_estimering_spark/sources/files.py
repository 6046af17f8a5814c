"""CSV / JSON-lines / text file sources (SURVEY.md §2 "CSV/text scan").

The testdata ships parquet only, so these are exercised by round-trip
pytest smoke (tests/test_sources.py) rather than a registry query. Schemas
are explicit — at 100 TB schema inference is an extra full pass over the
data; never let the reader infer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """One row per line, column ``value: string``."""
    return spark.read.text(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


# --- round-5: XML + ORC round-trip registry rows -----------------------

def _nation_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..io import load_table

    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        (F.round(F.col("s_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
    )


_ROUNDTRIP_ORACLE = """
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS acctbal_cents
    FROM supplier
    GROUP BY s_nationkey
"""


def _register_roundtrip(
    name: str,
    fmt: str,
    read_opts: dict,
    write_opts: dict,
    doc: str,
    read_schema: str | None = None,
):
    from pyspark.sql import functions as F

    from ..registry import register
    from ..scratch import detach_result, new_scratch_dir

    @register(name, oracle=_ROUNDTRIP_ORACLE, doc=doc, tags=("source", fmt, "sink"))
    def roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        import os

        out = new_scratch_dir(f"{fmt}_{os.path.basename(sf_dir.rstrip('/'))}")
        path = os.path.join(out, "t")
        w = _nation_proj(spark, sf_dir).write.format(fmt)
        for k, v in write_opts.items():
            w = w.option(k, v)
        w.save(path)
        r = spark.read.format(fmt)
        if read_schema is not None:
            # explicit schema: at 100 TB inference is an extra full pass
            r = r.schema(read_schema)
        for k, v in read_opts.items():
            r = r.option(k, v)
        back = r.load(path)
        agg = back.groupBy("s_nationkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("acctbal_cents").cast("long").alias("acctbal_cents"),
        )
        return detach_result(agg, out)

    return roundtrip


scan_xml_roundtrip = _register_roundtrip(
    "scan_xml_roundtrip",
    "xml",
    read_opts={"rowTag": "supplier"},
    write_opts={"rootTag": "suppliers", "rowTag": "supplier"},
    doc="Native XML source/sink (Spark 4 built-in, from spark-xml): the "
    "supplier projection writes as element-per-row XML and reads back "
    "with rowTag schema inference, then aggregates to the oracle's "
    "answer — a lossless round-trip through the one text format "
    "enterprise feeds still arrive in. Hermetic scratch; result "
    "detached. At scale XML is an INGEST format (parsed once, stored "
    "columnar), which is exactly the shape here.",
)

scan_orc_roundtrip = _register_roundtrip(
    "scan_orc_roundtrip",
    "orc",
    read_opts={},
    write_opts={},
    doc="ORC source/sink round-trip: the other columnar format Spark "
    "ships (zlib-compressed, predicate-pushdown-capable like parquet); "
    "the supplier projection writes/reads/aggregates hash-exact against "
    "the oracle. Proves the engine is not parquet-monogamous — a "
    "migration from an ORC warehouse reads natively.",
)

scan_csv_roundtrip = _register_roundtrip(
    "scan_csv_roundtrip",
    "csv",
    read_opts={"header": "true", "mode": "FAILFAST"},
    write_opts={"header": "true"},
    read_schema="s_suppkey bigint, s_nationkey bigint, acctbal_cents bigint",
    doc="CSV source/sink round-trip with an EXPLICIT read schema (never "
    "infer — at 100 TB inference is a second full pass over the data) "
    "and FAILFAST mode (a malformed row should abort the load, not "
    "silently null out): the supplier projection writes header'd CSV, "
    "reads back typed, and aggregates hash-exact against the oracle. "
    "Integer-cents columns make the text round-trip lossless — the "
    "format every legacy feed still arrives in.",
)
