"""TRUE-streaming JSONL corpus ingestion.

The batch twin (plans/advanced7.scan_jsonl_roundtrip) proves the JSONL
format round-trips; this row proves the STREAMING ingest path: the
corpus arrives as a directory of JSONL files consumed one file per
micro-batch (the adversarial multi-batch packing from the soak-test
convention), a running per-source aggregate is maintained across
batches in COMPLETE mode, and the drained final table must hash-match
the batch oracle — i.e., incremental ingestion converges to exactly
the all-at-once answer. Grounding: the reference's pipeline is
incremental by construction (one image per task invocation,
tasks.py:32-41); this is the same contract for corpus feeds.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import new_scratch_dir
from .windows import _drain_to_memory

N_FEED_FILES = 4


@register(
    "stream_jsonl_ingest_true",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(('0x' || substring(md5(text), 1, 12))::BIGINT)
                    AS BIGINT) AS text_fp_sum
        FROM documents
        GROUP BY source
    """,
    doc="TRUE streaming JSONL ingestion, oracle-checked: documents are "
    "written as FOUR JSONL files, readStream consumes them with "
    "maxFilesPerTrigger=1 (four real micro-batches, not one lucky "
    "drain), and a per-source aggregate (count, char sum, 48-bit-md5 "
    "content fingerprint sum) accumulates across batches in COMPLETE "
    "mode. The drained final table must value-hash-match the batch "
    "oracle over the original parquet — incremental ingestion "
    "converges to the all-at-once answer, and every document's text "
    "survived JSON escaping bit-for-bit through the streaming path "
    "too. Unbounded-state note: per-source aggregates are "
    "key-space-bounded (20 sources), the shape COMPLETE mode is "
    "actually safe for at scale.",
    tags=("streaming", "scan", "json", "traindata"),
)
def stream_jsonl_ingest_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = new_scratch_dir("jsonl_stream")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(N_FEED_FILES).write.mode("overwrite").json(scratch)
    try:
        feed = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .json(scratch)
        )
        agg = feed.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
            F.sum(
                F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast(
                    "long"
                )
            ).alias("text_fp_sum"),
        )
        # _drain_to_memory detaches the drained rows (eager
        # localCheckpoint), so the feed dir can be deleted right after
        return _drain_to_memory(agg, "jsonl_ingest", sf_dir, "complete")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
