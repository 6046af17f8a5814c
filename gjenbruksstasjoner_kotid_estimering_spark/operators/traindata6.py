"""Round-8 wave B — tokenizer-training and corpus-statistics additions
to the LLM-data lane: a full iterative BPE merge-training loop, an
integer-exact positive-PMI collocation scan, and the mapInArrow batch
surface.

Grounding: ``bpe_pair_stats`` (traindata3.py) covers the inner loop of
BPE training — ONE pair-count pass. This wave adds the actual training
loop (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units"): N rounds of count-pairs → merge-best → re-segment.
The Spark-first shape: the corpus-sized work is the distributed word-
frequency aggregate (one shuffle over the full 100 TB corpus); the
iterations then run over the *vocabulary* table, which is bounded (a
few hundred thousand rows for any real corpus) — exactly how production
tokenizer trainers (HuggingFace, SentencePiece on Spark) structure it.
The PMI scan is the collocation-mining counterpart: instead of log-PMI
(libm drift breaks value-hash oracles), the sign test uses exact
integer cross-multiplication: pmi > 0  ⇔  c_xy·M² > c_x·c_y·N.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import tokens_col
from ..io import fan_out, load_table
from ..registry import register

# --- BPE merge training ----------------------------------------------------

N_MERGES = 16
EOW = "</w>"  # end-of-word sentinel so merges can't cross word boundaries
# The driver-side training table is the DEDUPLICATED word-frequency list,
# bounded by vocabulary size (not corpus size) — a few 100k entries for
# any natural-language corpus. The cap turns a silent driver-OOM risk
# into a loud failure if the corpus ever stops being word-like.
VOCAB_CAP = 200_000


def _merge_rep(rep: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Apply one merge to a word's symbol sequence, greedy left-to-right
    (the standard BPE convention for overlapping occurrences)."""
    out: list[str] = []
    i = 0
    while i < len(rep):
        if i < len(rep) - 1 and (rep[i], rep[i + 1]) == pair:
            out.append(rep[i] + rep[i + 1])
            i += 2
        else:
            out.append(rep[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Deterministic BPE training over a word-frequency table.

    Each round counts adjacent symbol pairs (weighted by word frequency),
    merges the most frequent pair — ties broken by lexicographically
    smallest (left, right) — and re-segments. Returns
    (rank, left, right, merged, pair_count) per merge.
    """
    reps = {w: tuple(w) + (EOW,) for w in word_freqs}
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, freq in word_freqs.items():
            rep = reps[w]
            for i in range(len(rep) - 1):
                p = (rep[i], rep[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best_n = max(counts.values())
        left, right = min(p for p, c in counts.items() if c == best_n)
        merges.append((rank, left, right, left + right, best_n))
        reps = {w: _merge_rep(r, (left, right)) for w, r in reps.items()}
    return merges


@register(
    "bpe_train_merges",
    oracle=None,  # iterative fixpoint — not SQL-expressible; pytest
    # (tests/test_traindata6.py) proves equivalence against an
    # independent re-count-from-the-raw-token-stream implementation
    doc="Full BPE tokenizer training (Sennrich 2016): N=16 rounds of "
    "count-adjacent-symbol-pairs → merge the most frequent (ties: "
    "lexicographically smallest pair) → re-segment, over char-initial "
    "word representations with an end-of-word sentinel. Scale shape: "
    "the CORPUS-sized pass is one distributed word-frequency "
    "aggregate (map-side combining, one shuffle); training then runs "
    "on the deduplicated vocabulary table, which is bounded by "
    "|vocab| — not corpus size — and guarded by an explicit cap, the "
    "same two-phase structure production tokenizer trainers use. "
    "Output is the ranked merge table a tokenizer ships as its "
    "merges.txt. The chosen pair count is provably non-increasing "
    "across ranks (a new pair's occurrences are bounded by the "
    "occurrences of the merge that created its symbol) — pinned in "
    "pytest alongside the independent-implementation equivalence.",
    tags=("text", "bpe", "tokenizer", "traindata"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = wf.collect()  # bounded: |vocab| rows, capped below
    if len(rows) > VOCAB_CAP:
        raise ValueError(
            f"word-frequency table has {len(rows)} entries — exceeds the "
            f"{VOCAB_CAP} driver-side training cap; corpus is not word-like"
        )
    merges = bpe_train({r["w"]: r["n"] for r in rows}, N_MERGES)
    schema = StructType(
        [
            StructField("rank", LongType()),
            StructField("left", StringType()),
            StructField("right", StringType()),
            StructField("merged", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(merges, schema)


# --- positive-PMI collocations ---------------------------------------------

TOP_COLLOCATIONS = 50


@register(
    "text_pmi_positive_pairs",
    oracle=f"""
        WITH toks AS (
          SELECT CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t
          FROM documents
        ),
        uni AS (
          SELECT w, CAST(count(*) AS BIGINT) AS cu
          FROM (SELECT unnest(t) AS w FROM toks)
          WHERE w != ''
          GROUP BY w
        ),
        big AS (
          SELECT pair[1] AS lw, pair[2] AS rw,
                 CAST(count(*) AS BIGINT) AS cp
          FROM (
            SELECT unnest(list_filter(
                     list_transform(t,
                       (x, i) -> CASE WHEN i < len(t)
                                 THEN [x, t[i + 1]] END),
                     y -> y IS NOT NULL)) AS pair
            FROM toks
          )
          GROUP BY 1, 2
        ),
        tot AS (
          SELECT CAST((SELECT sum(cu) FROM uni) AS BIGINT) AS m,
                 CAST((SELECT sum(cp) FROM big) AS BIGINT) AS n
        )
        SELECT big.lw || ' ' || big.rw AS pair,
               big.cp AS c_pair, ul.cu AS c_left, ur.cu AS c_right,
               big.cp * tot.m * tot.m > ul.cu * ur.cu * tot.n
                   AS positive_pmi
        FROM big
        JOIN uni ul ON big.lw = ul.w
        JOIN uni ur ON big.rw = ur.w
        CROSS JOIN tot
        ORDER BY big.cp DESC, pair
        LIMIT {TOP_COLLOCATIONS}
    """,
    doc="Collocation mining by PMI sign, integer-exact: for each "
    "adjacent word pair, pmi > 0  ⇔  P(xy) > P(x)P(y)  ⇔  "
    "c_xy·M² > c_x·c_y·N (M = total tokens, N = total pairs) — the "
    "cross-multiplied form needs no logarithm, so the result is "
    "bit-identical across engines where log-PMI would drift in the "
    "last ulp and break the value-hash gate. Shape: one unigram "
    "shuffle, one bigram shuffle, vocabulary-sized broadcast joins "
    "for the marginals, scalar totals via a broadcast one-row frame, "
    "TakeOrdered top-50. The quality-signal use: positive-PMI pairs "
    "are real collocations; a corpus whose top pairs are NEGATIVE "
    "PMI is shuffled/garbled text — a training-data gate upstream "
    "of tokenizer work.",
    tags=("text", "pmi", "collocation", "traindata"),
)
def text_pmi_positive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("lw"),
                F.element_at(toks, i + 2).alias("rw"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lw:string,rw:string>>"))

    uni = (
        docs.select(F.explode(toks).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    big = (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.lw").alias("lw"), F.col("p.rw").alias("rw"))
        .groupBy("lw", "rw")
        .agg(F.count(F.lit(1)).cast("long").alias("cp"))
    )
    # Materialize both count relations ONCE: uni feeds three consumers
    # (the m total, ul, ur) and big two (the n total, the probe side) —
    # without this each consumer re-runs the full-corpus tokenize +
    # explode + groupBy from lineage (up to five corpus passes for one
    # query). The checkpointed relations are the DISTINCT unigram /
    # bigram tables — vocabulary-sized, orders of magnitude smaller than
    # re-tokenizing the corpus at any scale where PMI mining is sane.
    uni = uni.localCheckpoint(eager=True)
    big = big.localCheckpoint(eager=True)
    tot = (
        uni.agg(F.sum("cu").cast("long").alias("m"))
        .crossJoin(big.agg(F.sum("cp").cast("long").alias("n")))
    )
    ul = uni.select(F.col("w").alias("lw"), F.col("cu").alias("c_left"))
    ur = uni.select(F.col("w").alias("rw"), F.col("cu").alias("c_right"))
    return (
        big.join(F.broadcast(ul), "lw")
        .join(F.broadcast(ur), "rw")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "lw", "rw").alias("pair"),
            F.col("cp").alias("c_pair"),
            "c_left",
            "c_right",
            (
                F.col("cp") * F.col("m") * F.col("m")
                > F.col("c_left") * F.col("c_right") * F.col("n")
            ).alias("positive_pmi"),
        )
        .orderBy(F.col("c_pair").desc(), "pair")
        .limit(TOP_COLLOCATIONS)
    )


# --- mapInArrow ------------------------------------------------------------


def _arrow_doc_stats(batches: "Iterator") -> "Iterator":
    """Arrow-native per-batch transform: every output column is computed
    by pyarrow.compute kernels on the RecordBatch — no per-row Python,
    no pandas conversion. This is the zero-copy fast path under
    mapInPandas (which round-trips through pandas objects)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column(batch.schema.get_field_index("text"))
        doc_id = batch.column(batch.schema.get_field_index("doc_id"))
        yield pa.RecordBatch.from_arrays(
            [
                doc_id,
                pc.cast(pc.utf8_length(text), pa.int64()),
                pc.cast(
                    pc.list_value_length(pc.split_pattern(text, " ")),
                    pa.int64(),
                ),
                pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 16)),
            ],
            names=["doc_id", "n_chars", "n_tokens", "prefix_upper"],
        )


@register(
    "udf_map_in_arrow",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               upper(substr(text, 1, 16)) AS prefix_upper
        FROM documents
    """,
    doc="mapInArrow — the remaining Python batch surface (udf_arrow_scalar "
    "covers the row API, mapInPandas the pandas batch API): the "
    "transform receives raw pyarrow RecordBatches and computes every "
    "output column with Arrow compute kernels (utf8_length, "
    "split_pattern + list_value_length, utf8_upper/slice) — zero "
    "per-row Python AND zero pandas materialization, the cheapest "
    "possible Python-side hop for columnar feature extraction at "
    "100 TB. Single-space split (not \\\\s+) keeps the token count "
    "bit-aligned with the oracle's string_split across both engines. "
    "Plan pinned to a single Arrow exchange in "
    "tests/test_traindata6.py.",
    tags=("udf", "arrow", "batch"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        keys=["doc_id"],
    )
    return docs.mapInArrow(
        _arrow_doc_stats,
        "doc_id long, n_chars long, n_tokens long, prefix_upper string",
    )
