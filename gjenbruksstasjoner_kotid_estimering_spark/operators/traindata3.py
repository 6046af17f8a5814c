"""Training-data pipeline operators, round 4.

Two corpus-curation stages rounds 1-3 didn't cover, both oracle-checked:

- ``bpe_pair_stats``: the inner loop of BPE tokenizer training — count
  every ADJACENT token pair across the corpus (occurrences, not distinct
  per doc: BPE merges by total frequency) and return the top pairs. The
  plan is the ideal aggregation shape: per-doc pair generation is a pure
  columnar transform (no shuffle), the count is a partial-aggregated
  groupBy, and the top-k is Spark's TakeOrdered (per-partition heads,
  O(k) merge on the driver) — no global sort, no single-partition
  window. At 100 TB this is exactly how a tokenizer-training pair scan
  should look: one shuffle, vocabulary-sized state.

- ``dedup_containment_rare_shingle``: asymmetric containment dedup
  (|A∩B| / |A|) — catches subset-duplicates (a doc embedded inside a
  longer one) that symmetric Jaccard under-scores. Candidate generation
  blocks on each document's K RAREST shingles (min document-frequency,
  shingle as tie-break) with df in [2, RARE_DF_CAP]: df=1 keys can
  match nothing and are dropped before the join (most of the exploded
  volume at scale), df>cap keys are boilerplate, and K>1 matters
  because a near-dup's single rarest shingle usually lies in the part
  that DIFFERS — blocking must tolerate that. Block sizes stay bounded
  by RARE_DF_CAP, so the pair join is candidate-driven like the LSH
  lanes, never all-pairs. Verification computes exact containment via
  array_intersect on the candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..io import fan_out, load_table
from ..registry import register
from .dedup import SHINGLE_K, shingles_col

TOP_PAIRS = 50
# Opaque-container frame geometry for the multimodal sampling lane: fixed
# 32-byte frames, every 4th sampled. Real video parsing plugs a demuxer
# into the same plan shape; the fixed-size-frame container keeps the
# derivation byte-exact on both engines.
FRAME_BYTES = 32
FRAME_STRIDE = 4
# A "rarest shingle" with document frequency above this cap is not a rare
# signature at all (the doc is made of boilerplate); such docs leave the
# candidate set. The cap simultaneously bounds every block's size: a
# blocking key matches at most RARE_DF_CAP documents, so per-block pair
# fan-out is ≤ cap·(cap-1)/2 regardless of corpus size.
RARE_DF_CAP = 10
# Rare keys elected per doc. One is not enough: for a true near-dup pair
# the single rarest shingle of each side is usually df=1 content from the
# DIFFERING span, so the shared-rare-shingle signal only appears a few
# ranks down.
RARE_KEYS_PER_DOC = 3
CONTAINMENT_MIN = 0.5


@register(
    "bpe_pair_stats",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t
          FROM documents
        ),
        pairs AS (
          SELECT unnest(list_filter(
                   list_transform(t,
                     (x, i) -> CASE WHEN i < len(t)
                               THEN x || ' ' || t[i + 1] END),
                   y -> y IS NOT NULL)) AS pair
          FROM toks
        )
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM pairs
        GROUP BY pair
        ORDER BY n DESC, pair
        LIMIT {TOP_PAIRS}
    """,
    doc="BPE tokenizer-training pair scan: every adjacent token pair in "
    "the corpus (all occurrences — BPE merges on total frequency), "
    "counted and ranked; top-50 by (count DESC, pair ASC) for a "
    "deterministic result. Pair generation is a per-row array transform "
    "(zero shuffle), the count partial-aggregates map-side, and the "
    "bounded result uses sort+limit = TakeOrdered, not a global sort — "
    "the one-shuffle shape a 100 TB tokenizer-training scan needs. "
    "Tokenizer contract shared with the winnowing/decontamination lanes "
    "(guarded \\s+ split).",
    tags=("text", "tokens", "bpe", "agg"),
)
def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    adjacent = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(adjacent).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(TOP_PAIRS)
    )


@register(
    "dedup_containment_rare_shingle",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(t) >= {SHINGLE_K}
                      THEN list_distinct(list_filter(
                        list_transform(t,
                          (x, i) -> CASE WHEN i + {SHINGLE_K - 1} <= len(t)
                                    THEN x || ' ' || t[i + 1]
                                         || ' ' || t[i + 2] END),
                        y -> y IS NOT NULL))
                      ELSE [] END AS s
          FROM toks
        ),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        df AS (SELECT g, count(*) AS df FROM ex GROUP BY g),
        rare AS (
          SELECT doc_id, g, df,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY df, g) AS rn
          FROM ex JOIN df USING (g)
          WHERE df >= 2
        ),
        keys AS (SELECT doc_id, g FROM rare
                 WHERE rn <= {RARE_KEYS_PER_DOC} AND df <= {RARE_DF_CAP}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM keys a JOIN keys b ON a.g = b.g AND a.doc_id < b.doc_id
        ),
        scored AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_shared,
                 CAST(len(sa.s) AS BIGINT) AS n_a,
                 CAST(len(sb.s) AS BIGINT) AS n_b
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b, n_shared, n_a, n_b,
               CAST(n_shared AS DOUBLE) / least(n_a, n_b) AS containment
        FROM scored
        WHERE CAST(n_shared AS DOUBLE) / least(n_a, n_b)
              >= {CONTAINMENT_MIN}
    """,
    doc="Asymmetric containment dedup (|A∩B| / min(|A|,|B|) — the "
    "smaller side is the candidate contained doc, independent of id "
    "order): candidates block on each doc's "
    "RAREST shingle (min document-frequency, shingle tie-break; docs "
    f"whose rarest shingle has df > {RARE_DF_CAP} carry no rare "
    "signature and are excluded — which also caps every block at "
    f"{RARE_DF_CAP} docs, bounding pair fan-out independent of corpus "
    "size), then exact |A∩B|/|A| on candidates only via "
    "array_intersect. Catches subset-duplicates symmetric Jaccard "
    "misses. The rarest-shingle election is a doc-partitioned window "
    "(doc-sized groups, scale-safe), df is one vocabulary-sized "
    "aggregation, and the shingle-set payloads join into the "
    "candidate-sized frame only.",
    tags=("dedup", "text", "containment", "join"),
)
def dedup_containment_rare_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    # NOTE (r17): localCheckpoints on this relation and on `rare` were
    # tried (static plan: 20→6 Exchanges) and REVERTED — a 6×-interleaved
    # warm A/B at sf0.1 read no-cp ≤ cp on every statistic (min 1.85 vs
    # 2.14s, median 2.4 vs 2.6s): runtime exchange reuse already covers
    # the duplicated subtrees, and caching the array-heavy shingle rows
    # costs more than the recompute it saves (the r9 rescan-audit
    # finding).
    sh = d.select("doc_id", shingles_col(F.col("text")).alias("s"))
    ex = sh.select("doc_id", F.explode("s").alias("g"))
    df_counts = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        # df=1 keys match nothing — filtering them BEFORE the rank join
        # drops most of the exploded volume at scale
        .where(F.col("df") >= 2)
    )
    rare = (
        ex.join(df_counts, "g")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "g")
            ),
        )
        .where(
            (F.col("rn") <= RARE_KEYS_PER_DOC)
            & (F.col("df") <= RARE_DF_CAP)
        )
        .select("doc_id", "g")
    )
    cand = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    scored = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"),
                            F.col("s").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"),
                        F.col("s").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias(
                "n_shared"
            ),
            F.size("sa").cast("long").alias("n_a"),
            F.size("sb").cast("long").alias("n_b"),
        )
    )
    # Denominator is the SMALLER side: containment of the contained doc
    # in the containing one. Dividing by the lower-doc_id side instead
    # would make detection depend on arbitrary id order — a long doc with
    # a low id that fully contains a short one would score
    # n_short/n_long ≈ 0 and the subset-dup would slip through.
    containment = F.col("n_shared").cast("double") / F.least(
        F.col("n_a"), F.col("n_b")
    )
    return scored.withColumn("containment", containment).where(
        F.col("containment") >= CONTAINMENT_MIN
    )


@register(
    "corpus_split_assign",
    oracle="""
        WITH assigned AS (
          SELECT doc_id, lang,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'),
                                    1, 14))::BIGINT % 100 AS bucket,
                 CASE WHEN text = '' THEN 0
                      ELSE len(string_split_regex(text, '\\s+')) END
                     AS n_tokens
          FROM documents
        )
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'valid'
                    ELSE 'test' END AS split,
               lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM assigned
        GROUP BY 1, 2
    """,
    doc="Deterministic train/valid/test corpus split (90/5/5) with "
    "per-split token budgets: assignment is a pure function of doc_id "
    "(salted md5 bucket — no RNG, no state), so the split is stable "
    "under re-runs, distribution-independent of input ordering, and "
    "reproducible across engines; per-(split, lang) doc and token "
    "counts are the budget report every dataset card needs. The salt "
    "(':split') decorrelates these buckets from the sampling lane's "
    "(sample_stratified_exact) — the same doc must be able to land "
    "differently in independent bucketed decisions. One shuffle "
    "(the final aggregate); tokenizer contract shared with the "
    "winnowing/BPE lanes.",
    tags=("text", "sampling", "split", "agg"),
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import md5_long_col

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        md5_long_col(F.concat(F.col("doc_id").cast("string"), F.lit(":split")))
        % 100
    )
    split = (
        F.when(bucket < 90, "train")
        .when(bucket < 95, "valid")
        .otherwise("test")
    )
    n_tokens = F.size(tokens_col(F.col("text"))).cast("long")
    return (
        d.select(split.alias("split"), "lang", n_tokens.alias("n_tokens"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@register(
    "multimodal_audio_stats",
    oracle="""
        WITH b AS (
          SELECT doc_id, hex(encode(text)) AS h,
                 octet_length(encode(text)) AS n
          FROM documents
        ),
        samples AS (
          SELECT doc_id, n,
                 [('0x' || substring(h, (i - 1) * 2 + 1, 2))::BIGINT
                  FOR i IN range(1, n + 1)] AS s
          FROM b
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_samples,
               CAST(list_aggregate(s, 'sum') AS BIGINT) AS amp_sum,
               CAST(list_aggregate(s, 'max') AS BIGINT) AS amp_peak,
               CAST(list_aggregate(s, 'min') AS BIGINT) AS amp_floor
        FROM samples
        WHERE n > 0
    """,
    doc="Multimodal waveform statistics — the audio-lane feature shape "
    "made oracle-exact: each blob is read as unsigned 8-bit PCM samples "
    "and reduced to integer amplitude stats (count/sum/peak/floor — "
    "the silence/clipping screens an audio-corpus quality gate runs "
    "before expensive transcription). Byte extraction is a per-row hex "
    "transform + integer fold: zero shuffles, codegen end to end, and "
    "the all-integer output hashes exactly. A real PCM/FLAC decoder "
    "swaps into the image lane's mapInPandas slot; payload = UTF-8 "
    "bytes of documents.text so both engines see identical samples.",
    tags=("multimodal", "binary", "audio"),
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    # Byte extraction must stay LINEAR in the blob: split the hex string
    # into 2-char pairs once (regexp inserts a separator after each pair),
    # then convert pairs. The tempting per-index form
    # transform(sequence(1,n), i -> conv(substring(hex(blob), 2i-1, 2)))
    # is O(n²): substring on a long string is O(n) per element AND the
    # hex(encode(text)) subtree re-evaluates inside the lambda per
    # element (no loop-invariant hoisting in codegen) — measured 11.5s →
    # ~0.5s at sf0.1 for this rewrite.
    pairs = F.filter(
        F.split(
            F.regexp_replace(F.hex(F.encode("text", "UTF-8")), "(..)", "$1,"),
            ",",
        ),
        lambda x: x != "",
    )
    samples = F.transform(pairs, lambda x: F.conv(x, 16, 10).cast("long"))
    return (
        d.where(F.length("text") > 0)
        .select("doc_id", samples.alias("s"))
        .select(
            "doc_id",
            F.size("s").cast("long").alias("n_samples"),
            F.aggregate(
                "s", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("amp_sum"),
            F.array_max("s").alias("amp_peak"),
            F.array_min("s").alias("amp_floor"),
        )
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
        WITH blobs AS (
          SELECT doc_id, encode(text) AS b,
                 octet_length(encode(text)) // {FRAME_BYTES} AS n_frames
          FROM documents
        ),
        sampled AS (
          SELECT doc_id, n_frames, unnest(
                   CASE WHEN n_frames >= 1
                        THEN [i FOR i IN range(1, n_frames + 1,
                                               {FRAME_STRIDE})]
                        ELSE [] END) AS frame_no
          FROM blobs
        )
        SELECT s.doc_id,
               CAST(s.frame_no AS BIGINT) AS frame_no,
               CAST((s.frame_no - 1) * {FRAME_BYTES} AS BIGINT)
                   AS offset_bytes,
               -- digest the lowercase HEX of the frame bytes (2 chars per
               -- byte): DuckDB has no BLOB substring, so the cross-engine
               -- contract slices the hex string instead
               md5(lower(substring(hex(bl.b),
                                   (s.frame_no - 1) * {FRAME_BYTES * 2} + 1,
                                   {FRAME_BYTES * 2}))) AS frame_digest
        FROM sampled s JOIN blobs bl USING (doc_id)
    """,
    doc="Multimodal frame sampling — the video-lane decode shape made "
    f"oracle-exact: each blob is an opaque container of fixed "
    f"{FRAME_BYTES}-byte frames; every {FRAME_STRIDE}th full frame is "
    "sampled (trailing partial frame dropped) and emitted as (frame_no, "
    "byte offset, content digest). The plan is the one a real "
    "frame-sampler needs at 100 TB: a per-row array transform generates "
    "sampled offsets (zero shuffle, no explode of UNsampled frames — "
    "the stride prunes before materialization), byte-slice + digest "
    "stay codegen'd JVM expressions. A real demuxer swaps into the "
    "same mapInPandas slot the image lane uses; the fixed-frame "
    "container keeps both engines byte-identical (payload = UTF-8 "
    "encoding of documents.text, as multimodal_binary_stats).",
    tags=("multimodal", "binary", "video"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    b = F.encode("text", "UTF-8")
    n_frames = (F.length(b) / FRAME_BYTES).cast("long")
    frame_nos = F.when(
        n_frames >= 1,
        F.sequence(F.lit(1), n_frames, F.lit(FRAME_STRIDE)),
    ).otherwise(F.array().cast("array<long>"))
    return (
        d.select(
            "doc_id",
            b.alias("b"),
            F.explode(frame_nos).alias("frame_no"),
        )
        .select(
            "doc_id",
            "frame_no",
            ((F.col("frame_no") - 1) * FRAME_BYTES).alias("offset_bytes"),
            # md5 over the frame's lowercase hex (not raw bytes): the
            # engine-portable digest contract — see the oracle comment
            F.md5(
                F.lower(
                    F.hex(
                        F.col("b").substr(
                            ((F.col("frame_no") - 1) * FRAME_BYTES + 1).cast(
                                "int"
                            ),
                            F.lit(FRAME_BYTES),
                        )
                    )
                )
            ).alias("frame_digest"),
        )
    )


LM_TOP_BIGRAMS = 500


@register(
    "text_bigram_coverage",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t
          FROM documents
        ),
        pairs AS (
          SELECT doc_id,
                 unnest(list_filter(
                   list_transform(t,
                     (x, i) -> CASE WHEN i < len(t)
                               THEN x || ' ' || t[i + 1] END),
                   y -> y IS NOT NULL)) AS pair
          FROM toks
        ),
        top AS (
          SELECT pair FROM pairs
          GROUP BY pair
          ORDER BY count(*) DESC, pair
          LIMIT {LM_TOP_BIGRAMS}
        ),
        per AS (
          SELECT p.doc_id,
                 CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(count(*) FILTER (WHERE t.pair IS NOT NULL)
                      AS BIGINT) AS n_top_bigrams
          FROM pairs p LEFT JOIN top t USING (pair)
          GROUP BY p.doc_id
        )
        SELECT d.doc_id,
               COALESCE(per.n_bigrams, 0) AS n_bigrams,
               COALESCE(per.n_top_bigrams, 0) AS n_top_bigrams
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
    doc="Language-model-proxy quality signal: for every document, how "
    "many of its adjacent-token bigrams (with multiplicity) fall inside "
    "the corpus's top-500 bigram vocabulary — the integer-exact core of "
    "a KenLM-style perplexity gate (a doc whose bigrams barely touch "
    "the corpus head is boilerplate, noise, or another language; "
    "consumers divide the two counts). No libm anywhere, so the oracle "
    "hashes exactly. Plan: one pair scan feeds BOTH the vocabulary "
    "top-k (partial-agg + TakeOrdered, vocabulary-sized state) and the "
    "per-doc counts; the vocabulary broadcasts back as a left-join "
    "flag, so the per-doc pass is a single doc_id-keyed shuffle — at "
    "100 TB the head vocabulary is KBs while the corpus scan "
    "parallelizes freely. Tokenizer contract shared with the BPE/"
    "winnowing lanes (guarded \\s+ split).",
    tags=("text", "tokens", "quality", "lm"),
)
def text_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    adjacent = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = d.select("doc_id", F.explode(adjacent).alias("pair"))
    pairs = pairs.localCheckpoint(eager=True)  # one pair scan, two consumers
    top = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(LM_TOP_BIGRAMS)
        .select("pair", F.lit(True).alias("_top"))
    )
    per = (
        pairs.join(F.broadcast(top), "pair", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count_if(F.col("_top").isNotNull()).alias("n_top_bigrams"),
        )
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_top_bigrams", F.lit(0)).alias("n_top_bigrams"),
        )
    )
