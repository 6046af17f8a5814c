"""Training-data pipeline operators, round 4 (second batch).

Four corpus-curation stages the earlier lanes don't cover, all
oracle-checked:

- ``text_segment_dedup``: C4-style duplicate-SPAN removal. Documents are
  cut into fixed-width token segments and every segment that occurs more
  than once in the corpus survives only in its FIRST occurrence
  (lexicographic (doc_id, position)); later occurrences are dropped and
  each document is re-assembled from its surviving segments. This is the
  span-level exact dedup C4 applies at three-sentence granularity —
  distinct from doc-level ``dedup_exact`` (whole docs) and
  ``dedup_winnow_pairs`` (approximate copy-span DETECTION: it reports
  pairs, this one REWRITES the corpus).

- ``text_bm25_rank``: BM25 retrieval ranking of the corpus against a
  fixed query. Uses the RATIONAL Robertson–Spärck-Jones idf
  (N - df + 0.5)/(df + 0.5) — deliberately no ``ln``: IEEE-754 requires
  exact rounding for + - * / so an identical operand order is
  bit-identical across engines, while libm's log is not so guaranteed
  (same convention as ``text_tfidf_exact``). Per-term partial scores are
  added in one fixed textual order, never via float ``sum()`` whose
  accumulation order differs between engines.

- ``events_anomaly_mad``: robust anomaly counting per event_type via
  median / median-absolute-deviation. Both medians are LOWER medians
  (order statistic at rank (n+1) div 2) — selected values, not
  interpolated averages — so every derived number is exact arithmetic on
  input values and the 3×MAD threshold comparison cannot drift between
  engines.

- ``text_gopher_quality_flags``: rule-based document filtering in the
  style of the Gopher/MassiveText quality rules (token-count bounds,
  mean-token-length band, stopword-presence, symbol ratio). Emits the
  individual boolean rule flags plus the final keep decision — the
  filter-with-provenance shape a curation pipeline needs (``text_quality``
  is the complementary continuous score; this is the hard gate).

The reference has no text lane (453-line image pipeline); these extend its
"derive signals from an opaque payload" pattern (reference
preprocess_image.py:110-136) to corpus curation, as mandated by the
driver's extension-surface brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens_col
from ..io import fan_out, load_table
from ..registry import register

# Segment width for span-level dedup. C4 uses three-sentence spans; the
# synthetic corpus has no sentence structure, so a fixed token window
# plays that role. Short enough that the repetitive synthetic vocabulary
# actually produces cross-doc duplicate spans at sf0.01.
SEG_TOKENS = 10

# BM25: classic Robertson parameters; the query is a fixed term set (in
# production this side is the user query / benchmark suite — tiny, so all
# per-term corpus statistics fold into one broadcast row).
BM25_QUERY = ("spark", "query", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20

# Gopher-style rule thresholds (MassiveText's published bands, adapted to
# the short synthetic docs: real pipelines use 50..100k tokens and
# mean-word-length 3..10).
GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 120
GOPHER_MIN_MEAN_LEN = 2.0
GOPHER_MAX_MEAN_LEN = 12.0
GOPHER_MAX_SYMBOL_RATIO = 0.1

MAD_SIGMAS = 3.0


@register(
    "text_segment_dedup",
    oracle=f"""
        WITH toks AS (
          -- mirror tokens_col: empty string -> [] (string_split_regex('')
          -- would yield [''], a phantom token)
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t
          FROM documents
        ),
        starts AS (
          SELECT doc_id, t, unnest(range(1, len(t) + 1, {SEG_TOKENS})) AS s
          FROM toks
          WHERE len(t) > 0
        ),
        segs AS (
          SELECT doc_id,
                 CAST((s - 1) // {SEG_TOKENS} AS BIGINT) AS idx,
                 array_to_string(t[s:s + {SEG_TOKENS} - 1], ' ') AS seg
          FROM starts
        ),
        ranked AS (
          SELECT doc_id, idx, seg,
                 row_number() OVER (PARTITION BY seg
                                    ORDER BY doc_id, idx) AS rn
          FROM segs
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_segments,
                 CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
                 coalesce(string_agg(seg, ' ' ORDER BY idx)
                            FILTER (WHERE rn = 1), '') AS text_clean
          FROM ranked GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_segments, 0) AS n_segments,
               coalesce(p.n_kept, 0) AS n_kept,
               coalesce(p.text_clean, '') AS text_clean
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="C4-style duplicate-span removal: fixed 10-token segments, each "
    "distinct segment survives only at its first (doc_id, position) "
    "occurrence, documents re-assembled from surviving segments. One "
    "shuffle keyed on the ~60-byte segment value (the keep-first winner "
    "needs exact segment equality — grouping by value IS the operator; "
    "a hash pre-filter would still have to confirm on value), one "
    "doc_id-keyed re-assembly that reuses the fan_out partitioning. "
    "Keep-first is a groupBy(seg).min + equi-join, not a per-segment "
    "window: partial min combines map-side and a corpus-viral segment "
    "skews a splittable JOIN partition (AQE skew-join) instead of one "
    "unsplittable window task.",
    tags=("text", "dedup", "c4", "window"),
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    seg_starts = F.when(
        n > 0, F.sequence(F.lit(1), n, F.lit(SEG_TOKENS))
    ).otherwise(F.array().cast("array<int>"))
    segs = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                seg_starts,
                lambda s: F.concat_ws(" ", F.slice(toks, s, SEG_TOKENS)),
            )
        ).alias("idx", "seg"),
    ).select("doc_id", F.col("idx").cast("long").alias("idx"), "seg")
    # NOTE (r17, reworded r18 per ADVICE): a localCheckpoint here was
    # tried and REVERTED on measurement — a 5×-interleaved warm A/B at
    # sf0.1 read no-cp ≤ cp on every repeat (1.20 vs 1.30s min): the
    # checkpoint's materialization of the exploded segment rows cost
    # more than it saved at this scale. The tokenize+slice+posexplode
    # chain DOES run twice (the keep-first aggregate side and the
    # join-back probe side are non-identical subtrees — partial
    # HashAggregate vs projection with the extra ``o`` column — so no
    # ReusedExchange applies); at a scale factor where the double chain
    # dominates the materialization, re-evaluate.
    # Keep-first = occurrence o equals the segment's global min(o) —
    # groupBy + equi-join back rather than row_number over
    # Window.partitionBy(seg): a corpus-viral segment would make the
    # window partition one unsplittable task, while the groupBy's partial
    # min combines map-side and probe-side join skew is what AQE
    # skew-join splits (same rationale as _exsub_dup_window_starts;
    # position bound documented at EXSUB_POS_CAP).
    o = (F.col("doc_id") * EXSUB_POS_CAP + F.col("idx")).alias("o")
    firsts = segs.groupBy("seg").agg(
        F.min(F.col("doc_id") * EXSUB_POS_CAP + F.col("idx")).alias(
            "first_o"
        )
    )
    ranked = segs.select("doc_id", "idx", "seg", o).join(firsts, "seg")
    kept_seg = F.when(F.col("o") == F.col("first_o"), F.struct("idx", "seg"))
    per_doc = ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count_if(F.col("o") == F.col("first_o")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_seg)), lambda x: x["seg"]
            ),
            " ",
        ).alias("text_clean"),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def _bm25_oracle() -> str:
    t1, t2, t3 = BM25_QUERY
    score_terms = []
    for i in (1, 2, 3):
        score_terms.append(
            f"""CASE WHEN tf{i} > 0 THEN
                 ((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)
                    / (CAST(df{i} AS DOUBLE) + 0.5))
                 * ((CAST(tf{i} AS DOUBLE) * {BM25_K1 + 1.0!r})
                    / (CAST(tf{i} AS DOUBLE)
                       + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r}
                          * (CAST(dl AS DOUBLE) / avgdl))))
                 ELSE 0.0 END"""
        )
    s1, s2, s3 = score_terms
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t
          FROM documents
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(len(t) AS BIGINT) AS dl,
                 CAST(len(list_filter(t, x -> x = '{t1}')) AS BIGINT) AS tf1,
                 CAST(len(list_filter(t, x -> x = '{t2}')) AS BIGINT) AS tf2,
                 CAST(len(list_filter(t, x -> x = '{t3}')) AS BIGINT) AS tf3
          FROM toks
        ),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS sum_dl,
                 CAST(count(*) FILTER (WHERE tf1 > 0) AS BIGINT) AS df1,
                 CAST(count(*) FILTER (WHERE tf2 > 0) AS BIGINT) AS df2,
                 CAST(count(*) FILTER (WHERE tf3 > 0) AS BIGINT) AS df3
          FROM per_doc
        ),
        scored AS (
          SELECT doc_id, dl,
                 tf1 AS tf_{t1}, tf2 AS tf_{t2}, tf3 AS tf_{t3},
                 ({s1}) + ({s2}) + ({s3}) AS score
          FROM per_doc CROSS JOIN (
            SELECT *, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)
                        AS avgdl
            FROM stats)
        )
        SELECT doc_id, dl, tf_{t1}, tf_{t2}, tf_{t3}, score
        FROM scored
        ORDER BY score DESC, doc_id
        LIMIT {BM25_TOP}
    """


@register(
    "text_bm25_rank",
    oracle=_bm25_oracle(),
    doc="BM25 top-20 retrieval over the corpus for a fixed 3-term query, "
    "rational RSJ idf (N-df+0.5)/(df+0.5) — no libm log, so identical "
    "operand order is bit-identical across engines; per-term partial "
    "scores added in one fixed order (never float sum() with "
    "engine-dependent accumulation order). Per-doc tf/dl derive with "
    "ZERO shuffle (array filter sizes, no explode); all corpus "
    "statistics (N, Σdl, per-term df — integer sums, exact) reduce to "
    "ONE row that broadcasts back; the bounded result is sort+limit = "
    "TakeOrdered. At 100 TB: one scan, one single-row aggregate, one "
    "O(k) driver merge.",
    tags=("text", "bm25", "ranking", "agg"),
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    toks = tokens_col(F.col("text"))
    def tf_of(term: str):
        # NB: a default-arg lambda (lambda x, t=term: ...) would have
        # arity 2 and F.filter would pass the element INDEX as t.
        return F.size(F.filter(toks, lambda x: x == term)).cast("long")

    per_doc = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            tf_of(t).alias(f"tf{i}")
            for i, t in enumerate(BM25_QUERY, 1)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf{i}") > 0).alias(f"df{i}")
            for i in range(1, 4)
        ],
    ).withColumn(
        "avgdl", F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    )

    def term_score(i: int):
        tf = F.col(f"tf{i}").cast("double")
        df_ = F.col(f"df{i}").cast("double")
        idf = (F.col("n_docs").cast("double") - df_ + F.lit(0.5)) / (
            df_ + F.lit(0.5)
        )
        sat = (tf * F.lit(BM25_K1 + 1.0)) / (
            tf
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B)
                * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
        return F.when(F.col(f"tf{i}") > 0, idf * sat).otherwise(F.lit(0.0))

    scored = per_doc.join(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        *[
            F.col(f"tf{i}").alias(f"tf_{t}")
            for i, t in enumerate(BM25_QUERY, 1)
        ],
        (term_score(1) + term_score(2) + term_score(3)).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(BM25_TOP)


@register(
    "events_anomaly_mad",
    oracle=f"""
        WITH ranked AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events
        ),
        med AS (
          SELECT event_type, n, value AS med
          FROM ranked WHERE rn = (n + 1) // 2
        ),
        dev AS (
          SELECT r.event_type, m.n, m.med, abs(r.value - m.med) AS dev,
                 row_number() OVER (PARTITION BY r.event_type
                                    ORDER BY abs(r.value - m.med)) AS drn
          FROM ranked r JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type, dev AS mad FROM dev WHERE drn = (n + 1) // 2
        )
        SELECT d.event_type,
               CAST(max(d.n) AS BIGINT) AS n,
               max(d.med) AS med,
               max(a.mad) AS mad,
               CAST(count(*) FILTER (WHERE d.dev > {MAD_SIGMAS!r} * a.mad)
                    AS BIGINT) AS n_anomalies,
               max(d.dev) AS max_dev
        FROM dev d JOIN mad a USING (event_type)
        GROUP BY d.event_type
    """,
    doc="Robust per-group anomaly counting: lower-median (order statistic "
    "at rank (n+1) div 2 — a SELECTED input value, not an interpolated "
    "average, so all downstream arithmetic is exact and cross-engine "
    "stable), MAD of absolute deviations, count of |x-med| > 3·MAD. "
    "Both order statistics are read off BIN-LEVEL cumulative counts, "
    "never a row_number over raw events, and the first-stage bin key is "
    "INTEGER CENTS (round(value*100)::long — the stat_mann_whitney / "
    "stat_ks pattern), so the ordered-window support is domain-bounded "
    "by construction (≤ value_range·100 bins at any corpus size), not "
    "by fixture luck on the distinct-value count. Each cents bin "
    "carries its exact raw value (min(value) — injective for the "
    "2dp-quantized telemetry contract, guarded per sf dir by "
    "tests/test_traindata4.py::test_anomaly_mad_cents_encoding_is_lossless), "
    "so the selected median/MAD and every deviation stay bit-exact raw "
    "doubles matching the oracle's arithmetic. The second (deviation) "
    "window consumes the dev-bin relation derived from the cents bins — "
    "≤ the same bound. The approximate production form for unbounded "
    "continuous supports at 100 TB is the agg_approx_quantile lane; "
    "this operator is the exact contract.",
    tags=("events", "anomaly", "median", "window"),
)
def events_anomaly_mad(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "value",
    )

    def ck(df: DataFrame) -> DataFrame:
        # ``materialize=False`` keeps the full logical plan visible for
        # the structural pytest (windows-over-bins pin); the registry
        # row always runs materialized.
        return df.localCheckpoint(eager=False) if materialize else df
    rank = F.expr("(n + 1) div 2")
    # r17 optimization (guide §2.4): the bin relation feeds BOTH the
    # median path and the deviation path, and the deviation relation
    # feeds BOTH the MAD order statistic and the final rollup — without
    # materialization each consumer re-runs the upstream aggregate (the
    # before plan, plans/r17/events_anomaly_mad_before.txt, shows the
    # events scan twice and the cumulative windows 5×). All three frames
    # are domain-bounded (≤ value_range·100 bins per group by the cents
    # contract), so materializing them is O(bins), not O(events).
    bins = ck(
        e.groupBy("event_type", "cents").agg(
            F.count(F.lit(1)).alias("c"), F.min("value").alias("value")
        )
    )
    wt = Window.partitionBy("event_type")
    wv = wt.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    binc = bins.select(
        "event_type",
        "value",
        "c",
        F.sum("c").over(wv).alias("cum"),
        F.sum("c").over(wt).alias("n"),
    )
    # the median bin is the one whose cumulative range covers the rank
    med = ck(  # group-count-sized, consumed 2×
        binc.where(
            (F.col("cum") >= rank) & (F.col("cum") - F.col("c") < rank)
        ).select("event_type", F.col("value").alias("med"), "n")
    )
    devb = (
        bins.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "n",
            F.abs(F.col("value") - F.col("med")).alias("dev"),
            "c",
        )
        .groupBy("event_type", "n", "dev")
        .agg(F.sum("c").alias("c"))
    )
    devb = ck(devb)  # dev-bin-sized, consumed 2×
    wd = wt.orderBy("dev").rowsBetween(Window.unboundedPreceding, 0)
    devc = devb.select(
        "event_type", "n", "dev", "c", F.sum("c").over(wd).alias("cum")
    )
    mad = devc.where(
        (F.col("cum") >= rank) & (F.col("cum") - F.col("c") < rank)
    ).select("event_type", F.col("dev").alias("mad"))
    return (
        devb.join(F.broadcast(mad), "event_type")
        .join(F.broadcast(med.select("event_type", "med")), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("dev") > F.lit(MAD_SIGMAS) * F.col("mad"),
                    F.col("c"),
                ).otherwise(F.lit(0))
            ).alias("n_anomalies"),
            F.max("dev").alias("max_dev"),
        )
    )


@register(
    "text_gopher_quality_flags",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t,
                 length(text)
                   - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                   AS n_sym,
                 length(text) AS n_all
          FROM documents
        ),
        sig AS (
          SELECT doc_id,
                 CAST(len(t) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(list_distinct(t),
                        x -> list_contains({list(STOPWORDS)!r}, x)))
                      AS BIGINT) AS n_stopwords,
                 CASE WHEN len(t) > 0
                      THEN CAST(list_sum(list_transform(t, x -> length(x)))
                                AS DOUBLE) / CAST(len(t) AS DOUBLE)
                      ELSE 0.0 END AS mean_token_len,
                 CASE WHEN n_all > 0
                      THEN CAST(n_sym AS DOUBLE) / CAST(n_all AS DOUBLE)
                      ELSE 0.0 END AS symbol_ratio
          FROM toks
        )
        SELECT doc_id, n_tokens, n_stopwords, mean_token_len, symbol_ratio,
               n_tokens < {GOPHER_MIN_TOKENS}
                 OR n_tokens > {GOPHER_MAX_TOKENS} AS flag_length,
               mean_token_len < {GOPHER_MIN_MEAN_LEN!r}
                 OR mean_token_len > {GOPHER_MAX_MEAN_LEN!r}
                 AS flag_mean_len,
               n_stopwords < 1 AS flag_no_stopword,
               symbol_ratio > {GOPHER_MAX_SYMBOL_RATIO!r} AS flag_symbols,
               NOT (n_tokens < {GOPHER_MIN_TOKENS}
                    OR n_tokens > {GOPHER_MAX_TOKENS}
                    OR mean_token_len < {GOPHER_MIN_MEAN_LEN!r}
                    OR mean_token_len > {GOPHER_MAX_MEAN_LEN!r}
                    OR n_stopwords < 1
                    OR symbol_ratio > {GOPHER_MAX_SYMBOL_RATIO!r}) AS keep
        FROM sig
    """,
    doc="Gopher/MassiveText-style rule-based quality gate with "
    "provenance: token-count band, mean-token-length band (exact long "
    "char sum / long count — one double division), stopword presence, "
    "symbol ratio; emits each rule flag plus the final keep decision. "
    "Pure per-row columnar expressions — zero shuffles, full codegen, "
    "embarrassingly parallel at 100 TB. Complementary to text_quality "
    "(continuous score): this is the hard filter a curation DAG branches "
    "on.",
    tags=("text", "quality", "filter", "gopher"),
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_all = F.length("text")
    n_sym = n_all - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    sig = d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(
            F.filter(
                F.array_distinct(toks), lambda x: x.isin(*STOPWORDS)
            )
        )
        .cast("long")
        .alias("n_stopwords"),
        F.when(
            n_tok > 0,
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            ).cast("double")
            / n_tok.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_token_len"),
        F.when(
            n_all > 0, n_sym.cast("double") / n_all.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("symbol_ratio"),
    )
    flag_length = (F.col("n_tokens") < GOPHER_MIN_TOKENS) | (
        F.col("n_tokens") > GOPHER_MAX_TOKENS
    )
    flag_mean = (F.col("mean_token_len") < GOPHER_MIN_MEAN_LEN) | (
        F.col("mean_token_len") > GOPHER_MAX_MEAN_LEN
    )
    flag_stop = F.col("n_stopwords") < 1
    flag_sym = F.col("symbol_ratio") > GOPHER_MAX_SYMBOL_RATIO
    return sig.select(
        "doc_id",
        "n_tokens",
        "n_stopwords",
        "mean_token_len",
        "symbol_ratio",
        flag_length.alias("flag_length"),
        flag_mean.alias("flag_mean_len"),
        flag_stop.alias("flag_no_stopword"),
        flag_sym.alias("flag_symbols"),
        (~(flag_length | flag_mean | flag_stop | flag_sym)).alias("keep"),
    )


# --- exact-substring span dedup (Lee et al. ExactSubstr form) -----------

# Duplicate-window width in tokens. The published ExactSubstr threshold is
# 50 BPE tokens over suffix arrays; the synthetic docs are 10-99 whitespace
# tokens, so a narrower window plays that role (wide enough that matches
# mean real shared phrasing, narrow enough that the fixture corpus actually
# contains cross-doc duplicates).
EXSUB_K = 8
# Occurrence total order = doc_id * EXSUB_POS_CAP + pos. Documented bound:
# per-document token count < EXSUB_POS_CAP (1e6 tokens ~ 4 MB of text — a
# web-corpus document above that is pathological and belongs to the length
# filter, not this operator) and doc_id < ~9.2e12 so the product stays
# inside BIGINT. ENFORCED at runtime by the assert_true guard in
# _exsub_dup_window_starts (a violation raises naming the doc_id instead
# of silently interleaving occurrence keys across documents).
EXSUB_POS_CAP = 1_000_000


def _exsub_dup_window_starts(toked: DataFrame) -> DataFrame:
    """(doc_id, pos) of every EXSUB_K-token window that is NOT the first
    corpus occurrence of its content — the shared core of the span
    detector and the rewrite operator. ``toked`` is (doc_id, t:array).

    First occurrence is computed as groupBy(gh).min + an equi-join back,
    NOT as a min-over-Window.partitionBy(gh): a corpus-viral 8-gram
    (boilerplate, license headers) has corpus-sized duplication, and a
    window partition is one unsplittable task, while the groupBy's
    partial min combines map-side (one row per gram per map task reaches
    the reducer) and the probe-side join skew is exactly what AQE
    skew-join splits. Both sides hash by gh, so the exchange is shared.
    """
    k = EXSUB_K
    # Runtime guard for the documented EXSUB_POS_CAP bound (r8 advice):
    # a >=1e6-token document would interleave occurrence keys across
    # documents and — because the DuckDB oracle uses the IDENTICAL
    # encoding — produce matching-but-wrong output the hash compare
    # cannot catch. assert_true is folded into the pos arithmetic
    # (coalesce(NULL-on-pass, 0)) so column pruning can't drop it; the
    # per-gram cost is one long comparison.
    overflow = F.coalesce(
        F.assert_true(
            F.col("nt") < EXSUB_POS_CAP,
            F.concat(
                F.lit(
                    "exact-substring occurrence order overflows "
                    f"EXSUB_POS_CAP={EXSUB_POS_CAP}: doc_id="
                ),
                F.col("doc_id").cast("string"),
                F.lit(" has token count "),
                F.col("nt").cast("string"),
                F.lit(" — route it to the length-filter lane"),
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    grams = (
        toked.select(
            "doc_id",
            F.size("t").alias("nt"),
            F.posexplode(
                F.when(
                    F.size("t") >= k,
                    F.expr(
                        f"transform(sequence(1, size(t) - {k} + 1),"
                        f" i -> md5(array_join(slice(t, i, {k}), ' ')))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos0", "gh"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1 + overflow).cast("long").alias("pos"),
            "gh",
        )
    )
    o = (F.col("doc_id") * EXSUB_POS_CAP + F.col("pos")).alias("o")
    firsts = grams.groupBy("gh").agg(
        F.min(F.col("doc_id") * EXSUB_POS_CAP + F.col("pos")).alias(
            "first_o"
        )
    )
    return (
        grams.select("doc_id", "pos", "gh", o)
        .join(firsts, "gh")
        .filter(F.col("o") > F.col("first_o"))
        .select("doc_id", "pos")
    )


# Shared DuckDB CTE prefix: whitespace tokens -> EXSUB_K-gram md5 keys ->
# non-first-occurrence window starts. Mirrors _exsub_dup_window_starts.
_EXSUB_DUPS_CTE = f"""
        toks AS (
          SELECT doc_id,
                 CASE WHEN text = '' THEN []
                      ELSE string_split_regex(text, '\\s+') END AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(s AS BIGINT) AS pos,
                 md5(array_to_string(t[s:s + {EXSUB_K} - 1], ' ')) AS gh
          FROM (SELECT doc_id, t,
                       unnest(range(1, len(t) - {EXSUB_K} + 2)) AS s
                FROM toks WHERE len(t) >= {EXSUB_K})
        ),
        occ AS (
          SELECT doc_id, pos,
                 doc_id * {EXSUB_POS_CAP} + pos AS o,
                 min(doc_id * {EXSUB_POS_CAP} + pos)
                     OVER (PARTITION BY gh) AS first_o
          FROM grams
        ),
        dups AS (SELECT doc_id, pos FROM occ WHERE o > first_o)
"""


@register(
    "dedup_exact_substring_spans",
    oracle=f"""
        WITH {_EXSUB_DUPS_CTE},
        flagged AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER w IS NULL
                        OR pos > lag(pos) OVER w + {EXSUB_K}
                      THEN 1 ELSE 0 END AS nf
          FROM dups
          WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        isl AS (
          SELECT doc_id, pos,
                 sum(nf) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
          FROM flagged
        )
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {EXSUB_K} - 1 AS BIGINT) AS span_end,
               CAST(count(*) AS BIGINT) AS n_dup_windows
        FROM isl GROUP BY doc_id, island
    """,
    doc="Exact-substring duplicate-SPAN detection, the token-window form "
    "of 'Deduplicating Training Data Makes Language Models Better' "
    "(Lee et al. 2022): every EXSUB_K-token window that occurs anywhere "
    "earlier in the corpus (total order = first (doc_id, pos) occurrence; "
    "the first occurrence always survives) marks its tokens as duplicated, "
    "and overlapping/contiguous duplicate windows per document merge into "
    "maximal spans [span_start, span_end] (1-based token indices, "
    "inclusive). Differs from text_segment_dedup (fixed aligned segments "
    "— misses duplicates that straddle a segment boundary) by sliding the "
    "window over EVERY position, which is what makes the guarantee 'no "
    "shared substring of >= 2K-1 tokens survives twice'. Scale shape: "
    "O(total tokens) gram rows keyed by a 32-hex md5 of the window (never "
    "the ~60-byte raw text) -> ONE shuffle for the per-gram min-occurrence "
    "window (partial min is map-side combinable when written as groupBy; "
    "the window form keeps per-gram groups bounded by duplication count), "
    "then a doc_id-keyed island merge whose groups are bounded by document "
    "length. No all-pairs anything; a suffix array is the single-node "
    "answer, the sliding-gram shuffle is the cluster answer. md5 collision "
    "posture: same as dedup_fingerprint — 128-bit, corpus-scale collision "
    "probability ~0, and a collision only ever over-marks a span.",
    tags=("dedup", "text", "traindata", "spans"),
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        keys=["doc_id"],
    )
    k = EXSUB_K
    toked = d.select("doc_id", tokens_col(F.col("text")).alias("t"))
    dups = _exsub_dup_window_starts(toked)
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = dups.select(
        "doc_id",
        "pos",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + k),
            1,
        )
        .otherwise(0)
        .alias("nf"),
    )
    isl = flagged.select(
        "doc_id",
        "pos",
        F.sum("nf")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k - 1).cast("long").alias("span_end"),
        F.count(F.lit(1)).alias("n_dup_windows"),
    ).select("doc_id", "span_start", "span_end", "n_dup_windows")


@register(
    "text_exact_substring_rewrite",
    oracle=f"""
        WITH {_EXSUB_DUPS_CTE},
        covered AS (
          SELECT DISTINCT doc_id, CAST(c AS BIGINT) AS p
          FROM (SELECT doc_id, unnest(range(pos, pos + {EXSUB_K})) AS c
                FROM dups)
        ),
        tokpos AS (
          SELECT doc_id,
                 CAST(generate_subscripts(t, 1) AS BIGINT) AS p,
                 unnest(t) AS tok
          FROM toks
        ),
        kept AS (
          SELECT tp.doc_id, tp.p, tp.tok
          FROM tokpos tp
          LEFT JOIN covered c ON tp.doc_id = c.doc_id AND tp.p = c.p
          WHERE c.p IS NULL
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_kept,
                 coalesce(string_agg(tok, ' ' ORDER BY p), '')
                     AS text_clean
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(CASE WHEN d.text = '' THEN []
                        ELSE string_split_regex(d.text, '\\s+') END)
                    AS BIGINT) AS n_tokens,
               CAST(len(CASE WHEN d.text = '' THEN []
                        ELSE string_split_regex(d.text, '\\s+') END)
                    - coalesce(p.n_kept, 0) AS BIGINT) AS n_removed,
               coalesce(p.text_clean, '') AS text_clean
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="The REWRITE half of ExactSubstr dedup (Lee et al. 2022): every "
    "token covered by a non-first-occurrence EXSUB_K-token window is "
    "dropped and each document is re-assembled from its surviving tokens "
    "(single-space joined — the tokenizer's normal form, same convention "
    "as text_segment_dedup). dedup_exact_substring_spans is the detector "
    "(spans report); this one actually produces the deduplicated corpus. "
    "Scale shape on top of the shared dup-window core (one md5-gram "
    "shuffle): covered-position expansion is O(dup_windows x K) rows, "
    "de-duplicated and anti-joined against token positions on the doc_id "
    "key, then one doc-keyed re-assembly whose groups are bounded by "
    "document length. Every stage is keyed by doc_id or gram hash — no "
    "all-pairs, no corpus-sized window.",
    tags=("dedup", "text", "traindata", "rewrite"),
)
def text_exact_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        keys=["doc_id"],
    )
    k = EXSUB_K
    toked = d.select("doc_id", tokens_col(F.col("text")).alias("t"))
    dups = _exsub_dup_window_starts(toked)
    covered = dups.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("p"),
    ).distinct()
    tokpos = toked.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "tok")
    kept = tokpos.join(covered, ["doc_id", "p"], "left_anti")
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return (
        toked.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))
            ).alias("n_removed"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
