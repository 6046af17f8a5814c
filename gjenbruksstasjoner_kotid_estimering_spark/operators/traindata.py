"""Training-data pipeline operators, round 2: PII redaction, repetition
quality (Gopher-style), exact TF-IDF, embedding centroids, sequence
packing, semantic dedup, and SCD2 interval building.

These extend the corpus-prep lane (plans/text.py, plans/corpus.py,
operators/dedup.py) with the remaining stages a large-scale LLM data
pipeline runs between raw crawl and tokenized shards. Everything stays
JVM-side built-ins except ``doc_pack_sequences`` (bin packing is
inherently imperative per partition → applyInPandas, the declared
Python surface).

Oracle-parity notes (driver hashes values exactly):
- Ratios are single double divisions of exact integer counts.
- TF-IDF here uses the RATIONAL idf (N+1)/(df+1) — no transcendental —
  so cross-engine floats are bit-identical; the classic log form lives in
  the MLlib lane (``text_tfidf``), which is rows-only by design.
- Centroids are quantized to integer micro-units per dimension before the
  sum, so the aggregate is order-insensitive (a raw float sum would hash
  differently under Spark's partial aggregation vs DuckDB's scan order).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..io import fan_out, load_table
from ..registry import register

# Patterns kept to the syntax intersection of Java regex (Spark) and RE2
# (DuckDB): no lookarounds, no backrefs.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"

# KMeans centers for semantic dedup are learned from a deterministic
# hash sample of at most max(this, 32·k) vectors — the fit cost is then
# O(cap·k·iters) independent of corpus size (SemDeDup production shape:
# centers from a sample, assignment over everything).
KMEANS_FIT_SAMPLE_CAP = 65_536


@register(
    "text_pii_redact",
    oracle=f"""
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or +47' || '0-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS text
          FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
               length(regexp_replace(regexp_replace(text, '{EMAIL_RE}',
                      '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g'))
                 AS redacted_len,
               substring(regexp_replace(regexp_replace(text, '{EMAIL_RE}',
                      '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g'),
                      GREATEST(length(text) - 60, 1), 61) AS redacted_tail
        FROM aug
    """,
    doc="PII redaction: regex scrub of emails and phone numbers to typed "
    "placeholder tokens, with per-doc match counts — the compliance pass "
    "every crawl corpus goes through before training. The corpus is "
    "synthetic word-soup, so a deterministic contact line is appended "
    "first (both engines append the identical line; the op under test is "
    "the redaction). Patterns use the Java-regex ∩ RE2 syntax subset so "
    "Spark and DuckDB match identically. Pure JVM regexp_* projections — "
    "one scan, no shuffle, trivially 100 TB-safe.",
    tags=("text", "pii", "regex"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +47"),
            F.lit("0-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
        # GREATEST(…, 1): a negative start silently switches substring to
        # count-from-end semantics (differently per engine) — clamp so
        # short docs stay cross-engine exact
        F.substring(
            redacted,
            F.greatest(F.length("text") - F.lit(60), F.lit(1)),
            F.lit(61),
        ).alias("redacted_tail"),
    )


@register(
    "text_repetition_filter",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        counts AS (
          SELECT doc_id, tok, count(*) AS c
          FROM toks GROUP BY doc_id, tok
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS total_tokens,
                 count(*) AS distinct_tokens,
                 CAST(max(c) AS BIGINT) AS top_word_count
          FROM counts GROUP BY doc_id
        )
        SELECT doc_id, total_tokens, distinct_tokens, top_word_count,
               CAST(top_word_count AS DOUBLE) / CAST(total_tokens AS DOUBLE)
                 AS top_word_frac,
               CAST(distinct_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
                 AS distinct_frac,
               (CAST(top_word_count AS DOUBLE)
                  / CAST(total_tokens AS DOUBLE) <= 0.2
                AND CAST(distinct_tokens AS DOUBLE)
                  / CAST(total_tokens AS DOUBLE) >= 0.25) AS keep
        FROM per_doc
    """,
    doc="Repetition-based quality filter (the Gopher/C4 rule family): "
    "per-doc token totals, distinct ratio, and most-frequent-word "
    "fraction, with a keep flag thresholding both. Implemented as "
    "explode → two-level aggregate; at 100 TB the (doc_id, token) partial "
    "counts combine map-side so the shuffle carries counts, not tokens. "
    "All fractions are single double divisions of exact counts.",
    tags=("text", "quality", "dedup"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed fan_out: one doc_id exchange serves the (doc_id, token) count,
    # the per-doc rollup, and the final projection (HashPartitioning on
    # doc_id satisfies both aggregates' clustering requirements).
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    counts = (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("total_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.max("c").alias("top_word_count"),
    )
    top_frac = F.col("top_word_count").cast("double") / F.col(
        "total_tokens"
    ).cast("double")
    distinct_frac = F.col("distinct_tokens").cast("double") / F.col(
        "total_tokens"
    ).cast("double")
    return per_doc.select(
        "doc_id",
        "total_tokens",
        "distinct_tokens",
        "top_word_count",
        top_frac.alias("top_word_frac"),
        distinct_frac.alias("distinct_frac"),
        ((top_frac <= 0.2) & (distinct_frac >= 0.25)).alias("keep"),
    )


@register(
    "text_tfidf_exact",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM toks GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, count(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 CAST(tf.tf AS DOUBLE)
                   * (CAST(n.n_docs + 1 AS DOUBLE)
                      / CAST(df.df + 1 AS DOUBLE)) AS tfidf
          FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        ),
        ranked AS (
          SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rn,
                 count(*) OVER (PARTITION BY doc_id) AS nnz
          FROM scored
        )
        SELECT doc_id, nnz, term AS top_term, tfidf AS top_tfidf
        FROM ranked WHERE rn = 1
    """,
    doc="Exact TF-IDF with the RATIONAL idf (N+1)/(df+1): per-doc distinct "
    "term count plus the top-weighted term (tie-break on term). The "
    "document-frequency table is a second aggregate over the (doc, term) "
    "counts — at 100 TB df is tiny (vocabulary-sized) and broadcasts back "
    "into the per-doc scoring join, so the only fact-sized shuffle is the "
    "(doc_id, term) count. No log: a single double multiply/divide chain "
    "on exact integers is bit-identical across engines, where libm's log "
    "is not guaranteed to be. The classic log-idf MLlib pipeline is "
    "``text_tfidf`` (rows-only).",
    tags=("text", "tfidf", "agg", "join"),
)
def text_tfidf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Keyed fan_out: hash-partitioning by doc_id is reused by BOTH the
    # (doc_id, term) aggregate (ClusteredDistribution(doc_id, term) is
    # satisfied by HashPartitioning(doc_id)) and the per-doc ranking
    # window — one exchange serves three stages.
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    n_docs = d.count()  # one tiny action; the scalar folds into the plan
    tf = (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (
            F.col("tf").cast("double")
            * (
                F.lit(float(n_docs + 1))
                / (F.col("df") + F.lit(1)).cast("double")
            )
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id")
    ranked = scored.select(
        "doc_id",
        "term",
        "tfidf",
        F.row_number()
        .over(w.orderBy(F.col("tfidf").desc(), F.col("term")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("nnz"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id", "nnz", F.col("term").alias("top_term"),
        F.col("tfidf").alias("top_tfidf"),
    )


@register(
    "embedding_centroids",
    oracle="""
        WITH raw AS (
          SELECT label,
                 unnest(list_transform(embedding,
                        (v, i) -> {'pos': i, 'val': v})) AS e
          FROM embeddings
        ),
        elems AS (
          SELECT label,
                 CAST(e.pos - 1 AS INT) AS pos,
                 CAST(round(CAST(e.val AS DOUBLE) * 1000000.0, 0) AS BIGINT)
                   AS micro
          FROM raw
        )
        SELECT label, pos,
               CAST(sum(micro) AS BIGINT) AS sum_micro,
               count(*) AS n,
               CAST(sum(micro) AS DOUBLE) / (1000000.0 * count(*))
                 AS centroid
        FROM elems
        GROUP BY label, pos
    """,
    doc="Per-label embedding centroids (the class-prototype build behind "
    "semantic dedup and cluster-balanced sampling): posexplode the vector, "
    "quantize each element to integer micro-units, aggregate exact sums "
    "per (label, dimension), divide once. The quantization is what makes "
    "a distributed float mean ORDER-INSENSITIVE — sum(double) hashes "
    "differently under Spark partial aggregation vs any fixed scan order; "
    "sum(BIGINT) cannot. Long (label, pos) output shape instead of array "
    "columns so the comparison is cell-exact. One shuffle on (label, pos).",
    tags=("embedding", "agg", "similarity"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fan_out(load_table(spark, sf_dir, "embeddings"))
    elems = e.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("val").cast("double") * 1000000.0, 0)
        .cast("long")
        .alias("micro"),
    )
    return elems.groupBy("label", "pos").agg(
        F.sum("micro").alias("sum_micro"),
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("micro").cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1)))
        ).alias("centroid"),
    )


_PACK_SCHEMA = (
    "part_id int, bin_id long, doc_id long, n_tokens long, bin_tokens long"
)
PACK_BUDGET = 512


def _pack_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing bin packing within one partition."""
    part_id = int(pdf["part_id"].iloc[0])
    docs = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    bins: list[list[int]] = []  # remaining budget per bin is derived
    remaining: list[int] = []
    assign: list[int] = []
    for _, row in docs.iterrows():
        need = int(row["n_tokens"])
        placed = -1
        for b, rem in enumerate(remaining):
            if need <= rem:
                placed = b
                break
        if placed < 0:
            bins.append([])
            remaining.append(PACK_BUDGET)
            placed = len(bins) - 1
        bins[placed].append(int(row["doc_id"]))
        remaining[placed] -= need
        assign.append(placed)
    docs["bin_id"] = assign
    totals = docs.groupby("bin_id")["n_tokens"].transform("sum")
    return pd.DataFrame(
        {
            "part_id": part_id,
            "bin_id": docs["bin_id"].astype("int64"),
            "doc_id": docs["doc_id"].astype("int64"),
            "n_tokens": docs["n_tokens"].astype("int64"),
            "bin_tokens": totals.astype("int64"),
        }
    )


@register(
    "doc_pack_sequences",
    oracle=None,  # partition-dependent assignment → rows-only + pytest
    doc="Sequence packing for LLM training: greedy first-fit-decreasing "
    "binning of documents into fixed token budgets (512), partition-local "
    "via applyInPandas — the step that turns a filtered corpus into "
    "dense training sequences. Packing quality is partition-local by "
    "design (global optimal packing is NP-hard and needs no cross-"
    "partition state at 100 TB — each worker packs its shard). Invariants "
    "pytest-checked: every doc assigned exactly once; every bin within "
    "budget unless it holds a single over-budget doc.",
    tags=("text", "packing", "pandas"),
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    sized = d.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    # deterministic partition assignment (not physical partition id): the
    # pack groups are stable across cluster sizes and re-runs
    parted = fan_out(
        sized.withColumn(
            "part_id", F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int")
        ),
        keys=["part_id"],
    )
    return parted.groupBy("part_id").applyInPandas(
        _pack_partition, schema=_PACK_SCHEMA
    )


def semantic_dedup_frame(
    feats: DataFrame,
    *,
    target_cluster_size: int = 200,
    threshold: float = 0.97,
    seed: int | None = None,
) -> tuple[DataFrame, int]:
    """SemDeDup core over a (vec_id, embedding, features) frame.

    k is derived from the corpus — k = max(16, ceil(n / target_cluster_size))
    — so the expected cluster SIZE stays constant as the corpus grows and
    the in-cluster all-pairs term is O(n · target_cluster_size), linear in
    n, not block-quadratic (a fixed k would cap the cluster COUNT instead
    and let cluster sizes, hence the pair join, grow as (n/k)²). This is
    SemDeDup's own scaling rule: k ∝ corpus size.

    Returns (result_df, k) so callers/tests can assert the derived k.
    """
    from ..ml.models import SEED
    from pyspark.ml.clustering import KMeans

    # Materialize once: the frame is consumed four times (k-derivation
    # count, KMeans fit, transform, both sides of the pair self-join) —
    # without this each consumer re-runs the embedding load + vector
    # conversion from lineage.
    feats = feats.localCheckpoint(eager=True)
    n = feats.count()
    k = max(16, -(-n // target_cluster_size))  # ceil without math import
    # Coarse blocking clusters, not a converged clustering: SemDeDup only
    # needs same-neighborhood vectors to land in the same candidate
    # bucket, and the default (maxIter=20, tol=1e-4) never converges on
    # this corpus — it just runs all 20 rounds. 8 rounds at a loose tol
    # halves the fit cost; the dedup invariants
    # (tests/test_semantic_scale.py) are cluster-shape-independent.
    #
    # The fit input is decoupled from the corpus (r8 verdict #5): centers
    # are learned from a DETERMINISTIC hash sample capped at
    # KMEANS_FIT_SAMPLE_CAP rows (xxhash64(vec_id) residue — stable
    # across runs and executors, no Math.random), coalesced so each fit
    # job runs a handful of right-sized tasks instead of 32 near-empty
    # ones (at sf0.1 the whole frame is 2k rows — the old fit cost was
    # almost entirely per-job scheduling tax, and its 4-7s sweep swings
    # were that tax's jitter). initMode='random' drops the multi-pass
    # kmeans|| init — for coarse blocking the seeded random start is
    # just as good and several distributed passes cheaper. transform()
    # still scores the FULL frame distributed; at 100 TB the fit is
    # O(cap·k·iters) regardless of corpus size, which is the SemDeDup
    # production shape (centers from a sample, assignment over all).
    cap = max(KMEANS_FIT_SAMPLE_CAP, 32 * k)  # ≥~32 sample pts per center
    fit_input = feats
    if n > cap:
        keep_ppm = (cap * 1_000_000) // n
        fit_input = feats.where(
            F.pmod(F.xxhash64("vec_id"), F.lit(1_000_000)) < keep_ppm
        )
    fit_input = fit_input.coalesce(max(1, min(n, cap) // 8192 + 1))
    km = KMeans(
        k=k,
        seed=SEED if seed is None else seed,
        featuresCol="features",
        predictionCol="cluster",
        maxIter=8,
        tol=1e-3,
        initMode="random",
    )
    # Norms are computed ONCE per vector before the self-join; inside the
    # join each candidate pair would re-fold 2×64 elements — per-side
    # precomputation turns pair-quadratic fold work into two column reads.
    norm_of = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    # r17 optimization (guide §2.4): ``assigned`` feeds BOTH self-join
    # sides and the final keep-join — without materialization each
    # consumer re-runs the KMeans center-distance projection and the
    # 64-element norm fold (3× per vector). One pass, vector-count rows.
    assigned = (
        km.fit(fit_input)
        .transform(feats)
        .select("vec_id", "cluster", "embedding", norm_of.alias("nrm"))
        .localCheckpoint(eager=False)
    )
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("cluster").alias("a_cluster"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("cluster").alias("b_cluster"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("a_emb"),
            F.col("b_emb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(
            b,
            (F.col("a_cluster") == F.col("b_cluster"))
            & (F.col("b_id") < F.col("a_id")),
        )
        .select(
            "a_id",
            "a_cluster",
            (dot / (F.col("a_nrm") * F.col("b_nrm"))).alias("cos"),
        )
        .where(F.col("cos") >= F.lit(threshold))
        .select(F.col("a_id").alias("dup_id"))
        .distinct()
    )
    result = assigned.join(
        pairs, assigned.vec_id == pairs.dup_id, "left"
    ).select(
        "vec_id",
        "cluster",
        F.col("dup_id").isNull().alias("keep"),
    )
    return result, k


@register(
    "dedup_semantic_kmeans",
    oracle=None,  # KMeans assignment is engine-specific → rows-only
    doc="Semantic dedup (SemDeDup-shaped): KMeans coarse clusters over the "
    "embeddings with k DERIVED from corpus size "
    "(k = max(16, ceil(n/200)) — k ∝ n keeps expected cluster SIZE "
    "constant, so the in-cluster all-pairs term is O(n·200), linear in "
    "n at 100 TB), then WITHIN each cluster exact pairwise cosine — a "
    "doc is dropped if it is ≥ 0.97-similar to a lower-vec_id doc in "
    "the same cluster. The per-cluster pair join is the same "
    "candidate-driven shape as the LSH lanes; "
    "tests/test_semantic_scale.py asserts the pair count stays "
    "sub-quadratic on a synthetic corpus. Output: (vec_id, cluster, "
    "keep).",
    tags=("dedup", "embedding", "ml", "similarity"),
)
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.models import _features_df

    result, _k = semantic_dedup_frame(_features_df(spark, sf_dir))
    return result


@register(
    "scd2_intervals",
    oracle="""
        SELECT user_id, event_type, value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               (lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL) AS is_current
        FROM events
        WHERE user_id < 20
    """,
    doc="SCD2 (slowly-changing-dimension) interval build: each user's "
    "event stream becomes [valid_from, valid_to) versioned rows via "
    "lead() over (ts, event_id) — the CDC-to-dimension transform of a "
    "warehouse ingest, with the deterministic event_id tie-break that "
    "makes equal-timestamp updates reproducible. One shuffle on user_id; "
    "at 100 TB this is the window form of the foreachBatch upserter "
    "(operators/upsert.py) applied to history instead of latest-wins. "
    "Scoped to user_id < 20 to keep the gate result compact.",
    tags=("window", "scd2", "cdc"),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "corpus_to_shards_pipeline",
    oracle=None,  # FFD packing loop is not SQL-expressible → rows-only;
    # determinism + budget invariants in tests/test_traindata.py
    doc="Third flagship composite — raw corpus to training shards: "
    "repetition-quality gate (keep-flagged docs only) → exact dedup "
    "(min doc_id per text) → deterministic 16-way sharding "
    "(xxhash64(doc_id)) → first-fit-decreasing packing into 512-token "
    "bins → per-shard fill report (bins, docs, tokens, mean fill as one "
    "double division of exact sums). One doc_id-keyed exchange feeds the "
    "quality aggregates, one text-keyed exchange dedups, one part_id "
    "exchange packs — three shuffles for the whole corpus-to-shards "
    "path, each strictly smaller than the last (the 100 TB funnel "
    "shape). Output is fully deterministic: hash-derived shards + stable "
    "FFD ordering.",
    tags=("flagship", "text", "packing", "pipeline"),
)
def corpus_to_shards_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    counts = (
        d.select("doc_id", "text", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.max("c").alias("top_word_count"),
    )
    top_frac = F.col("top_word_count").cast("double") / F.col(
        "n_tokens"
    ).cast("double")
    distinct_frac = F.col("distinct_tokens").cast("double") / F.col(
        "n_tokens"
    ).cast("double")
    kept = per_doc.where((top_frac <= 0.2) & (distinct_frac >= 0.25)).join(
        d.select("doc_id", "text"), "doc_id"
    )
    deduped = kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min("n_tokens").alias("n_tokens")
    )
    parted = deduped.select(
        "doc_id",
        "n_tokens",
        F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int").alias("part_id"),
    ).repartition(16, F.col("part_id"))
    packed = parted.groupBy("part_id").applyInPandas(
        _pack_partition, schema=_PACK_SCHEMA
    )
    return packed.groupBy("part_id").agg(
        F.countDistinct("bin_id").alias("n_bins"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum("n_tokens").cast("double")
            / (F.countDistinct("bin_id") * F.lit(float(PACK_BUDGET)))
        ).alias("mean_fill"),
    )


@register(
    "text_vocab_encode",
    oracle="""
        WITH toks AS (
          SELECT doc_id, t.tok, CAST(t.pos - 1 AS BIGINT) AS pos
          FROM (
            SELECT doc_id,
                   unnest(list_transform(string_split(text, ' '),
                          (x, i) -> {'tok': x, 'pos': i})) AS t
            FROM documents
          )
        ),
        freq AS (
          SELECT tok, count(*) AS n FROM toks GROUP BY tok
        ),
        vocab AS (
          SELECT tok,
                 row_number() OVER (ORDER BY n DESC, tok) - 1 AS token_id
          FROM freq
        )
        SELECT toks.doc_id,
               count(*) AS n_tokens,
               CAST(sum(v.token_id) AS BIGINT) AS ids_sum,
               string_agg(CAST(v.token_id AS VARCHAR), ','
                          ORDER BY toks.pos) FILTER (WHERE toks.pos < 8)
                 AS ids_head
        FROM toks JOIN vocab v ON v.tok = toks.tok
        GROUP BY toks.doc_id
    """,
    doc="Vocabulary build + token-id encoding — the tokenize-to-ids step "
    "that turns a filtered corpus into model input: dense ids assigned by "
    "(frequency DESC, term ASC) — the deterministic vocab order every "
    "tokenizer trainer uses — then each document encoded positionally. "
    "The vocab is vocabulary-sized (tiny) and BROADCAST back into the "
    "fact-sized (doc, token, pos) stream, so the only big shuffle is the "
    "per-doc re-assembly; ids_head restores token ORDER via a "
    "position-sorted fold (collect_list alone is unordered — the "
    "canonical-order trap). All-integer outputs hash exactly.",
    tags=("text", "tokens", "vocab", "join"),
)
def text_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"), keys=["doc_id"])
    toks = d.select(
        "doc_id",
        F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # Global dense ids WITHOUT a single-partition window (the naive
    # Window.orderBy(...) funnels the whole vocabulary through one task —
    # fatal for a 10M-term vocab): range-partition by the sort key, rank
    # locally per partition, then add broadcast per-partition offsets.
    # Range partitions tile the global order, so offset + local rank IS
    # the global rank regardless of where the sampled boundaries fall.
    # Partition count tracks the cluster width (defaultParallelism) instead
    # of a hard-coded constant so vocabulary ranking parallelism scales with
    # the executor fleet; floor of 8 keeps small local runs deterministic.
    n_vocab_parts = max(8, spark.sparkContext.defaultParallelism)
    by_rank = freq.repartitionByRange(
        n_vocab_parts, F.col("n").desc(), F.col("tok")
    ).withColumn("pid", F.spark_partition_id())
    local = by_rank.withColumn(
        "local_rank",
        F.row_number().over(
            Window.partitionBy("pid").orderBy(F.col("n").desc(), F.col("tok"))
        ),
    ).localCheckpoint(eager=True)  # pin partitioning: pid must not re-derive
    sizes = {
        r["pid"]: r["cnt"]
        for r in local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], schema="pid int, offset long"
    )
    vocab = local.join(F.broadcast(off_df), "pid").select(
        "tok",
        (F.col("offset") + F.col("local_rank") - 1).alias("token_id"),
    )
    encoded = toks.join(F.broadcast(vocab), "tok")
    return encoded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("token_id").alias("ids_sum"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("pos") < 8,
                            F.struct(F.col("pos"), F.col("token_id")),
                        )
                    )
                ),
                lambda e: e.token_id.cast("string"),
            ),
        ).alias("ids_head"),
    )
