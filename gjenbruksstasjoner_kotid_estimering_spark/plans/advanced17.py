"""Round-9 wave N — rank statistics, an exact Lloyd step, URL
canonicalization dedup, sketch-guided heavy hitters, and nested-schema
pruning.

Five lanes a reference user (and any 100 TB training-data pipeline)
needs beyond what the registry already covers:

- ``stat_spearman_rank_exact`` / ``stat_kendall_tau_exact`` — the two
  standard rank-correlation statistics, emitted as the INTEGER
  sufficient statistics (tie-corrected doubled ranks / concordance
  counts) so the driver hash is exact across engines — extending the
  integer-exact stats lane (stats.py, advanced14/15's KS and
  Mann-Whitney).
- ``ml_kmeans_one_step_exact`` — one full Lloyd iteration (assign +
  re-aggregate) over the embeddings table in integer micro-units: the
  iterative-ML pattern (broadcast tiny state, one distributed pass per
  step) with a full value-hash oracle, unlike the float-iterating
  `dedup_semantic_kmeans`/`graph_pagerank` rows-only twins.
- ``text_url_canonical_dedup`` — CommonCrawl-style URL canonicalization
  (case-fold host, strip default port, drop utm_* params, sort the
  query string, strip fragments) + exact dedup, the step upstream of
  every web-corpus dedup pipeline.
- ``text_heavy_hitter_tokens`` — sketch-guided exact heavy hitters:
  single-pass ``df.stat.freqItems`` (Misra-Gries; no false negatives)
  proposes a tiny candidate set, an exact count pass restricted to the
  candidates by broadcast semi-join confirms — the two-phase shape that
  replaces a full-vocabulary shuffle at 100 TB.
- ``scan_nested_schema_pruning`` — proves Spark's nested-field pruning
  reaches the parquet scan: a struct-of-struct file where the query
  touches only ``doc.meta.*`` must leave the wide ``doc.text`` bytes
  unread (ReadSchema pinned in tests/test_advanced17.py).

Reference parity note: the reference's only statistic is a linear
interpolation (reference estimate_queue.py:103-140); these extend the
same "calibrated readout over scanned history" surface to the standard
nonparametric toolkit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table
from ..registry import register


# --- Spearman rank correlation (exact, tie-corrected) ----------------------


@register(
    "stat_spearman_rank_exact",
    oracle="""
        WITH r AS (
            SELECT l_returnflag AS grp,
                   2 * rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_quantity)
                     + count(*) OVER (PARTITION BY l_returnflag, l_quantity)
                     - 1 AS rx2,
                   count(*) OVER (PARTITION BY l_returnflag, l_quantity)
                     AS cx,
                   2 * rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY CAST(round(l_extendedprice * 100)
                                              AS BIGINT))
                     + count(*) OVER (PARTITION BY l_returnflag,
                                      CAST(round(l_extendedprice * 100)
                                           AS BIGINT)) - 1 AS ry2,
                   count(*) OVER (PARTITION BY l_returnflag,
                                  CAST(round(l_extendedprice * 100)
                                       AS BIGINT)) AS cy
            FROM lineitem
        )
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum((rx2 - ry2) * (rx2 - ry2)) AS BIGINT)
                   AS d2_sum_x4,
               CAST(sum(cx * cx - 1) AS BIGINT) AS tiecorr_x,
               CAST(sum(cy * cy - 1) AS BIGINT) AS tiecorr_y
        FROM r GROUP BY grp
    """,
    doc="Exact tie-corrected Spearman rank correlation per group, as "
    "integer sufficient statistics: doubled average ranks (2·avg_rank "
    "= 2·min_rank + tie_count − 1 — always integer), Σ(2dᵢ)² = 4Σdᵢ², "
    "and the tie-correction sums Σt(t²−1) per variable (emitted as the "
    "per-row Σ(c²−1) identity, no second aggregation). ρ follows "
    "closed-form downstream; the engine emits only integers so the "
    "driver hash is bit-exact. Plan: two window ranks over the same "
    "group partitioning (one shuffle by group — Spark reuses the "
    "exchange across same-keyed windows), then a hash aggregate. "
    "Σd² ≤ 4n³ bounds: overflow-free below ~1.3e6 rows/group; at "
    "100 TB, compute per-shard Spearman or widen to DECIMAL.",
    tags=("stats", "rank", "window", "exact"),
)
def stat_spearman_rank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Doubled average rank via ONE window spec per variable (r17): with
    # rank() over (grp ORDER BY x) + count() over (grp, x), each
    # variable needs TWO window groups and Catalyst interleaves the four
    # into x,y,x,y — four full-relation sorts (and a DOUBLE partition
    # key additionally sorts by knownfloatingpointnormalized(x), a
    # different key than the rank window's raw x). Instead both pieces
    # come from RANGE frames over the SAME (grp ORDER BY x) spec —
    # count(range unbounded..current) counts u<=v ties included,
    # count(range current..current) counts the tie group — and
    # 2·count_le − cnt + 1 ≡ 2·rank + cnt − 1. One Window group per
    # variable: one exchange + two sorts (was four). x rides as integer
    # cents (order/tie-isomorphic for the <=2-decimal domain).
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    wx = Window.partitionBy("grp").orderBy("x")
    wy = Window.partitionBy("grp").orderBy("y")
    one = F.count(F.lit(1))
    le_x = one.over(wx.rangeBetween(Window.unboundedPreceding, Window.currentRow))
    le_y = one.over(wy.rangeBetween(Window.unboundedPreceding, Window.currentRow))
    cx = one.over(wx.rangeBetween(Window.currentRow, Window.currentRow))
    cy = one.over(wy.rangeBetween(Window.currentRow, Window.currentRow))
    ranked = li.select(
        "grp",
        (2 * le_x - cx + 1).alias("rx2"),
        cx.alias("cx"),
        (2 * le_y - cy + 1).alias("ry2"),
        cy.alias("cy"),
    )
    d = F.col("rx2") - F.col("ry2")
    return ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d * d).alias("d2_sum_x4"),
        F.sum(F.col("cx") * F.col("cx") - 1).alias("tiecorr_x"),
        F.sum(F.col("cy") * F.col("cy") - 1).alias("tiecorr_y"),
    )


# --- Kendall's tau (exact concordance counts) -------------------------------


@register(
    "stat_kendall_tau_exact",
    oracle="""
        WITH c AS (
            SELECT c_nationkey AS nk, c_custkey AS ck,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS x,
                   (c_custkey * 2654435761) % 1048576 AS y
            FROM customer
        )
        SELECT a.nk AS nationkey,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
               CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS tied
        FROM c a JOIN c b ON a.nk = b.nk AND a.ck < b.ck
        GROUP BY a.nk
    """,
    doc="Exact Kendall's tau sufficient statistics per nation: "
    "concordant / discordant / tied pair counts between account "
    "balance (cents) and a Knuth-scrambled key (a deterministic, "
    "engine-portable second variate), via a group-bounded pair "
    "self-join (a.key < b.key halves the square). All integers — "
    "(nc−nd)/n_pairs is tau-a downstream. Scale posture: the join is "
    "keyed by the GROUP (nation), so the quadratic blowup is bounded "
    "per group, never global — at 100 TB group sizes this switches to "
    "the O(n log n) merge-sort inversion count (sort by x, count "
    "inversions in y via the windowed running-rank trick) or per-shard "
    "tau; the registry form documents the semantics exactly.",
    tags=("stats", "rank", "join", "exact"),
)
def stat_kendall_tau_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("ck"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        ((F.col("c_custkey") * 2654435761) % 1048576).alias("y"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.nk") == F.col("b.nk")) & (F.col("a.ck") < F.col("b.ck")),
    ).select(
        F.col("a.nk").alias("nationkey"),
        ((F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))).alias(
            "sgn"
        ),
    )
    return pairs.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("sgn") > 0, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(F.col("sgn") < 0, 1).otherwise(0)).alias("discordant"),
        F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0)).alias("tied"),
    )


# --- one exact Lloyd (k-means) step -----------------------------------------

_K = 8
_MICRO = "CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)"


@register(
    "ml_kmeans_one_step_exact",
    oracle=f"""
        WITH iv AS (
            SELECT vec_id,
                   list_transform(embedding, x -> {_MICRO}) AS v
            FROM embeddings
        ),
        cent AS (SELECT vec_id AS cid, v AS cv FROM iv WHERE vec_id < {_K}),
        assign AS (
            SELECT iv.vec_id,
                   list_aggregate(iv.v, 'sum') AS s,
                   min(list_aggregate(
                           list_transform(list_zip(iv.v, cent.cv),
                                          p -> (p[1]-p[2]) * (p[1]-p[2])),
                           'sum') * {_K} + cent.cid) AS comp
            FROM iv CROSS JOIN cent
            GROUP BY iv.vec_id, s
        )
        SELECT CAST(comp % {_K} AS BIGINT) AS centroid_id,
               CAST(count(*) AS BIGINT) AS n_assigned,
               CAST(sum(comp // {_K}) AS BIGINT) AS inertia_micro2,
               CAST(sum(s) AS BIGINT) AS coord_sum_micro
        FROM assign GROUP BY 1
    """,
    doc="One exact Lloyd (k-means) iteration over the embeddings table "
    "in integer micro-units: k=8 centroids seeded from vec_id<8, every "
    "point assigned to its nearest centroid by integer squared "
    "distance (argmin packed as dist²·k+cid — ties break to the lowest "
    "centroid id deterministically), then the re-aggregation emits per "
    "centroid the EXACT assignment count, inertia (Σ min-dist², the "
    "quantity Lloyd descends), and the coordinate-sum signature of the "
    "new centroid. The iterative-ML execution shape done Spark-first: "
    "centroid state is broadcast (k rows), each step is ONE distributed "
    "pass with zip_with/aggregate entirely JVM-side — no Python, no "
    "driver loop over data. Full value-hash oracle, unlike the "
    "float-iterating dedup_semantic_kmeans/graph_pagerank rows-only "
    "twins. dist² ≤ 64·(2.4e6)² ≈ 3.7e14, ×8 fits BIGINT with 4 "
    "decades to spare.",
    tags=("ml", "kmeans", "broadcast", "exact", "embedding"),
)
def ml_kmeans_one_step_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    micro = lambda col: F.transform(  # noqa: E731
        col, lambda x: F.round(x.cast("double") * 1000000.0).cast("long")
    )
    iv = emb.select("vec_id", micro(F.col("embedding")).alias("v"))
    cent = iv.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    zero = F.lit(0).cast("long")
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        zero,
        lambda acc, x: acc + x,
    )
    assign = (
        iv.join(F.broadcast(cent))
        .select(
            "vec_id",
            F.aggregate(F.col("v"), zero, lambda acc, x: acc + x).alias("s"),
            (d2 * _K + F.col("cid")).alias("comp"),
        )
        .groupBy("vec_id", "s")
        .agg(F.min("comp").alias("comp"))
    )
    return assign.groupBy(
        (F.col("comp") % _K).alias("centroid_id")
    ).agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.sum(F.floor(F.col("comp") / _K)).alias("inertia_micro2"),
        F.sum("s").alias("coord_sum_micro"),
    )


# --- URL canonicalization + dedup -------------------------------------------

# Messy-URL synthesis (deterministic in order columns; variants k=0..3
# differ in host case, explicit default port, utm_* tracking params,
# param order, and fragments — the canonical form depends only on
# o_custkey, so a customer's orders collapse to one canonical URL).
_URL_SQL = """
    CASE o_orderkey % 4
      WHEN 0 THEN 'https://WWW.Example.COM:443/cust/' || o_custkey
                  || '?cust=' || o_custkey || '&seg=web'
      WHEN 1 THEN 'https://WWW.Example.COM/cust/' || o_custkey
                  || '?cust=' || o_custkey || '&seg=web&utm_source=o'
                  || o_orderkey
      WHEN 2 THEN 'https://www.example.com/cust/' || o_custkey
                  || '?seg=web&cust=' || o_custkey
      ELSE 'https://www.example.com/cust/' || o_custkey
           || '?cust=' || o_custkey || '&seg=web#sec' || (o_orderkey % 7)
    END
"""


@register(
    "text_url_canonical_dedup",
    oracle=f"""
        WITH u AS (SELECT o_orderkey, {_URL_SQL} AS url FROM orders),
        canon AS (
            SELECT o_orderkey,
                   regexp_replace(
                       lower(regexp_extract(url, '^https://([^/?#]+)', 1)),
                       ':443$', '')
                   || regexp_extract(url, '^https://[^/?#]+(/[^?#]*)', 1)
                   || '?' ||
                   array_to_string(
                       list_sort(list_filter(
                           str_split(regexp_extract(url, '\\?([^#]*)', 1),
                                     '&'),
                           p -> NOT starts_with(p, 'utm_'))),
                       '&') AS curl
            FROM u
        )
        SELECT curl AS canonical_url,
               CAST(count(*) AS BIGINT) AS n_dups,
               CAST(min(o_orderkey) AS BIGINT) AS first_orderkey
        FROM canon GROUP BY curl
    """,
    doc="URL canonicalization + exact dedup — the step upstream of "
    "every web-corpus pipeline: case-fold the host, strip the default "
    ":443 port, drop the fragment, remove utm_* tracking params, and "
    "SORT the remaining query params, then group by the canonical "
    "form (count + first-seen id). Four deterministic messy variants "
    "are synthesized per order row; all of a customer's orders "
    "collapse to one canonical URL, so n_dups is exact. Entirely "
    "JVM-side string/array kernels (regexp_extract, filter, "
    "array_sort, array_join) — one shuffle, on the canonical key. At "
    "100 TB this is the dedup_exact shape with the canonical URL as "
    "the fingerprint input.",
    tags=("text", "url", "dedup", "string"),
)
def text_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    url = F.expr(_URL_SQL)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, r"^https://([^/?#]+)", 1)),
        r":443$",
        "",
    )
    path = F.regexp_extract(url, r"^https://[^/?#]+(/[^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    canon_q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    curl = F.concat(host, path, F.lit("?"), canon_q)
    return (
        o.select(F.col("o_orderkey"), curl.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("o_orderkey").alias("first_orderkey"),
        )
    )


# --- sketch-guided exact heavy hitters --------------------------------------

_HH_DENOM = 50  # report tokens with count > total/50 (2% support)


@register(
    "text_heavy_hitter_tokens",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(str_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tot AS (SELECT count(*) AS n FROM tok)
        SELECT token,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok
        GROUP BY token
        HAVING count(*) * {_HH_DENOM} > (SELECT n FROM tot)
    """,
    doc="Sketch-guided exact heavy hitters over the corpus token "
    "stream: phase 1 runs Spark's single-pass df.stat.freqItems "
    "(Misra-Gries summaries merged per partition — NO false negatives "
    "above the support threshold, possible false positives), phase 2 "
    "recounts EXACTLY but only rows matching the tiny candidate set "
    "(broadcast hash semi-join pushed to the scan), and the final "
    "filter count·50 > total keeps true >2% tokens — integer "
    "cross-multiplication, no float support ratios. Deterministic "
    "despite the sketch: false positives are filtered by exact counts, "
    "and no true heavy hitter can be missed. The two-phase shape is "
    "the 100 TB answer to full-vocabulary groupBy: the wide shuffle "
    "only ever carries candidate tokens.",
    tags=("text", "sketch", "heavy-hitters", "agg", "llm-data"),
)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    total = tok.count()
    # Misra-Gries proposal pass at a support safely UNDER the report
    # threshold (sketch guarantee is one-sided).
    cand_row = tok.stat.freqItems(["token"], support=1.0 / (2 * _HH_DENOM))
    cands = [r for r in cand_row.collect()[0][0]]
    cand_df = spark.createDataFrame(
        [(c,) for c in cands], "token string"
    )
    exact = (
        tok.join(F.broadcast(cand_df), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.where(F.col("cnt") * _HH_DENOM > F.lit(total))


# --- nested schema pruning ---------------------------------------------------


@register(
    "scan_nested_schema_pruning",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum
        FROM documents GROUP BY lang
    """,
    doc="Nested-field schema pruning at the parquet scan: documents "
    "re-shaped into doc:struct<meta:struct<lang,n_chars>, text> and "
    "written to scratch, then a query touching ONLY doc.meta.* reads "
    "back — Spark's nestedSchemaPruning must push the struct "
    "projection into ReadSchema so the wide doc.text bytes are never "
    "decoded (the dominant cost at 100 TB, where text is ~99% of the "
    "file). tests/test_advanced17.py pins ReadSchema to the pruned "
    "struct. Hermetic per-invocation scratch via scratch.py; the "
    "returned frame is detached (localCheckpoint) before the scratch "
    "dir is deleted.",
    tags=("scan", "parquet", "nested", "pushdown"),
)
def scan_nested_schema_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import detach_result

    df, path = nested_prune_query(spark, sf_dir)
    return detach_result(df, path)


def nested_prune_query(spark: SparkSession, sf_dir: str):
    """Write the nested scratch file and build the pruned-read query;
    returns (DataFrame, scratch_path). Split out so the plan-pin test can
    inspect the query BEFORE detachment collapses it to a checkpoint."""
    from ..scratch import new_scratch_dir

    path = new_scratch_dir("nested_prune")
    docs = load_table(spark, sf_dir, "documents")
    nested = docs.select(
        "doc_id",
        F.struct(
            F.struct(
                F.col("lang"), F.col("n_chars")
            ).alias("meta"),
            F.col("text"),
        ).alias("doc"),
    )
    nested.write.mode("overwrite").parquet(path)
    rd = spark.read.parquet(path)
    agg = rd.groupBy(F.col("doc.meta.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc.meta.n_chars").alias("chars_sum"),
    )
    return agg, path
