"""Round-9 wave H — weighted shortest paths and entity resolution.

Grounding: the traversal family (graph.py: PageRank fixed-point, BFS
frontier, connected components) lacked the two shapes production graph
workloads actually run on TPC-H-like supply data: WEIGHTED shortest
paths ("cheapest supply route") and entity resolution ("which part
records are the same real-world part"). Both are stated exactly — integer
weights / integer edit distances — so DuckDB can restate them and the
driver hash gate carries full values, unlike the float-iterate PageRank
row (rows-only by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

SSSP_SEED = "s:0"
SSSP_HOPS = 4

_SSSP_EDGES_SQL = """
        ew AS (
            SELECT l_suppkey AS s, l_partkey AS p,
                   CAST(min(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
        ),
        e AS (
            SELECT 's:' || CAST(s AS VARCHAR) AS u,
                   'p:' || CAST(p AS VARCHAR) AS v, w FROM ew
            UNION ALL
            SELECT 'p:' || CAST(p AS VARCHAR),
                   's:' || CAST(s AS VARCHAR), w FROM ew
        )
"""


def _sssp_oracle() -> str:
    # unrolled Bellman-Ford: d_{k+1}(x) = min(d_k(x), min over in-edges
    # of d_k(u) + w) — one linear-size min-merge per hop, NO recursive
    # path enumeration (a recursive CTE carrying per-path sums explodes
    # on dense graphs; the min-merge is the same O(E) step Spark runs)
    levels = ["d0 AS (SELECT '%s' AS node, CAST(0 AS BIGINT) AS dist)" % SSSP_SEED]
    for k in range(1, SSSP_HOPS + 1):
        prev = f"d{k - 1}"
        levels.append(
            f"d{k} AS (SELECT node, min(dist) AS dist FROM ("
            f"SELECT node, dist FROM {prev} UNION ALL "
            f"SELECT e.v AS node, {prev}.dist + e.w AS dist "
            f"FROM {prev} JOIN e ON {prev}.node = e.u) GROUP BY node)"
        )
    return (
        "WITH "
        + _SSSP_EDGES_SQL
        + ", "
        + ", ".join(levels)
        + f" SELECT node, CAST(dist AS BIGINT) AS dist FROM d{SSSP_HOPS}"
    )


@register(
    "graph_sssp_weighted",
    oracle=_sssp_oracle(),
    doc="Weighted single-source shortest paths (Bellman-Ford, hop-bounded "
    f"at {SSSP_HOPS}) from supplier 0 over the bipartite supplier—part "
    "graph, edge weight = min lineitem quantity per (s,p) — 'cheapest "
    "supply route within k hops'. Each round relaxes EVERY in-edge "
    "against the current distance relation and min-merges: "
    "d_{k+1} = min(d_k, d_k ⋈ edges + w). The node-sized distance "
    "relation is broadcast against the stationary edge relation, so "
    "edges never shuffle (the BFS row's scale property, kept under "
    "weights); the hop bound makes the result exact and engine-"
    "independent — the oracle is the identical min-merge unrolled in "
    "SQL, NOT a path-enumerating recursive CTE (which explodes on a "
    "dense graph; the min-merge is linear per round on both engines). "
    "Integer distances end to end.",
    tags=("graph", "iterative", "sssp", "exact"),
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ew = (
        li.groupBy(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        )
        .agg(F.min("l_quantity").cast("long").alias("w"))
    )
    s_node = F.concat(F.lit("s:"), F.col("s").cast("string"))
    p_node = F.concat(F.lit("p:"), F.col("p").cast("string"))
    edges = (
        ew.select(s_node.alias("u"), p_node.alias("v"), "w")
        .unionAll(ew.select(p_node.alias("u"), s_node.alias("v"), "w"))
        .localCheckpoint(eager=True)  # one scan, reused every round
    )
    dist = spark.range(1).select(
        F.lit(SSSP_SEED).alias("node"), F.lit(0).cast("long").alias("dist")
    )
    # r17 optimization: the per-round min-merge shuffles only the NODE-
    # sized distance relation (edges are stationary under the broadcast
    # join), so the iteration runs at 8 shuffle partitions — the
    # graph_pagerank/_star_rounds convention; at the session default
    # each of the 4 rounds pays 32 near-empty reduce tasks of pure
    # scheduling tax. Every round materializes inside the scope
    # (localCheckpoint eager), so the scope covers all execution.
    from ..session import scoped_shuffle_partitions

    with scoped_shuffle_partitions(spark, 8):
        for _ in range(SSSP_HOPS):
            relax = (
                F.broadcast(dist)
                .join(edges, dist.node == edges.u)
                .select(
                    F.col("v").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                )
            )
            # r18 (guide §2.5, r17 verdict #4): LAZY checkpoint — round
            # N's state materializes inside round N+1's broadcast build
            # (and the final round inside the caller's action) instead
            # of one eager driver job per round; lineage is truncated
            # either way, and the round's two consumers (broadcast side
            # + union branch) share the one persisted RDD.
            dist = (
                dist.unionByName(relax)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=False)
            )
    return dist


ER_MAX_EDIT = 2
# Name relations at or under this size solve their transitive closure on
# the driver (union-find) instead of running the distributed fixpoint —
# same hybrid-finish convention (and rationale) as clusters.py's
# LOCAL_EDGE_CUTOFF. Pass 0 to force the distributed path.
ER_LOCAL_CUTOFF = 100_000


@register(
    "er_resolve_parts",
    oracle=f"""
        WITH RECURSIVE names AS (
            SELECT DISTINCT p_name AS name FROM part
        ),
        pairs AS (
            SELECT a.name AS a, b.name AS b
            FROM names a JOIN names b
              ON a.name != b.name
             AND levenshtein(a.name, b.name) <= {ER_MAX_EDIT}
        ),
        reach AS (
            SELECT name AS a, name AS b FROM names
            UNION
            SELECT r.a, p.b FROM reach r JOIN pairs p ON r.b = p.a
        ),
        rep AS (SELECT a AS name, min(b) AS rep FROM reach GROUP BY a)
        SELECT rep.rep AS cluster_rep,
               CAST(count(DISTINCT p.p_name) AS BIGINT) AS n_names,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(min(p.p_partkey) AS BIGINT) AS min_partkey,
               CAST(sum(CAST(round(p.p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM part p JOIN rep ON p.p_name = rep.name
        GROUP BY rep.rep
    """,
    doc="Entity resolution over part records — the three-stage pipeline "
    "every dedup system runs (blocking → pairwise match → transitive "
    "clustering), composed scalably: (1) candidate generation on "
    "DISTINCT names only (the 100 TB insight: attribute cardinality, "
    "not row count, drives matching — 64 names here, and the "
    f"levenshtein ≤ {ER_MAX_EDIT} pair join runs on that tiny distinct "
    "relation, never on parts); (2) transitive clustering over the "
    "match graph — a driver union-find when the name relation fits the "
    "probe cutoff (the clusters.py hybrid finish), min-label "
    "propagation to fixpoint as the distributed fallback; "
    "(3) one broadcast join maps every part "
    "row to its cluster representative and aggregates (names, rows, "
    "min key, exact retail cents). Oracle: recursive-CTE transitive "
    "closure + min() — exact because edit distances and the closure "
    "are integers/sets, no scores to drift.",
    tags=("dedup", "graph", "er", "text"),
)
def er_resolve_parts(
    spark: SparkSession,
    sf_dir: str,
    local_cutoff: int = ER_LOCAL_CUTOFF,
    edge_cutoff: int | None = None,
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.name") != F.col("b.name"))
            & (
                F.levenshtein(F.col("a.name"), F.col("b.name"))
                <= ER_MAX_EDIT
            ),
        )
        .select(F.col("a.name").alias("u"), F.col("b.name").alias("v"))
        .localCheckpoint(eager=True)
    )
    # r17 optimization: the match graph is DISTINCT-NAME-sized (attribute
    # cardinality, not row count — the module's own 100 TB insight), so
    # the transitive closure is solved with one driver union-find when
    # the name relation fits ``local_cutoff`` (the clusters.py hybrid-
    # finish convention: limit(cutoff+1) probe, distributed loop as the
    # fallback). Before: 3-6 fixpoint rounds × (join + union + groupBy +
    # checkpoint + change-count), each a full job at tiny data sizes.
    labels = None
    if local_cutoff:
        # r18 (r17 verdict #6): the node probe alone does not bound the
        # collect — a pathological name distribution can emit O(names²)
        # match edges even under the node cutoff, and pairs.collect()
        # would pull all of them to the driver. Probe the EDGE relation
        # with the same limit+cutoff convention; past the cutoff the
        # distributed fixpoint below handles the closure. ``edge_cutoff``
        # defaults to ``local_cutoff`` (one knob); it exists as a
        # separate parameter because on real TPC-H names edges < names,
        # so the fallback is only test-reachable with a lower edge bound
        # (tests/test_advanced13.py).
        ecut = local_cutoff if edge_cutoff is None else edge_cutoff
        head = names.limit(local_cutoff + 1).collect()
        edge_head = (
            pairs.limit(ecut + 1).collect()
            if len(head) <= local_cutoff
            else None
        )
        if edge_head is not None and len(edge_head) <= ecut:
            edge_rows = edge_head  # the probe already holds every edge
            parent: dict = {r["name"]: r["name"] for r in head}

            def find(x: str) -> str:
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in edge_rows:
                ru, rv = find(r["u"]), find(r["v"])
                if ru != rv:  # union by min so the root IS the min label
                    if ru < rv:
                        parent[rv] = ru
                    else:
                        parent[ru] = rv
            labels = spark.createDataFrame(
                [(n, find(n)) for n in parent],
                schema="name string, rep string",
            )
    if labels is None:
        # min-label propagation: rep(x) ← min(rep(x), min rep over nbrs)
        labels = names.select("name", F.col("name").alias("rep"))
        while True:
            prop = (
                pairs.join(labels, pairs.u == labels.name)
                .select(F.col("v").alias("name"), "rep")
                .unionByName(labels)
                .groupBy("name")
                .agg(F.min("rep").alias("rep"))
                .localCheckpoint(eager=True)
            )
            changed = (
                prop.alias("n")
                .join(
                    labels.alias("o"),
                    (F.col("n.name") == F.col("o.name"))
                    & (F.col("n.rep") != F.col("o.rep")),
                )
                .count()
            )
            labels = prop
            if changed == 0:
                break
    clustered = part.join(
        F.broadcast(labels), part.p_name == labels.name
    )
    return clustered.groupBy(F.col("rep").alias("cluster_rep")).agg(
        F.countDistinct("p_name").alias("n_names"),
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
        F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )
