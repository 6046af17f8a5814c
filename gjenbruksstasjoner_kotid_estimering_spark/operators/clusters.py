"""Near-duplicate cluster formation — iterative label propagation
(connected components) over MinHash candidate edges.

The dedup endgame a training-data pipeline actually needs: candidate PAIRS
(operators/dedup.dedup_near_minhash) must become disjoint CLUSTERS so one
representative per cluster survives. Connected components is inherently
iterative (non-SQL-expressible per the driver contract → rows-only);
implemented as min-label propagation: every node repeatedly adopts the
smallest label among itself and its neighbors until a fixpoint, with
``localCheckpoint`` each round to truncate the growing lineage (the
standard Spark iterative-algorithm hygiene — without it each iteration
re-plans the whole history).

Iterations are bounded by the graph diameter; each round is one shuffle on
doc_id. At 100 TB this is the classic large-star/small-star regime — the
same loop body, more rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

MAX_ITERATIONS = 20


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """(src, dst) undirected edges → (node, component) with component = min
    node id reachable. Converges in ≤ diameter iterations."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: the edge list is re-read every iteration, and
        # without this the whole upstream pipeline (e.g. MinHash banding)
        # re-executes per round
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


@register(
    "dedup_clusters",
    oracle=None,  # iterative fixpoint — rows-only; invariants pytest-checked
    doc="Near-dup clusters: MinHash-LSH candidate pairs → connected "
    "components via bounded min-label propagation (localCheckpoint per "
    "round) → one row per clustered doc with its cluster id and the "
    "elected representative (min doc_id). The iterative-algorithm surface "
    "of the engine.",
    tags=("dedup", "cluster", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dedup_near_minhash

    pairs = dedup_near_minhash(spark, sf_dir)
    comps = connected_components(pairs)
    return comps.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).alias("is_representative"),
    )
