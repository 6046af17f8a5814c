"""Scale guard for SemDeDup-shaped semantic dedup.

``semantic_dedup_frame`` derives k from the corpus
(k = max(16, ceil(n / target_cluster_size))) so the expected cluster SIZE
stays constant as the corpus grows: the in-cluster all-pairs term is then
O(n · target_cluster_size) — linear in n — instead of the block-quadratic
O(n²/k) a fixed k would give. These tests build a synthetic embedding
corpus large enough that the derived k must exceed the floor, assert the
derivation, and assert the realized candidate-pair count stays far below
the full-quadratic n(n-1)/2.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata import (
    semantic_dedup_frame,
)

DIM = 16


def _synthetic_feats(spark, n_docs: int, n_centers: int = 40, seed: int = 7):
    """(vec_id, embedding, features) frame: points drawn around
    ``n_centers`` well-separated centers, plus a few exact duplicates so
    the dedup path itself is exercised."""
    from pyspark.ml.functions import array_to_vector

    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 10.0, (n_centers, DIM))
    rows = []
    for i in range(n_docs):
        c = centers[i % n_centers]
        vec = c + rng.normal(0.0, 0.05, DIM)
        rows.append((i, [float(x) for x in vec]))
    # exact duplicates of the first few docs (higher vec_id → dropped side)
    for j in range(5):
        rows.append((n_docs + j, rows[j][1]))
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    return df.withColumn(
        "features",
        array_to_vector(F.transform("embedding", lambda x: x.cast("double"))),
    )


def test_k_derivation_floor(spark):
    """Small corpora stay at the floor of 16."""
    feats = _synthetic_feats(spark, 200, n_centers=8)
    _, k = semantic_dedup_frame(feats, target_cluster_size=200)
    assert k == 16


def test_k_scales_with_corpus(spark):
    """k ∝ n above the floor: 5000 docs @ target 100 → k = ceil(5005/100)."""
    feats = _synthetic_feats(spark, 5000)
    result, k = semantic_dedup_frame(feats, target_cluster_size=100)
    n = 5005
    assert k == -(-n // 100) == 51
    # result covers every vec exactly once
    assert result.count() == n


def test_pair_count_subquadratic(spark):
    """Realized in-cluster pair count « n(n-1)/2 and within a constant
    factor of the linear n·target bound."""
    n_docs, target = 3000, 100
    feats = _synthetic_feats(spark, n_docs, n_centers=60)
    n = n_docs + 5

    from gjenbruksstasjoner_kotid_estimering_spark.ml.models import SEED
    from pyspark.ml.clustering import KMeans

    k = max(16, -(-n // target))
    km = KMeans(k=k, seed=SEED, featuresCol="features",
                predictionCol="cluster")
    sizes = (
        km.fit(feats)
        .transform(feats)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .collect()[0]["pairs"]
    )
    full_quadratic = n * (n - 1) / 2
    # far below all-pairs…
    assert sizes < 0.10 * full_quadratic
    # …and within a constant factor of the linear-in-n design bound.
    # (KMeans clusters aren't exactly target-sized; 20× absorbs skew while
    # still failing hard if k were fixed: fixed k=16 gives ~n²/16 ≈ 28×
    # this bound at n=3005.)
    assert sizes < 20 * n * target


def test_duplicates_dropped_originals_kept(spark):
    feats = _synthetic_feats(spark, 400, n_centers=20)
    result, _ = semantic_dedup_frame(feats, target_cluster_size=100)
    rows = {r["vec_id"]: r["keep"] for r in result.collect()}
    # the 5 appended exact duplicates (vec_id >= 400) must be dropped
    for j in range(5):
        assert rows[400 + j] is False
    # their lower-id originals must be kept
    for j in range(5):
        assert rows[j] is True
