"""Collaborative-filtering recommendations via MLlib ALS.

Grounding: the reference ships a learned model scored inside the
pipeline (estimate_queue.py:64-88 loads and applies a Keras model);
this module is the same learn-then-serve contract for the
interaction-matrix case — implicit "ratings" derived from order
history, factorized with alternating least squares, served as top-k
recommendations per customer. ALS is the one MLlib algorithm whose
distributed structure matters at 100 TB: the ratings matrix is
block-partitioned by user and item, and each half-iteration is a
shuffle-join between factor blocks and rating blocks — no driver-side
matrix ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

RANK = 8
ITERS = 5
TOP_K = 5
SEED = 42


def build_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit ratings: quantity each customer ordered of each part,
    on a deterministic 1/16 stratified subsample (custkey%4==0 and
    partkey%4==0) that bounds local training cost; the full matrix is
    what a cluster run would train on."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .where(
            (F.col("o_custkey") % 4 == 0) & (F.col("l_partkey") % 4 == 0)
        )
        .groupBy("o_custkey", "l_partkey")
        .agg(F.sum("l_quantity").cast("float").alias("qty"))
        .select(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
            "qty",
        )
    )


@register(
    "ml_als_recommend",
    oracle=None,  # iterative factorization — rows-only; fit quality and
    # reproducibility are pinned in tests/test_recommend.py
    doc="ALS matrix factorization (rank 8, 5 iterations, fixed seed) "
    "over implicit order-quantity ratings, served as top-5 part "
    "recommendations per customer with milli-quantized scores. "
    "Training data is a deterministic modulo-stratified subsample "
    "(bounds local cost; the distributed structure — user/item block "
    "partitioning, factor-block shuffle joins per half-iteration — "
    "is the same one that scales to a 100 TB interaction matrix "
    "with no driver-side state). Row count is exactly "
    "5 x |sampled customers|; pytest pins training RMSE below the "
    "mean-predictor baseline and same-seed reproducibility.",
    tags=("ml", "recommend", "als"),
)
def ml_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.recommendation import ALS

    ratings = build_ratings(spark, sf_dir)
    als = ALS(
        rank=RANK,
        maxIter=ITERS,
        regParam=0.1,
        seed=SEED,
        userCol="user",
        itemCol="item",
        ratingCol="qty",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(TOP_K)
    return recs.select(
        F.col("user").cast("long").alias("o_custkey"),
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "o_custkey",
        (F.col("pos") + 1).cast("long").alias("rec_rank"),
        F.col("rec.item").cast("long").alias("l_partkey"),
        F.round(F.col("rec.rating") * 1000.0)
        .cast("long")
        .alias("score_milli"),
    )
