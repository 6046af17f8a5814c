"""Round-8 wave E: ALS recommendations and the advanced12 semantics rows."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.ml import recommend as rec
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced12 as a12

from conftest import SF0001


def test_als_beats_mean_predictor_on_training_fit(spark):
    from pyspark.ml.recommendation import ALS

    ratings = rec.build_ratings(spark, SF0001).cache()
    try:
        als = ALS(
            rank=rec.RANK,
            maxIter=rec.ITERS,
            regParam=0.1,
            seed=rec.SEED,
            userCol="user",
            itemCol="item",
            ratingCol="qty",
            coldStartStrategy="drop",
        )
        model = als.fit(ratings)
        pred = model.transform(ratings)
        row = pred.agg(
            F.sqrt(
                F.avg((F.col("prediction") - F.col("qty")) ** 2)
            ).alias("rmse"),
            F.stddev_pop("qty").alias("baseline"),
        ).collect()[0]
        assert math.isfinite(row.rmse)
        # the factorization must fit training data better than the
        # constant mean predictor (whose RMSE is the population stddev)
        assert row.rmse < row.baseline
    finally:
        ratings.unpersist()


def test_als_recommendations_shape_and_reproducibility(spark):
    out1 = rec.ml_als_recommend(spark, SF0001)
    rows1 = sorted(map(tuple, out1.collect()))
    n_users = rec.build_ratings(spark, SF0001).select("user").distinct().count()
    assert len(rows1) == n_users * rec.TOP_K
    per_user: dict[int, list[int]] = {}
    for cust, rank, part, score in rows1:
        per_user.setdefault(cust, []).append(rank)
        assert part % 4 == 0  # recommendations come from the sampled items
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_user.values())
    # same seed, same data, same session => identical output
    rows2 = sorted(map(tuple, rec.ml_als_recommend(spark, SF0001).collect()))
    assert rows1 == rows2


def test_not_in_null_variant_counts(spark):
    counts = {
        r.variant: r.n_orders
        for r in a12.subquery_not_in_null_semantics(spark, SF0001).collect()
    }
    assert counts["not_in_with_null"] == 0  # three-valued logic trap
    assert counts["not_in_clean"] == counts["not_exists"]
    assert counts["not_exists"] == counts["anti_join"]
    assert counts["not_in_clean"] > 0


def test_tz_convert_is_a_pure_phase_shift(spark):
    rows = a12.date_tz_convert(spark, SF0001).collect()
    assert len(rows) == 24
    for r in rows:
        assert r.hour_oslo == (r.hour_utc + 1) % 24
    # the 23:00 UTC bucket rolls into the NEXT Oslo calendar day
    late = [r for r in rows if r.hour_utc == 23]
    assert late and late[0].n_local_days >= 1
