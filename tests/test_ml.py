"""MLlib lane tests: trained heads recover the true linear weights; IVF
search recalls the brute-force top-k."""

from __future__ import annotations

import numpy as np
import pytest

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.ml import models as ml

SF = "/root/testdata/sf0.001"


def test_trained_models_recover_weights(spark):
    """Targets are exactly linear in the features → the normal-equation fit
    must recover TRUE_WEIGHTS (up to numerical tolerance)."""
    trained = ml.train_queue_models(spark, SF)
    for name, true_w in ml.TRUE_WEIGHTS.items():
        got = np.array(trained[name].coefficients)
        np.testing.assert_allclose(got, true_w, rtol=1e-4, atol=1e-4)
        assert abs(trained[name].intercept) < 1e-4


def test_queue_estimate_ml_shape(spark):
    df = registry.all_specs()["queue_estimate_ml"].builder(spark, SF)
    rows = df.collect()
    assert len(rows) == 500  # one estimate per embedding
    for r in rows[:50]:
        assert r.lanes in (1.0, 2.0)
        assert 0.0 <= r.queue_full <= 1.0
        assert r.cars >= 0.0
        assert r.expected_queue_time == pytest.approx(r.cars / 74.0)


def test_ivf_recall_vs_brute_force(spark):
    exact = {
        r.vec_id
        for r in registry.all_specs()["similarity_topk"].builder(spark, SF).collect()
    }
    ivf = {
        r.vec_id
        for r in registry.all_specs()["similarity_topk_ivf"]
        .builder(spark, SF)
        .collect()
    }
    assert 0 in ivf  # the query vector always finds itself (cosine 1.0)
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall} ({exact=} {ivf=})"


def test_classifier_separable_target(spark):
    row = (
        registry.all_specs()["ml_classifier_eval"].builder(spark, SF).collect()[0]
    )
    assert row.n_train + row.n_test == 500
    assert row.accuracy >= 0.9, row
    assert row.auc >= 0.95, row


def test_tfidf_downweights_ubiquitous_tokens(spark):
    df = registry.all_specs()["text_tfidf"].builder(spark, SF)
    rows = df.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r.nnz > 0
        assert r.l2_norm > 0.0
    # a token present in EVERY doc gets IDF log((n+1)/(n+1)) = 0: build a
    # tiny corpus to check the invariant directly
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    tiny = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma")],
        schema="doc_id long, text string",
    )
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="_toks"),
            HashingTF(inputCol="_toks", outputCol="_tf", numFeatures=64),
            IDF(inputCol="_tf", outputCol="_tfidf"),
        ]
    )
    out = pipe.fit(tiny).transform(tiny)
    arrs = [r.a for r in out.select(vector_to_array("_tfidf").alias("a")).collect()]
    # 'common' hashes to the same bucket in every doc; its idf is 0 → its
    # weight vanishes while the unique token keeps positive weight
    for a in arrs:
        positive = [v for v in a if v > 0]
        assert len(positive) == 1


def test_model_save_load_roundtrip(spark, tmp_path):
    """Persist the three trained heads and score from LOADED artifacts —
    the reference's load_model_file registry pattern (estimate_queue.py:
    64-69). Loaded models must predict bit-identically."""
    from gjenbruksstasjoner_kotid_estimering_spark.ml.models import (
        _features_df,
        load_queue_models,
        save_queue_models,
        score,
        train_queue_models,
    )

    models = train_queue_models(spark, SF)
    save_queue_models(models, str(tmp_path / "registry"))
    loaded = load_queue_models(str(tmp_path / "registry"))
    assert set(loaded) == set(models)

    feats = _features_df(spark, SF)
    cols = [f"pred_{n}" for n in models]
    orig = score(models, feats).select("vec_id", *cols).collect()
    redo = score(loaded, feats).select("vec_id", *cols).collect()
    by_id = {r.vec_id: r for r in redo}
    for r in orig:
        s = by_id[r.vec_id]
        for c in cols:
            assert getattr(r, c) == getattr(s, c), (r.vec_id, c)
