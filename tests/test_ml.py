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
