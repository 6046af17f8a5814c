"""Keras artifact interop (ml/keras_import.py): npz round-trip, forward
pass vs hand numpy, and exact parity with MLlib linear scoring — the
'user arrives with the reference .h5 heads' migration path
(reference estimate_queue.py:24-28,64-69)."""

from __future__ import annotations

import numpy as np
import pytest

from gjenbruksstasjoner_kotid_estimering_spark.ml import keras_import as ki


def _mlp_layers(rng, dims):
    return [
        (rng.normal(size=(dims[i], dims[i + 1])), rng.normal(size=dims[i + 1]))
        for i in range(len(dims) - 1)
    ]


def test_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    layers = _mlp_layers(rng, [64, 16, 1])
    path = tmp_path / "station_41_queue_full.npz"
    arrs = {}
    for i, (w, b) in enumerate(layers):
        arrs[f"layer{i}_W"], arrs[f"layer{i}_b"] = w, b
    np.savez(path, **arrs)
    loaded = ki.load_npz_weights(str(path))
    assert len(loaded) == 2
    for (w0, b0), (w1, b1) in zip(layers, loaded):
        assert np.array_equal(w0, w1) and np.array_equal(b0, b1)


def test_validate_rejects_mismatch():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="mismatch"):
        ki._validate([(rng.normal(size=(4, 3)), rng.normal(size=2))])
    with pytest.raises(ValueError, match="input dim"):
        ki._validate(
            [
                (rng.normal(size=(4, 3)), rng.normal(size=3)),
                (rng.normal(size=(5, 1)), rng.normal(size=1)),
            ]
        )
    with pytest.raises(ValueError, match="no dense layers"):
        ki._validate([])


def test_forward_matches_hand_numpy():
    rng = np.random.default_rng(11)
    layers = _mlp_layers(rng, [8, 5, 1])
    x = rng.normal(size=(7, 8))
    got = ki.forward(x, layers, hidden_activation="relu")
    h = np.maximum(x @ layers[0][0] + layers[0][1], 0.0)
    want = (h @ layers[1][0] + layers[1][1])[:, 0]
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_h5_loader_gated():
    """Without h5py the .h5 path raises an actionable ImportError that
    names the npz extraction alternative."""
    try:
        import h5py  # noqa: F401

        pytest.skip("h5py installed — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="npz"):
        ki.load_h5_weights("/root/reference/queue_time_predictions/models/"
                           "station_41_queue_full.h5")


def test_spark_scoring_matches_mllib_linear(spark, tmp_path):
    """Train the three MLlib heads, export them as Keras-shaped single
    dense layers, score via the imported-weights pandas-UDF path, and
    assert per-row parity with model.transform — a user swapping in real
    reference artifacts gets the identical downstream lane."""
    from gjenbruksstasjoner_kotid_estimering_spark.ml import models as M

    sf = "/root/testdata/sf0.001"
    trained = M.train_queue_models(spark, sf)
    feats = M._features_df(spark, sf)

    heads = {name: ki.from_linear_regression(m) for name, m in trained.items()}
    imported = ki.score_imported(feats, heads)
    mllib = M.score(trained, feats)

    a = {
        r["vec_id"]: r
        for r in imported.select(
            "vec_id", *[f"pred_{n}" for n in heads]
        ).collect()
    }
    b = {
        r["vec_id"]: r
        for r in mllib.select(
            "vec_id", *[f"pred_{n}" for n in heads]
        ).collect()
    }
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        for n in heads:
            assert a[k][f"pred_{n}"] == pytest.approx(
                b[k][f"pred_{n}"], rel=1e-9, abs=1e-9
            )


def test_npz_head_through_estimator_chain(spark, tmp_path):
    """End-to-end migration shape: npz artifacts on disk → loaded heads →
    Spark scoring → the reference estimator chain runs unchanged."""
    from gjenbruksstasjoner_kotid_estimering_spark.ml import models as M
    from gjenbruksstasjoner_kotid_estimering_spark.functions import (
        estimator as est,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rng = np.random.default_rng(5)
    heads = {}
    for name in ("queue_end_pos", "queue_lanes", "queue_full"):
        layers = _mlp_layers(rng, [M.EMB_DIM, 1])
        path = tmp_path / f"station_41_{name}.npz"
        np.savez(
            path,
            **{
                "layer0_W": layers[0][0],
                "layer0_b": layers[0][1],
            },
        )
        heads[name] = ki.load_npz_weights(str(path))

    scored = ki.score_imported(M._features_df(spark, sf), heads).select(
        F.col("vec_id").alias("station_id"),
        F.col("pred_queue_end_pos").alias("queue_end_pos"),
        F.when(F.col("pred_queue_lanes") > 0.0, 1.0).otherwise(0.0).alias(
            "queue_lanes"
        ),
        F.least(
            F.greatest(F.col("pred_queue_full"), F.lit(0.0)), F.lit(1.0)
        ).alias("queue_full"),
    )
    out = est.with_queue_estimate(scored, spark)
    rows = out.collect()
    assert len(rows) == 500
    for r in rows:
        assert r["expected_queue_time"] is None or r["expected_queue_time"] >= 0
