"""Image-lane tests: numpy semantics of mask/crop/normalize (reference
preprocess_image.py:57-136) and the Spark plumbing end-to-end (binaryFile →
mapInPandas → parquet features)."""

from __future__ import annotations

import numpy as np
import pytest

from gjenbruksstasjoner_kotid_estimering_spark.sources import images as im


def test_crop_geometry():
    """ROI bbox crop: 1280×240 frame → 110×1227 (FIXTURES.md; reference
    preprocess_image.py:100-105)."""
    frame = np.zeros((im.RAW_H, im.RAW_W, 3), dtype=np.uint8)
    cropped = im.crop_to_roi_bbox(frame)
    assert cropped.shape == (110, 1227, 3)


def test_mask_outside_roi_white():
    frame = np.zeros((im.RAW_H, im.RAW_W, 3), dtype=np.uint8)
    masked = im.mask_outside_roi(frame)
    # corners are far outside the ROI polygon → painted white
    assert (masked[0, 0] == 255).all()
    assert (masked[-1, -1] == 255).all()
    # a point well inside the polygon keeps its (black) value
    assert (masked[150, 300] == 0).all()
    # mask only ever brightens to white or preserves
    assert set(np.unique(masked)) <= {0, 255}


def test_normalize_range():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = im.normalize(img)
    assert out.dtype == np.float64
    assert out.min() == 0.0 and out.max() == pytest.approx(1.0)


def test_decoder_deterministic():
    a = im.default_decoder(b"hello world" * 100)
    b = im.default_decoder(b"hello world" * 100)
    c = im.default_decoder(b"other bytes!" * 100)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (im.RAW_H, im.RAW_W, 3) and a.dtype == np.uint8


def test_pipeline_end_to_end(spark, tmp_path):
    rng = np.random.default_rng(7)
    names = [
        "station_id_41_20200506T094000.jpg",
        "station_id_41_20200506T095000.jpg",
        "station_id_7_20210101T120000.jpg",
        "not_a_station_frame.jpg",
    ]
    for n in names:
        (tmp_path / n).write_bytes(rng.bytes(4096))
    feats = im.preprocess_images(im.read_images(spark, str(tmp_path)))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in feats.collect()}
    assert len(rows) == 4
    golden = rows["station_id_41_20200506T094000.jpg"]
    assert golden.station_id == 41
    assert golden.epoch == 1588750800  # reference golden (estimate_queue_test.py:30)
    assert len(golden.features) == im.FEATURE_LEN
    assert rows["not_a_station_frame.jpg"].station_id is None
    # persist partitioned by station and read back
    out = tmp_path / "features_out"
    im.write_features(feats, str(out))
    back = spark.read.parquet(str(out))
    assert back.count() == 4
    assert set(back.columns) == {"path", "station_id", "epoch", "features"}


def test_reference_camera_frame_through_lane(spark, tmp_path):
    """Run the reference's actual test fixture frame
    (test/data/station_id_41_20200506T094000.jpg, 1280x240 camera image)
    through the Spark lane: metadata parse must hit the golden epoch and
    features must be deterministic."""
    import shutil
    import os

    src = "/root/reference/test/data/station_id_41_20200506T094000.jpg"
    if not os.path.exists(src):
        pytest.skip("reference fixture not present")
    shutil.copy(src, tmp_path / "station_id_41_20200506T094000.jpg")
    feats = im.preprocess_images(im.read_images(spark, str(tmp_path)))
    rows = feats.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.station_id == 41
    assert r.epoch == 1588750800
    assert len(r.features) == im.FEATURE_LEN
    again = im.preprocess_images(im.read_images(spark, str(tmp_path))).collect()[0]
    assert list(r.features) == list(again.features)


def test_real_codec_golden_parity(spark, tmp_path):
    """Full-fidelity golden check: decode the reference's camera frame with
    REAL cv2, preprocess, featurize with REAL VGG16, and compare against
    the shipped golden vector (test/data/processed_image.bin, float32
    [58368]). Skips cleanly where the optional codec/weights are absent
    (this container); in a codec-equipped container it proves O2/O6 parity
    end-to-end through the Spark lane."""
    import os
    import pickle

    import pytest

    jpg = "/root/reference/test/data/station_id_41_20200506T094000.jpg"
    golden = "/root/reference/test/data/processed_image.bin"
    if not (os.path.exists(jpg) and os.path.exists(golden)):
        pytest.skip("reference fixtures not present")
    if not im.real_lane_available():
        pytest.skip("cv2/VGG16 not available in this container")

    import shutil

    indir = tmp_path / "frames"
    indir.mkdir()
    shutil.copy(jpg, indir / os.path.basename(jpg))
    feats = im.preprocess_images(
        im.read_images(spark, str(indir)),
        decoder=im.cv2_decoder(),
        featurizer=im.vgg16_featurizer(),
    ).collect()
    assert len(feats) == 1
    got = np.asarray(feats[0].features, dtype=np.float32)
    with open(golden, "rb") as f:
        want = np.asarray(pickle.load(f), dtype=np.float32)
    assert got.shape == want.shape == (58368,)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4)
