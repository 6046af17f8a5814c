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


def test_jpeg_decoder_grayscale_contract():
    """jpeg_decoder() must honor the cv2.imdecode(IMREAD_COLOR) contract
    on GRAYSCALE streams too: 3 identical channels, not a 2-D array —
    otherwise the two container flavors (cv2 present/absent) diverge."""
    from gjenbruksstasjoner_kotid_estimering_spark.sources import jpeg

    gray = np.full((16, 24), 90, dtype=np.uint8)
    out = im.jpeg_decoder()(jpeg.encode(gray, quality=100))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 1], out[..., 2])


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


FIXTURE_JPG = "/root/reference/test/data/station_id_41_20200506T094000.jpg"
FIXTURE_BIN = "/root/reference/test/data/processed_image.bin"


def test_reference_camera_frame_through_lane(spark, tmp_path):
    """Run the reference's actual test fixture frame
    (test/data/station_id_41_20200506T094000.jpg, 1280x240 camera image)
    through the Spark lane with the REAL JPEG decode (vendored baseline
    codec; cv2 where installed): metadata parse must hit the golden epoch
    and features must be deterministic."""
    import shutil
    import os

    if not os.path.exists(FIXTURE_JPG):
        pytest.skip("reference fixture not present")
    shutil.copy(FIXTURE_JPG, tmp_path / "station_id_41_20200506T094000.jpg")

    def lane():
        return im.preprocess_images(
            im.read_images(spark, str(tmp_path)), decoder=im.jpeg_decoder()
        )

    rows = lane().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.station_id == 41
    assert r.epoch == 1588750800
    assert len(r.features) == im.FEATURE_LEN
    again = lane().collect()[0]
    assert list(r.features) == list(again.features)


def test_real_codec_golden_parity(spark, tmp_path):
    """Golden-fixture parity of the decode → preprocess chain, executed
    unconditionally with the REAL decode path (reference
    preprocess_image.py:198-205):

    - the camera frame decodes to the reference geometry (240×1280 BGR),
    - mask/crop/normalize yield the 110×1227 float crop,
    - the crop geometry IMPLIES the shipped golden vector's length:
      VGG16 include_top=False pools /32 per axis →
      (110//32) × (1227//32) × 512 = 3 × 38 × 512 = 58368, which must
      equal len(processed_image.bin) — the geometry contract between the
      two fixtures holds through OUR chain.
    - where real VGG16 weights are installed, additionally compares the
      full feature vector against the golden.
    """
    import os
    import pickle

    if not (os.path.exists(FIXTURE_JPG) and os.path.exists(FIXTURE_BIN)):
        pytest.skip("reference fixtures not present")

    raw = open(FIXTURE_JPG, "rb").read()
    img = im.jpeg_decoder()(raw)
    assert img.shape == (240, 1280, 3) and img.dtype == np.uint8
    crop = im.normalize(im.crop_to_roi_bbox(im.mask_outside_roi(img)))
    assert crop.shape == (110, 1227, 3)
    assert 0.0 <= crop.min() and crop.max() <= 1.0
    # outside-ROI pixels were painted white → exactly 1.0 after normalize
    assert crop[0, 0, 0] == 1.0

    with open(FIXTURE_BIN, "rb") as f:
        golden = np.asarray(pickle.load(f), dtype=np.float32)
    h, w = crop.shape[:2]
    assert (h // 32) * (w // 32) * 512 == golden.shape[0] == 58368

    if im.real_lane_available():  # full-weights containers only
        got = im.vgg16_featurizer()(crop)
        assert np.allclose(got, golden, rtol=1e-4, atol=1e-4)


def test_image_pipeline_stats_registry_entry(spark):
    """The driver-facing image-lane query (round-5 VERDICT item 4): real
    JPEG encode → binaryFile → decode → mask → crop → normalize →
    featurize, scalar stats out, hermetic scratch cleaned up."""
    import os

    from gjenbruksstasjoner_kotid_estimering_spark import scratch

    df = im.image_pipeline_stats(spark, "/root/testdata/sf0.001")
    rows = {r.frame: r for r in df.collect()}
    assert len(rows) == im._PIPELINE_FRAMES
    for name, r in rows.items():
        assert name.startswith("station_id_") and name.endswith(".jpg")
        assert r.station_id in (41, 42)
        assert r.epoch is not None and r.epoch > 1588000000  # May 2020 CEST
        assert (r.raw_h, r.raw_w) == (im.RAW_H, im._PIPELINE_W)
        # ROI bbox y∈[101,211], x clipped to the narrow frame width
        assert (r.crop_h, r.crop_w) == (110, im._PIPELINE_W)
        assert r.n_features == im.FEATURE_LEN
        assert r.px_checksum > 0
        assert r.feat_norm > 0.0
    # hermetic: no frames linger in scratch after the builder returns
    assert not any(
        n.startswith("frames-") for n in os.listdir(scratch.scratch_root())
    )


def test_image_pipeline_stats_deterministic(spark):
    """Two invocations produce identical stats — the decode chain has no
    RNG, so the rows-only driver check sees a stable result."""
    a = {
        r.frame: (r.px_checksum, r.feat_norm)
        for r in im.image_pipeline_stats(spark, "/root/testdata/sf0.001").collect()
    }
    b = {
        r.frame: (r.px_checksum, r.feat_norm)
        for r in im.image_pipeline_stats(spark, "/root/testdata/sf0.001").collect()
    }
    assert a == b


def test_phash_dedup_finds_exactly_planted_pairs(spark):
    """The registry row must emit exactly the six (original, edit) pairs
    — no misses (recall) and no cross-frame false positives
    (precision), with the documented hamming margins."""
    from gjenbruksstasjoner_kotid_estimering_spark.sources import images as im
    from gjenbruksstasjoner_kotid_estimering_spark.sources import jpeg

    rows = sorted(
        map(
            tuple,
            im.multimodal_image_phash_dedup(spark, "/root/testdata/sf0.001").collect(),
        )
    )
    want = sorted(
        (f"frame_{i:02d}_v0.jpg", f"frame_{i:02d}_v1.jpg")
        for i in range(im._PHASH_BASE_FRAMES)
    )
    assert [(a, b) for a, b, _ in rows] == want
    assert all(h <= im._PHASH_MAX_HAMMING for _, _, h in rows)

    # margin check straight through the codec, no Spark: edits stay
    # within threshold, distinct frames stay clear of it
    dec = im.jpeg_decoder()
    hashes = {
        (i, v): im.dhash64(
            dec(jpeg.encode(im._phash_fixture_frame(i, v), quality=90))
        )
        for i in range(im._PHASH_BASE_FRAMES)
        for v in (0, 1)
    }

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for i in range(im._PHASH_BASE_FRAMES):
        assert ham(hashes[(i, 0)], hashes[(i, 1)]) <= im._PHASH_MAX_HAMMING
    cross = min(
        ham(hashes[(i, v1)], hashes[(j, v2)])
        for i in range(im._PHASH_BASE_FRAMES)
        for j in range(i + 1, im._PHASH_BASE_FRAMES)
        for v1 in (0, 1)
        for v2 in (0, 1)
    )
    assert cross > im._PHASH_MAX_HAMMING
