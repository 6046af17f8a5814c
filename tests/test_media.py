"""Audio/video multimodal lane: schema, determinism, frame-sampling fanout."""

from __future__ import annotations

import numpy as np

from gjenbruksstasjoner_kotid_estimering_spark.sources import images as im
from gjenbruksstasjoner_kotid_estimering_spark.sources import media as md


def _write_clips(tmp_path, ext, sizes):
    rng = np.random.default_rng(11)
    for i, size in enumerate(sizes):
        (tmp_path / f"clip_{i}.{ext}").write_bytes(rng.bytes(size))


def test_audio_features(spark, tmp_path):
    _write_clips(tmp_path, "wav", [8000, 16000, 100])
    clips = im.read_images(spark, str(tmp_path), glob="*.wav")
    feats = md.process_audio(clips)
    rows = sorted(feats.collect(), key=lambda r: r.path)
    assert len(rows) == 3
    for r in rows:
        assert len(r.features) == md.N_MEL
        assert r.duration_s == np.float32(r.n_samples / md.SAMPLE_RATE)
    # deterministic: same bytes → same features
    again = sorted(md.process_audio(clips).collect(), key=lambda r: r.path)
    for a, b in zip(rows, again):
        assert a.features == b.features


def test_video_frame_sampling(spark, tmp_path):
    _write_clips(tmp_path, "mp4", [1024 * 25, 1024 * 7])
    vids = im.read_images(spark, str(tmp_path), glob="*.mp4")
    frames = md.sample_video_frames(vids)
    rows = frames.collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path.rsplit("/", 1)[-1], []).append(r)
    # 25 frames, stride 10 → indices 0,10,20; 7 frames → index 0
    assert sorted(r.frame_idx for r in by_path["clip_0.mp4"]) == [0, 10, 20]
    assert sorted(r.frame_idx for r in by_path["clip_1.mp4"]) == [0]
    for r in rows:
        assert len(r.features) == 16
        assert all(0.0 <= v <= 1.0 for v in r.features)


def test_image_tiles_conserve_checksums_and_grid(spark):
    """Tile checksums sum back to the whole-frame checksum (zero padding
    adds nothing) and the grid is exactly ceil(h/16) x ceil(w/16)."""
    from conftest import SF0001

    tiles = im.multimodal_image_tiles(spark, SF0001).collect()
    frames = {}
    for r in tiles:
        frames.setdefault(r.frame, []).append(r)
    assert len(frames) == im._TILES_FRAMES
    nr = -(-im.RAW_H // im.TILE)
    nc = -(-im._PIPELINE_W // im.TILE)
    for i in range(im._TILES_FRAMES):
        img = im._synthetic_frame(i).astype(np.int64)
        # recover this frame's rows by its exact whole-image checksum
        # after JPEG decode (lossy: decode the encoded bytes, like the op)
        from gjenbruksstasjoner_kotid_estimering_spark.sources import jpeg

        decoded = jpeg.decode(jpeg.encode(img.astype(np.uint8), quality=90))
        want_sum = int(decoded.astype(np.int64).sum())
        match = [
            rows
            for rows in frames.values()
            if sum(r.px_sum for r in rows) == want_sum
        ]
        assert match, f"no frame's tiles sum to frame {i}'s checksum"
    for rows in frames.values():
        assert len(rows) == nr * nc
        assert {(r.tile_row, r.tile_col) for r in rows} == {
            (r_, c_) for r_ in range(nr) for c_ in range(nc)
        }
        for r in rows:
            assert r.px_sum == r.sum_b + r.sum_g + r.sum_r
