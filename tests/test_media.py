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
