"""Audio/video multimodal lane: opaque binary columns + typed metadata +
Arrow-batched processing stubs (driver-mandated multimodal extension).

Same architecture as sources/images.py (the reference's only modality):
``binaryFile`` rows in, one ``mapInPandas`` pass out, with the
codec-dependent step pluggable — the real libraries (ffmpeg/librosa-style)
are not in this container, so the decoders are clearly-marked deterministic
fakes; the Spark-side contract (schemas, batch shape, partitioning) is real
and tested.

- audio: decode → fixed-rate PCM stand-in → frame-energy features
  (float32[N_MEL] per clip)
- video: decode → deterministic frame sampling (every k-th frame index +
  per-frame byte-slice "thumbnail" features)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SAMPLE_RATE = 16_000
N_MEL = 32
FRAME_STRIDE = 10  # sample every 10th frame

audio_features_schema = StructType(
    [
        StructField("path", StringType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", FloatType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

video_frames_schema = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def fake_pcm_decode(content: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE audio decode: bytes → int16-ish PCM float array.
    Replace with a real codec (soundfile/ffmpeg) outside this container."""
    buf = np.frombuffer(content, dtype=np.uint8).astype(np.float32)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.float32)
    return (buf - 127.5) / 127.5


def audio_energy_features(pcm: np.ndarray, n_bands: int = N_MEL) -> np.ndarray:
    """Mean absolute energy over N_MEL equal time bands (mel-spectrogram
    stand-in with the real output contract: flat float32[N_MEL])."""
    usable = pcm[: max(len(pcm) // n_bands, 1) * n_bands]
    if len(usable) < n_bands:
        usable = np.pad(usable, (0, n_bands - len(usable)))
    bands = usable.reshape(n_bands, -1)
    return np.abs(bands).mean(axis=1).astype(np.float32)


def process_audio(
    clips: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_pcm_decode,
) -> DataFrame:
    """binaryFile rows → per-clip audio features in one Arrow-batched pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                pcm = decoder(bytes(content))
                rows.append(
                    {
                        "path": path,
                        "n_samples": len(pcm),
                        "duration_s": np.float32(len(pcm) / SAMPLE_RATE),
                        "features": audio_energy_features(pcm),
                    }
                )
            yield pd.DataFrame(rows)

    return clips.select("path", "content").mapInPandas(
        run, schema=audio_features_schema
    )


def fake_frame_count(content: bytes) -> int:
    """DETERMINISTIC FAKE container probe: frame count from byte length."""
    return max(len(content) // 1024, 1)


def sample_video_frames(
    videos: DataFrame,
    stride: int = FRAME_STRIDE,
    probe: Callable[[bytes], int] = fake_frame_count,
) -> DataFrame:
    """binaryFile rows → one row per sampled frame (every ``stride``-th),
    with per-frame byte-slice features — the frame-sampling fanout shape
    (1 video → many frames) a multimodal training pipeline needs; the
    decode itself is the pluggable fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                n = probe(raw)
                for idx in range(0, n, stride):
                    sl = np.frombuffer(
                        raw[idx * 1024 : idx * 1024 + 64], dtype=np.uint8
                    ).astype(np.float32)
                    if sl.size < 16:
                        sl = np.pad(sl, (0, 16 - sl.size))
                    rows.append(
                        {
                            "path": path,
                            "frame_idx": idx,
                            "n_frames": n,
                            "features": (sl[:16] / 255.0).astype(np.float32),
                        }
                    )
            yield pd.DataFrame(rows)

    return videos.select("path", "content").mapInPandas(
        run, schema=video_frames_schema
    )
