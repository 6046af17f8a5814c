"""Image-lane throughput: N synthetic frames through the full preprocess
pipeline (binaryFile scan -> mask/crop/normalize/featurize in mapInPandas
-> features). The reference design processes ONE image per container
invocation with a model reload each time (BASELINE.md 'throughput
ceiling'); this measures images/sec on local[N].

Usage: python scripts/bench_images.py [n_images]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark
from gjenbruksstasjoner_kotid_estimering_spark.sources import images as im


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spark = get_spark("bench-images")
    tmp = tempfile.mkdtemp(prefix="frames-")
    rng = np.random.default_rng(1)
    for i in range(n):
        sid = 40 + (i % 5)
        ts = f"2020050{(i % 9) + 1}T{i % 24:02d}{i % 60:02d}00"
        with open(os.path.join(tmp, f"station_id_{sid}_{ts}_{i}.jpg"), "wb") as f:
            f.write(rng.bytes(64_000))  # ~64 KB, JPEG-sized payloads
    t0 = time.perf_counter()
    count = im.preprocess_images(
        im.read_images(spark, tmp),
        n_partitions=spark.sparkContext.defaultParallelism,
    ).count()
    dt = time.perf_counter() - t0
    print(
        f"{count} frames in {dt:.1f}s -> {count / dt:.0f} images/sec "
        f"(cold: includes one-time Python-worker startup)"
    )
    # steady state: workers are warm, measures the pipeline itself
    t0 = time.perf_counter()
    count = im.preprocess_images(
        im.read_images(spark, tmp),
        n_partitions=spark.sparkContext.defaultParallelism,
    ).count()
    dt = time.perf_counter() - t0
    print(
        f"{count} frames in {dt:.1f}s -> {count / dt:.0f} images/sec "
        f"(steady state, full mask/crop/normalize/featurize lane)"
    )


if __name__ == "__main__":
    main()
