"""Product quantization (PQ) over the embedding column — compressed
vector storage + asymmetric-distance top-k, the billion-scale ANN path.

At 100 TB of embeddings the dominant cost of similarity search is
reading vectors: 64 float32 dims = 256 bytes/vec. PQ (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
index FAISS IVFPQ builds on) splits each vector into M subvectors and
replaces each with the id of its nearest subspace centroid: M=8, 16
centroids/subspace → 8 × 4 bits = 8 bytes/vec, a 32× scan reduction.
Queries stay full-precision and score codes via Asymmetric Distance
Computation (ADC): per subspace, a 16-entry lookup table of distances
from the query subvector to each centroid; a vector's approximate
distance is M table lookups + adds, never a decode.

Spark-first split of the work, mirroring how FAISS trains at scale:

- **codebook training is sample-based and driver-side**: Lloyd's
  k-means on a deterministic bounded sample (TRAIN_SAMPLE vecs — FAISS
  recommends k·(39~256) training points per subspace; 2048 for k=16 is
  comfortably above) in numpy. Training on the full corpus would be a
  distributed-KMeans-per-subspace job for no quality gain.
- **encode/score are distributed**: the (M, K, dsub) codebook tensor is
  tiny and rides to executors in the UDF closure; each Arrow batch is
  encoded/scored with one vectorized numpy broadcast per subspace —
  Python at the declared batch-at-a-time surface only.

Both operators are rows-only by design (k-means codebooks are
engine-specific); tests/test_pq.py pins determinism, code-range/shape
invariants, reconstruction-error improvement over the rate-0 quantizer,
and ADC top-k recall against exact search on a clustered corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..io import load_table
from ..registry import register

M_SUBVECTORS = 8
K_SUB = 16  # 4-bit codes
TRAIN_SAMPLE = 2048
TRAIN_ITERS = 10
PQ_SEED = 41
TOP_K = 10
QUERY_VEC_ID = 0  # same query convention as similarity_topk


def train_codebooks(
    sample: np.ndarray,
    m: int = M_SUBVECTORS,
    ksub: int = K_SUB,
    iters: int = TRAIN_ITERS,
    seed: int = PQ_SEED,
) -> np.ndarray:
    """(n, d) training sample → (m, ksub, d//m) codebook tensor.

    Deterministic kmeans++ seeding + fixed-iteration Lloyd per subspace.
    Empty clusters are re-seeded to the point farthest from its centroid
    (the standard FAISS/scikit repair)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * dsub : (j + 1) * dsub].astype(np.float64)
        # kmeans++ init
        cents = np.empty((ksub, dsub))
        cents[0] = x[rng.integers(n)]
        d2 = ((x - cents[0]) ** 2).sum(axis=1)
        for c in range(1, ksub):
            probs = d2 / d2.sum() if d2.sum() > 0 else None
            cents[c] = x[rng.choice(n, p=probs)]
            d2 = np.minimum(d2, ((x - cents[c]) ** 2).sum(axis=1))
        for _ in range(iters):
            dist = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(axis=0)
                else:  # re-seed empty cluster at the worst-fit point
                    cents[c] = x[dist.min(axis=1).argmax()]
        books[j] = cents
    return books


def encode_batch(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 codes, one vectorized argmin per subspace."""
    n, d = x.shape
    m, ksub, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        dist = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = dist.argmin(axis=1)
    return codes


def adc_tables(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Full-precision query → (m, ksub) squared-distance lookup tables."""
    m, ksub, dsub = books.shape
    return np.stack(
        [
            ((books[j] - query[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
            for j in range(m)
        ]
    )


def _train_from_corpus(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Deterministic bounded training sample → codebooks. The sample is
    taken by vec_id stride (no RNG in the distributed path) and collect
    is bounded by TRAIN_SAMPLE regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    # ceil, not floor: a floored stride of 1 for n in
    # [TRAIN_SAMPLE, 2·TRAIN_SAMPLE) would make the limit() keep only the
    # corpus HEAD (lowest vec_ids) instead of a spread sample — fatal when
    # rows are ordered by source/time
    stride = max(1, -(-n // TRAIN_SAMPLE))
    rows = (
        e.where(F.col("vec_id") % stride == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(TRAIN_SAMPLE)
        .collect()
    )
    sample = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return train_codebooks(sample)


_CODES_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("codes", ArrayType(IntegerType())),
        StructField("codes_packed", LongType()),
        StructField("recon_err", DoubleType()),
    ]
)


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """(n, m) uint8 4-bit codes → (n,) int64, code j in bits [4j, 4j+4).

    Exact and reversible for m ≤ 15 (here m=8 → 32 bits used): the scalar
    form a driver/oracle can sort and hash, where the raw ``array<int>``
    column crashed the round-4 driver canonicalizer (numpy arrays are
    unhashable). The storage story is unchanged — 8 bytes/vec either way.
    """
    m = codes.shape[1]
    shifts = (4 * np.arange(m, dtype=np.int64))[None, :]
    return (codes.astype(np.int64) << shifts).sum(axis=1)


def unpack_codes(packed: np.ndarray, m: int = M_SUBVECTORS) -> np.ndarray:
    """Inverse of :func:`pack_codes`: (n,) int64 → (n, m) uint8."""
    shifts = (4 * np.arange(m, dtype=np.int64))[None, :]
    return ((packed.astype(np.int64)[:, None] >> shifts) & 0xF).astype(
        np.uint8
    )


def _encode_df(spark: SparkSession, sf_dir: str, books: np.ndarray) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def enc(batches):
        for pdf in batches:
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            codes = encode_batch(x, books)
            m, ksub, dsub = books.shape
            recon = books[np.arange(m)[None, :], codes.astype(np.int64), :]
            recon = recon.reshape(len(x), -1)
            err = np.sqrt(((x - recon) ** 2).sum(axis=1))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "codes": list(codes.astype(np.int32)),
                    "codes_packed": pack_codes(codes),
                    "recon_err": err,
                }
            )

    return e.mapInPandas(enc, schema=_CODES_SCHEMA)


@register(
    "embedding_pq_codes",
    oracle=None,  # k-means codebooks are engine-specific → rows-only
    doc="Product-quantization encode of the embedding column: sample-"
    f"trained codebooks (M={M_SUBVECTORS} subspaces × {K_SUB} centroids "
    "= 4-bit codes, 32× smaller than float32), distributed Arrow-batch "
    "encoding, per-vector L2 reconstruction error. The compressed-"
    "vector-storage stage of a billion-scale ANN index "
    "(tests/test_pq.py pins determinism, code ranges, and that PQ "
    "explains most of the variance the rate-0 quantizer leaves). "
    "Output carries the 8 codes PACKED into one BIGINT (4 bits each, "
    "pack_codes) — scalar columns only, so the driver can sort/hash the "
    "rows; the array form stays internal to the ADC path.",
    tags=("similarity", "embedding", "compression", "ml"),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    books = _train_from_corpus(spark, sf_dir)
    return _encode_df(spark, sf_dir, books).select(
        "vec_id", "codes_packed", "recon_err"
    )


SHORTLIST = 100  # ADC shortlist size; exact rerank runs on these only


@register(
    "similarity_topk_pq",
    oracle=None,  # PQ shortlist membership is engine-specific → rows-only
    doc=f"Two-stage PQ nearest-neighbor search for the vec_id="
    f"{QUERY_VEC_ID} query — the shape every production PQ index uses: "
    "(1) SHORTLIST: every stored vector scored from its 8 codes via "
    "per-subspace ADC lookup tables (no decode, 8 adds/vec over 8-byte "
    f"codes instead of 256-byte floats), TakeOrdered keeps {SHORTLIST}; "
    "(2) RERANK: exact L2 on the shortlist only (a broadcast semi-join "
    f"back to the float vectors — {SHORTLIST} rows however large the "
    f"corpus), emit the top {TOP_K}. PQ resolves clusters, not "
    "within-cluster order — the rerank restores exact order while the "
    "compressed scan keeps 100 TB of vectors out of the fast path. "
    "Shortlist recall is pytest-asserted on a clustered corpus.",
    tags=("similarity", "topk", "compression"),
)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    books = _train_from_corpus(spark, sf_dir)
    qrow = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()
    )
    query = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    tables = adc_tables(query, books)
    codes = _encode_df(spark, sf_dir, books).select("vec_id", "codes")

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("adc_dist2", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            c = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            m = c.shape[1]
            d2 = tables[np.arange(m)[None, :], c].sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "adc_dist2": d2})

    shortlist = (
        codes.mapInPandas(score, schema=out_schema)
        .orderBy(F.col("adc_dist2"), F.col("vec_id"))
        .limit(SHORTLIST)
        .select("vec_id")
    )
    # exact rerank on the tiny shortlist: broadcast it into the vector
    # table, fold the exact L2 in double
    qlit = F.array(*[F.lit(float(v)) for v in query])
    exact_d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            qlit,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        e.join(F.broadcast(shortlist), "vec_id")
        .select("vec_id", exact_d2.alias("dist2"))
        .orderBy(F.col("dist2"), F.col("vec_id"))
        .limit(TOP_K)
    )
