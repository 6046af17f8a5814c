"""Product-quantization lane (operators/pq.py): codebook determinism,
encode invariants, reconstruction quality, and ADC recall vs exact
search — the invariants that stand in for an oracle on this
engine-specific (rows-only) surface."""

from __future__ import annotations

import numpy as np
import pytest

from gjenbruksstasjoner_kotid_estimering_spark.operators import pq

SF = "/root/testdata/sf0.001"


def _clustered(n=1200, d=64, centers=30, seed=9):
    rng = np.random.default_rng(seed)
    c = rng.normal(0, 5.0, (centers, d))
    x = c[rng.integers(0, centers, n)] + rng.normal(0, 0.3, (n, d))
    return x


def test_codebooks_deterministic():
    x = _clustered()
    a = pq.train_codebooks(x)
    b = pq.train_codebooks(x)
    assert np.array_equal(a, b)
    assert a.shape == (pq.M_SUBVECTORS, pq.K_SUB, 64 // pq.M_SUBVECTORS)
    c = pq.train_codebooks(x, seed=pq.PQ_SEED + 1)
    assert not np.array_equal(a, c)


def test_encode_shapes_and_ranges():
    x = _clustered(n=300)
    books = pq.train_codebooks(x)
    codes = pq.encode_batch(x, books)
    assert codes.shape == (300, pq.M_SUBVECTORS)
    assert codes.dtype == np.uint8
    assert codes.min() >= 0 and codes.max() < pq.K_SUB


def test_reconstruction_beats_rate_zero():
    """PQ reconstruction must capture most of the variance the rate-0
    quantizer (every vector ≈ the mean) leaves behind."""
    x = _clustered()
    books = pq.train_codebooks(x)
    codes = pq.encode_batch(x, books)
    m, ksub, dsub = books.shape
    recon = books[np.arange(m)[None, :], codes.astype(np.int64), :].reshape(
        len(x), -1
    )
    pq_mse = ((x - recon) ** 2).sum(axis=1).mean()
    rate0_mse = ((x - x.mean(axis=0)) ** 2).sum(axis=1).mean()
    # 4-bit-per-subspace codes can't be lossless on 30 well-separated
    # clusters, but must explain the large majority of the variance
    assert pq_mse < 0.30 * rate0_mse


def test_adc_equals_exact_on_reconstructions():
    """ADC distance == exact squared distance to the RECONSTRUCTION —
    the algebraic identity PQ rests on (subspace distances add)."""
    x = _clustered(n=50)
    books = pq.train_codebooks(x)
    codes = pq.encode_batch(x, books)
    q = x[0]
    tables = pq.adc_tables(q, books)
    m = books.shape[0]
    adc = tables[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)
    recon = books[np.arange(m)[None, :], codes.astype(np.int64), :].reshape(
        len(x), -1
    )
    exact = ((recon - q) ** 2).sum(axis=1)
    assert np.allclose(adc, exact, rtol=1e-10, atol=1e-10)


def test_adc_shortlist_recall_on_clustered_corpus():
    """The production PQ contract: PQ resolves CLUSTERS, not
    within-cluster order, so the guarantee to test is that the exact
    top-10 is contained in the ADC top-100 shortlist (then rerank
    restores exact order — test_spark_topk_pq covers that end-to-end)."""
    rng0 = np.random.default_rng(9)
    centers = rng0.normal(0, 5.0, (30, 64))
    labels = rng0.integers(0, 30, 2000)
    x = centers[labels] + rng0.normal(0, 0.3, (2000, 64))
    books = pq.train_codebooks(x)
    codes = pq.encode_batch(x, books)
    m = books.shape[0]
    rng = np.random.default_rng(4)
    shortlist_recalls, purities = [], []
    for qi in rng.integers(0, len(x), 10):
        q = x[qi]
        tables = pq.adc_tables(q, books)
        adc = tables[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)
        exact = ((x - q) ** 2).sum(axis=1)
        top100 = set(np.argsort(adc, kind="stable")[:100])
        top_exact = set(np.argsort(exact, kind="stable")[:10])
        shortlist_recalls.append(len(top100 & top_exact) / 10)
        top10 = np.argsort(adc, kind="stable")[:10]
        purities.append(float(np.mean(labels[top10] == labels[qi])))
    assert np.mean(shortlist_recalls) >= 0.9
    assert np.mean(purities) >= 0.9  # ADC lands in the right cluster


def test_spark_codes_deterministic_and_bounded(spark):
    df = pq.embedding_pq_codes(spark, SF)
    # driver-facing contract: scalar columns only (the round-4 array
    # output crashed the driver's canonicalizer on unhashable ndarrays)
    assert df.columns == ["vec_id", "codes_packed", "recon_err"]
    assert dict(df.dtypes)["codes_packed"] == "bigint"
    rows = {r["vec_id"]: r for r in df.collect()}
    assert len(rows) == 500
    again = {
        r["vec_id"]: r for r in pq.embedding_pq_codes(spark, SF).collect()
    }
    for k in rows:
        assert rows[k]["codes_packed"] == again[k]["codes_packed"]
        assert rows[k]["recon_err"] == again[k]["recon_err"]
        codes = pq.unpack_codes(
            np.array([rows[k]["codes_packed"]], dtype=np.int64)
        )[0]
        assert len(codes) == pq.M_SUBVECTORS
        assert all(0 <= c < pq.K_SUB for c in codes)
        assert rows[k]["codes_packed"] < (1 << (4 * pq.M_SUBVECTORS))
        assert rows[k]["recon_err"] >= 0.0


def test_pack_codes_round_trips():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, pq.K_SUB, size=(64, pq.M_SUBVECTORS)).astype(
        np.uint8
    )
    packed = pq.pack_codes(codes)
    assert packed.dtype == np.int64
    assert (packed >= 0).all() and (packed < (1 << 32)).all()
    assert (pq.unpack_codes(packed) == codes).all()
    # packing is injective on distinct code rows
    uniq_rows = len({tuple(c) for c in codes})
    assert len(set(packed.tolist())) == uniq_rows


def test_spark_topk_pq_matches_exact_after_rerank(spark):
    """End-to-end two-stage search: because rerank is exact on the
    shortlist, the result should equal brute-force exact top-k whenever
    the true top-k survives the shortlist — assert ≥ 8/10 overlap and
    exact agreement on the head."""
    top = pq.similarity_topk_pq(spark, SF).collect()
    assert len(top) == pq.TOP_K
    dists = [r["dist2"] for r in top]
    assert dists == sorted(dists)
    assert top[0]["vec_id"] == pq.QUERY_VEC_ID and top[0]["dist2"] == 0.0

    from gjenbruksstasjoner_kotid_estimering_spark.io import load_table

    rows = load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = x[list(ids).index(pq.QUERY_VEC_ID)]
    exact = ((x - q) ** 2).sum(axis=1)
    order = np.lexsort((ids, exact))
    exact_top = set(ids[order[: pq.TOP_K]].tolist())
    got = {r["vec_id"] for r in top}
    assert len(got & exact_top) >= 8
