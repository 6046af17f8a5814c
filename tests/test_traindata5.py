"""Round-7 training-data ops: embedding dim stats, importance resampling."""

from __future__ import annotations

import numpy as np
import pytest

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.operators import traindata5 as t5

from conftest import SF0001, SF001


def test_embedding_dim_stats_match_numpy(spark):
    rows = t5.embedding_dim_stats(spark, SF0001).collect()
    embs = np.array(
        load_table(spark, SF0001, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist()
    )
    micro = np.round(embs.astype("float64") * 1e6).astype("int64")
    assert len(rows) == embs.shape[1]
    for r in rows:
        col = micro[:, r["pos"]]
        assert r["n_vecs"] == len(col)
        assert r["sum_micro"] == int(col.sum())
        assert r["sumsq_micro"] == int((col.astype(object) ** 2).sum())
        assert r["min_micro"] == int(col.min())
        assert r["max_micro"] == int(col.max())
        assert r["n_zero"] == int((col == 0).sum())
        assert r["mean_micro"] == pytest.approx(col.mean())
        assert r["var_micro"] == pytest.approx(col.var(), rel=1e-9)


def test_importance_resampling_balances_sources(spark):
    """Per-source resampled mass lands within one copy per doc of the
    uniform target N/S, and every copy count is floor(w) or floor(w)+1."""
    out = t5.sample_importance_weighted(spark, SF001).toPandas()
    n_total = len(out)
    per_source = out.groupby("source")
    n_sources = per_source.ngroups
    target = n_total / n_sources
    for source, grp in per_source:
        n_s = len(grp)
        w = n_total / (n_sources * n_s)
        lo, hi = int(np.floor(w)), int(np.floor(w)) + 1
        assert set(grp["n_copies"]) <= {lo, hi}, source
        mass = int(grp["n_copies"].sum())
        # mass = n_s*floor(w) + #{h%den < rem}; the hash term is 0..n_s,
        # so the deviation from the exact target is bounded by n_s
        assert abs(mass - target) <= n_s, (source, mass, target)


def test_importance_resampling_is_deterministic(spark):
    a = t5.sample_importance_weighted(spark, SF0001).collect()
    b = t5.sample_importance_weighted(spark, SF0001).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
