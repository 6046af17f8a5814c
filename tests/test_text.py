"""Text-analysis expression tests against plain-Python reference
implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.functions import text as tx


CASES = [
    "the quick brown fox",
    "a",
    "hello, world! punctuation-heavy: yes; really?!",
    "no stopwords here whatsoever",
    "the the the the",
]


def _vals(spark, col_fn, texts=CASES):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    out = df.select("i", col_fn(F.col("t")).alias("v")).orderBy("i").collect()
    return [r.v for r in out]


def test_token_counts(spark):
    got = _vals(spark, tx.token_count_col)
    assert got == [len(t.split()) for t in CASES]


def test_stopword_ratio(spark):
    got = _vals(spark, tx.stopword_ratio_col)
    for g, t in zip(got, CASES):
        toks = t.split()
        expected = sum(w in tx.STOPWORDS for w in toks) / len(toks)
        assert g == pytest.approx(expected)


def test_quality_bounds(spark):
    got = _vals(spark, tx.quality_score_col)
    assert all(0.0 <= v <= 1.0 for v in got)
    # mid-length stopword-bearing prose beats punctuation soup
    assert got[0] > got[2] or got[0] == pytest.approx(got[2])


def test_punct_ratio(spark):
    got = _vals(spark, tx.punct_ratio_col, ["abc", "a,b.c!", ""])
    assert got[0] == 0.0
    assert got[1] == pytest.approx(3 / 6)
    assert got[2] == 0.0
