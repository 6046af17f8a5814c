"""Query registry: the contract surface behind ``__spark_entry__.py``.

Each implemented operator from SURVEY.md §2 registers a :class:`QuerySpec`
binding a name to

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first plan, and
- ``oracle`` — the equivalent ANSI SQL DuckDB runs over the same parquet
  views (``None`` for genuinely non-SQL-expressible ops → the driver records
  a weaker rows-only check).

Column names (and, where hashing is type-sensitive, types) are aligned
between the two on purpose: the driver sorts columns by name before value-
hashing, so every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn`` as the Spark builder for ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


# The driver's correctness sweep walks ``queries()`` in dict-insertion
# order under a ~50-query-per-round budget. Round-5 ordering policy
# (VERDICT r4 items 1-2, 6): (a) the two round-4 driver blemishes first so
# their fixes get fresh driver rows (merge_tx_time_travel — the flaky red,
# now hermetic; embedding_pq_codes — canonicalizer crash, now packed
# BIGINT), plus their protocol siblings; (b) queries NEW this round;
# (c) re-verification rotation by OLDEST driver evidence — all of the
# r1-last-seen block, then the head of the r2-last-seen block — so no
# green row goes more than a few rounds stale on the current codebase.
_PRIORITY: tuple[str, ...] = (
    # (a) round-4 blemishes, re-verify first
    "merge_tx_time_travel",
    "embedding_pq_codes",
    "merge_tx_changes",
    "merge_tx_schema_evolution",
    "sink_python_datasource",
    "stream_error_followup_join",
    "stream_stateful_tracker",
    # (b) new this round — never driver-seen
    "image_pipeline_stats",
    "join_bucketed_colocated",
    "events_top_paths",
    "stream_tumbling_window_true",
    "stream_session_window_true",
    "window_running_distinct",
    "scan_xml_roundtrip",
    "scan_orc_roundtrip",
    "sql_ddl_roundtrip",
    "stream_dedup_true",
    "stream_merge_sink_true",
    "string_collation_ci",
    # (c) rotation: evidence last refreshed in round 1 (40 names) ...
    "unpivot_melt",
    "agg_stats_exact",
    "sample_stratified",
    "agg_collect",
    "text_token_counts",
    "text_quality",
    "text_lang_agg",
    "text_langid",
    "text_bpe_tokens",
    "posexplode_tokens",
    "regex_extract_all_tokens",
    "corpus_prep_pipeline",
    "join_inner",
    "join_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_range",
    "join_full_outer",
    "subquery_scalar",
    "join_right_outer",
    "scan_project",
    "scan_limit1",
    "filter_predicates",
    "range_filter",
    "scalar_math_projection",
    "derived_arithmetic",
    "case_when_threshold",
    "conditional_projection",
    "string_funcs",
    "string_regexp_replace",
    "regex_extract_timestamp",
    "decimal_cast",
    "json_extract",
    "sort_multi",
    "null_funcs",
    "date_arith",
    "try_funcs",
    "json_struct_parse",
    "string_funcs2",
    # ... then the head of the round-2 block (the rest rotates in r6)
    "set_union",
    "asof_interp_join",
    "queue_estimate",
    "join_asof_nearest",
    "upsert_last_write_wins",
    "upsert_sink_shape",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "similarity_topk",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # --- round-1 driver-unverified surface first ---
    from .operators import (  # noqa: F401
        asof_interp,
        upsert,
        dedup,
        similarity,
        clusters,
        udaf,
        udtf,
        skew,
    )
    from .plans import (  # noqa: F401
        windows,
        tpch,
        advanced,
        setops,
    )
    from .streaming import windows as stream_windows  # noqa: F401
    from .ml import models  # noqa: F401
    from .plans import tpch2  # noqa: F401  # round-2 additions
    from .operators import traindata  # noqa: F401  # round-2 additions
    from .operators import traindata2  # noqa: F401  # round-3 additions
    from .operators import merge_tx  # noqa: F401  # round-4 additions
    from .operators import traindata3  # noqa: F401  # round-4 additions
    from .operators import traindata4  # noqa: F401  # round-4 additions
    from .plans import analytics  # noqa: F401  # round-4 additions
    from .plans import stats  # noqa: F401  # round-4 additions
    from .sources import pyds  # noqa: F401  # round-4 additions
    from .operators import pq  # noqa: F401  # round-4 additions
    from .sources import images  # noqa: F401  # round-5 additions
    from .plans import bucketed  # noqa: F401  # round-5 additions
    from .sources import files  # noqa: F401  # round-5 additions
    from .plans import ddl  # noqa: F401  # round-5 additions
    from .plans import advanced2  # noqa: F401  # round-2 additions
    from .plans import advanced3  # noqa: F401  # round-4 additions
    from .operators import graph  # noqa: F401  # round-2 additions

    # --- driver-green in round 1 ---
    from .plans import (  # noqa: F401
        aggregates,
        corpus,
        joins,
        relational,
        text,
    )


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    # A typo'd or renamed _PRIORITY entry would silently lose its slot and
    # the driver's per-round budget would land on the wrong queries — fail
    # loudly instead so tests catch the drift.
    stale = [name for name in _PRIORITY if name not in _REGISTRY]
    if stale:
        raise LookupError(
            f"_PRIORITY names missing from the registry: {stale!r} — "
            "update _PRIORITY after renaming/removing operators"
        )
    ordered = {name: _REGISTRY[name] for name in _PRIORITY}
    ordered.update(_REGISTRY)
    return ordered


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
