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
# order under a ~50-query-per-round budget. Round-7-driver ordering:
# (a) every key with zero driver evidence — 52 names, the union of
# CORRECTNESS_r01..r06 never reached them; (b) rotation by OLDEST
# driver evidence — the nine r1-last-seen stragglers, then the
# r2-last-seen block; the ~50 budget covers the head, the tail rolls
# forward next round.
_PRIORITY: tuple[str, ...] = (
    # (a) the 52 keys with ZERO driver evidence (r06 verdict: the
    # registry grew faster than the 50-key sample). Lakehouse clause
    # matrix and the at-scale join block first, then streaming, scans,
    # SQL surface, aggregates, and the rest alphabetically.
    "merge_tx_full_clause_matrix",
    "merge_tx_when_matched_delete",
    "merge_tx_delete_cdf",
    "merge_tx_evolve_conditional",
    "merge_tx_sync_delete_scope",
    "merge_tx_vacuum_retention",
    "merge_tx_restore_version",
    "join_runtime_bloom",
    "join_dynamic_partition_pruning",
    "scan_zorder_skipping",
    "join_fuzzy_levenshtein",
    "join_geo_gridblock",
    "txn_multi_table_atomic",
    "stream_ohlc_true",
    "stream_sliding_window_true",
    "stream_static_enrich_true",
    "stream_txn_multi_table_true",
    "stream_jsonl_ingest_true",
    "stream_file_sink_exactly_once",
    "scan_csv_roundtrip",
    "scan_csv_permissive_corrupt",
    "scan_jsonl_roundtrip",
    "scan_hive_partitioned",
    "scan_parquet_merge_schema",
    "sql_pipe_syntax",
    "sql_udf_functions",
    "sql_parameterized",
    "sql_session_variables",
    "pandas_api_pipeline",
    "agg_bitmap_distinct_rollup",
    "agg_max_by_min_by",
    "agg_weighted_median",
    "agg_distinct_exact_vs_approx",
    "agg_approx_top_k",
    "udtf_table_arg_topk",
    "udf_arrow_scalar",
    "dedup_text_normalized",
    "dq_constraint_checks",
    "embedding_dim_stats",
    "graph_bfs_distance",
    "multimodal_image_phash_dedup",
    "multimodal_image_tiles",
    "profile_skew_keys",
    "sample_importance_weighted",
    "sample_repeat_epochs",
    "sink_dynamic_partition_overwrite",
    "text_bigram_coverage",
    "text_feature_hashing",
    "text_vocab_zipf_stats",
    "timeseries_merge_intervals",
    "timeseries_resample_ohlc",
    "window_time_range_rolling",
    # (b) rotation: newest driver evidence r1 (9 names)
    "date_arith",
    "decimal_cast",
    "json_extract",
    "json_struct_parse",
    "null_funcs",
    "regex_extract_timestamp",
    "sort_multi",
    "string_funcs2",
    "try_funcs",
    # (c) the r2-last-seen block — the ~50/round budget reaches the
    # head only after (a)+(b); the tail rolls to r08
    "agg_approx_quantile",
    "agg_histogram",
    "agg_hll_sketch",
    "agg_median_mode",
    "agg_percentiles",
    "agg_salted_skew",
    "array_funcs",
    "array_predicates",
    "asof_interp_join",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "explode_unpivot",
    "join_asof_nearest",
    "join_lateral",
    "join_salted_skew",
    "map_funcs",
    "queue_estimate",
    "set_intersect_except",
    "set_union",
    "set_union_all",
    "similarity_pairs_lsh",
    "similarity_topk",
    "stream_tumbling_window",
    "struct_map_funcs",
    "subquery_correlated_scalar",
    "subquery_exists",
    "topk_per_group",
    "tpch_q1",
    "tpch_q18",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "udaf_grouped_stats",
    "udtf_bigrams",
    "upsert_last_write_wins",
    "upsert_sink_shape",
    "window_first_last_nth",
    "window_frame_agg",
    "window_lag_lead",
    "window_ntile",
    "window_percent_rank",
    "window_range_frame",
    "window_rank",
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
    from .streaming import filesink  # noqa: F401  # round-6 additions
    from .streaming import jsonl  # noqa: F401  # round-7 additions
    from .streaming import enrich  # noqa: F401  # round-7 additions
    from .streaming import txn_stream  # noqa: F401  # round-7 additions
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
    from .plans import advanced4  # noqa: F401  # round-6 additions
    from .operators import traindata5  # noqa: F401  # round-6 additions
    from .plans import advanced5  # noqa: F401  # round-6 additions
    from .plans import advanced6  # noqa: F401  # round-7 additions
    from .plans import advanced7  # noqa: F401  # round-7 additions
    from .plans import advanced8  # noqa: F401  # round-7 additions
    from .plans import advanced9  # noqa: F401  # round-7 additions
    from .plans import pandas_api  # noqa: F401  # round-7 additions
    from .plans import advanced10  # noqa: F401  # round-8 additions
    from .operators import traindata6  # noqa: F401  # round-8 additions
    from .streaming import multisrc  # noqa: F401  # round-8 additions
    from .plans import advanced11  # noqa: F401  # round-8 additions
    from .plans import advanced12  # noqa: F401  # round-8 additions
    from .ml import recommend  # noqa: F401  # round-8 additions
    from .operators import merge_ivm  # noqa: F401  # round-9 additions
    from .plans import advanced13  # noqa: F401  # round-9 additions
    from .operators import graph2  # noqa: F401  # round-9 additions
    from .streaming import pystream  # noqa: F401  # round-9 additions
    from .plans import advanced14  # noqa: F401  # round-9 additions
    from .plans import advanced15  # noqa: F401  # round-9 additions
    from .streaming import latedrop  # noqa: F401  # round-9 additions
    from .streaming import scd2_stream  # noqa: F401  # round-9 additions
    from .plans import advanced16  # noqa: F401  # round-9 additions
    from .operators import udaf2  # noqa: F401  # round-9 additions
    from .plans import advanced17  # noqa: F401  # round-9 additions
    from .operators import txn  # noqa: F401  # round-7 additions
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
