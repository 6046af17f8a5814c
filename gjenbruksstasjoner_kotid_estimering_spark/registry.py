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
# order under a ~50-query-per-round budget. Round-6-driver ordering:
# (a) the r4/r5 red row first (its oracle dtype fix — CAST every UNION
# branch to BIGINT — landed after the r5 snapshot, so the driver has not
# yet recorded it green); (b) every never-driver-sampled key: the 12
# post-r5-snapshot rows plus this round's 8; (c) rotation by OLDEST
# driver evidence — the nine r1-last-seen stragglers, then the
# r2-last-seen block, of which the ~50 budget covers the head; the tail
# rolls forward next round.
_PRIORITY: tuple[str, ...] = (
    # (a) the r4/r5 red row: oracle dtype fix landed last round but the
    # driver has not yet confirmed it — re-verify first
    "merge_tx_time_travel",
    # (b0) this round's wave A — never driver-sampled
    "sql_scripting_block",
    "sql_execute_immediate",
    "sql_lateral_column_alias",
    "agg_listagg_ordered",
    "agg_transpose_matrix",
    "join_strategy_hints",
    "agg_count_min_sketch",
    "bpe_train_merges",
    "text_pmi_positive_pairs",
    "udf_map_in_arrow",
    "stream_union_sources_true",
    "stream_statestore_reader",
    "join_aqe_skew",
    "scan_file_metadata",
    "subquery_not_in_null_semantics",
    "date_tz_convert",
    "ml_als_recommend",
    # (b0b) round-9 session waves F–K — never driver-sampled
    "merge_tx_ivm_aggregate",
    "merge_tx_cdf_to_scd2",
    "stream_scd2_dimension_true",
    "stream_late_data_drop_true",
    "stream_python_datasource_true",
    "events_feature_store_pit",
    "graph_sssp_weighted",
    "er_resolve_parts",
    "agg_kmv_sketch_rollup",
    "stat_chi_square_independence",
    "stat_ks_two_sample_exact",
    "stat_mann_whitney_u_exact",
    "timeseries_ewma_dyadic",
    "window_running_median_exact",
    "events_regex_sequence_match",
    "sql_ddl_default_columns",
    "sql_interval_arithmetic",
    "string_url_parse",
    "text_ttr_lexical_diversity",
    "udf_pandas_grouped_agg",
    "stat_spearman_rank_exact",
    "stat_kendall_tau_exact",
    "ml_kmeans_one_step_exact",
    "text_url_canonical_dedup",
    "text_heavy_hitter_tokens",
    "scan_nested_schema_pruning",
    # (b) never-driver-sampled, newest wave first: this round's 8
    # (observe metrics, GROUP BY ALL, multiset set-ops, exact
    # covariance, cume_dist deciles, touch attribution, mergeSchema
    # read, vacuum retention) ...
    "scan_observe_metrics",
    "sql_group_by_all",
    "set_intersect_except_all",
    "stat_corr_covar_exact",
    "window_cume_dist_deciles",
    "events_attribution_touch",
    "scan_parquet_merge_schema",
    "merge_tx_vacuum_retention",
    "scan_jsonl_roundtrip",
    "dedup_text_normalized",
    "window_time_range_rolling",
    "sample_repeat_epochs",
    "merge_tx_restore_version",
    "join_dynamic_partition_pruning",
    "text_feature_hashing",
    "scan_csv_permissive_corrupt",
    "text_vocab_zipf_stats",
    "graph_bfs_distance",
    "multimodal_image_tiles",
    "stream_jsonl_ingest_true",
    "sink_dynamic_partition_overwrite",
    "timeseries_merge_intervals",
    "udf_arrow_scalar",
    "stream_static_enrich_true",
    "agg_max_by_min_by",
    "txn_multi_table_atomic",
    "agg_bitmap_distinct_rollup",
    "stream_txn_multi_table_true",
    "sql_session_variables",
    "pandas_api_pipeline",
    # ... then the prior session's still-unsampled additions (runtime
    # bloom, z-order skipping, fuzzy/geo blocked joins, weighted
    # median, OHLC, DQ suite, skew profile)
    "merge_tx_evolve_conditional",
    "merge_tx_when_matched_delete",
    "merge_tx_sync_delete_scope",
    "merge_tx_full_clause_matrix",
    "merge_tx_delete_cdf",
    "agg_distinct_exact_vs_approx",
    "stream_sliding_window_true",
    "scan_csv_roundtrip",
    "sql_pipe_syntax",
    "sql_udf_functions",
    "sql_parameterized",
    "text_bigram_coverage",
    "join_runtime_bloom",
    "join_fuzzy_levenshtein",
    "join_geo_gridblock",
    "scan_zorder_skipping",
    "agg_weighted_median",
    "timeseries_resample_ohlc",
    "dq_constraint_checks",
    "profile_skew_keys",
    "embedding_dim_stats",
    "sample_importance_weighted",
    "stream_ohlc_true",
    "scan_hive_partitioned",
    "udtf_table_arg_topk",
    "agg_approx_top_k",
    "multimodal_image_phash_dedup",
    "stream_file_sink_exactly_once",
    # (c) rotation: newest driver evidence r1 (9 names)
    "date_arith",
    "decimal_cast",
    "json_extract",
    "json_struct_parse",
    "null_funcs",
    "regex_extract_timestamp",
    "sort_multi",
    "string_funcs2",
    "try_funcs",
    # (d) then the r2-last-seen block (48 names) — the driver budget
    # (~50/round) reaches partway in; the rest roll to next round
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
