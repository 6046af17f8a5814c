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


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    Import order is load-bearing: the driver's correctness sweep walks
    ``queries()`` in registration (dict-insertion) order under a per-round
    budget, and round 1's sweep stopped after the first 50 names
    (CORRECTNESS_r01.json). Modules whose queries the driver has not yet
    verified register FIRST (flagship pipeline, windows, TPC-H, dedup/
    similarity, upserts, streaming, ml); the 50 already driver-green in
    round 1 (aggregates/corpus/joins/relational/text + set_union) follow.
    """
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
    from .plans import advanced2  # noqa: F401  # round-2 additions
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
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
