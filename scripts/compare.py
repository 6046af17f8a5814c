"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and values
(order-insensitive, exact) — so oracle mismatches surface here before the
driver sees them.

Usage: python scripts/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.io import TABLES
from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by repr of every column — the
    order-insensitive canonical form used for comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:  # unify datetime64 resolution (ns vs us noise)
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
    if len(df):
        key = df.apply(lambda c: c.map(repr)).agg("|".join, axis=1)
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def cell_equal(a, b) -> bool:
    """Exact cell comparison, dtype-strict across the int/float divide.

    The driver hashes canonicalized cell reprs, so an int64 Spark column vs
    a float64 oracle column (e.g. DuckDB HUGEINT from sum(BIGINT) rendered
    as float) fails the driver even when the values are numerically equal.
    Coercing both sides through float() here would mask exactly that class
    (it hid the r4/r5 merge_tx_time_travel red row) — so integer-vs-float
    pairs are a mismatch, full stop.
    """
    if repr(a) == repr(b):
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        return False
    a_int = isinstance(a, (int,)) or type(a).__name__.startswith(("int", "uint"))
    b_int = isinstance(b, (int,)) or type(b).__name__.startswith(("int", "uint"))
    if a_int != b_int:
        return False  # int-vs-float dtype drift: driver hash would differ
    if a_int and b_int:
        return int(a) == int(b)
    try:
        return float(a) == float(b) or repr(float(a)) == repr(float(b))
    except (TypeError, ValueError):
        return False


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = canon(spark_df), canon(duck_df)
    for col in s.columns:
        sv, dv = s[col].to_numpy(), d[col].to_numpy()
        bad = [
            i for i in range(len(sv)) if not cell_equal(sv[i], dv[i])
        ]
        if bad:
            i = bad[0]
            problems.append(
                f"col {col!r}: {len(bad)}/{len(sv)} cells differ; "
                f"first at row {i}: spark={sv[i]!r} duck={dv[i]!r} "
                f"(spark dtype {s[col].dtype}, duck dtype {d[col].dtype})"
            )
    return problems


def cli_args(argv: list[str]) -> tuple[str, list[str]]:
    """Shared CLI shape: optional sf_dir first, then query names."""
    sf_dir = (
        argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.001"
    )
    if argv and os.path.isdir(argv[0]):
        argv = argv[1:]
    return sf_dir, argv


def run_sweep(spark, con, sf_dir: str, names: list[str] | None = None) -> list[str]:
    """Run registry queries vs their oracles on the GIVEN session and
    DuckDB connection; return the failing names. The session is the
    caller's choice — this is what lets the tuned lane (main below) and
    the de-tuned lane (scripts/robustness_sweep.py) share one gate
    instead of drifting copies. Unknown names are failures with a clean
    message; a rows-only key returning zero rows is a failure too (its
    declared gate is non-empty)."""
    specs = registry.all_specs()
    names = list(names) if names else sorted(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown} (see registry.queries())")
    failures = list(unknown)
    for name in names:
        if name in unknown:
            continue
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}", flush=True)
            failures.append(name)
            continue
        if spec.oracle is None:
            if len(sdf) == 0:
                print(f"FAIL  {name}: zero rows [rows-only]", flush=True)
                failures.append(name)
            else:
                print(
                    f"rows  {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)"
                    " [rows-only]",
                    flush=True,
                )
            continue
        try:
            ddf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}", flush=True)
            failures.append(name)
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures.append(name)
            print(f"FAIL  {name} ({len(sdf)} rows):", flush=True)
            for p in problems:
                print(f"      {p}", flush=True)
        else:
            print(
                f"ok    {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)",
                flush=True,
            )
    return failures


def main() -> int:
    sf_dir, names = cli_args(sys.argv[1:])
    spark = get_spark("compare-harness")
    con = duck_con(sf_dir)
    failures = run_sweep(spark, con, sf_dir, names)
    total = len(names or registry.all_specs())
    print(f"\n{total - len(failures)}/{total} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
