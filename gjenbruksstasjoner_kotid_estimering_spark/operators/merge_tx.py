"""Transactional MERGE sink: copy-on-write parquet + atomic manifest commits.

The reference's sink is a per-item DynamoDB ``update_item``
(reference estimate_queue.py:166-178) — transactional per key, opaque to
analytics. ``operators/upsert.py`` re-expresses it as partition-scoped
parquet overwrite: correct and O(batch), but NOT atomic under concurrent
writers (the round-3 review's one named production gap). This module is
the production form: MERGE INTO with snapshot isolation and optimistic
concurrency, built from two primitives every distributed filesystem
offers —

- **immutable data files**: writers only ever ADD parquet files under
  ``<table>/data/``; nothing is modified in place, so readers of an old
  snapshot are never torn.
- **atomic manifest publication**: a snapshot is a JSON manifest listing
  its data files, committed as ``_commits/v{N:020d}.json`` by writing +
  fsyncing a temp file and publishing it with ``os.link`` — "link if
  absent" is atomic on POSIX (object stores use if-none-match put), and
  because the payload is complete before the name exists, readers can
  never observe a partial manifest and a writer crash leaves no
  half-committed version. Two writers racing to version N: exactly one
  wins; the loser re-reads the new snapshot, recomputes its merge on
  top, and retries at N+1 (optimistic concurrency, same protocol as
  Delta Lake's log).

MERGE strategy (what Delta calls copy-on-write at file granularity):

1. snapshot-read the target, tag each row with its source file
   (``input_file_name()``);
2. find AFFECTED files — those containing at least one matched key —
   via a broadcast semi-join of file rows against update keys (at 100 TB
   with many files, parquet footer min/max on the key would prune before
   this scan; the semi-join is the exact fallback);
3. rewrite ONLY affected files: their rows anti-joined against update
   keys (unmatched survivors) are written to new files, while unaffected
   files are carried into the new manifest by reference — zero data
   movement for the untouched bulk of the table;
4. append the deduplicated updates (last-write-wins within the batch by
   a caller-named ordering column) as new files;
5. commit the manifest; on version conflict go back to 1.

Updates-side dedup uses the same (key, ordering DESC, row_number) shape
as operators/upsert.py:105 — one shuffle on the merge key.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir, process_cache_dir

_COMMITS = "_commits"
_DATA = "data"


class VersionConflict(Exception):
    """Another writer committed the version this merge was based on."""


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _COMMITS, f"v{version:020d}.json")


def current_version(table_dir: str) -> int:
    """Highest committed version, or 0 for an empty/new table."""
    cdir = os.path.join(table_dir, _COMMITS)
    if not os.path.isdir(cdir):
        return 0
    versions = [
        int(n[1:-5])
        for n in os.listdir(cdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(versions, default=0)


def _read_commit(table_dir: str, version: int) -> dict:
    if version == 0:
        return {"files": []}
    with open(_commit_path(table_dir, version)) as f:
        return json.load(f)


def _read_manifest(table_dir: str, version: int) -> list[str]:
    return _read_commit(table_dir, version)["files"]


def snapshot(spark: SparkSession, table_dir: str) -> tuple[DataFrame | None, int]:
    """(DataFrame over the committed snapshot, its version). Readers never
    list ``data/`` — files reach visibility only via a manifest, so
    half-written merges are invisible."""
    v = current_version(table_dir)
    files = _read_manifest(table_dir, v)
    if not files:
        return None, v
    return (
        spark.read.option("mergeSchema", "true").parquet(*files),
        v,
    )


def _write_data_file(
    df: DataFrame, table_dir: str, stats_col: str | None = None
) -> tuple[list[str], dict]:
    """Write df as new immutable parquet files; return (paths, stats).

    With ``stats_col``, also collect per-file [min, max] of that column
    (one column-pruned scan of the just-written files, grouped by
    input_file_name) — the Delta/Iceberg file-statistics convention that
    makes ``snapshot_pruned`` skip files whose key range cannot match."""
    sub = os.path.join(table_dir, _DATA, uuid.uuid4().hex)
    df.write.mode("error").parquet(sub)
    files = sorted(
        os.path.join(sub, n)
        for n in os.listdir(sub)
        if n.endswith(".parquet")
    )
    stats: dict = {}
    if stats_col is not None and files:
        from urllib.parse import unquote, urlparse

        spark = df.sparkSession
        rows = (
            spark.read.parquet(*files)
            .groupBy(F.input_file_name().alias("_f"))
            .agg(F.min(stats_col).alias("lo"), F.max(stats_col).alias("hi"))
            .collect()
        )
        for r in rows:
            stats[unquote(urlparse(r["_f"]).path)] = [r["lo"], r["hi"]]
    return files, stats


def _try_commit(
    table_dir: str,
    version: int,
    files: list[str],
    stats_col: str | None = None,
    stats: dict | None = None,
) -> None:
    """Atomically PUBLISH a fully-written manifest.

    Atomic *creation* (O_EXCL on the final path) is not atomic
    *publication*: a reader could observe the created-but-not-yet-written
    file, and a writer crash between create and write would brick the
    table with a permanently-empty manifest. So the payload is written
    and fsynced to a private temp name first, then published with
    ``os.link`` — link-to-existing-target fails (the conflict signal) and
    a crash before the link leaves only an ignorable temp file."""
    os.makedirs(os.path.join(table_dir, _COMMITS), exist_ok=True)
    body = {"version": version, "files": files}
    if stats_col is not None:
        body["stats_col"] = stats_col
        body["stats"] = stats or {}
    payload = json.dumps(body, indent=0).encode()
    final = _commit_path(table_dir, version)
    tmp = f"{final}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError as exc:
        raise VersionConflict(f"version {version} already committed") from exc
    finally:
        os.unlink(tmp)


def _plain_path(uri: str) -> str:
    """input_file_name() returns URIs (file:///...); manifests hold plain
    paths — the one normalization every writer shares."""
    from urllib.parse import unquote, urlparse

    return unquote(urlparse(uri).path)


def _keep_stats(base_commit: dict, keep_files: list[str]) -> dict:
    """Stats entries carried over for files kept by reference."""
    stats = base_commit.get("stats", {})
    return {f: stats[f] for f in keep_files if f in stats}


def _discard_files(files: list[str]) -> None:
    """Remove a failed attempt's data-file dirs (no vacuum debt)."""
    import shutil

    for d in {os.path.dirname(f) for f in files}:
        shutil.rmtree(d, ignore_errors=True)


def merge(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    max_retries: int = 10,
    evolve_schema: bool = False,
    conditional: bool = False,
    delete_condition=None,
    sync_delete_scope=None,
) -> int:
    """MERGE INTO table_dir USING updates ON key_cols:
    matched → replace with the update row (last-write-wins within the
    batch by ``order_col`` — pass a LIST ending in a unique column when
    the primary ordering can tie, so LWW stays deterministic), not
    matched → insert. Returns the committed version. Retries on
    concurrent-writer conflicts.

    ``conditional=True`` is the ``WHEN MATCHED AND s.order > t.order``
    form: a matched TARGET row survives unless the update row wins by
    ``order_col`` (ties → update, keeping replays idempotent). This
    makes last-write-wins hold ACROSS merges — an out-of-order batch
    arriving after a newer one cannot regress a key — which is what a
    multi-micro-batch streaming upsert needs (intra-batch LWW alone is
    last-PROCESSED-wins under reordering). Requires the ordering
    column(s) to be real table columns.

    ``conditional=True, evolve_schema=True`` composes the two: update
    batches may carry NEW payload columns (the reference's upsert builds
    its UpdateExpression from whatever keys arrive —
    estimate_queue.py:166-178 — so evolving payloads ARE the reference
    semantics). Affected-file target rows that predate the evolution
    read the new columns as NULL; winner selection is whole-row by
    ``order_col``, so a STALE update can neither regress existing
    columns nor inject its evolved-column value over a newer target row.
    Survivor (unaffected) files keep their narrow schema — snapshot()
    reads with mergeSchema.

    ``delete_condition`` is the ``WHEN MATCHED AND <cond> THEN DELETE``
    clause (a pyspark Column over the UPDATE row's columns): a matched
    target row whose winning update satisfies the condition is REMOVED
    instead of replaced; an unmatched update satisfying it is a no-op
    (never inserted), per the Delta/Iceberg matched-clause contract.
    Composes with ``conditional=True``: a STALE delete row loses the
    order_col window to the newer target row, so out-of-order deletes
    cannot remove keys they no longer own — and a replayed delete is
    idempotent (tie → clause re-applies to an already-absent key).

    ``sync_delete_scope`` is ``WHEN NOT MATCHED BY SOURCE AND <scope>
    THEN DELETE`` (a pyspark Column over TARGET rows): within the scope,
    target rows whose keys are absent from the batch are removed — the
    dimension-sync clause (Delta 3.x semantics; the scope keeps it from
    degenerating into a full-table replace, and bounds the copy-on-write
    rewrite to files containing scope rows). Not supported together
    with ``conditional`` (cross-merge LWW has no per-target-row absence
    ordering to compare).

    Schema contract: an EMPTY table bootstraps with the updates frame's
    full schema — including the ordering column(s), which become real
    table columns from then on. Keep synthetic ordering helpers out of
    bootstrap batches (seed via ``_write_seed`` first, as
    ``upsert_merge_tx`` does) unless the ordering column is genuine data
    (as ``ts``/``event_id`` are in the streaming lane)."""
    if sync_delete_scope is not None and conditional:
        raise ValueError(
            "sync_delete_scope is not supported with conditional=True"
        )
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    dedup = (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # updates are re-read per retry attempt; localCheckpoint so the
    # (possibly expensive) upstream plan runs once. Lazy (r18, §2.5):
    # the first consumer (the affected-files semi-join, or the type
    # coercion projection's broadcast) materializes it — same
    # single-execution guarantee without a dedicated driver job per
    # MERGE call.
    dedup = dedup.localCheckpoint(eager=False)
    has_del = delete_condition is not None
    if has_del:
        # evaluated once, on the update row's own columns; carried as a
        # plain flag so the winner window can see it
        dedup = dedup.withColumn("_del", delete_condition)

    for _ in range(max_retries):
        target, base_version = snapshot(spark, table_dir)
        base_commit = _read_commit(table_dir, base_version)
        stats_col = base_commit.get("stats_col")
        new_stats: dict = {}
        if target is None:
            # bootstrap: no row can be "matched", so delete-clause rows
            # are no-ops and never insert
            boot = dedup.where(~F.col("_del")).drop("_del") if has_del else dedup
            new_files, new_stats = _write_data_file(
                boot, table_dir, stats_col
            )
            keep_files: list[str] = []
        else:
            # Type stability: evolution is ADD-COLUMN only. Update values
            # for EXISTING table columns are coerced to the table's
            # declared types — otherwise a type-drifting batch (e.g. long
            # updates on an int column) would commit a manifest mixing
            # parquet files with conflicting types for one column, and
            # every later mergeSchema read of that version throws
            # CANNOT_MERGE_SCHEMAS (version corruption).
            _tt = {f.name: f.dataType for f in target.schema.fields}
            dedup = dedup.select(
                *[
                    F.col(c).cast(_tt[c]).alias(c) if c in _tt else F.col(c)
                    for c in dedup.columns
                ]
            )
            keys = dedup.select(*key_cols)
            tagged = target.withColumn("_file", F.input_file_name())
            affected = {
                _plain_path(r["_file"])
                for r in tagged.join(F.broadcast(keys), key_cols, "left_semi")
                .select("_file")
                .distinct()
                .collect()
            }
            if sync_delete_scope is not None:
                # every file holding a scope row may contain keys absent
                # from the batch → those files must rewrite too
                affected |= {
                    _plain_path(r["_file"])
                    for r in tagged.where(sync_delete_scope)
                    .select("_file")
                    .distinct()
                    .collect()
                }
            base_files = _read_manifest(table_dir, base_version)
            keep_files = [f for f in base_files if f not in affected]
            new_files = []
            if conditional:
                missing = [c for c in order_cols if c not in target.columns]
                if missing:
                    raise ValueError(
                        "conditional merge needs the ordering column(s) in "
                        f"the table schema; missing: {missing!r}"
                    )
                # WHEN MATCHED AND update wins by order_col: union the
                # affected files' rows with the update rows and keep ONE
                # winner per key — target rows with no match and updates
                # with no target row are alone in their window, so
                # survivor carry-through and inserts fall out of the same
                # expression. _src breaks order ties toward the update
                # (replay idempotency).
                existing = (
                    spark.read.option("mergeSchema", "true")
                    .parquet(*sorted(affected))
                    .withColumn("_src", F.lit(0))
                    if affected
                    else None
                )
                if has_del and existing is not None:
                    existing = existing.withColumn("_del", F.lit(False))
                del_cols = ["_del"] if has_del else []
                if evolve_schema:
                    # conditional + evolution: update batches may carry
                    # new payload columns; pre-evolution target rows get
                    # them as NULL via allowMissingColumns.
                    new_cols = [
                        c
                        for c in dedup.columns
                        if c not in target.columns and c != "_del"
                    ]
                    upd_rows = dedup.select(
                        *target.columns, *new_cols, *del_cols
                    ).withColumn("_src", F.lit(1))
                else:
                    upd_rows = dedup.select(
                        *target.columns, *del_cols
                    ).withColumn("_src", F.lit(1))
                combined = (
                    upd_rows
                    if existing is None
                    else existing.unionByName(
                        upd_rows, allowMissingColumns=evolve_schema
                    )
                )
                w_win = Window.partitionBy(*key_cols).orderBy(
                    *[F.col(c).desc() for c in order_cols],
                    F.col("_src").desc(),
                )
                winners = (
                    combined.withColumn("_rn", F.row_number().over(w_win))
                    .where(F.col("_rn") == 1)
                    .drop("_rn", "_src")
                )
                if has_del:
                    # a WINNING delete row removes its key; a stale one
                    # already lost the window to the newer target row
                    winners = winners.where(~F.col("_del")).drop("_del")
                fs, st = _write_data_file(winners, table_dir, stats_col)
                new_files += fs
                new_stats.update(st)
                try:
                    _try_commit(
                        table_dir,
                        base_version + 1,
                        keep_files + new_files,
                        stats_col=stats_col,
                        stats={
                            **_keep_stats(base_commit, keep_files),
                            **new_stats,
                        },
                    )
                    return base_version + 1
                except VersionConflict:
                    _discard_files(new_files)
                    continue
            if affected:
                # mergeSchema, same as snapshot()/_rewrite_where: after an
                # evolve_schema commit an affected set can mix pre- and
                # post-evolution files, and a plain read would take the
                # FIRST file's (possibly narrower) schema — silently
                # rewriting evolved-column values as NULL in wide
                # survivors (tests/test_merge_tx.py::
                # test_merge_after_evolution_preserves_wide_survivors)
                survivors = spark.read.option("mergeSchema", "true").parquet(
                    *sorted(affected)
                ).join(F.broadcast(keys), key_cols, "left_anti")
                if sync_delete_scope is not None:
                    # unmatched-by-source rows inside the scope are the
                    # sync-delete set — everything else carries through.
                    # NULL scope predicate = not in scope (row survives),
                    # the SQL WHEN-clause convention.
                    survivors = survivors.where(
                        ~F.coalesce(sync_delete_scope, F.lit(False))
                    )
                fs, st = _write_data_file(survivors, table_dir, stats_col)
                new_files += fs
                new_stats.update(st)
            # matched-delete (and suppressed unmatched-insert): the keys
            # frame above still contains delete rows' keys, so their
            # target rows leave via the anti-join — simply never writing
            # the update row implements both clause arms
            upd_src = dedup.where(~F.col("_del")) if has_del else dedup
            if evolve_schema:
                # ADD-COLUMN evolution: new update columns become table
                # columns; survivor files keep their narrower schema and
                # read back with the new columns as NULL (snapshot reads
                # with mergeSchema). Column order follows target ++ new.
                new_cols = [
                    c
                    for c in dedup.columns
                    if c not in target.columns
                    and c not in order_cols
                    and c != "_del"
                ]
                projected = upd_src.select(*target.columns, *new_cols)
            else:
                # fixed-schema contract: extra update columns (e.g.
                # synthetic ordering helpers) are dropped
                projected = upd_src.select(*target.columns)
            fs, st = _write_data_file(projected, table_dir, stats_col)
            new_files += fs
            new_stats.update(st)
        try:
            _try_commit(
                table_dir,
                base_version + 1,
                keep_files + new_files,
                stats_col=stats_col,
                stats={**_keep_stats(base_commit, keep_files), **new_stats},
            )
            return base_version + 1
        except VersionConflict:
            _discard_files(new_files)
            continue  # re-read the newer snapshot and re-merge on top
    raise VersionConflict(f"gave up after {max_retries} retries")


@register(
    "upsert_merge_tx",
    oracle="""
        WITH upd AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS acctbal_cents
            FROM orders WHERE o_custkey % 7 = 0
            GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               COALESCE(u.acctbal_cents,
                        CAST(round(c.c_acctbal * 100) AS BIGINT))
                   AS acctbal_cents,
               (u.c_custkey IS NOT NULL) AS merged
        FROM customer c LEFT JOIN upd u USING (c_custkey)
    """,
    doc="Transactional MERGE INTO (operators/merge_tx.py): customer is "
    "seeded as a copy-on-write parquet table (immutable data files + "
    "atomic O_EXCL manifest commits, Delta-log-style optimistic "
    "concurrency), then an orders-derived balance batch is MERGEd "
    "(matched → update, else insert, LWW within batch); the committed "
    "snapshot is read back. Exercises the full protocol under the "
    "oracle gate: affected-file pruning via broadcast semi-join, "
    "survivor anti-join rewrite, manifest swap. Balances in integer "
    "cents for exact cross-engine hashing.",
    tags=("sink", "merge", "transaction", "upsert"),
)
def upsert_merge_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    table_dir = _seed_and_merges(spark, sf_dir, "merge_tx", mods=(7,))
    snap, _ = snapshot(spark, table_dir)
    # per-process cached fixture — returned lazily (no detach): the table
    # outlives the frame and no other process can touch it
    return snap.select("c_custkey", "acctbal_cents", "merged")


def _write_seed(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    stats_col: str | None = None,
) -> int:
    """Initialize a table: version-1 manifest over the seed files (with
    per-file key stats when ``stats_col`` is given)."""
    files, stats = _write_data_file(df, table_dir, stats_col)
    _try_commit(
        table_dir,
        current_version(table_dir) + 1,
        files,
        stats_col=stats_col,
        stats=stats,
    )
    return current_version(table_dir)


def merge_batch_writer(
    table_dir: str,
    key_cols: list[str],
    order_col,
    conditional: bool = False,
):
    """foreachBatch sink that routes each micro-batch through the
    transactional MERGE — the streaming form of the reference's DynamoDB
    upsert (estimate_queue.py:166-178) with real transactionality.

    Semantics under failure recovery: foreachBatch is at-least-once (a
    batch that wrote but crashed before the checkpoint commit replays),
    and MERGE with last-write-wins keys is IDEMPOTENT on replay — the
    same rows merge to the same final state, only the version counter
    advances. So the sink delivers exactly-once *state* from
    at-least-once *delivery* without per-batch bookkeeping, which is
    precisely why production streaming sinks are MERGEs and not appends
    (tests/test_merge_tx.py::test_streaming_merge_replay_idempotent).
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge(
            batch_df.sparkSession,
            table_dir,
            batch_df,
            key_cols=key_cols,
            order_col=order_col,
            conditional=conditional,
        )

    return apply


def run_streaming_merge(
    spark: SparkSession,
    sf_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    reader=None,
) -> None:
    """One-shot streaming drain of the events source into a MERGE-managed
    table keyed by (user_id, event_type): the latest event per key wins
    across all batches — the streaming upsert lane
    (streaming/file_stream.run_available_now contract) upgraded from
    partition-overwrite to transactional copy-on-write."""
    from ..streaming.file_stream import read_events_stream, run_available_now

    def transform(events: DataFrame) -> DataFrame:
        return events.select(
            "user_id", "event_type", "value", "ts", "event_id"
        )

    run_available_now(
        spark,
        sf_dir,
        table_dir,  # unused by the foreachBatch sink, kept for contract
        checkpoint_dir,
        transform=transform,
        reader=reader or read_events_stream,
        foreach_batch=merge_batch_writer(
            table_dir,
            key_cols=["user_id", "event_type"],
            # event_id tie-break: equal-ts events must LWW deterministically
            order_col=["ts", "event_id"],
            # conditional: LWW must hold ACROSS micro-batches too — an
            # out-of-order batch cannot regress a key past a newer event
            # already merged by an earlier batch (multi-batch drains are
            # legal whatever the source's file/batch packing)
            conditional=True,
        ),
    )


@register(
    "stream_merge_sink_true",
    oracle="""
        WITH ranked AS (
          SELECT user_id, event_type, value, ts, event_id,
                 row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        SELECT user_id, event_type, value, ts, event_id
        FROM ranked WHERE rn = 1
    """,
    doc="TRUE streaming → transactional MERGE sink, end-to-end and "
    "oracle-checked: the events stream drains through foreachBatch into "
    "a copy-on-write MERGE table keyed by (user_id, event_type) with "
    "last-write-wins on (ts, event_id), and the committed snapshot read "
    "back must hash-equal the batch latest-per-key window — proving the "
    "whole production streaming-upsert lane (at-least-once delivery + "
    "idempotent MERGE = exactly-once state) under the driver's gate. "
    "Hermetic scratch table + checkpoint; result detached before "
    "cleanup.",
    tags=("streaming", "sink", "merge", "upsert"),
)
def stream_merge_sink_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"stream_merge_{sf_tag}")
    ckpt = new_scratch_dir(f"stream_merge_ckpt_{sf_tag}")
    try:
        run_streaming_merge(spark, sf_dir, table_dir, ckpt)
        snap, _ = snapshot(spark, table_dir)
        if snap is None:  # empty source → nothing committed → empty result
            return spark.createDataFrame(
                [],
                "user_id long, event_type string, value double, "
                "ts timestamp, event_id long",
            )
        return detach_result(
            snap.select("user_id", "event_type", "value", "ts", "event_id"),
            table_dir,
            ckpt,
        )
    finally:
        # detach_result already removed these on the success path; this
        # covers the empty-source return and mid-run exceptions
        shutil.rmtree(table_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


# --- snapshot history: time travel + change data feed ------------------

def snapshot_at(
    spark: SparkSession, table_dir: str, version: int
) -> DataFrame | None:
    """Time-travel read: the table exactly as committed at ``version``.

    Free by construction — every version's manifest lists immutable data
    files that no later merge modifies (copy-on-write), so an old
    snapshot is just "read the old manifest". The Delta/Iceberg
    ``VERSION AS OF`` semantics without any extra bookkeeping."""
    if version < 0 or version > current_version(table_dir):
        return None
    files = _read_manifest(table_dir, version)
    if not files:
        return None
    return spark.read.option("mergeSchema", "true").parquet(*files)


def history(table_dir: str) -> list[dict]:
    """Commit log: [{version, n_files}] ascending — the audit surface a
    lakehouse table exposes (``DESCRIBE HISTORY``).

    Cost model: one manifest read per version — O(versions) total, and
    ``current_version``/``snapshot_at`` are O(1) manifest reads after one
    listdir. That is the right shape because each version's manifest is
    COMPLETE (it lists every live file), unlike a Delta log whose tail of
    deltas must be replayed from the last checkpoint — our manifests ARE
    the checkpoints, written every commit. The production refinement at
    very high commit rates is compacting old manifests' *file lists* out
    (keeping only counts) once past the vacuum retention window; the
    per-call cost here stays sub-second into the hundreds of versions
    (tests/test_merge_tx.py::test_history_hundred_versions_bounded)."""
    out = []
    for v in range(1, current_version(table_dir) + 1):
        out.append({"version": v, "n_files": len(_read_manifest(table_dir, v))})
    return out


def changes_between(
    spark: SparkSession,
    table_dir: str,
    key_cols: list[str],
    v_from: int,
    v_to: int,
) -> DataFrame:
    """Change data feed between two committed versions: one row per key
    whose row changed, with ``change_type`` ∈ insert / update / delete
    and the post-image columns (pre-image for deletes).

    Computed as a key-keyed full outer join of the two snapshots with a
    whole-row struct comparison — O(|v_from| + |v_to|) with one shuffle
    per side, no dependence on how many merges lie between the
    versions. (Delta derives CDF from per-commit actions; diffing
    snapshots is the format-agnostic equivalent and exact for
    last-write-wins tables.)"""
    a = snapshot_at(spark, table_dir, v_from)
    b = snapshot_at(spark, table_dir, v_to)
    if a is None or b is None:
        raise ValueError("both versions must exist and be non-empty")
    # payload = UNION of both versions' columns (v_from order, then columns
    # ADD-COLUMN evolution introduced by v_to), each side padded with NULL
    # where it lacks the column. Deriving from v_from alone would suppress
    # changes whose only difference is in an evolved column and emit
    # insert post-images without it.
    payload = [c for c in a.columns if c not in key_cols]
    payload += [
        c for c in b.columns if c not in key_cols and c not in payload
    ]
    # Unified type per column: v_to (the newer schema) wins for columns
    # present in both sides, so TYPE-CHANGING evolution (e.g. int→long)
    # compares and emits post-images in the evolved type instead of
    # producing mismatched struct types in the full_outer join.
    types = {f.name: f.dataType for f in a.schema.fields}
    types.update({f.name: f.dataType for f in b.schema.fields})

    def side(df: DataFrame, alias: str):
        # EVERY column cast to the unified type (typed NULL when absent)
        # so both sides' structs share one type and the row comparison
        # needs no coercion
        cols = [
            F.col(c).cast(types[c]).alias(c)
            if c in df.columns
            else F.lit(None).cast(types[c]).alias(c)
            for c in payload
        ]
        return df.select(*key_cols, F.struct(*cols).alias(alias))

    a_s = side(a, "_a")
    b_s = side(b, "_b")
    j = a_s.join(b_s, key_cols, "full_outer")
    change = (
        F.when(F.col("_a").isNull(), F.lit("insert"))
        .when(F.col("_b").isNull(), F.lit("delete"))
        # null-safe (<=>): evolved columns are NULL pre-evolution, and a
        # plain != would evaluate NULL (→ 'none') exactly on the rows
        # whose only change involves such a column
        .when(~F.col("_a").eqNullSafe(F.col("_b")), F.lit("update"))
        .otherwise(F.lit("none"))
    )
    img = F.coalesce(F.col("_b"), F.col("_a"))
    return (
        j.select(
            *key_cols,
            change.alias("change_type"),
            *[img[c].alias(c) for c in payload],
        )
        .where(F.col("change_type") != "none")
    )


_SEED_CACHE: dict[tuple[str, tuple[int, ...]], str] = {}
_SEED_LOCK = threading.Lock()


def _seed_and_merges(
    spark: SparkSession, sf_dir: str, tag: str, mods: tuple[int, ...]
) -> str:
    """Shared fixture for every merge_tx registry query: seed customer
    balances (v1), then one MERGE commit per modulus in ``mods``
    (orders-derived balances for custkey % mod). upsert_merge_tx uses
    mods=(7,); the time-travel/CDF queries use (7, 5) → versions 1..3.
    One definition keeps the seed schema / cents rounding in lockstep
    with the _VERSIONED_STATES_SQL oracle CTEs.

    Built once per (sf_dir, mods) PER PROCESS (scratch.process_cache_dir
    — pid-scoped, so the round-4 cross-process wipe race cannot recur;
    the build is lock-serialized, so a concurrent first call waits
    instead of observing a half-committed table). The versioned table is
    immutable copy-on-write state: later commits (e.g. compact_read's
    OPTIMIZE) only append versions, and version-addressed readers are
    unaffected — which is exactly the lakehouse-snapshot claim these
    queries exist to prove. Callers must NOT delete the returned dir;
    it lives until process exit (atexit) or owner death (gc_scratch)."""
    key = (os.path.realpath(sf_dir), mods)
    with _SEED_LOCK:
        cached = _SEED_CACHE.get(key)
        if cached is not None and os.path.isdir(cached):
            return cached
        table_dir = _build_seed_and_merges(spark, sf_dir, mods)
        _SEED_CACHE[key] = table_dir
        return table_dir


def _build_seed_and_merges(
    spark: SparkSession,
    sf_dir: str,
    mods: tuple[int, ...],
    table_dir: str | None = None,
) -> str:
    if table_dir is None:
        name = "merge_seed_{}_{}".format(
            os.path.basename(sf_dir.rstrip("/")).replace(".", "_"),
            "_".join(map(str, mods)),
        )
        table_dir = os.path.join(process_cache_dir(), name)
    # a crashed earlier build in THIS process may have left a partial
    # table; the lock in the caller makes this remove-and-rebuild safe
    shutil.rmtree(table_dir, ignore_errors=True)
    os.makedirs(table_dir)
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
        F.lit(False).alias("merged"),
    )
    _write_seed(spark, table_dir, base)
    for mod in mods:
        upd = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_custkey") % mod == 0)
            .groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(
                F.round(F.sum("o_totalprice") * 100)
                .cast("long")
                .alias("acctbal_cents")
            )
            .withColumn("merged", F.lit(True))
            .withColumn("_ord", F.lit(1))
        )
        merge(spark, table_dir, upd, key_cols=["c_custkey"], order_col="_ord")
    return table_dir


_VERSIONED_STATES_SQL = """
        base AS (
            SELECT c_custkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
                   FALSE AS merged
            FROM customer
        ),
        upd7 AS (
            SELECT o_custkey AS k,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
            FROM orders WHERE o_custkey % 7 = 0 GROUP BY o_custkey
        ),
        upd5 AS (
            SELECT o_custkey AS k,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
            FROM orders WHERE o_custkey % 5 = 0 GROUP BY o_custkey
        ),
        v2 AS (
            SELECT b.c_custkey,
                   COALESCE(u.cents, b.cents) AS cents,
                   (u.k IS NOT NULL) OR b.merged AS merged
            FROM base b LEFT JOIN upd7 u ON b.c_custkey = u.k
        ),
        v3 AS (
            SELECT v.c_custkey,
                   COALESCE(u.cents, v.cents) AS cents,
                   (u.k IS NOT NULL) OR v.merged AS merged
            FROM v2 v LEFT JOIN upd5 u ON v.c_custkey = u.k
        )
"""


@register(
    "merge_tx_time_travel",
    oracle=f"""
        WITH {_VERSIONED_STATES_SQL}
        SELECT CAST(1 AS BIGINT) AS version,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE merged) AS BIGINT) AS n_merged,
               CAST(sum(cents) AS BIGINT) AS acctbal_sum_cents
        FROM base
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE merged) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM v2
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE merged) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM v3
    """,
    doc="Time travel over the transactional MERGE table: seed (v1) + two "
    "MERGE commits (v2: custkey%7 balances, v3: custkey%5), then read "
    "ALL THREE versions back via their manifests and summarize each "
    "(row count, merged count, exact integer-cents balance sum). "
    "Old snapshots are free under copy-on-write — immutable data files "
    "+ per-version manifests, no log replay. The oracle recomputes the "
    "three states relationally, so the hash gate proves snapshot "
    "isolation really preserved v1 and v2 bit-for-bit after later "
    "commits.",
    tags=("sink", "merge", "transaction", "timetravel"),
)
def merge_tx_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    table_dir = _seed_and_merges(spark, sf_dir, "merge_tt", mods=(7, 5))
    out = None
    for v in (1, 2, 3):
        snap = snapshot_at(spark, table_dir, v)
        summary = snap.agg(
            F.lit(v).cast("long").alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("merged")).alias("n_merged"),
            F.sum("acctbal_cents").alias("acctbal_sum_cents"),
        )
        out = summary if out is None else out.unionAll(summary)
    return out  # cached fixture: version-addressed reads stay valid


@register(
    "merge_tx_changes",
    oracle=f"""
        WITH {_VERSIONED_STATES_SQL}
        SELECT v2.c_custkey,
               CASE WHEN v3.cents != v2.cents
                         OR v3.merged != v2.merged
                    THEN 'update' END AS change_type,
               v3.cents AS acctbal_cents,
               v3.merged
        FROM v2 JOIN v3 ON v2.c_custkey = v3.c_custkey
        WHERE v3.cents != v2.cents OR v3.merged != v2.merged
    """,
    doc="Change data feed between two MERGE commits (v2 → v3): full-outer "
    "key join of the two snapshots with whole-row struct comparison — "
    "insert/update/delete post-images, independent of how many commits "
    "separate the versions. On this workload every change is an update "
    "(orders keys ⊆ customer keys ⇒ no inserts; MERGE never deletes), "
    "which the oracle mirrors as an inequality join of the recomputed "
    "states.",
    tags=("sink", "merge", "transaction", "cdf"),
)
def merge_tx_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    table_dir = _seed_and_merges(spark, sf_dir, "merge_cdf", mods=(7, 5))
    # cached fixture — lazy return; versions 2 and 3 are immutable
    return changes_between(
        spark, table_dir, key_cols=["c_custkey"], v_from=2, v_to=3
    )


# --- SQL surface: VERSION AS OF views + table_changes ------------------

def create_version_view(
    spark: SparkSession, table_dir: str, name: str, version: int | None = None
) -> str:
    """Expose a committed snapshot to ``spark.sql``: registers temp view
    ``name`` (current snapshot) or ``name_v{N}`` over version N — the
    ``SELECT * FROM tbl VERSION AS OF N`` semantics the docstrings cite,
    via the one mechanism plain Spark offers for naming a frame. Returns
    the registered view name. Views are cheap manifest reads; the
    underlying files are immutable, so a registered version stays
    readable until ``vacuum`` passes its retention window."""
    if version is None:
        df, version = snapshot(spark, table_dir)
        view = name
    else:
        df = snapshot_at(spark, table_dir, version)
        view = f"{name}_v{version}"
    if df is None:
        raise ValueError(f"version {version} is empty or absent")
    df.createOrReplaceTempView(view)
    return view


def table_changes(
    spark: SparkSession,
    table_dir: str,
    key_cols: list[str],
    v_from: int,
    v_to: int,
) -> DataFrame:
    """Delta-CDF-shaped change feed: ``changes_between`` re-emitted with
    the ``table_changes('t', from, to)`` output convention — payload
    columns plus ``_change_type`` and ``_commit_version`` (the version
    whose commit made the change visible, = v_to for a snapshot diff).
    Register the result as a view to query it from SQL
    (tests/test_merge_tx.py::test_sql_surface_version_and_changes)."""
    ch = changes_between(spark, table_dir, key_cols, v_from, v_to)
    payload = [c for c in ch.columns if c != "change_type"]
    return ch.select(
        *payload,
        F.col("change_type").alias("_change_type"),
        F.lit(v_to).cast("long").alias("_commit_version"),
    )


# --- data skipping: per-file stats pruning -----------------------------

PRUNE_LO, PRUNE_HI = 20, 80


def snapshot_pruned(
    spark: SparkSession, table_dir: str, lo, hi
) -> tuple[DataFrame | None, int, int]:
    """Range read with file skipping: (filtered frame, files in the
    snapshot, files actually read).

    Files whose manifest [min, max] cannot intersect [lo, hi] are never
    opened — the Delta/Iceberg data-skipping contract. Files without
    recorded stats are read (correctness over optimism); the residual
    filter still applies either way, so pruning is purely a scan
    reduction. At 100 TB with range-clustered writes this is the
    difference between touching every file and touching the few whose
    key range overlaps the predicate."""
    v = current_version(table_dir)
    commit = _read_commit(table_dir, v)
    files = commit["files"]
    if not files:
        return None, 0, 0
    col = commit.get("stats_col")
    if col is None:
        raise ValueError(
            "table has no recorded stats_col — seed it with "
            "_write_seed(..., stats_col=...) or read via snapshot()"
        )
    stats = commit.get("stats", {})

    def may_match(f: str) -> bool:
        st = stats.get(f)
        if st is None or st[0] is None or st[1] is None:
            return True  # no/NULL stats → conservatively read the file
        return st[0] <= hi and st[1] >= lo

    chosen = [f for f in files if may_match(f)]
    reader = spark.read.option("mergeSchema", "true")  # evolved tables
    if not chosen:
        # fully pruned: an EMPTY frame with the table schema, not None —
        # callers compose .select()/.count() on the result either way
        empty = reader.parquet(*files).where(F.lit(False))
        return empty, len(files), 0
    df = reader.parquet(*chosen).where(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return df, len(files), len(chosen)


@register(
    "merge_tx_pruned_read",
    oracle=f"""
        WITH {_VERSIONED_STATES_SQL}
        SELECT c_custkey, cents AS acctbal_cents, merged
        FROM v2
        WHERE c_custkey BETWEEN {PRUNE_LO} AND {PRUNE_HI}
    """,
    doc="Data-skipping read over the MERGE table: the seed is written "
    "range-clustered (repartitionByRange on the key) with per-file "
    "[min, max] key stats in the manifest — the Delta/Iceberg file-"
    "statistics convention — and a MERGE commit carries stats through "
    "survivor rewrites; the range read then opens ONLY files whose "
    "recorded range intersects the predicate "
    "(tests assert files_read < files_total). Oracle = the recomputed "
    "post-merge state filtered relationally, so the hash gate proves "
    "skipping loses no rows.",
    tags=("sink", "merge", "pruning", "scan"),
)
def merge_tx_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_prune_{sf_tag}")
    base = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
                "acctbal_cents"
            ),
            F.lit(False).alias("merged"),
        )
        .repartitionByRange(8, "c_custkey")
    )
    _write_seed(spark, table_dir, base, stats_col="c_custkey")
    upd = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 7 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("acctbal_cents")
        )
        .withColumn("merged", F.lit(True))
        .withColumn("_ord", F.lit(1))
    )
    merge(spark, table_dir, upd, key_cols=["c_custkey"], order_col="_ord")
    df, _, _ = snapshot_pruned(spark, table_dir, PRUNE_LO, PRUNE_HI)
    return detach_result(
        df.select("c_custkey", "acctbal_cents", "merged"), table_dir
    )


# --- table maintenance: OPTIMIZE (compaction), VACUUM, Z-ORDER ---------

def compact(
    spark: SparkSession,
    table_dir: str,
    max_files: int = 1,
    zorder_cols: list[str] | None = None,
) -> int:
    """OPTIMIZE: rewrite the current snapshot's data files into
    ``max_files`` larger ones (optionally Z-order-clustered), commit as a
    new version. Contents are bit-identical — only the file layout
    changes — so time travel to pre-compaction versions still works and
    readers never block (copy-on-write: the old files stay on disk until
    ``vacuum``).

    With ``zorder_cols`` the rewrite range-partitions on the interleaved
    Z-value of the named (non-negative integer) columns, so per-file
    [min, max] stats become selective on EVERY named column at once —
    multi-dimensional data skipping, the Delta OPTIMIZE ZORDER BY
    semantics."""
    for _ in range(10):
        # (re)build the rewrite plan INSIDE the loop: after a conflict the
        # clustered frame must derive from the NEW tip, or the retry would
        # commit the stale pre-conflict snapshot and silently drop the
        # concurrent writer's rows (a lost update)
        target, base_version = snapshot(spark, table_dir)
        if target is None:
            return base_version
        base_commit = _read_commit(table_dir, base_version)
        stats_col = base_commit.get("stats_col")
        if zorder_cols:
            df = target.repartitionByRange(
                max_files, zorder_value(*zorder_cols)
            )
        elif stats_col is not None:
            df = target.repartitionByRange(max_files, stats_col)
        else:
            df = target.coalesce(max_files)
        files, stats = _write_data_file(df, table_dir, stats_col)
        try:
            _try_commit(
                table_dir,
                base_version + 1,
                files,
                stats_col=stats_col,
                stats=stats,
            )
            return base_version + 1
        except VersionConflict:
            _discard_files(files)
            continue  # recompact on top of the new tip
    raise VersionConflict("compaction gave up after 10 retries")


def vacuum(
    table_dir: str,
    retain_versions: int = 1,
    min_age_seconds: float = 600.0,
) -> list[str]:
    """Delete data files referenced ONLY by versions older than the
    newest ``retain_versions`` manifests; returns the deleted paths.
    The lakehouse GC contract: time travel keeps working within the
    retention window, disk stops growing without bound. Manifests are
    kept (tiny, and they document history); only unreferenced DATA files
    go.

    ``min_age_seconds`` guards the in-flight-writer race: a concurrent
    merge/compact writes its data files BEFORE committing its manifest,
    and those files are in no live manifest yet — unconditionally
    deleting unreferenced files would corrupt the writer's imminent
    commit. Age-gating on modification time is how production lakehouses
    (Delta's deletedFileRetentionDuration) close this window; pass 0
    only when no writer can be active."""
    import time

    current = current_version(table_dir)
    keep_from = max(1, current - retain_versions + 1)
    live: set[str] = set()
    for v in range(keep_from, current + 1):
        live.update(_read_manifest(table_dir, v))
    deleted = []
    data_root = os.path.join(table_dir, _DATA)
    if not os.path.isdir(data_root):
        return deleted
    cutoff = time.time() - min_age_seconds
    for sub in os.listdir(data_root):
        subdir = os.path.join(data_root, sub)
        for name in os.listdir(subdir):
            path = os.path.join(subdir, name)
            if (
                name.endswith(".parquet")
                and path not in live
                and os.path.getmtime(path) <= cutoff
            ):
                os.unlink(path)
                deleted.append(path)
        if not os.listdir(subdir):
            os.rmdir(subdir)
    return deleted


ZORDER_BITS = 16


def zorder_value(col_a: str, col_b: str):
    """Interleaved-bit Z-value of two non-negative integer columns
    (ZORDER_BITS low bits each → one BIGINT). Pure JVM bit arithmetic —
    an unrolled shift/mask expression, no UDF — so Z-order clustering is
    just repartitionByRange(z) and file stats stay selective on both
    dimensions."""
    a = F.col(col_a).cast("long")
    b = F.col(col_b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(
            F.shiftleft(bit_a, 2 * i)
        ).bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
    return z


@register(
    "merge_tx_compact_read",
    oracle=f"""
        WITH {_VERSIONED_STATES_SQL}
        SELECT c_custkey, cents AS acctbal_cents, merged FROM v2
    """,
    doc="OPTIMIZE (compaction) over the MERGE table: seed + one MERGE "
    "leave a fragmented file set (seed files, survivor rewrites, update "
    "appends); compact() rewrites the snapshot into 2 range-clustered "
    "files as a new commit and the read-back must be bit-identical to "
    "the pre-compaction state — which the oracle hash proves, since it "
    "recomputes the post-merge state relationally and never sees the "
    "layout. Copy-on-write keeps pre-compaction versions time-"
    "travelable until vacuum() reclaims them "
    "(tests/test_merge_tx.py::test_compact_and_vacuum).",
    tags=("sink", "merge", "compaction", "maintenance"),
)
def merge_tx_compact_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    table_dir = _seed_and_merges(spark, sf_dir, "merge_compact", mods=(7,))
    # Appends an OPTIMIZE commit to the per-process cached table: commits
    # are copy-on-write, so concurrent/later readers of any version are
    # unaffected (re-invocation just re-compacts the compacted tip —
    # contents identical, which is the compaction contract being tested).
    compact(spark, table_dir, max_files=2)
    snap, _ = snapshot(spark, table_dir)
    return snap.select("c_custkey", "acctbal_cents", "merged")


@register(
    "merge_tx_schema_evolution",
    oracle="""
        WITH upd AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS acctbal_cents,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders WHERE o_custkey % 7 = 0
            GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               COALESCE(u.acctbal_cents,
                        CAST(round(c.c_acctbal * 100) AS BIGINT))
                   AS acctbal_cents,
               (u.c_custkey IS NOT NULL) AS merged,
               u.n_orders
        FROM customer c LEFT JOIN upd u USING (c_custkey)
    """,
    doc="ADD-COLUMN schema evolution under MERGE: the update batch "
    "carries a column the table never had (n_orders); with "
    "evolve_schema=True it becomes a table column, survivor files keep "
    "their narrower physical schema, and the snapshot read "
    "(mergeSchema) returns NULL n_orders for never-merged rows — "
    "exactly the LEFT-JOIN-shaped oracle. No rewrite of old files, no "
    "table-wide migration: evolution costs one commit, the Delta/"
    "Iceberg add-column contract.",
    tags=("sink", "merge", "schema", "evolution"),
)
def merge_tx_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_evo_{sf_tag}")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
        F.lit(False).alias("merged"),
    )
    _write_seed(spark, table_dir, base)
    upd = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 7 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("acctbal_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .withColumn("merged", F.lit(True))
    )
    merge(
        spark,
        table_dir,
        upd.withColumn("_ord", F.lit(1)),
        key_cols=["c_custkey"],
        order_col="_ord",
        evolve_schema=True,
    )
    snap, _ = snapshot(spark, table_dir)
    return detach_result(
        snap.select("c_custkey", "acctbal_cents", "merged", "n_orders"),
        table_dir,
    )


@register(
    "merge_tx_sync_delete_scope",
    oracle="""
        WITH upd AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS cents
            FROM orders WHERE o_custkey % 7 = 0
            GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               COALESCE(u.cents,
                        CAST(round(c.c_acctbal * 100) AS BIGINT))
                   AS acctbal_cents,
               (u.c_custkey IS NOT NULL) AS merged
        FROM customer c LEFT JOIN upd u USING (c_custkey)
        WHERE u.c_custkey IS NOT NULL OR c.c_custkey % 2 = 1
    """,
    doc="WHEN NOT MATCHED BY SOURCE AND <scope> THEN DELETE — the "
    "dimension-sync MERGE clause (Delta 3.x): within the scope (even "
    "custkeys here), target rows whose keys are absent from the batch "
    "are removed in the same commit that applies the batch's updates "
    "and inserts; rows outside the scope are untouched however stale. "
    "The scope bounds the copy-on-write rewrite to files containing "
    "scope rows — without it the clause degenerates into a full-table "
    "replace. Oracle: LEFT JOIN keeping matched rows plus out-of-scope "
    "unmatched rows.",
    tags=("sink", "merge", "transaction", "delete", "sync"),
)
def merge_tx_sync_delete_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_sync_{sf_tag}")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
        F.lit(False).alias("merged"),
    )
    _write_seed(spark, table_dir, base)
    upd = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 7 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("acctbal_cents")
        )
        .withColumn("merged", F.lit(True))
        .withColumn("_ord", F.lit(1))
    )
    merge(
        spark,
        table_dir,
        upd,
        key_cols=["c_custkey"],
        order_col="_ord",
        sync_delete_scope=F.col("c_custkey") % 2 == 0,
    )
    snap, _ = snapshot(spark, table_dir)
    return detach_result(
        snap.select("c_custkey", "acctbal_cents", "merged"), table_dir
    )


@register(
    "merge_tx_delete_cdf",
    oracle="""
        WITH upd AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS cents
            FROM orders WHERE o_custkey % 7 = 0
            GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               CASE WHEN u.cents > 250000000
                    THEN 'delete' ELSE 'update' END AS change_type,
               CASE WHEN u.cents > 250000000
                    THEN CAST(round(c.c_acctbal * 100) AS BIGINT)
                    ELSE u.cents END AS acctbal_cents,
               (u.cents <= 250000000) AS merged
        FROM customer c JOIN upd u USING (c_custkey)
    """,
    doc="Change data feed across a matched-DELETE merge: after one "
    "commit that both updates (balance <= $2.5M) and deletes (above "
    "it), changes_between(v1, v2) must emit 'update' rows carrying the "
    "post-image and 'delete' rows carrying the PRE-image — the CDC "
    "contract consumers (downstream sync, audit) rely on when rows can "
    "disappear. Every matched row appears (the merged flag flips on "
    "update, so no silent no-change suppression); unmatched rows are "
    "absent. Snapshot-diff CDF needs no per-commit action log, so "
    "delete support costs nothing extra — the full-outer diff already "
    "classifies vanished keys.",
    tags=("sink", "merge", "cdf", "delete", "timetravel"),
)
def merge_tx_delete_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_delcdf_{sf_tag}")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
        F.lit(False).alias("merged"),
    )
    _write_seed(spark, table_dir, base)
    upd = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 7 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("acctbal_cents")
        )
        .withColumn("merged", F.lit(True))
        .withColumn("_ord", F.lit(1))
    )
    merge(
        spark,
        table_dir,
        upd,
        key_cols=["c_custkey"],
        order_col="_ord",
        delete_condition=F.col("acctbal_cents") > 250_000_000,
    )
    cdf = changes_between(spark, table_dir, ["c_custkey"], 1, 2)
    return detach_result(
        cdf.select("c_custkey", "change_type", "acctbal_cents", "merged"),
        table_dir,
    )


@register(
    "merge_tx_full_clause_matrix",
    oracle="""
        WITH upd AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS cents
            FROM orders WHERE o_custkey % 7 = 0
            GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               COALESCE(u.cents,
                        CAST(round(c.c_acctbal * 100) AS BIGINT))
                   AS acctbal_cents,
               (u.c_custkey IS NOT NULL) AS merged
        FROM customer c LEFT JOIN upd u USING (c_custkey)
        WHERE (u.c_custkey IS NOT NULL AND u.cents <= 250000000)
           OR (u.c_custkey IS NULL AND c.c_custkey % 2 = 1)
    """,
    doc="The FULL MERGE statement in one commit — all four clause arms "
    "of the ANSI/Delta form simultaneously: WHEN MATCHED AND "
    "cents > $2.5M THEN DELETE; WHEN MATCHED THEN UPDATE; WHEN NOT "
    "MATCHED THEN INSERT; WHEN NOT MATCHED BY SOURCE AND even-custkey "
    "THEN DELETE. Clause interaction is where MERGE implementations "
    "break (a matched-delete key must not resurrect via the sync scope; "
    "a sync-scoped file's matched rows must still update), so the "
    "oracle covers the joint truth table: matched rows survive iff "
    "under the delete threshold, unmatched rows survive iff outside "
    "the sync scope. Single commit, single affected-file pass.",
    tags=("sink", "merge", "transaction", "delete", "sync"),
)
def merge_tx_full_clause_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_matrix_{sf_tag}")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
        F.lit(False).alias("merged"),
    )
    _write_seed(spark, table_dir, base)
    upd = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 7 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("acctbal_cents")
        )
        .withColumn("merged", F.lit(True))
        .withColumn("_ord", F.lit(1))
    )
    merge(
        spark,
        table_dir,
        upd,
        key_cols=["c_custkey"],
        order_col="_ord",
        delete_condition=F.col("acctbal_cents") > 250_000_000,
        sync_delete_scope=F.col("c_custkey") % 2 == 0,
    )
    snap, _ = snapshot(spark, table_dir)
    return detach_result(
        snap.select("c_custkey", "acctbal_cents", "merged"), table_dir
    )


@register(
    "merge_tx_when_matched_delete",
    oracle="""
        WITH upd AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS cents
            FROM orders WHERE o_custkey % 7 = 0
            GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               COALESCE(u.cents,
                        CAST(round(c.c_acctbal * 100) AS BIGINT))
                   AS acctbal_cents,
               (u.c_custkey IS NOT NULL) AS merged
        FROM customer c LEFT JOIN upd u USING (c_custkey)
        WHERE u.c_custkey IS NULL OR u.cents <= 250000000
    """,
    doc="WHEN MATCHED AND <cond> THEN DELETE — the Delta/Iceberg "
    "matched-delete MERGE clause the surface was missing: one "
    "orders-derived batch both updates (balance <= $2.5M in cents) and "
    "deletes (balance above it) against the seeded customer table in a "
    "single MERGE commit. Matched deletes leave via the same "
    "affected-file anti-join that powers updates (no extra pass); "
    "unmatched delete rows are no-ops, never inserted. The oracle is "
    "the LEFT JOIN with the delete arm as a WHERE exclusion — row "
    "count AND values prove both clause arms.",
    tags=("sink", "merge", "transaction", "delete"),
)
def merge_tx_when_matched_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_del_{sf_tag}")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
        F.lit(False).alias("merged"),
    )
    _write_seed(spark, table_dir, base)
    upd = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 7 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("acctbal_cents")
        )
        .withColumn("merged", F.lit(True))
        .withColumn("_ord", F.lit(1))
    )
    merge(
        spark,
        table_dir,
        upd,
        key_cols=["c_custkey"],
        order_col="_ord",
        delete_condition=F.col("acctbal_cents") > 250_000_000,
    )
    snap, _ = snapshot(spark, table_dir)
    return detach_result(
        snap.select("c_custkey", "acctbal_cents", "merged"), table_dir
    )


@register(
    "merge_tx_evolve_conditional",
    oracle="""
        WITH upd5 AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS cents
            FROM orders WHERE o_custkey % 5 = 0
            GROUP BY o_custkey
        ),
        upd7 AS (
            SELECT o_custkey AS c_custkey,
                   CAST(round(sum(o_totalprice) * 100)
                        AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders WHERE o_custkey % 7 = 0
            GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               CASE
                   WHEN u5.c_custkey IS NOT NULL THEN u5.cents
                   WHEN u7.c_custkey IS NOT NULL THEN u7.cents
                   ELSE CAST(round(c.c_acctbal * 100) AS BIGINT)
               END AS acctbal_cents,
               CAST(CASE
                   WHEN u5.c_custkey IS NOT NULL THEN 2
                   WHEN u7.c_custkey IS NOT NULL THEN 1
                   ELSE 0
               END AS BIGINT) AS ts,
               CASE WHEN u5.c_custkey IS NULL
                    THEN u7.n_orders END AS n_orders
        FROM customer c
        LEFT JOIN upd5 u5 USING (c_custkey)
        LEFT JOIN upd7 u7 USING (c_custkey)
    """,
    doc="Conditional MERGE composed with ADD-COLUMN schema evolution "
    "(the round-5 gap: merge() used to raise on the combination). The "
    "reference's upsert builds its UpdateExpression from whatever keys "
    "arrive (estimate_queue.py:166-178), so evolving payloads under "
    "cross-merge last-write-wins ARE the reference semantics. Fixture: "
    "seed customer balances at ts=0; conditional-merge custkey%5 "
    "balances at ts=2; then conditional+evolve merge custkey%7 at ts=1 "
    "carrying a NEW n_orders column. Keys divisible by 35 prove the "
    "stale-rejection contract on the EVOLVED column: the ts=1 update "
    "loses to the ts=2 target row, so it neither regresses the balance "
    "nor injects n_orders — hence the oracle's n_orders is NULL "
    "whenever upd5 matched. Survivor files keep their narrow schema "
    "(mergeSchema read).",
    tags=("sink", "merge", "transaction", "schema", "evolution"),
)
def merge_tx_evolve_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_evocond_{sf_tag}")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
            "acctbal_cents"
        ),
        F.lit(0).cast("long").alias("ts"),
    )
    _write_seed(spark, table_dir, base)

    def upd(mod: int, ts: int) -> DataFrame:
        return (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_custkey") % mod == 0)
            .groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(
                F.round(F.sum("o_totalprice") * 100)
                .cast("long")
                .alias("acctbal_cents"),
                F.count(F.lit(1)).alias("n_orders"),
            )
            .withColumn("ts", F.lit(ts).cast("long"))
        )

    # newer batch first: custkey%5 at ts=2 (no evolution — n_orders dropped
    # by the fixed-schema projection since evolve_schema=False)
    merge(
        spark,
        table_dir,
        upd(5, 2).drop("n_orders"),
        key_cols=["c_custkey"],
        order_col="ts",
        conditional=True,
    )
    # older batch second, carrying the NEW column: conditional + evolve.
    # Keys %35 must keep the ts=2 balance AND stay NULL in n_orders.
    merge(
        spark,
        table_dir,
        upd(7, 1),
        key_cols=["c_custkey"],
        order_col="ts",
        conditional=True,
        evolve_schema=True,
    )
    snap, _ = snapshot(spark, table_dir)
    return detach_result(
        snap.select("c_custkey", "acctbal_cents", "ts", "n_orders"),
        table_dir,
    )


# --- row-level DELETE / UPDATE (copy-on-write) -------------------------

def delete_where(spark: SparkSession, table_dir: str, predicate) -> int:
    """DELETE FROM table WHERE predicate, copy-on-write: only files that
    CONTAIN a matching row are rewritten (without those rows); untouched
    files carry over by reference. Commits a new version; old versions
    stay time-travelable. ``predicate`` is a pyspark Column."""
    return _rewrite_where(spark, table_dir, predicate, set_exprs=None)


def update_where(
    spark: SparkSession, table_dir: str, predicate, set_exprs: dict
) -> int:
    """UPDATE table SET col=expr WHERE predicate, copy-on-write at file
    granularity: affected files rewrite with the assignment applied to
    matching rows (non-matching rows in the same file copy through
    unchanged); untouched files carry over by reference."""
    return _rewrite_where(spark, table_dir, predicate, set_exprs=set_exprs)


def _rewrite_where(
    spark: SparkSession,
    table_dir: str,
    predicate,
    set_exprs: dict | None,
    max_retries: int = 10,
) -> int:
    for _ in range(max_retries):
        target, base_version = snapshot(spark, table_dir)
        if target is None:
            return base_version
        base_commit = _read_commit(table_dir, base_version)
        stats_col = base_commit.get("stats_col")
        tagged = target.withColumn("_file", F.input_file_name())
        affected = {
            _plain_path(r["_file"])
            for r in tagged.where(predicate)
            .select("_file")
            .distinct()
            .collect()
        }
        base_files = _read_manifest(table_dir, base_version)
        keep_files = [f for f in base_files if f not in affected]
        new_files: list[str] = []
        new_stats: dict = {}
        if affected:
            rows = spark.read.option("mergeSchema", "true").parquet(
                *sorted(affected)
            )
            if set_exprs is None:
                # SQL DELETE semantics: remove rows where the predicate
                # IS TRUE; rows where it evaluates NULL must survive
                # (where(~pred) would drop them — NULL is not true, and
                # unaffected files keep their NULL rows, so the outcome
                # would depend on file co-location)
                rewritten = rows.where(
                    ~F.coalesce(predicate, F.lit(False))
                )
            else:
                rewritten = rows.withColumns(
                    {
                        c: F.when(predicate, e).otherwise(F.col(c))
                        for c, e in set_exprs.items()
                    }
                )
            fs, st = _write_data_file(rewritten, table_dir, stats_col)
            new_files += fs
            new_stats.update(st)
        try:
            _try_commit(
                table_dir,
                base_version + 1,
                keep_files + new_files,
                stats_col=stats_col,
                stats={**_keep_stats(base_commit, keep_files), **new_stats},
            )
            return base_version + 1
        except VersionConflict:
            _discard_files(new_files)
            continue
    raise VersionConflict("gave up after retries")


@register(
    "merge_tx_delete_update",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_custkey % 11 = 0
                    THEN CAST(round(c_acctbal * 100) AS BIGINT) + 500
                    ELSE CAST(round(c_acctbal * 100) AS BIGINT)
               END AS acctbal_cents,
               FALSE AS merged
        FROM customer
        WHERE c_custkey % 13 != 0
    """,
    doc="Row-level DELETE + UPDATE on the copy-on-write table: DELETE "
    "WHERE custkey%13=0 (affected files rewritten without matching "
    "rows), then UPDATE SET cents=cents+500 WHERE custkey%11=0 "
    "(assignment applied via when(pred) inside rewritten files, "
    "non-matching rows copy through). Both are file-granular — "
    "untouched files carry into the new manifest by reference, stats "
    "preserved, versions travelable. Oracle recomputes the final state "
    "relationally (anti-filter + CASE), so the hash proves both row "
    "operations hit exactly the predicated rows.",
    tags=("sink", "merge", "delete", "update"),
)
def merge_tx_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_dml_{sf_tag}")
    base = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            (F.round(F.col("c_acctbal") * 100)).cast("long").alias(
                "acctbal_cents"
            ),
            F.lit(False).alias("merged"),
        )
        .repartitionByRange(8, "c_custkey")
    )
    _write_seed(spark, table_dir, base, stats_col="c_custkey")
    delete_where(spark, table_dir, F.col("c_custkey") % 13 == 0)
    update_where(
        spark,
        table_dir,
        F.col("c_custkey") % 11 == 0,
        {"acctbal_cents": F.col("acctbal_cents") + F.lit(500)},
    )
    snap, _ = snapshot(spark, table_dir)
    return detach_result(
        snap.select("c_custkey", "acctbal_cents", "merged"), table_dir
    )


def _private_table_copy(
    spark: SparkSession, sf_dir: str, mods: tuple[int, ...], dest_dir: str
) -> str:
    """A PRIVATE physical copy of the shared cached fixture table, for
    registry rows that MUTATE disk state (vacuum, restore-then-vacuum):
    they must never touch the process-cached table other readers rely
    on, but rebuilding three versions with two MERGE jobs per
    invocation costs seconds at sf0.1 — a straight file copy plus a
    manifest path rewrite is milliseconds. Manifests store absolute
    data-file paths, so each commit JSON is rewritten (files list and
    per-file stats keys) to point inside the copy."""
    src = _seed_and_merges(spark, sf_dir, "priv", mods)
    shutil.copytree(os.path.join(src, _DATA), os.path.join(dest_dir, _DATA))
    os.makedirs(os.path.join(dest_dir, _COMMITS), exist_ok=True)
    for v in range(1, current_version(src) + 1):
        body = _read_commit(src, v)
        body["files"] = [f.replace(src, dest_dir, 1) for f in body["files"]]
        if "stats" in body:
            body["stats"] = {
                k.replace(src, dest_dir, 1): val
                for k, val in body["stats"].items()
            }
        with open(_commit_path(dest_dir, v), "w") as f:
            json.dump(body, f, indent=0)
    return dest_dir


@register(
    "merge_tx_vacuum_retention",
    oracle=f"""
        WITH {_VERSIONED_STATES_SQL}
        SELECT CAST(1 AS BIGINT) AS version,
               CAST(-1 AS BIGINT) AS n_rows,
               CAST(-1 AS BIGINT) AS n_merged,
               CAST(-1 AS BIGINT) AS acctbal_sum_cents
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE merged) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM v2
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE merged) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM v3
    """,
    doc="VACUUM with a retention window — the lakehouse GC contract: on "
    "a private 3-version table (seed + %7 + %5 MERGEs, same states as "
    "merge_tx_time_travel), vacuum(retain_versions=2, min_age=0) "
    "deletes every data file referenced ONLY by v1. The builder then "
    "PROVES all three GC postconditions before returning: (a) >=1 file "
    "was actually deleted (copy-on-write guarantees v1-only files "
    "exist — the %7 merge rewrote those partitions), (b) reading v1 "
    "now RAISES (its manifest references deleted files — sentinel row "
    "version=1 / -1s records the enforced failure), (c) v2 and v3 "
    "read back bit-exact, which the oracle hash verifies against the "
    "relationally recomputed states. Disk stops growing without "
    "bound while time travel keeps working inside the window — the "
    "only sustainable posture for a 100 TB table taking thousands of "
    "commits a day. Uses a per-invocation scratch table, NOT the "
    "shared cached fixture (vacuum mutates disk; the cached table's "
    "other readers rely on all versions staying live).",
    tags=("sink", "merge", "transaction", "vacuum", "gc"),
)
def merge_tx_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_vacuum_{sf_tag}")
    shutil.rmtree(table_dir)  # copytree needs a non-existent destination
    _private_table_copy(spark, sf_dir, (7, 5), table_dir)
    deleted = vacuum(table_dir, retain_versions=2, min_age_seconds=0.0)
    if not deleted:
        raise AssertionError(
            "vacuum deleted no files — v1-only data files must exist "
            "after two copy-on-write MERGE commits"
        )
    try:
        snapshot_at(spark, table_dir, 1).count()
    except Exception:
        pass  # expected: v1's manifest references vacuumed files
    else:
        raise AssertionError(
            "v1 read succeeded after vacuum(retain_versions=2) — "
            "retention was not enforced"
        )
    sentinel = spark.range(1).select(
        F.lit(1).cast("long").alias("version"),
        F.lit(-1).cast("long").alias("n_rows"),
        F.lit(-1).cast("long").alias("n_merged"),
        F.lit(-1).cast("long").alias("acctbal_sum_cents"),
    )
    out = sentinel
    for v in (2, 3):
        snap = snapshot_at(spark, table_dir, v)
        out = out.unionAll(
            snap.agg(
                F.lit(v).cast("long").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count_if(F.col("merged")).alias("n_merged"),
                F.sum("acctbal_cents").alias("acctbal_sum_cents"),
            )
        )
    return detach_result(out, table_dir)


def restore_version(spark: SparkSession, table_dir: str, version: int) -> int:
    """RESTORE: roll the table back to ``version`` by committing that
    version's manifest (files + stats) again as a NEW version — history
    is preserved, nothing is rewritten or deleted (Delta Lake's RESTORE
    semantics). Copy-on-write makes this O(1): the new commit merely
    re-references the old immutable data files — which also re-protects
    them from vacuum(), since liveness is manifest-reachability.
    Returns the new version number. Retries on VersionConflict so a
    concurrent writer cannot starve the restore."""
    body = _read_commit(table_dir, version)
    while True:
        new_v = current_version(table_dir) + 1
        try:
            _try_commit(
                table_dir,
                new_v,
                body["files"],
                stats_col=body.get("stats_col"),
                stats=body.get("stats"),
            )
            return new_v
        except VersionConflict:
            continue


@register(
    "merge_tx_restore_version",
    oracle=f"""
        WITH {_VERSIONED_STATES_SQL}
        SELECT CAST(3 AS BIGINT) AS version,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE merged) AS BIGINT) AS n_merged,
               CAST(sum(cents) AS BIGINT) AS acctbal_sum_cents
        FROM v3
        UNION ALL
        SELECT CAST(4 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE merged) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM v2
    """,
    doc="RESTORE to an earlier version as a NEW commit: on a private "
    "3-version table (same states as merge_tx_time_travel), "
    "restore_version(2) commits v2's manifest again as v4 — a pure "
    "metadata operation (no data movement, O(1) at any table size), "
    "after which the CURRENT read serves v2's state while v3 stays "
    "time-travelable (the row for version 3 is read AFTER the "
    "restore). The oracle recomputes both states relationally: the "
    "version-4 branch must equal v2 bit-for-bit, proving rollback "
    "re-references rather than recomputes. The un-rewind everyone "
    "needs the day a bad MERGE lands on a 100 TB table.",
    tags=("sink", "merge", "transaction", "restore"),
)
def merge_tx_restore_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    table_dir = new_scratch_dir(f"merge_restore_{sf_tag}")
    shutil.rmtree(table_dir)  # copytree needs a non-existent destination
    _private_table_copy(spark, sf_dir, (7, 5), table_dir)
    new_v = restore_version(spark, table_dir, 2)
    if new_v != 4:
        raise AssertionError(f"expected restore to commit v4, got v{new_v}")
    out = None
    for v in (3, new_v):  # v3 read AFTER the restore: history intact
        snap = snapshot_at(spark, table_dir, v)
        summary = snap.agg(
            F.lit(v).cast("long").alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("merged")).alias("n_merged"),
            F.sum("acctbal_cents").alias("acctbal_sum_cents"),
        )
        out = summary if out is None else out.unionAll(summary)
    return detach_result(out, table_dir)
