"""Executable floor-table triage for a bench sweep record.

The round-over-round triage rule (PROGRESS.md rounds 11-14, judge-
adjudicated): a sweep row above its pinned isolated-warm floor needs NO
code change when the excess matches the JIT-warm-in signature (untimed
rerun back at the floor) or the host-contention signature (everything
slow uniformly, total outside the 251-322s same-code band). Only a row
whose STEADY state (rerun, or isolated ab_isolated re-time) sits above
its floor is a plan-regression candidate.

This script turns that prose rule into one command over the sweep
artifact: for every row with a pinned floor it compares the steady
reading (second_run_s when the row was in the rerun pass, else the
timed entry) against floor x TOLERANCE + ABS_SLACK and prints a verdict;
heavy rows with no pinned floor are listed as pin candidates. Exit 1
only when a floored row's steady reading breaches the band - the signal
that an `ab_isolated.py --repeat 3` confirmation (and only then a plan
look) is warranted.

Floors are isolated-warm seconds at sf0.1 (fresh JVM, bench-identical
warmup), pinned via scripts/ab_isolated.py across rounds 11-14 - the
provenance for each value is the floor tables in PROGRESS.md. A floor
is a characterization, not a promise: re-pin it (and edit here) if the
operator's plan deliberately changes.

Accepts both the builder's bench_full.json and the driver's
BENCH_rNN.json sidecar (whose payload sits under a "parsed" wrapper
with no second_run_s - those rows triage under the timed-only
warm-in allowance).

Usage: python scripts/floor_check.py [bench_full.json] [--top N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Pinned isolated-warm floors at sf0.1, seconds (PROGRESS.md rounds
# 11-14 ab_isolated tables). Streaming rows adjudicated intrinsic get
# their measured steady drain cost as the floor.
FLOORS = {
    "agg_distinct": 1.15,
    "agg_distinct_exact_vs_approx": 0.5,
    "basket_part_pairs": 1.8,
    "dedup_clusters": 2.6,
    "dedup_embedding_cosine": 2.0,
    "dedup_semantic_kmeans": 2.4,
    "dedup_ngram_jaccard": 2.2,
    "dedup_simhash": 1.9,
    # re-pinned r18: the r17 union-find rewrite + r18 edge-probe bound —
    # quiet-row sweep readings 1.21–1.46s (own-window steal <2%)
    "er_resolve_parts": 1.3,
    "events_anomaly_mad": 1.2,
    "graph_bfs_distance": 2.0,
    "graph_sssp_weighted": 2.1,
    "graph_pagerank": 3.0,
    # re-pinned r18: encoder entropy coding vectorized (0.46→0.033s per
    # frame) — isolated 0.94s steady even at 56% measured steal
    "image_pipeline_stats": 0.9,
    "graph_triangle_count": 2.5,
    "join_aqe_skew": 1.7,
    "join_bucketed_colocated": 2.0,
    "merge_tx_cdf_to_scd2": 1.0,
    "merge_tx_pruned_read": 2.1,
    "ml_als_recommend": 2.4,
    "ml_classifier_eval": 1.6,
    "pandas_api_pipeline": 1.4,
    "profile_columns": 1.4,
    "queue_estimate": 1.0,
    "queue_estimate_ml": 2.1,
    "recursive_cte_hierarchy": 1.7,
    "similarity_topk_ivf": 2.0,
    "stream_stateful_tracker": 1.7,
    "stream_union_sources_true": 2.2,
    "stream_error_followup_join": 2.7,
    "stream_late_data_drop_true": 2.5,
    "stream_ohlc_true": 1.4,
    "stream_python_datasource_true": 3.5,
    "stream_scd2_dimension_true": 4.8,
    "stream_txn_multi_table_true": 2.8,
    "text_url_canonical_dedup": 0.9,
    "text_vocab_encode": 1.5,
    "udaf_grouped_stats": 0.7,
    "udtf_polymorphic_split": 0.5,
}

# A steady reading inside floor*TOLERANCE + ABS_SLACK is in-band - the
# same ">1.5x with >0.5s absolute" mover convention the verdicts use.
TOLERANCE = 1.5
ABS_SLACK = 0.5

# A row OUTSIDE the rerun pass has only its timed entry, which includes
# per-operator first-execution JIT/class-load - measured at 0.5-2.5s
# across every pinned A/B (e.g. udtf_polymorphic_split 2.06s first vs
# 0.49/0.54s warm). Grant that allowance before calling a timed-only
# reading a breach, else every warm-in row outside the slowest-K
# false-positives on every run.
WARMIN_ALLOWANCE = 2.5

# Rows at least this heavy (timed, seconds) without a pinned floor are
# worth pinning so future triage stays a table lookup.
PIN_CANDIDATE_S = 2.0

# A record whose own cpu_steal.steal_of_busy reaches this fraction was
# measurably contended (quiet r13 host: 0.0045; the r16 above-band
# window: ~0.25) - print a suspect-breaches note.
STEAL_NOTE_RATIO = 0.05


def steal_note(name, row_steal, rerun_steal) -> str:
    """Inline contention annotation for one row from the record's own
    per-window steal maps (r17): the TIMED window explains the timed
    entry; the RERUN window explains second_run_s — the reading breach
    verdicts key on. Empty string when both windows were quiet or
    unmeasured."""
    out = ""
    rt = row_steal.get(name)
    if rt is not None and rt >= STEAL_NOTE_RATIO:
        out += f"  row-steal {rt:.0%} CONTENDED"
    rr = rerun_steal.get(name)
    if rr is not None and rr >= STEAL_NOTE_RATIO:
        out += f"  rerun-steal {rr:.0%} CONTENDED"
    return out


def triage(record: dict, top: int = 20) -> tuple[list, list]:
    """Return (breaches, pin_candidates) for the record.

    breaches: (name, timed, steady, floor) where steady > band - scanned
    over EVERY pinned floor present in the record, not just the top-N
    display slice, so a small-floor row regressing several-fold (e.g. a
    0.5s floor drifting to ~2s steady) cannot hide below the slowest-N
    cut (r14 advice). pin_candidates: (name, timed) heavy rows with no
    floor entry - a top-N concern, since only heavy rows are worth a
    floor.
    """
    timings = record["queries"]
    second = record.get("second_run_s", {})
    breaches, candidates = [], []
    for name, timed in timings.items():
        floor = FLOORS.get(name)
        if floor is None:
            continue
        steady = second.get(name)
        band = floor * TOLERANCE + ABS_SLACK
        if steady is None:
            if timed > band + WARMIN_ALLOWANCE:
                breaches.append((name, timed, timed, floor))
        elif steady > band:
            breaches.append((name, timed, steady, floor))
    breaches.sort(key=lambda b: -b[1])
    for name, timed in sorted(timings.items(), key=lambda kv: -kv[1])[:top]:
        if name not in FLOORS and timed >= PIN_CANDIDATE_S:
            candidates.append((name, timed))
    return breaches, candidates


def main(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(
        description="Floor-band triage over a bench sweep record.")
    parser.add_argument("path", nargs="?", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_full.json",
    ), help="bench_full.json or a driver BENCH_rNN.json sidecar")
    parser.add_argument("--top", type=int, default=20,
                        help="slowest-N rows to display (breach scan is always all floors)")
    ns = parser.parse_args(argv)
    top = ns.top
    record = json.load(open(ns.path))
    # Driver sidecars wrap the bench line under "parsed" (no second_run_s).
    # A failed/unparsed bench run writes "parsed": null (rc != 0 sidecars,
    # e.g. BENCH_r01.json); a truthy payload missing "queries" is equally
    # untriageable - report both cleanly instead of crashing (r15 advice).
    # Some sidecar envelopes carry sf only at the wrapper level, so read
    # it before unwrapping and let the payload's own sf override.
    sf = record.get("sf")
    if "parsed" in record:
        record = record["parsed"]
        if not record or "queries" not in record:
            print(f"{ns.path}: sidecar has no parsed bench payload with"
                  " queries (failed or unparsed run) - nothing to triage")
            return 2
        if record.get("sf") is not None:
            sf = record.get("sf")
    if sf != 0.1:
        print(f"note: floors are pinned at sf0.1; this record is sf={sf}"
              " - verdicts below are not meaningful at other scales")
    # Surface the record's own steal measurement (r16): a sweep taken
    # under heavy hypervisor steal inflates every row uniformly, so its
    # breaches need a quiet-host ab_isolated confirmation before they
    # mean anything. Informational only - rc semantics unchanged.
    # bench_full.json carries the full cpu_steal dict; a driver sidecar's
    # parsed summary line carries only the steal_of_busy scalar.
    cs = record.get("cpu_steal")
    steal = (cs.get("steal_of_busy") if isinstance(cs, dict)
             else record.get("steal_of_busy"))
    if steal is not None and steal >= STEAL_NOTE_RATIO:
        print(f"note: this record measured cpu steal_of_busy={steal:.1%}"
              f" (>= {STEAL_NOTE_RATIO:.0%}) - the host was CONTENDED"
              " during the sweep; treat breaches below as suspect and"
              " re-confirm on a quiet host")
    elif steal is None:
        # Make the missing-provenance case loud (r17 review), and say
        # WHICH missing case it is (r17 review #2): a record with no
        # cpu_steal/steal_of_busy key at all predates the r16 capture;
        # one whose key is present but null WAS captured on a host
        # where the ratio is unmeasurable (no /proc/stat, or a zero
        # busy delta) - claiming "pre-r16" there sends the reader
        # hunting for PROGRESS.md prose that doesn't exist.
        if "cpu_steal" not in record and "steal_of_busy" not in record:
            print("note: this record carries NO cpu_steal measurement"
                  " (pre-r16 artifact) - host quietness is documented"
                  " in PROGRESS.md prose only, not machine-checkable"
                  " here")
        else:
            print("note: this record's steal ratio is null - capture"
                  " ran but the ratio was unmeasurable (no /proc/stat"
                  " on the host, or a zero busy-tick delta); host"
                  " quietness is not machine-checkable here")
    breaches, candidates = triage(record, top)

    second = record.get("second_run_s", {})
    # Per-row steal (r17): when the record carries row_steal /
    # second_run_row_steal, a row whose OWN window (timed or rerun) was
    # contended gets an inline annotation — the reading is then
    # adjudicated from the artifact, no ab_isolated needed. The rerun
    # window matters MORE for breach verdicts: triage keys steady on
    # second_run_s, which the timed-window map says nothing about.
    row_steal = record.get("row_steal") or {}
    rerun_steal = record.get("second_run_row_steal") or {}
    for name, timed in sorted(record["queries"].items(), key=lambda kv: -kv[1])[:top]:
        floor = FLOORS.get(name)
        steady = second.get(name)
        tag = "BREACH" if any(b[0] == name for b in breaches) else (
            "pin?  " if any(c[0] == name for c in candidates) else "ok    ")
        s_steady = f"{steady:5.2f}" if steady is not None else "  -  "
        s_floor = f"{floor:4.1f}" if floor is not None else "  - "
        print(f"{tag} {name:38s} timed {timed:6.2f}  steady {s_steady}"
              f"  floor {s_floor}{steal_note(name, row_steal, rerun_steal)}")

    if candidates:
        print("\npin candidates (heavy, no floor - run"
              " scripts/ab_isolated.py --repeat 3 <key> and add here):")
        for name, timed in candidates:
            print(f"  {name} ({timed:.2f}s)")
    if breaches:
        # The breach scan covers ALL floored rows (r14 advice), so the
        # steal annotation must too (r17 review #2): a below-display-cut
        # breach whose own window the artifact shows as stolen would
        # otherwise read as unadjudicated and trigger a needless
        # ab_isolated run.
        print("\nBREACHES (steady above floor band - confirm with"
              " ab_isolated before any plan change):")
        for name, timed, steady, floor in breaches:
            print(f"  {name}: steady {steady:.2f}s vs floor {floor:.1f}s"
                  f" (band {floor * TOLERANCE + ABS_SLACK:.2f}s)"
                  f"{steal_note(name, row_steal, rerun_steal)}")
        return 1
    scanned = sum(1 for n in record["queries"] if n in FLOORS)
    print(f"\nfloor check: {scanned} pinned floors scanned, slowest"
          f" {min(top, len(record['queries']))} rows displayed, 0 breaches")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
