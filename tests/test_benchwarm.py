"""benchwarm invariants: the shared warm-up set and the listener settle.

The warmup lives in ONE module consumed by bench.py and
scripts/ab_isolated.py (r11 review: duplicated copies drifted apart
within a single round); these tests keep the set honest against the
registry and pin the settle loop's contract without a Spark session.
"""

from __future__ import annotations

from gjenbruksstasjoner_kotid_estimering_spark import benchwarm, registry


def test_warmup_names_all_registered():
    """A registry rename must break LOUDLY here, not silently drop a warm
    query (bench.py guards with `if name in specs`, which would quietly
    un-warm the renamed row and skew the next sweep's comparability)."""
    specs = registry.all_specs()
    missing = [n for n in benchwarm.WARMUP + benchwarm.PYDS_WARMED if n not in specs]
    assert not missing, f"benchwarm names not in registry: {missing}"


def test_warmup_covers_a_streaming_row():
    """The session's first streaming query pays ~2s one-time infra the
    batch warmup never touches (r11 measurement) — the fixed set must
    keep at least one true-streaming drain or that cost lands on an
    arbitrary timed stream_* row again."""
    assert any(n.startswith("stream_") for n in benchwarm.WARMUP)


def test_warm_python_lanes_runs(spark):
    """warm_python_lanes must execute end-to-end in a live session: two
    r17 variants broke at CALL time (string type hints unable to resolve
    a function-local ``pd``, then an unimported PandasUDFType) while the
    suite stayed green — bench.py only ever runs the warmup inside its
    try/except, which degrades to warmup_ok=False and a non-comparable
    sweep instead of a loud failure. This is the loud failure."""
    benchwarm.warm_python_lanes(spark)


def test_settle_batch_row_pays_zero_sleep(monkeypatch):
    """A batch row with no listener movement must return without sleeping
    — 300 batch rows × any fixed sleep would distort the sweep wall."""
    calls = []
    monkeypatch.setattr("time.sleep", lambda s: calls.append(s))
    benchwarm.settle(lambda: (3, 7), (3, 7), expect_events=False)
    assert calls == []


def test_settle_waits_for_stability():
    """Counts still moving → keep polling; two consecutive stable reads →
    return with the final counts visible to the caller."""
    seq = iter([(1, 0), (1, 1), (1, 2), (1, 2), (1, 2), (1, 2)])
    last = {"v": (0, 0)}

    def read():
        last["v"] = next(seq, last["v"])
        return last["v"]

    benchwarm.settle(read, (0, 0), expect_events=True, tick_s=0.001)
    assert last["v"] == (1, 2)


class _FakeWriter:
    def format(self, _):
        return self

    def mode(self, _):
        return self

    def save(self):
        pass


class _FakeDF:
    write = _FakeWriter()


class _Spec:
    def __init__(self, builder):
        self.builder = builder


class _Counter:
    def __init__(self):
        self.starts = 0
        self.batches = 0


def test_sweep_settles_even_when_row_fails(monkeypatch):
    """A failed row's in-flight listener tail must drain before the next
    row reads its baseline — otherwise the tail is attributed to the NEXT
    row's delta (r11 advice: the except path skipped the settle)."""
    import bench

    settled = []
    monkeypatch.setattr(benchwarm, "settle", lambda *a, **k: settled.append(a))

    counter = _Counter()

    def boom(spark, sf_dir):
        counter.starts += 1  # stream started, then the drain died
        raise RuntimeError("drain died")

    stats: dict = {}
    timings, errors = bench._sweep(None, {"stream_bad": _Spec(boom)}, "x", counter, stats)
    assert len(settled) == 1
    assert "stream_bad" in errors and "stream_bad" not in timings
    # the started stream is still visible in the diagnostics
    assert stats["stream_bad"]["queries"] == 1


def test_sweep_stats_failure_cannot_error_a_timed_row(monkeypatch):
    """timings and errors are mutually exclusive: an exception in the
    post-timing settle/stats bookkeeping must not re-classify a
    successfully timed row as errored (r11 advice)."""
    import bench

    def bad_settle(*a, **k):
        raise RuntimeError("listener bus gone")

    monkeypatch.setattr(benchwarm, "settle", bad_settle)
    timings, errors = bench._sweep(
        None, {"good": _Spec(lambda s, d: _FakeDF())}, "x", _Counter(), {}
    )
    assert "good" in timings
    assert errors == {}


def test_sweep_tag_marks_rerun_failures(monkeypatch, capsys):
    """The untimed second-run pass reuses _sweep; its stderr failure
    lines must be distinguishable from timed-sweep failures, and the
    rerun's error dict is returned (recorded as second_run_errors in the
    sidecar) rather than discarded."""
    import bench

    monkeypatch.setattr(benchwarm, "settle", lambda *a, **k: None)

    def boom(spark, sf_dir):
        raise RuntimeError("rerun flake")

    timings, errors = bench._sweep(
        None, {"heavy": _Spec(boom)}, "x", _Counter(), {}, tag="rerun:"
    )
    assert timings == {} and "heavy" in errors
    assert "bench: rerun:heavy FAILED" in capsys.readouterr().err


def test_sweep_row_steal_covers_every_row_including_failures(monkeypatch):
    """row_steal (r17) is per-row contention evidence: every row the
    sweep touched — timed OR failed — gets an entry keyed on its own
    /proc/stat window, and the capture must never reclassify a row (it
    runs in the finally, before the settle that would dilute it). With
    capture off (row_steal=None, the rerun pass) _sweep must not read
    /proc/stat at all."""
    import bench

    monkeypatch.setattr(benchwarm, "settle", lambda *a, **k: None)
    ticks = iter(range(100))
    monkeypatch.setattr(
        benchwarm, "cpu_ticks",
        lambda: {"steal": next(ticks), "busy": 100 * next(ticks)},
    )

    def boom(spark, sf_dir):
        raise RuntimeError("mid-sweep flake")

    specs = {"good": _Spec(lambda s, d: _FakeDF()), "bad": _Spec(boom)}
    row_steal: dict = {}
    timings, errors = bench._sweep(
        None, specs, "x", _Counter(), {}, row_steal=row_steal
    )
    assert set(row_steal) == {"good", "bad"}  # failures captured too
    assert all(v is not None for v in row_steal.values())
    assert "good" in timings and "bad" in errors

    calls = []
    monkeypatch.setattr(
        benchwarm, "cpu_ticks", lambda: calls.append(1) or None
    )
    bench._sweep(None, {"good": _Spec(lambda s, d: _FakeDF())},
                 "x", _Counter(), {})
    assert calls == []  # capture off → zero /proc/stat reads

    # A capture failure is diagnostics-only: it must not kill the sweep
    # nor reclassify the row (narrow-try convention, r17 review — an
    # exception raised inside the finally would REPLACE an in-flight
    # builder exception and abort with no artifact).
    monkeypatch.setattr(benchwarm, "cpu_ticks", lambda: {"bad": "shape"})
    def bad_stats(a, b):
        raise TypeError("unexpected tick shape")
    monkeypatch.setattr(benchwarm, "steal_stats", bad_stats)
    rs: dict = {}
    timings, errors = bench._sweep(
        None, {"good": _Spec(lambda s, d: _FakeDF())},
        "x", _Counter(), {}, row_steal=rs,
    )
    assert "good" in timings and errors == {}
    assert rs == {"good": None}


def test_bench_summary_line_schema_is_stable():
    """The printed line is the driver's ONLY bench interface (a malformed
    line in round 1 cost the round its bench artifact). Pin the key set,
    the JSON-serializability, and the 5-slowest truncation."""
    import json

    import bench

    timings = {f"q{i}": float(i) for i in range(1, 9)}
    line = bench.summary_line(timings, {}, True, 0.1)
    assert set(line) == {
        "metric", "value", "unit", "n_queries", "queries", "warmup_ok", "sf"
    }
    assert line["value"] == round(sum(timings.values()), 3)
    assert line["n_queries"] == 8
    assert list(line["queries"]) == ["q8", "q7", "q6", "q5", "q4"]
    json.dumps(line)  # must survive serialization

    with_err = bench.summary_line(timings, {"qx": "Boom: " + "y" * 500}, False, 0.1)
    assert with_err["n_errors"] == 1
    assert len(with_err["errors"]["qx"]) <= 80
    json.dumps(with_err)

    # steal_of_busy joins the line ONLY when measured (r16: the driver
    # sidecar is the persistent per-round carrier of contention evidence;
    # an unmeasurable /proc/stat must leave the base schema untouched).
    with_steal = bench.summary_line(
        timings, {}, True, 0.1,
        cpu_steal={"steal_ticks": 9, "busy_ticks": 36, "steal_of_busy": 0.25})
    assert with_steal["steal_of_busy"] == 0.25
    no_ratio = bench.summary_line(
        timings, {}, True, 0.1,
        cpu_steal={"steal_ticks": 0, "busy_ticks": 0, "steal_of_busy": None})
    assert "steal_of_busy" not in no_ratio


def test_full_sidecar_schema_is_stable():
    """bench_full.json is the triage artifact behind every sweep-blip
    adjudication (r11/r12 verdicts read it directly) — pin the key set,
    total single-sourcing from the summary line, and the r12-advice
    second_run_stream_stats field so a rerun's drain deltas are never
    silently dropped again."""
    import json

    import bench

    timings = {"stream_x": 4.0, "batch_y": 1.0}
    line = bench.summary_line(timings, {}, True, 0.1)
    full = bench.full_sidecar(
        line,
        timings=timings,
        errors={},
        prewarmed=["batch_y"],
        warmup_ok=True,
        stream_stats={"stream_x": {"queries": 1, "microbatches": 4}},
        second_run={"stream_x": 1.5},
        first_run_overhead={"stream_x": 2.5},
        rerun_errors={},
        second_run_stream_stats={"stream_x": {"queries": 1, "microbatches": 4}},
        sf_val=0.1,
        cpu_steal={"steal_ticks": 10, "busy_ticks": 1000,
                   "steal_of_busy": 0.01},
        row_steal={"stream_x": 0.02, "batch_y": None},
        second_run_row_steal={"stream_x": 0.4},
        harness_floor={"jvm_noop_min_s": 0.05, "parquet_scan_min_s": 0.09,
                       "repeats": 5},
    )
    assert set(full) == {
        "metric", "value", "unit", "n_queries", "queries", "errors",
        "prewarmed", "warmup_ok", "stream_stats", "second_run_s",
        "first_run_overhead_s", "second_run_errors",
        "second_run_stream_stats", "cpu_steal", "row_steal",
        "second_run_row_steal", "harness_floor_s", "sf",
    }
    assert full["value"] == line["value"]  # single-sourced total
    assert full["second_run_stream_stats"]["stream_x"]["microbatches"] == 4
    assert full["row_steal"]["stream_x"] == 0.02
    assert full["second_run_row_steal"]["stream_x"] == 0.4
    assert full["harness_floor_s"]["jvm_noop_min_s"] == 0.05
    json.dumps(full)  # must survive serialization


def test_round_sidecar_path_derives_next_round(tmp_path):
    """The per-round full-sidecar copy (r17 verdict #2a) lands as
    bench_full_r{N}.json with N = newest committed BENCH round + 1 —
    the round the fresh sweep belongs to — and is skipped entirely in
    dirs without driver sidecars (unit-test tmpdirs)."""
    import bench

    assert bench.round_sidecar_path(str(tmp_path)) is None
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r17.json").write_text("{}")
    (tmp_path / "BENCH_r17_c8.json").write_text("{}")  # low-core rerun: ignored
    assert bench.round_sidecar_path(str(tmp_path)) == str(
        tmp_path / "bench_full_r18.json"
    )


def test_steal_stats_ratio_and_unavailable_cases():
    """steal_stats summarizes two cpu_ticks() readings; either side None
    (non-Linux /proc) or a zero busy delta must degrade to None fields,
    never divide by zero (r16: the ratio is standing contention evidence
    in every bench artifact, so its edge cases must be exact)."""
    import json

    from gjenbruksstasjoner_kotid_estimering_spark.benchwarm import (
        cpu_ticks,
        steal_stats,
    )

    out = steal_stats({"steal": 100, "busy": 1000},
                      {"steal": 350, "busy": 2000})
    assert out == {"steal_ticks": 250, "busy_ticks": 1000,
                   "steal_of_busy": 0.25}
    assert steal_stats(None, {"steal": 1, "busy": 1}) is None
    assert steal_stats({"steal": 1, "busy": 1}, None) is None
    same = {"steal": 5, "busy": 7}
    assert steal_stats(same, same)["steal_of_busy"] is None
    json.dumps(out)

    # live reading on this host: monotone counters, sane shape. cpu_ticks
    # degrades to None by DESIGN where /proc/stat is absent (non-Linux) —
    # skip rather than contradict that contract.
    a, b = cpu_ticks(), cpu_ticks()
    if a is None or b is None:
        import pytest

        pytest.skip("/proc/stat unavailable on this platform")
    assert b["busy"] >= a["busy"] and b["steal"] >= a["steal"]


def test_floor_check_notes_contended_record(tmp_path, capsys):
    """A record carrying a high cpu_steal.steal_of_busy must print the
    contended-host note (breaches suspect), and a quiet record must not
    (r16). Informational only - rc unchanged."""
    import json

    from scripts.floor_check import main

    base = {"metric": "full queries() sweep wall time", "value": 1.0,
            "sf": 0.1, "queries": {"tpch_q1": 0.4}, "second_run_s": {}}
    hot = dict(base, cpu_steal={"steal_ticks": 9, "busy_ticks": 36,
                                "steal_of_busy": 0.25})
    p = tmp_path / "hot.json"
    p.write_text(json.dumps(hot))
    assert main([str(p)]) == 0
    assert "CONTENDED" in capsys.readouterr().out

    quiet = dict(base, cpu_steal={"steal_ticks": 1, "busy_ticks": 220,
                                  "steal_of_busy": 0.0045})
    p2 = tmp_path / "quiet.json"
    p2.write_text(json.dumps(quiet))
    assert main([str(p2)]) == 0
    assert "CONTENDED" not in capsys.readouterr().out

    # driver sidecar: the parsed summary line carries only the scalar
    # steal_of_busy (no cpu_steal dict) - the note must still fire (r16
    # review: the sidecar is the only PERSISTENT per-round carrier).
    sidecar = {"n": 15, "rc": 0, "sf": 0.1,
               "parsed": dict(base, steal_of_busy=0.31)}
    p3 = tmp_path / "BENCH_r99.json"
    p3.write_text(json.dumps(sidecar))
    assert main([str(p3)]) == 0
    assert "CONTENDED" in capsys.readouterr().out

    # no steal measurement at all (pre-r16 artifact, e.g. the committed
    # 261.19s record): the gap must be LOUD, not silent — otherwise a
    # missing field reads as "checked and quiet" (r17 review).
    p4 = tmp_path / "old.json"
    p4.write_text(json.dumps(base))
    assert main([str(p4)]) == 0
    out4 = capsys.readouterr().out
    assert "NO cpu_steal measurement" in out4
    assert "CONTENDED" not in out4

    # per-row steal (r17): a displayed row whose OWN window was stolen is
    # annotated inline; quiet rows are not. The whole-sweep ratio can be
    # quiet while one row's window was hit (mid-sweep burst).
    perrow = dict(base,
                  queries={"tpch_q1": 0.4, "tpch_q2": 0.5},
                  cpu_steal={"steal_ticks": 1, "busy_ticks": 220,
                             "steal_of_busy": 0.0045},
                  row_steal={"tpch_q1": 0.31, "tpch_q2": 0.002},
                  second_run_row_steal={"tpch_q2": 0.4})
    p5 = tmp_path / "perrow.json"
    p5.write_text(json.dumps(perrow))
    assert main([str(p5)]) == 0
    out5 = capsys.readouterr().out
    assert "row-steal 31% CONTENDED" in out5
    assert out5.count("row-steal") == 1  # quiet timed window not annotated
    # the RERUN window has its own annotation (breach verdicts key on
    # second_run_s, whose contention the timed map says nothing about)
    assert "rerun-steal 40% CONTENDED" in out5

    # a post-capture artifact whose ratio is null (cpu_steal: null on a
    # /proc/stat-less host) must NOT claim "pre-r16" provenance
    nullsteal = dict(base, cpu_steal=None)
    p6 = tmp_path / "nullsteal.json"
    p6.write_text(json.dumps(nullsteal))
    assert main([str(p6)]) == 0
    out6 = capsys.readouterr().out
    assert "unmeasurable" in out6
    assert "pre-r16" not in out6


def test_floor_check_breach_block_carries_steal_annotation(tmp_path, capsys):
    """The breach scan covers ALL floored rows, including those below the
    display cut (r14 advice) — so the per-row steal annotation must reach
    the BREACHES block too, or a below-cut breach whose own rerun window
    the artifact shows as stolen reads as unadjudicated (r17 review)."""
    import json

    from scripts.floor_check import main

    # tpch_q1 has no floor; give the breach row a floor via a real pinned
    # name (udaf_grouped_stats, floor 0.7) and push it below the top-1
    # display cut with a slower unfloored row.
    rec = {"metric": "full queries() sweep wall time", "value": 9.0,
           "sf": 0.1,
           "queries": {"tpch_q1": 1.9, "udaf_grouped_stats": 1.8},
           "second_run_s": {"udaf_grouped_stats": 2.5},
           "cpu_steal": {"steal_ticks": 1, "busy_ticks": 220,
                         "steal_of_busy": 0.0045},
           "row_steal": {"udaf_grouped_stats": 0.01},
           "second_run_row_steal": {"udaf_grouped_stats": 0.52}}
    p = tmp_path / "burst.json"
    p.write_text(json.dumps(rec))
    assert main([str(p), "--top", "1"]) == 1  # steady 2.5 > 0.7*1.5+0.5
    out = capsys.readouterr().out
    assert "BREACHES" in out
    # the breach line itself carries the rerun-window contention evidence
    breach_line = [l for l in out.splitlines()
                   if l.strip().startswith("udaf_grouped_stats:")][0]
    assert "rerun-steal 52% CONTENDED" in breach_line


def test_overhead_map_nulls_negative_deltas():
    """A rerun slower than the timed first run measured host noise, not
    warm-in overhead (r13 advice: -10.3s rows in a committed sidecar made
    the overhead map unreliable) — such rows must record null, while
    genuine warm-in deltas and exact zeros survive as numbers."""
    import json

    import bench

    timings = {"warm_in": 5.0, "noisy": 3.0, "flat": 2.0}
    second = {"warm_in": 3.5, "noisy": 9.252, "flat": 2.0}
    out = bench.overhead_map(timings, second)
    assert out == {"warm_in": 1.5, "noisy": None, "flat": 0.0}
    json.dumps(out)  # null must survive serialization


def test_ab_isolated_rejects_nonpositive_repeat():
    """--repeat 0 (or negative) must exit 2 with usage, not print a
    misleading JSON line with empty timing lists (r11 advice)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [_sys.executable, str(repo / "scripts" / "ab_isolated.py"), "--repeat", "0", "tpch_q1"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 2
    assert "usage" in proc.stderr


def test_settle_respects_deadline():
    """Counts that never stabilize must not hang past the deadline."""
    import time

    n = {"v": 0}

    def read():
        n["v"] += 1
        return (n["v"], 0)

    t0 = time.perf_counter()
    benchwarm.settle(read, (0, 0), expect_events=True, deadline_s=0.1, tick_s=0.01)
    assert time.perf_counter() - t0 < 1.0


def test_floor_check_triage_classifies_rows():
    """floor_check.triage is the executable form of the sweep-triage
    rule: a floored row breaches only when its STEADY reading (rerun if
    present, else timed) exceeds floor*1.5+0.5; heavy unfloored rows are
    pin candidates; a warm-in row (heavy timed, at-floor rerun) is ok."""
    from scripts.floor_check import FLOORS, triage

    record = {
        "queries": {
            "dedup_clusters": 6.5,        # heavy timed...
            "graph_pagerank": 9.9,        # breach: steady way above floor
            "mystery_heavy_op": 3.3,      # no floor -> pin candidate
            "tpch_q1": 0.4,               # light, no floor -> ignored
        },
        "second_run_s": {
            "dedup_clusters": 2.7,        # ...but rerun at floor: warm-in, ok
            "graph_pagerank": 9.8,
        },
    }
    assert "dedup_clusters" in FLOORS and "graph_pagerank" in FLOORS
    breaches, candidates = triage(record, top=20)
    assert [b[0] for b in breaches] == ["graph_pagerank"]
    assert [c[0] for c in candidates] == ["mystery_heavy_op"]


def test_floor_check_timed_only_rows_get_warmin_allowance():
    """A row outside the rerun pass has only its timed entry, which
    includes 0.5-2.5s first-execution warm-in — it breaches only past
    band + WARMIN_ALLOWANCE, while a rerun-backed steady reading keeps
    the tight band (the udtf_polymorphic_split false-positive: 2.82s
    timed vs 0.5s floor was pure warm-in, proven 0.49/0.54s isolated)."""
    from scripts.floor_check import triage

    record = {
        "queries": {
            "udtf_polymorphic_split": 2.82,  # floor 0.5: warm-in, no rerun -> ok
            "graph_pagerank": 9.9,           # floor 3.0: over even with allowance
        },
        "second_run_s": {},
    }
    breaches, _ = triage(record, top=20)
    assert [b[0] for b in breaches] == ["graph_pagerank"]


def test_floor_check_breach_scan_covers_floors_below_topn():
    """The breach scan walks EVERY pinned floor in the record, not just
    the slowest-N display slice (r14 advice): a small-floor row that
    regresses several-fold (udtf_polymorphic_split 0.5s floor drifting
    to ~2s STEADY) must breach even when dozens of heavier rows push it
    out of the top-N."""
    from scripts.floor_check import triage

    record = {
        "queries": {
            **{f"heavy_unfloored_{i}": 50.0 - i for i in range(10)},
            "udtf_polymorphic_split": 2.1,   # floor 0.5, band 1.25
        },
        "second_run_s": {"udtf_polymorphic_split": 2.0},  # steady breach
    }
    breaches, candidates = triage(record, top=3)
    assert [b[0] for b in breaches] == ["udtf_polymorphic_split"]
    # pin candidates stay a top-N display concern
    assert len(candidates) == 3


def test_floor_check_main_unwraps_driver_sidecar(tmp_path, capsys):
    """floor_check accepts the driver's BENCH_rNN.json wrapper (payload
    under 'parsed', no second_run_s -> timed-only allowance applies)."""
    import json

    from scripts.floor_check import main

    sidecar = {
        "n": 15,
        "rc": 0,
        "sf": 0.1,
        "parsed": {
            "metric": "sweep_total",
            "value": 9.9,
            "sf": 0.1,
            "queries": {"graph_pagerank": 3.2, "tpch_q1": 0.4},
        },
    }
    path = tmp_path / "BENCH_r99.json"
    path.write_text(json.dumps(sidecar))
    rc = main([str(path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "graph_pagerank" in out and "0 breaches" in out


def test_floor_check_sidecar_payload_without_queries_is_rc2(tmp_path, capsys):
    """A truthy parsed payload MISSING 'queries' is as untriageable as
    'parsed': null — rc 2 with the clean message, not a KeyError (r15
    advice)."""
    import json

    from scripts.floor_check import main

    path = tmp_path / "BENCH_r99.json"
    path.write_text(json.dumps(
        {"n": 15, "rc": 1, "sf": 0.1, "parsed": {"metric": "sweep_total"}}))
    rc = main([str(path)])
    out = capsys.readouterr().out
    assert rc == 2
    assert "nothing to triage" in out


def test_floor_check_sf_falls_back_to_sidecar_wrapper(tmp_path, capsys):
    """A sidecar carrying sf only in the WRAPPER (payload omits it) must
    not print the 'not meaningful at other scales' note when the wrapper
    says sf0.1 (r15 advice)."""
    import json

    from scripts.floor_check import main

    sidecar = {
        "n": 15,
        "rc": 0,
        "sf": 0.1,
        "parsed": {"metric": "sweep_total", "value": 1.0,
                   "queries": {"tpch_q1": 0.4}},
    }
    path = tmp_path / "BENCH_r99.json"
    path.write_text(json.dumps(sidecar))
    rc = main([str(path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "not meaningful at other scales" not in out


def test_evidence_head_check_accounts_for_pins_and_never_band():
    """The _PRIORITY head order is pins -> never-sampled -> stalest
    cohort (rotate_priority.build_block); evidence_report's head check
    must accept that exact layout and flag each band's violation (r15
    review: an active pin previously made a correct rotation warn)."""
    from scripts.evidence_report import head_misplacement

    pins, never, cohort = ["p1"], ["n1", "n2"], ["s1", "s2"]
    good = ["p1", "n1", "n2", "s1", "s2", "old1", "old2"]
    assert head_misplacement(good, pins, never, cohort) is None

    # cohort pushed out of the head by fresher keys -> stalest flagged
    bad_cohort = ["p1", "n1", "n2", "old1", "old2", "s1", "s2"]
    label, misplaced = head_misplacement(bad_cohort, pins, never, cohort)
    assert label == "stalest keys" and misplaced == ["s1", "s2"]

    # never band displaced: keys[1:3] is ["old1", "n1"], so n2 sits
    # outside the positional band -> never flagged before the cohort check
    bad_never = ["p1", "old1", "n1", "n2", "s1", "s2", "old2"]
    label, misplaced = head_misplacement(bad_never, pins, never, cohort)
    assert label == "never-sampled keys" and misplaced == ["n2"]

    # pin not at the very head -> pins flagged first
    bad_pin = ["n1", "p1", "n2", "s1", "s2", "old1", "old2"]
    label, misplaced = head_misplacement(bad_pin, pins, never, cohort)
    assert label == "active pins" and misplaced == ["p1"]

    # a pinned key that is ALSO never-sampled counts once, in the pin band
    both = head_misplacement(["p1", "n2", "s1", "s2"], ["p1"], ["p1", "n2"],
                             ["s1", "s2"])
    assert both is None

    # a pinned key that is ALSO in the stalest cohort counts once, in the
    # pin band: the head window must NOT widen by the overlap (r15 advice
    # — a one-wider window would let a fresher key hide in the head).
    overlap = head_misplacement(["p1", "n1", "s1", "fresh", "s2"], ["p1"],
                                ["n1"], ["p1", "s1", "s2"])
    assert overlap == ("stalest keys", ["s2"])
    # and the correctly rotated overlap layout passes
    assert head_misplacement(["p1", "n1", "s1", "s2", "fresh"], ["p1"],
                             ["n1"], ["p1", "s1", "s2"]) is None
