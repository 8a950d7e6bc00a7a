"""The bench stdout line IS the driver's official per-round record —
the driver keeps the last ~2000 chars of output, so a line longer
than the window is truncated from the FRONT and the record goes
unparseable (it did in r5 and r6). These tests pin the envelope so
adding benched queries can never silently re-break it."""

from __future__ import annotations

import json


def _bench():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("bench")


def test_payload_fits_capture_window_at_worst_case_widths():
    """Every benched query at a 4-char value (99.9 — no sf0.1 query
    is within 10x of that) must fit the budget, with headroom for
    several more rows."""
    bench = _bench()
    worst = {n: 99.9 for n in bench.BENCH_QUERIES}
    p = bench._stdout_payload(worst, 9999.999, 0.1)
    assert len(p) <= bench._STDOUT_BUDGET
    # headroom probe: +5 future queries still fit (possibly via the
    # integer-degrade rung, which is exactly what it exists for)
    bigger = dict(worst, **{f"future_query_{i}": 99.9 for i in range(5)})
    p2 = bench._stdout_payload(bigger, 9999.999, 0.1)
    assert len(p2) <= bench._STDOUT_BUDGET


def test_declared_rows_render_at_one_decimal():
    """v6 contract (r11 VERDICT task 4): the stdout map carries only
    the DECLARED queries() rows (minus the STDOUT_EXCLUDE contract
    twins, whose mins live in BENCH_DETAIL.json — r14), and at that
    count the 1-decimal rung must fit — the per-query values in
    BENCH_r{N}.json are only useful for cross-round deltas with >= 1
    decimal of resolution."""
    bench = _bench()
    from cubert_spark.queries import all_queries

    declared = set(all_queries())
    # every excluded name must be a real declared+benched row — a
    # typo'd exclusion would silently re-grow the stdout map
    assert bench.STDOUT_EXCLUDE <= declared & set(bench.BENCH_QUERIES)
    rows = {
        n: 99.9
        for n in bench.BENCH_QUERIES
        if n in declared and n not in bench.STDOUT_EXCLUDE
    }
    assert rows, "bench set shares no rows with queries()?"
    p = bench._stdout_payload(rows, 9999.999, 0.1)
    assert len(p) <= bench._STDOUT_BUDGET
    d = json.loads(p)
    assert d["queries"][next(iter(rows))] == 99.9  # 1-decimal rung


def test_regression_rule_uses_prior_spread_with_floors():
    """_regressed_rows implements SCALE.md's triage rule: flag only a
    min beyond old_min + max(old_spread, 15% rel, 50 ms abs)."""
    bench = _bench()
    prev_q = {"a": 2.0, "b": 2.0, "c": 0.1, "d": 1.0}
    prev_r = {"a": [2.0, 3.0], "b": [2.0, 2.05], "c": [0.1, 0.11]}
    now = {
        "a": 4.9,  # beyond 2.0 + spread 1.0 -> flagged
        "b": 2.25,  # spread 0.05 < 15% floor 0.3; 2.25 < 2.3 -> ok
        "c": 0.14,  # within the 50 ms absolute floor -> ok
        "d": 1.10,  # no runs recorded; within 15% floor -> ok
    }
    assert bench._regressed_rows(now, prev_q, prev_r, list(now)) == ["a"]


def test_payload_is_parseable_json_with_contract_keys():
    """The line stays parseable with the contract keys at ANY bench
    row count: every row is either in the map or counted in "dropped"
    (the v6 heaviest-first drop rung — production stdout carries the
    smaller declared-only set, pinned by the budget test above)."""
    bench = _bench()
    t = {n: 1.234 for n in bench.BENCH_QUERIES}
    p = bench._stdout_payload(t, 107.358, 0.1)
    assert len(p) <= bench._STDOUT_BUDGET
    d = json.loads(p)
    assert d["metric"] == "bench_total_wall_sec"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.1
    assert d["value"] == 107.358
    assert set(d["queries"]) <= set(bench.BENCH_QUERIES)
    assert len(d["queries"]) + d.get("dropped", 0) == len(bench.BENCH_QUERIES)
    assert all(isinstance(v, (int, float)) for v in d["queries"].values())


def test_degrade_rung_kicks_in_rather_than_overflow():
    """Just past the budget at 1 decimal (realistic name widths), the
    integer rung engages and the line fits + parses."""
    bench = _bench()
    # 90 entries x 13-char names at 5-char values: ~2,070 bytes at
    # 1 decimal (overflow), ~1,890 as integers (fits)
    huge = {f"query_name_{i:02d}": 123.456 for i in range(90)}
    p = bench._stdout_payload(huge, 9999.9, 0.1)
    assert len(p) <= bench._STDOUT_BUDGET
    d = json.loads(p)
    assert d["queries"]["query_name_00"] == 123  # integer rung used
