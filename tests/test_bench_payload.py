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
    p = bench._stdout_payload(
        worst, 9999.999, 0.1, rot=12, quiet=False, pyloop_ds=999
    )
    assert len(p) <= bench._STDOUT_BUDGET
    # headroom probe: +5 future queries still fit (possibly via the
    # integer-degrade rung, which is exactly what it exists for)
    bigger = dict(worst, **{f"future_query_{i}": 99.9 for i in range(5)})
    p2 = bench._stdout_payload(
        bigger, 9999.999, 0.1, quiet=False, pyloop_ds=999
    )
    assert len(p2) <= bench._STDOUT_BUDGET


def test_rotation_covers_every_declared_row_within_k_rounds():
    """v7 contract (r14 VERDICT task 5): the stdout map rotates —
    BASELINE_PINNED every round, the rest via a round-robin window —
    so EVERY declared benched row reaches the external BENCH_r*.json
    record within k = ceil(pool / width) rounds, and every rotation
    renders at the 1-decimal rung (BENCH_r{N} values are only useful
    for cross-round deltas with >= 1 decimal)."""
    bench = _bench()
    from cubert_spark.queries import all_queries

    declared = set(all_queries())
    # pinned rows must be real declared+benched rows — a typo would
    # silently drop a judge-gate row from every round's record
    assert set(bench.BASELINE_PINNED) <= declared & set(bench.BENCH_QUERIES)
    declared_order = [n for n in bench.BENCH_QUERIES if n in declared]
    timings = {n: 99.9 for n in declared_order}
    pool = len(declared_order) - len(
        [n for n in bench.BASELINE_PINNED if n in timings]
    )
    width = bench.MAX_STDOUT_ROWS - len(bench.BASELINE_PINNED)
    k = -(-pool // width)  # ceil
    assert k <= 2, f"rotation period grew to {k} rounds — document it"
    seen = set()
    for rot in range(k):
        rows = bench._rotate_stdout_rows(timings, declared_order, rot)
        assert set(bench.BASELINE_PINNED) <= set(rows)
        assert len(rows) <= bench.MAX_STDOUT_ROWS
        p = bench._stdout_payload(
            rows, 9999.999, 0.1, rot=rot, quiet=False, pyloop_ds=999
        )
        assert len(p) <= bench._STDOUT_BUDGET
        d = json.loads(p)
        assert d["rot"] == rot
        assert d["queries"][next(iter(rows))] == 99.9  # 1-decimal rung
        seen |= set(rows)
    assert seen == set(declared_order), (
        f"rows never reaching the external record: "
        f"{set(declared_order) - seen}"
    )
    # consecutive rotation indices shift the window: rot and rot+k
    # carry the same map (period k), rot and rot+1 differ when the
    # pool overflows one window
    if pool > width:
        r0 = bench._rotate_stdout_rows(timings, declared_order, 0)
        r1 = bench._rotate_stdout_rows(timings, declared_order, 1)
        assert set(r0) != set(r1)


def test_anchor_gate_rejects_the_r14_ratchet_sequence():
    """r14 VERDICT task 2: the prev-pass-only gate admitted
    minhash_lsh's committed-median walk 3.8 -> 5.6 -> 9.1 s
    (quiet_pass=true at every step — each pass compared only to the
    one before). Replaying that sequence against the pinned anchor:
    the anchor NEVER moves up, so the 9.1 pass violates 1.5x the 3.8
    anchor and the gate stamps it loaded."""
    bench = _bench()
    anchors = {"minhash_lsh": 3.8}
    # step 1: 5.6 s median — under 1.5 x 3.8 = 5.7, passes (the gate
    # is an anchor, not a prev-pass ratchet; a one-step +47% is box
    # weather the requeue already handles)
    assert bench._anchor_regressed({"minhash_lsh": 5.6}, anchors,
                                   ["minhash_lsh"]) == []
    # a quiet pass at 5.6 must NOT raise the anchor
    anchors = bench._updated_anchors({"minhash_lsh": 5.6}, anchors,
                                     ["minhash_lsh"])
    assert anchors == {"minhash_lsh": 3.8}
    # step 2: 9.1 s — rejected against the still-pinned 3.8 anchor,
    # which the old prev-pass rule (vs 5.6) would have admitted
    assert bench._anchor_regressed({"minhash_lsh": 9.1}, anchors,
                                   ["minhash_lsh"]) == ["minhash_lsh"]
    # anchors only move DOWN, and new rows seed at first quiet median
    anchors = bench._updated_anchors(
        {"minhash_lsh": 3.1, "new_row": 2.0}, anchors,
        ["minhash_lsh", "new_row"])
    assert anchors == {"minhash_lsh": 3.1, "new_row": 2.0}


def test_anchor_gate_absolute_floor_protects_subsecond_rows():
    """1.5x alone would flag a 0.2 s row at 0.31 s — timer noise. The
    0.15 s absolute floor keeps sub-0.3 s rows from flapping."""
    bench = _bench()
    anchors = {"tiny": 0.2, "mid": 1.0}
    assert bench._anchor_regressed({"tiny": 0.34}, anchors, ["tiny"]) == []
    assert bench._anchor_regressed({"tiny": 0.36}, anchors, ["tiny"]) == ["tiny"]
    assert bench._anchor_regressed({"mid": 1.45}, anchors, ["mid"]) == []
    assert bench._anchor_regressed({"mid": 1.55}, anchors, ["mid"]) == ["mid"]
    # rows without an anchor (first round on the board) never flag
    assert bench._anchor_regressed({"fresh": 99.0}, anchors, ["fresh"]) == []


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
    # v8 host-attribution keys (r15 VERDICT task 7): always present —
    # null quiet means the gate never ran, distinct from a quiet pass
    assert d["v"] == 8
    assert "quiet" in d and d["quiet"] is None
    assert "pyloop_ds" in d
    p8 = bench._stdout_payload(t, 1.0, 0.1, quiet=True, pyloop_ds=4)
    d8 = json.loads(p8)
    assert d8["quiet"] is True and d8["pyloop_ds"] == 4
    # r17 (ADVICE): a rebase-assisted pass is self-describing on the
    # external line; ordinary lines omit the key (byte budget + pre-
    # r17 parse compatibility)
    assert "anchor_rebase" not in d8
    p9 = bench._stdout_payload(
        t, 1.0, 0.1, quiet=True, pyloop_ds=4, anchor_rebase=True
    )
    assert json.loads(p9)["anchor_rebase"] is True


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
