"""Operator-matrix unit tests over tiny in-memory DataFrames —
mirrors the reference's test strategy (SURVEY.md §5: ArrayBlock
fixtures in TestOperators.java) for surface not covered by the
star-schema oracle queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cubert_spark.operators import (
    combine,
    distinct,
    duplicate,
    flatten,
    gather,
    group_by,
    join,
    limit,
    rank,
    sort_within_blocks,
    top_n,
)
from cubert_spark.operators.dictionary import build_dictionary, decode, encode, refresh_dictionary
from cubert_spark.operators.joins import rs_join


@pytest.fixture(scope="module")
def join_fixtures(spark):
    # F4: overlapping, missing, duplicated keys (TestOperators.java:97-893)
    left = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 11), (2, "b", 20), (3, "c", 30)],
        "k1 int, k2 string, payload int",
    )
    right = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (2, "b", 201), (4, "d", 400)],
        "k1 int, k2 string, rpayload int",
    )
    return left, right


def test_join_matrix(spark, join_fixtures):
    left, right = join_fixtures
    inner = join(left, right, ["k1", "k2"], "INNER")
    assert inner.count() == 2 + 2  # k1=1 matches x2 left rows, k2=2 x2 right rows
    louter = join(left, right, ["k1", "k2"], "LEFT OUTER")
    assert louter.count() == 2 + 2 + 1  # +unmatched k=3
    full = join(left, right, ["k1", "k2"], "FULL OUTER")
    assert full.count() == 2 + 2 + 1 + 1
    semi = join(left, right, ["k1", "k2"], "LEFT SEMI")
    assert semi.count() == 3
    anti = join(left, right, ["k1", "k2"], "LEFT ANTI")
    assert anti.collect()[0]["k1"] == 3


def test_join_empty_right(spark, join_fixtures):
    # testMergeJoinFullOuterEmptyRight (TestOperators.java:295)
    left, right = join_fixtures
    empty = right.filter(F.lit(False))
    full = join(left, empty, ["k1", "k2"], "FULL OUTER")
    assert full.count() == left.count()
    assert all(r["rpayload"] is None for r in full.collect())


def test_join_block_naming(spark, join_fixtures):
    left, right = join_fixtures
    out = join(left, right, ["k1", "k2"], "INNER", left_name="L", right_name="R")
    assert set(out.columns) == {"k1", "k2", "L___payload", "R___rpayload"}


def test_rs_join_duplicate_dim_raises(spark, join_fixtures):
    left, right = join_fixtures
    with pytest.raises(Exception, match="duplicate dimension key"):
        rs_join(left, right, ["k1"], check_unique_dim=True).collect()


def test_groupby_null_semantics(spark):
    # F5: group with all-NULL measures (TestAggregators.java:53-112)
    df = spark.createDataFrame(
        [(1, 10, "x"), (1, None, "y"), (2, None, None), (2, None, "z")],
        "g int, m_int int, m_str string",
    )
    out = {
        r["g"]: r
        for r in group_by(
            df,
            ["g"],
            ("SUM", "m_int", "s"),
            ("COUNT", "m_int", "c"),
            ("MIN", "m_int", "mn"),
            ("MAX", "m_int", "mx"),
        ).collect()
    }
    # SUM/MIN/MAX skip nulls (CHANGELOG:23); COUNT counts rows
    assert out[1]["s"] == 10 and out[1]["c"] == 2
    assert out[2]["s"] is None and out[2]["mn"] is None and out[2]["c"] == 2


def test_groupby_all(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    row = group_by(df, [], ("SUM", "x", "s"), ("COUNT", "x", "c")).collect()[0]
    assert row["s"] == 6 and row["c"] == 3


def test_flatten_matrix(spark):
    # F6: TUPLE / BAG / BAG_TUPLE incl. null & empty bags
    df = spark.createDataFrame(
        [
            Row(id=1, rec=Row(a=1, b="x"), items=[Row(x=1, y="p"), Row(x=2, y="q")]),
            Row(id=2, rec=Row(a=2, b="y"), items=[]),
            Row(id=3, rec=Row(a=3, b="z"), items=None),
        ]
    )
    t = flatten(df, ("rec", "TUPLE"))
    assert {"a", "b", "id", "items"} == set(t.columns)
    # null/empty bag -> one row with NULL (FlattenBagOperator null-bag rule)
    b = flatten(df.select("id", "items"), ("items", "BAG"))
    assert b.count() == 4
    bt = flatten(df.select("id", "items"), ("items", "BAG_TUPLE"), aliases={"items": ("x", "y")})
    rows = {r["id"]: r for r in bt.collect() if r["id"] != 1}
    assert rows[2]["x"] is None and rows[3]["x"] is None
    assert bt.count() == 4


def test_duplicate_counter(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    out = duplicate(df, 3, counter="n")
    assert out.count() == 6
    assert sorted(r["n"] for r in out.filter("x=1").collect()) == [1, 2, 3]


def test_gather_combine(spark):
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(2,), (3,)], "x int")
    assert gather(a, b).count() == 4
    assert combine(a, b, sorted_on=["x"]).count() == 4
    assert distinct(gather(a, b)).count() == 3


def test_rank_topn(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "g string, v int"
    )
    r = rank(df, "rk", group_by=["g"], order_by=["v"])
    assert {(x["g"], x["v"], x["rk"]) for x in r.collect()} == {
        ("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("b", 9, 1),
    }
    t = top_n(df, 2, group_by=["g"], order_by=[F.col("v").desc()])
    assert {(x["g"], x["v"]) for x in t.collect()} == {("a", 3), ("a", 2), ("b", 9)}


def test_dictionary_roundtrip(spark):
    df = spark.createDataFrame(
        [("red", 1), ("blue", 2), (None, 3), ("green", 4)], "color string, v int"
    )
    d = build_dictionary(df, "color")
    codes = {r["value"]: r["code"] for r in d.collect()}
    assert codes == {"blue": 1, "green": 2, "red": 3}  # value-ordered dense codes
    enc = encode(df, d, ["color"])
    got = {r["v"]: r["color"] for r in enc.collect()}
    assert got[3] == 0  # NULLS AS 0
    dec = decode(enc.filter("color > 0"), d, ["color"])
    assert {r["color"] for r in dec.collect()} == {"red", "blue", "green"}
    # UNKNOWNS AS -1 on a dictionary missing a value
    d2 = build_dictionary(df.filter("color != 'red'"), "color")
    enc2 = encode(df, d2, ["color"])
    assert {r["v"]: r["color"] for r in enc2.collect()}[1] == -1


def test_dictionary_refresh(spark):
    df = spark.createDataFrame([("a",), ("b",)], "c string")
    d = build_dictionary(df, "c")
    new = spark.createDataFrame([("b",), ("z",), ("a",)], "c string")
    d2 = refresh_dictionary(d, new, "c")
    codes = {r["value"]: r["code"] for r in d2.collect()}
    assert codes == {"a": 1, "b": 2, "z": 3}  # old codes stable, new appended


def test_tee_with_split(spark, tmp_path):
    from cubert_spark.operators import tee

    df = spark.createDataFrame([(1, "keep"), (2, "side"), (3, "side")], "id int, tag string")
    main = tee(df, str(tmp_path / "side"), predicate=F.col("tag") == "side", split=True)
    side = spark.read.parquet(str(tmp_path / "side"))
    assert side.count() == 2
    assert [r["id"] for r in main.collect()] == [1]  # WITH SPLIT removes teed rows


def test_limit_and_sort_within(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "x int").repartition(1)
    assert limit(df, 2).count() == 2
    vals = [r["x"] for r in sort_within_blocks(df, "x").collect()]
    assert vals == [1, 2, 3]


# --- CDC changelog compaction ----------------------------------------------

def _changelog(spark):
    rows = [
        # key 1: insert then update — update wins
        Row(k=1, ts=1, uid=10, op="upsert", v=1.0),
        Row(k=1, ts=2, uid=11, op="upsert", v=2.0),
        # key 2: updated then tombstoned — absent from the snapshot
        Row(k=2, ts=1, uid=12, op="upsert", v=3.0),
        Row(k=2, ts=9, uid=13, op="delete", v=None),
        # key 3: same ts twice — the uid tiebreaker decides
        Row(k=3, ts=5, uid=20, op="upsert", v=5.0),
        Row(k=3, ts=5, uid=21, op="upsert", v=6.0),
        # key 4: deleted then re-inserted — resurrection wins
        Row(k=4, ts=1, uid=30, op="delete", v=None),
        Row(k=4, ts=2, uid=31, op="upsert", v=7.0),
    ]
    return spark.createDataFrame(rows)


def test_apply_changelog_latest_wins(spark):
    from cubert_spark.operators.cdc import apply_changelog

    out = apply_changelog(
        _changelog(spark),
        key_cols=["k"], seq_cols=["ts", "uid"], op_col="op",
        delete_ops=["delete"], payload_cols=["v"],
    )
    got = {r.k: (r.last_ts, r.last_uid, r.last_v, r.n_changes) for r in out.collect()}
    assert got == {
        1: (2, 11, 2.0, 2),
        3: (5, 21, 6.0, 2),   # ts tie -> higher uid wins
        4: (2, 31, 7.0, 2),   # delete then re-insert -> present
    }
    assert 2 not in got  # tombstone


def test_apply_changelog_is_agg_not_window(spark):
    """The compaction must plan as one hash aggregate (map-side
    partial), never a window sort over the changelog."""
    from cubert_spark.operators.cdc import apply_changelog
    from cubert_spark.plans import explain_str

    out = apply_changelog(
        _changelog(spark),
        key_cols=["k"], seq_cols=["ts", "uid"], op_col="op",
        delete_ops=["delete"], payload_cols=["v"],
    )
    s = explain_str(out)
    assert "Window" not in s, s
    assert "partial_max" in s or "HashAggregate" in s, s


def test_skyline2d_domination_and_ties(spark):
    """skyline2d matches the quadratic domination definition on a
    hand case exercising ties in x, ties in y, duplicates, and
    multi-group isolation."""
    from cubert_spark.operators.skyline import skyline2d

    rows = [
        # group g1: frontier is (5,1), (3,4), (1,9); (3,3) dominated
        # by (3,4) (same x, higher y); (2,4) dominated by (3,4)
        ("g1", 1, 5, 1), ("g1", 2, 3, 4), ("g1", 3, 3, 3),
        ("g1", 4, 2, 4), ("g1", 5, 1, 9),
        # duplicates on the frontier both survive
        ("g1", 6, 5, 1),
        # group g2: single row survives
        ("g2", 7, 0, 0),
    ]
    df = spark.createDataFrame(rows, "g string, rid long, x long, y long")
    got = sorted(r.rid for r in skyline2d(df, ["g"], "x", "y").collect())
    assert got == [1, 2, 5, 6, 7]

    # cross-check against brute force on the same data
    data = [(g, rid, x, y) for g, rid, x, y in rows]
    brute = [
        rid
        for g, rid, x, y in data
        if not any(
            g2 == g and x2 >= x and y2 >= y and (x2 > x or y2 > y)
            for g2, _r2, x2, y2 in data
        )
    ]
    assert got == sorted(brute)
