"""Schema-string bridge + scalar function registry tests
(BlockSchema.java grammar, FunctionType.java set)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cubert_spark.functions import call
from cubert_spark.functions.registry import case, is_distinct
from cubert_spark.schema import SchemaParseError, parse_schema, to_cubert_string


def test_parse_simple():
    s = parse_schema("STRING word, INT count")
    assert s.fieldNames() == ["word", "count"]
    assert isinstance(s["count"].dataType, T.IntegerType)


def test_parse_nested():
    s = parse_schema("INT id, TUPLE (INT a, STRING b) rec, BAG (TUPLE (INT x)) items, MAP (STRING) attrs")
    assert isinstance(s["rec"].dataType, T.StructType)
    assert isinstance(s["items"].dataType, T.ArrayType)
    assert isinstance(s["items"].dataType.elementType, T.StructType)
    assert isinstance(s["attrs"].dataType, T.MapType)


def test_roundtrip():
    text = "INT id, TUPLE (INT a, STRING b) rec, ARRAY (DOUBLE) xs"
    assert to_cubert_string(parse_schema(text)) == text


def test_parse_errors():
    with pytest.raises(SchemaParseError):
        parse_schema("NOTATYPE x")
    with pytest.raises(SchemaParseError):
        parse_schema("INT")


def test_scalar_builtins(spark):
    df = spark.createDataFrame([(5, 2, None), (7, 0, "x")], "a int, b int, s string")
    out = df.select(
        call("ADD", F.col("a"), F.col("b")).alias("add"),
        call("MOD", F.col("a"), F.lit(3)).alias("mod"),
        call("NVL", F.col("s"), F.lit("dflt")).alias("nvl"),
        call("IS_NULL", F.col("s")).alias("isn"),
        call("CASTTOSTRING", F.col("a")).alias("cs"),
        case(F.col("a") > 6, F.lit("big"), default=F.lit("small")).alias("c"),
        call("CONCAT", F.lit("v="), F.col("a").cast("string")).alias("cc"),
        call("SIZEOF", F.array(F.col("a"), F.col("b"))).alias("sz"),
    ).collect()
    r0, r1 = out
    assert r0["add"] == 7 and r0["mod"] == 2 and r0["nvl"] == "dflt" and r0["isn"]
    assert r1["c"] == "big" and r1["cs"] == "7" and r0["sz"] == 2


def test_seqno_dense_per_task(spark):
    """SEQNO reproduces SeqNo.java's dense 1-based per-JVM counter:
    within every task (spark_partition_id) the values are exactly
    1..n_rows — dense, no gaps — and restart at 1 in the next task
    (the reference's static counter does the same across map JVMs).
    UNIQUEID stays the non-dense globally-unique id."""
    df = spark.range(0, 1000, 1, 8).select(
        F.spark_partition_id().alias("pid"),
        call("SEQNO").alias("seq"),
        call("UNIQUEID").alias("uid"),
    )
    rows = df.collect()
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["seq"])
    assert len(by_pid) == 8
    for pid, seqs in by_pid.items():
        assert sorted(seqs) == list(range(1, len(seqs) + 1)), pid  # dense
    # UNIQUEID: globally unique (the divergent twin), not dense
    assert len({r["uid"] for r in rows}) == len(rows)
    # zero shuffle: the dense counter is pure column arithmetic
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_unknown_function():
    with pytest.raises(KeyError):
        call("NOPE")


def test_is_distinct(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, o string")
    out = df.withColumn("first", is_distinct([F.col("k")], [F.col("o")]))
    got = {(r["k"], r["o"]): r["first"] for r in out.collect()}
    assert got[(1, "a")] and not got[(1, "b")] and got[(2, "c")]
