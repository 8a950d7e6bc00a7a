"""JSON physical-plan frontend tests — incl. the reference's wordcount
example (release/examples/wordcount.cmr) expressed as a plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubert_spark.script import run_plan


def test_wordcount_plan(spark, tmp_path):
    """wordcount.cmr: LOAD -> FLATTEN -> SHUFFLE AGGREGATES -> STORE."""
    docs = spark.createDataFrame(
        [("a b b",), ("b c",)], "text string"
    ).withColumn("word_list", F.split("text", " "))
    plan = {
        "operators": [
            {"operator": "FLATTEN", "input": "docs", "output": "w",
             "flatten": [["word_list", "BAG"]], "aliases": {"word_list": ["word"]}},
            {"operator": "GENERATE", "input": "w", "output": "w2",
             "outputExpressions": ["word"]},
            {"operator": "SHUFFLE", "input": "w2", "output": "counts",
             "partitionKeys": ["word"], "numReducers": 2,
             "aggregates": [{"type": "COUNT", "input": "word", "output": "count"}]},
        ],
        "output": {"name": "counts", "path": str(tmp_path / "wc"), "format": "parquet"},
    }
    env = run_plan(spark, plan, relations={"docs": docs})
    got = {r["word"]: r["count"] for r in env["counts"].collect()}
    assert got == {"a": 1, "b": 3, "c": 1}
    written = spark.read.parquet(str(tmp_path / "wc"))
    assert written.count() == 3


def test_join_groupby_plan(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    right = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], "k int, v double")
    plan = {
        "operators": [
            {"operator": "JOIN", "leftBlock": "l", "rightBlock": "r",
             "output": "j", "joinKeys": ["k"], "joinType": "INNER"},
            {"operator": "GROUP_BY", "input": "j", "output": "agg",
             "groupBy": ["name"],
             "aggregates": [{"type": "SUM", "input": "v", "output": "total"}]},
            {"operator": "FILTER", "input": "agg", "output": "big",
             "filterExpr": "total > 2"},
        ],
    }
    env = run_plan(spark, plan, relations={"l": left, "r": right})
    assert {r["name"]: r["total"] for r in env["big"].collect()} == {"x": 15.0}


def test_cube_plan(spark):
    df = spark.createDataFrame([("a", "p", 1), ("a", "q", 2), ("b", "p", 4)],
                               "d1 string, d2 string, m int")
    plan = {
        "operators": [
            {"operator": "CUBE", "input": "t", "output": "c",
             "dimensions": ["d1", "d2"],
             "aggregates": [{"type": "SUM", "input": "m", "output": "s"}]},
        ],
    }
    env = run_plan(spark, plan, relations={"t": df})
    got = {(r["d1"], r["d2"]): r["s"] for r in env["c"].collect()}
    assert got[(None, None)] == 7 and got[("a", None)] == 3 and got[("b", "p")] == 4


def test_unknown_operator_raises(spark):
    from cubert_spark.script.plan import PlanError

    with pytest.raises(PlanError, match="unsupported operator"):
        run_plan(spark, {"operators": [{"operator": "WARP_DRIVE", "input": "x"}]},
                 relations={"x": spark.range(1)})
