"""Cubert-script-frontend queries: the DECLARED query goes through the
full .cmr text -> parser -> JSON IR -> DataFrame pipeline, so the
script language itself is DuckDB-oracle-verified end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cubert_spark.script import run_script

# Mirrors the reference's script shape (PROGRAM/JOB/MAP/SHUFFLE/REDUCE;
# release/examples/wordcount.cmr) over the star schema: filter with
# Cubert `==`, GENERATE with CASE(cond,val,...), shuffle + reduce-side
# GROUP BY with exact aggregates.
_SCRIPT = """
PROGRAM "script oracle";

JOB "urgent order buckets"
    REDUCERS 8;
    MAP {
        orders = LOAD "$SF/orders.parquet" USING PARQUET();
        keep = FILTER orders BY o_orderpriority == "1-URGENT" AND o_totalprice > 1000.0;
        proj = FROM keep GENERATE o_orderkey, o_totalprice,
               CASE(o_totalprice > 200000.0, "big", o_totalprice > 50000.0, "mid", true, "small") AS bucket;
    }
    SHUFFLE proj PARTITIONED ON bucket;
    REDUCE {
        agg = GROUP proj BY bucket AGGREGATES COUNT(o_orderkey) AS n,
              MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price;
    }
END
"""


def q_script_bucket_agg(spark: SparkSession, sf: str) -> DataFrame:
    env = run_script(spark, _SCRIPT, params={"SF": sf})
    return env["agg"]


SQL_SCRIPT_BUCKET_AGG = """
SELECT CASE WHEN o_totalprice > 200000.0 THEN 'big'
            WHEN o_totalprice > 50000.0 THEN 'mid'
            ELSE 'small' END AS bucket,
       COUNT(o_orderkey) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 1000.0
GROUP BY 1
"""

# <javascript> macro block (CmrExecutor.java:137-192): the JS computes
# a 90-day date window with a loop (the reference's common use: date
# iteration) and the script consumes it via $startDate / $endDate.
_SCRIPT_JS = """
<javascript>
function fmt(d) {
  var m = d.getUTCMonth() + 1, day = d.getUTCDate();
  return d.getUTCFullYear() + "-" + (m < 10 ? "0" + m : m) + "-" +
         (day < 10 ? "0" + day : day);
}
var start = new Date(Date.UTC(1995, 0, 1));
var dates = [];
for (var i = 0; i < 90; i++)
  dates.push(fmt(new Date(start.getTime() + i * 86400000)));
var startDate = dates[0];
var endDate = dates[dates.length - 1];
</javascript>
PROGRAM "js date window";

JOB "quarter order stats"
    REDUCERS 8;
    MAP {
        orders = LOAD "$SF/orders.parquet" USING PARQUET();
        win = FILTER orders BY o_orderdate >= "$startDate" AND o_orderdate <= "$endDate";
    }
    SHUFFLE win PARTITIONED ON o_orderpriority;
    REDUCE {
        agg = GROUP win BY o_orderpriority AGGREGATES COUNT(o_orderkey) AS n,
              MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price;
    }
END
"""


def q_script_js_dates(spark: SparkSession, sf: str) -> DataFrame:
    env = run_script(spark, _SCRIPT_JS, params={"SF": sf})
    return env["agg"]


SQL_SCRIPT_JS_DATES = """
SELECT o_orderpriority,
       COUNT(o_orderkey) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate <= DATE '1995-03-31'
GROUP BY o_orderpriority
"""

# Positional $N column references (CubertPhysical.g4:176
# `columnProjectionExpression: '$' INT | ID`, 0-based like Pig;
# resolved against the input schema at runtime by
# FunctionTree.java:176-186). The legacy-script idiom: project and
# filter a LOADed table by column position before names are assigned.
# lineitem positions: $0 l_orderkey, $3 l_linenumber, $4 l_quantity,
# $8 l_returnflag.
_SCRIPT_POSITIONAL = """
PROGRAM "positional refs";

JOB "returned line stats by position"
    REDUCERS 8;
    MAP {
        li = LOAD "$SF/lineitem.parquet" USING PARQUET();
        keep = FILTER li BY $8 == "R" AND $4 > 30.0;
        proj = FROM keep GENERATE $0 AS orderkey, $3 AS linenum,
               CASTTOLONG($4) AS qty;
    }
    SHUFFLE proj PARTITIONED ON linenum;
    REDUCE {
        agg = GROUP proj BY linenum AGGREGATES COUNT(orderkey) AS n,
              SUM(qty) AS sum_qty, MAX(qty) AS max_qty;
    }
END
"""


def q_script_positional(spark: SparkSession, sf: str) -> DataFrame:
    env = run_script(spark, _SCRIPT_POSITIONAL, params={"SF": sf})
    return env["agg"]


# CAST(SUM(BIGINT) AS BIGINT): DuckDB widens BIGINT sums to HUGEINT,
# which pandas renders as float — pin the exact type back.
SQL_SCRIPT_POSITIONAL = """
SELECT l_linenumber AS linenum,
       COUNT(l_orderkey) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       MAX(CAST(l_quantity AS BIGINT)) AS max_qty
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 30.0
GROUP BY l_linenumber
"""

QUERIES = {
    "script_bucket_agg": q_script_bucket_agg,
    "script_js_dates": q_script_js_dates,
    "script_positional": q_script_positional,
}
ORACLES = {
    "script_bucket_agg": SQL_SCRIPT_BUCKET_AGG,
    "script_js_dates": SQL_SCRIPT_JS_DATES,
    "script_positional": SQL_SCRIPT_POSITIONAL,
}
