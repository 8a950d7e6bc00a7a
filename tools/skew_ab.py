#!/usr/bin/env python
"""Skew-toolkit A/B on actually-skewed data (r12 VERDICT task #3).

The driver testdata draws keys uniformly, so the skew operators
(`operators/skew.py`) and the AQE skew-join path had never been
measured under the condition they exist for. This runs them against a
Zipf(s) draw (`tools/gen_testdata.py --zipf-s 1.2`, hot key = 0
holding ~20% of all rows) and prints per-experiment min-of-n wall
times:

  cd_plain / cd_salted   exact COUNT(DISTINCT l_partkey) per o_custkey
                         over orders JOIN lineitem — plain Catalyst
                         two-phase vs salted_count_distinct
  topn_plain / topn_salted  per-custkey top-5 orders by totalprice —
                         plain window vs salted_topn
  smj_dim_skew_on / smj_dim_skew_off  orders JOIN customer (merge-
                         hinted SMJ on the hot key) with AQE skew-join
                         enabled/disabled, plus plan evidence that the
                         splitter engaged (`skew=true` in the FINAL
                         adaptive plan) — and the agg-on-right shape
                         where its pattern structurally cannot match
  profile                profile_skew's diagnosis of o_custkey (top
                         hitter + skew_ratio), printed for the record

Protocol matches bench.py: fresh session per config where conf
changes require it, JVM warmup, noop sink, min-of-n.

Usage:
  PYTHONPATH=/root/repo python tools/skew_ab.py \
      --zipf /tmp/gen_zipf_sf1 --uniform /tmp/gen_sf1 --runs 3
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def timed(df_fn, runs: int) -> float:
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return min(out)


def load(spark, d: str, t: str):
    from cubert_spark.catalog import load_table

    return load_table(spark, d, t)


def experiments(spark, d: str, runs: int) -> dict:
    from cubert_spark.operators.skew import (
        profile_skew,
        salted_count_distinct,
        salted_topn,
    )

    # the smj block below scales AQE thresholds to the test SF; reset
    # them here so BOTH arms' cd_*/topn_* timings run under identical
    # configuration (a leaked 1MB advisory size from the first arm
    # would coalesce the second arm's aggregations differently —
    # apples-to-oranges A/B)
    for key in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ):
        spark.conf.unset(key)
    res = {}
    orders = load(spark, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load(spark, d, "lineitem").select("l_orderkey", "l_partkey")

    # non-additive agg over the skewed key: COUNT(DISTINCT partkey)
    # per customer; the hot key's reducer sees ~20% of the join output
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_custkey", "l_partkey"
    )
    res["cd_plain"] = timed(
        lambda: joined.groupBy("o_custkey").agg(
            F.countDistinct("l_partkey").alias("cd")
        ),
        runs,
    )
    res["cd_salted"] = timed(
        lambda: salted_count_distinct(joined, ["o_custkey"], "l_partkey"),
        runs,
    )

    # per-key top-n under skew
    order_by = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*order_by)
    res["topn_plain"] = timed(
        lambda: orders.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 5
        ),
        runs,
    )
    res["topn_salted"] = timed(
        lambda: salted_topn(orders, 5, ["o_custkey"], order_by),
        runs,
    )

    # AQE skew-join, two SMJ shapes. Thresholds are scaled to the
    # test SF: production defaults (256MB floor) assume real-cluster
    # partitions; at sf1 the hot key's compressed shuffle partition is
    # ~2MB, so a 1MB floor is the proportional equivalent. The
    # *factor* criterion (hot > 5x median) is the size-independent
    # part and stays at its default — that is what the skew trips.
    cust = load(spark, d, "customer").select("c_custkey", "c_name")

    def smj_dim():
        # fact-dim: both join children are bare scan->shuffle->sort —
        # the ONLY shape OptimizeSkewedJoin's pattern matches
        return (
            orders.hint("merge")
            .join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_totalprice", "c_name")
        )

    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("tot")
    )

    def smj_agg():
        # agg-on-right: a HashAggregate sits between the right shuffle
        # and the join, so the splitter's pattern does NOT match and
        # the hot partition is never split regardless of thresholds —
        # the shape where explicit salting is the only mitigation
        return orders.hint("merge").join(per_cust.hint("merge"), "o_custkey").select(
            "o_custkey", "o_totalprice", "tot"
        )

    def final_plan_engaged(df) -> bool:
        # plan evidence must come from an action on THIS DataFrame:
        # df.write creates its own QueryExecution, whose executedPlan
        # would be the pre-execution adaptive plan (isFinalPlan=false).
        # foreachPartition drains the same QueryExecution without
        # shipping the join output to the driver (collect() would
        # materialize every joined row — driver OOM bait above sf1)
        df.foreachPartition(lambda _: None)
        return "skew=true" in df._jdf.queryExecution().executedPlan().toString()

    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    for flag in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        tag = "on" if flag == "true" else "off"
        res[f"smj_dim_skew_{tag}"] = timed(smj_dim, runs)
        if flag == "true":
            res["smj_dim_plan_engaged"] = final_plan_engaged(smj_dim())
            res["smj_agg_plan_engaged"] = final_plan_engaged(smj_agg())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    prof = profile_skew(orders, ["o_custkey"], top_k=3).collect()
    res["profile"] = [
        {
            "rnk": r.rnk,
            "key": r.key_value,
            "cnt": r.cnt,
            "skew_ratio": round(r.skew_ratio, 1),
        }
        for r in sorted(prof, key=lambda r: r.rnk)
    ]
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--zipf", required=True)
    ap.add_argument("--uniform", default=None,
                    help="optional uniform dir at the same SF for the "
                         "no-skew control")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from cubert_spark import get_session

    spark = get_session(
        "skew-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    out = {"zipf": experiments(spark, args.zipf, args.runs)}
    if args.uniform:
        out["uniform"] = experiments(spark, args.uniform, args.runs)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
