#!/usr/bin/env python
"""A/B: exact cube percentile buffers vs the GK sketch across the two
memory regimes (r11 VERDICT task 5).

Spark's exact ``percentile`` buffers a (value -> count) OpenHashMap
per (cuboid, group) — so buffer size scales with the group's DISTINCT
measure values, not its row count. The reference bounds cube memory
with a flush-at-95% hash table (CubeOperator.java:81,200-204); our
equivalent pressure points are therefore:

  A. LOW-cardinality dims x CONTINUOUS measure: the grand-total
     cuboid's buffer holds ~every distinct measure value of the whole
     table in ONE aggregation buffer on one task.
  B. HIGH-cardinality dims x continuous measure: millions of
     (cuboid, group) map entries each with a small buffer.
  C. (control) LOW-card dims x integral measure (l_quantity, ~50
     distinct): the shipped cube_median row's regime — buffers stay
     tiny at ANY row count.

Each regime runs exact vs approx (GK, accuracy 10000) min-of-2 on
gen1 (6M-row lineitem), and records per-stage spill from the UI REST
API. Output: one JSON line per (regime, variant).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cubert_spark import get_session
from cubert_spark.operators.cube import cube


def _spill(spark) -> tuple[int, int]:
    """Sum memory/disk spill bytes over all completed stages."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            stages = json.load(r)
    except Exception:
        return (-1, -1)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def main() -> None:
    # the engine session default is spark.ui.enabled=false (headless
    # discipline) — the spill probe needs the UI REST API, so this
    # measurement tool re-enables it explicitly; with it disabled the
    # probe's sentinel used to difference out as a fake "0 spill"
    spark = get_session(
        "cube-median-regimes",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    li = spark.read.parquet("/tmp/gen_sf1/lineitem.parquet")
    # regime-B dims: ~600k distinct synthetic groups x 4 cuboids
    li = li.withColumn("hi_card", F.col("l_orderkey") % 600_000)

    exact = lambda c: F.percentile(c, F.lit(0.5)).alias("med")
    approx = lambda c: F.percentile_approx(c, F.lit(0.5), F.lit(10_000)).alias("med")
    regimes = {
        "A_lowdim_continuous": (["l_returnflag", "l_linestatus"], "l_extendedprice"),
        "B_highdim_continuous": (["hi_card", "l_linenumber"], "l_extendedprice"),
        "C_lowdim_integral": (["l_returnflag", "l_linestatus"], "l_quantity"),
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    for rname, (dims, measure) in regimes.items():
        for vname, agg in (("exact", exact), ("approx", approx)):
            # spill window spans ALL runs of the variant (a delta per
            # run discarded all but the last — a cold-buffer run-1
            # spill would have been silently dropped); a failed REST
            # probe (-1 sentinel) reports null, never fake bytes
            s0 = _spill(spark)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                cube(li, dims, agg(measure), F.count(F.lit(1)).alias("n")).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 2))
            s1 = _spill(spark)
            probe_ok = s0[0] >= 0 and s1[0] >= 0
            print(
                json.dumps(
                    {
                        "regime": rname,
                        "variant": vname,
                        "min_sec": min(runs),
                        "runs": runs,
                        "mem_spill_delta": s1[0] - s0[0] if probe_ok else None,
                        "disk_spill_delta": s1[1] - s0[1] if probe_ok else None,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
