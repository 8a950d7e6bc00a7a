#!/usr/bin/env python
"""Cold-JVM tail budget for the DECIMAL-heavy plans (r12 VERDICT #4).

r12's triage attributed `pq_adc_topk`'s 7.3 s -> 2.9 s descent across
quiet runs to C2 JIT of the giant DECIMAL-literal codegen (32
centroid-dot folds unrolled as literals -> very large generated Java
methods). On a real fleet every executor JVM pays that tail once per
codegen shape. This measures it and tests the warm-up mitigation:

  plain   fresh Python process (fresh JVM): run the query at the
          bench SF `--runs` times; run 1 is the cold cost, min of the
          last 3 is steady state.
  warmed  fresh process: first run the SAME query 3x at sf0.001 (tiny
          data, identical plan/codegen shapes, so the generated
          classes compile and the hot methods accumulate JIT
          invocations), then the bench-SF runs as above. If warmed
          run 1 lands near plain steady state, a startup warm-up
          query is a real fleet mitigation; the warm-up's own cost is
          reported so the trade is explicit.

A fresh JVM requires a fresh PYTHON PROCESS: spark.stop() ends the
SparkContext but the py4j gateway JVM (holding all JIT state and the
codegen cache) survives in-process — an in-session "restart" would
measure nothing. `--all` spawns one subprocess per (query, variant).

Usage:
  PYTHONPATH=/root/repo python tools/cold_start.py --all \
      --sf-dir /root/testdata/sf0.1 --tiny-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

QUERIES = ["pq_adc_topk", "kmeans_lloyd", "cube_median"]


def run_one(query: str, variant: str, sf_dir: str, tiny_dir: str, runs: int) -> None:
    from cubert_spark import get_session
    from cubert_spark.queries import all_queries, folded_queries

    spark = get_session(
        "cold-start", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    merged = {**all_queries(), **folded_queries()}
    fn = merged[query]
    out: dict = {"query": query, "variant": variant}
    if variant == "warmed":
        t0 = time.perf_counter()
        for _ in range(3):
            fn(spark, tiny_dir).write.format("noop").mode("overwrite").save()
        out["warmup_sec"] = round(time.perf_counter() - t0, 3)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    out["runs"] = times
    out["cold"] = times[0]
    out["steady"] = min(times[-3:])
    print(json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default=None)
    ap.add_argument("--variant", choices=["plain", "warmed"], default="plain")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tiny-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--runs", type=int, default=8)
    args = ap.parse_args()

    if not args.all:
        run_one(args.query, args.variant, args.sf_dir, args.tiny_dir, args.runs)
        return
    for q in QUERIES:
        for v in ("plain", "warmed"):
            subprocess.run(
                [
                    sys.executable, __file__, "--query", q, "--variant", v,
                    "--sf-dir", args.sf_dir, "--tiny-dir", args.tiny_dir,
                    "--runs", str(args.runs),
                ],
                env={
                    **os.environ,
                    "PYTHONPATH": os.pathsep.join(
                        p
                        for p in (
                            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            os.environ.get("PYTHONPATH", ""),
                        )
                        if p
                    ),
                },
                check=True,
            )


if __name__ == "__main__":
    main()
