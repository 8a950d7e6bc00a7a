#!/usr/bin/env python
"""Scaling-exponent measurement (r6 VERDICT task 4): run the heaviest
bench queries at two generated SFs (tools/gen_testdata.py) and report
per-query wall-time ratios and scaling exponents.

exponent = log(t_hi / t_lo) / log(input_growth), where input_growth
is the growth of the query's DOMINANT input between the two SFs
(lineitem/orders/documents grow 10x from sf0.1 to sf1; embeddings
grows 4x by the testdata's own sublinear protocol). A linear-shaped
operator should land near 1.0 at 100% CPU utilization; exponents
>~1.3 are the super-linear outliers that become 100 TB smoking guns.
Same protocol as bench.py: fresh session, warmups, noop sink,
min-of-n.

Usage:
  python tools/gen_testdata.py --sf 0.1 --out /tmp/gen_sf0.1
  python tools/gen_testdata.py --sf 1   --out /tmp/gen_sf1
  python tools/scaling_curve.py --lo /tmp/gen_sf0.1 --hi /tmp/gen_sf1
"""

from __future__ import annotations

import argparse
import json
import math
import time

#: query -> dominant input table (for the growth denominator)
HEAVY = {
    "fuzzy_pairs2": "customer",
    "semantic_dedup": "embeddings",
    "bloom_prune": "lineitem",
    "minhash_lsh": "documents",
    "pq_adc_topk": "embeddings",
    "pagerank": "documents",
    "triangle_count": "documents",
    "embedding_neardup": "embeddings",
    "bm25_search": "documents",
    "ivf_topk": "embeddings",
}


def table_rows(d: str, t: str) -> int:
    import duckdb

    return duckdb.connect().execute(
        f"select count(*) from '{d}/{t}.parquet'"
    ).fetchone()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", required=True)
    ap.add_argument("--hi", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of HEAVY")
    args = ap.parse_args()

    from cubert_spark import get_session
    from cubert_spark.queries import all_queries, folded_queries

    names = list(HEAVY) if not args.queries else args.queries.split(",")
    spark = get_session(
        "scaling-curve",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    merged = {**all_queries(), **folded_queries()}
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    def bench(sf_dir: str) -> dict[str, float]:
        out = {}
        for name in names:
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                merged[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            out[name] = round(min(runs), 3)
        return out

    t_lo = bench(args.lo)
    t_hi = bench(args.hi)
    result = {}
    for name in names:
        t = HEAVY.get(name, "lineitem")
        growth = table_rows(args.hi, t) / table_rows(args.lo, t)
        ratio = t_hi[name] / t_lo[name] if t_lo[name] > 0 else float("inf")
        result[name] = {
            "t_lo": t_lo[name],
            "t_hi": t_hi[name],
            "ratio": round(ratio, 2),
            "input": t,
            "input_growth": round(growth, 2),
            "exponent": round(math.log(ratio) / math.log(growth), 2)
            if ratio > 0 and growth > 1
            else None,
        }
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
