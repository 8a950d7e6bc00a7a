#!/usr/bin/env python
"""Isolated per-query re-measure under the official bench protocol.

Usage: PYTHONPATH=/root/repo python tools/triage_bench.py q1 q2 ...

Mirrors bench.py exactly (fresh session, JVM + Python-worker warmup,
noop sink, min-of-N with SPARK_GRAFT_BENCH_RUNS) but runs only the
named queries and NEVER writes BENCH_DETAIL.json — it exists so
regression triage can quote numbers measured under the same protocol
as the official record without touching it.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: triage_bench.py QUERY [QUERY ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cubert_spark import get_session
    from cubert_spark.queries import all_queries, folded_queries
    from cubert_spark.queries import datapipe as _dp
    from cubert_spark.queries import extensions as _ext
    from cubert_spark.queries.extensions import reset_materialized

    queries = all_queries()
    _extra = {
        "minhash_lsh_fast": _dp.q_minhash_lsh_fast,
        "bloom_prune_fast": _ext.q_bloom_prune_fast,
    }
    _extra.update(folded_queries())

    spark = get_session(
        "cubert-triage", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    double_it = pandas_udf(lambda s: pd.Series(s * 2), "long")
    spark.range(100).select(double_it(col("id"))).collect()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    out = {}
    for name in names:
        fn = queries.get(name) or _extra[name]
        runs = []
        for _ in range(n_runs):
            reset_materialized()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
        print(f"# {name}: min={min(runs):.3f}s runs={runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
