#!/usr/bin/env python
"""Isolated per-query re-measure under the official bench protocol.

Usage: PYTHONPATH=/root/repo python tools/triage_bench.py q1 q2 ...

IMPORTS bench.py's own warmup + timed-run helpers (fresh session,
JVM/Arrow warmups, noop sink, min-of-N with SPARK_GRAFT_BENCH_RUNS)
so the protocol cannot drift from the official record's — a stale
copy-paste here would invalidate the regression attributions built
on these numbers (SCALE.md r12 triage). Runs only the named queries
and NEVER writes BENCH_DETAIL.json.
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: triage_bench.py QUERY [QUERY ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from cubert_spark import get_session
    from cubert_spark.queries import (
        all_queries,
        extra_bench_queries,
        folded_queries,
    )

    queries = all_queries()
    _extra = extra_bench_queries()
    _extra.update(folded_queries())

    spark = get_session(
        "cubert-triage", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    bench.warmup(spark, sf_dir)

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    out = {}
    for name in names:
        fn = queries.get(name) or _extra[name]
        runs = [bench.timed_run(spark, fn, sf_dir) for _ in range(n_runs)]
        out[name] = {"min": min(runs), "runs": runs}
        print(f"# {name}: min={min(runs):.3f}s runs={runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
