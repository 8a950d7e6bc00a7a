"""gen10 oracle parity for PER-DOCUMENT operators via CHUNKED DuckDB
replay (r14, VERDICT r13 task 3).

gopher_repetition's gen10 DuckDB replay (8x gram explode over 500k
docs) exceeds any reasonable measurement window as ONE statement —
but the operator is doc-local (every output row depends only on its
own document), so the replay partitions EXACTLY: run the same oracle
SQL over doc_id-modulus shards of the documents view, concatenate,
and canonicalize. The Spark side runs ONCE over the full corpus; the
comparison is the driver's own dtype-sensitive sorted row-hash
multiset (oracle._canon_pdf/_hash_frame), so a MATCH here is the same
claim as a CORRECTNESS row, just assembled from shard replays.

Soundness: valid ONLY for queries whose output FACTORIZES over the
shard predicate's equivalence classes — per-document queries under a
doc_id-modulus predicate (no cross-document aggregates/joins;
gopher_repetition qualifies: all 13 signals are within-document), and
per-SHARD-pure folds under their OWN shard key (bestfit_pack: the BFD
greedy runs independently per hash16(doc_id,'bfd') % 16 shard, so
restricting the documents view to one shard's docs replays exactly
that shard's fold — the same argument one level up, r14 VERDICT
task 6). --preset picks the matching predicate.

Usage: PYTHONPATH=/root/repo python3 tools/gen10_chunked_parity.py \
          --sf-dir /tmp/gen_sf10 --query gopher_repetition --chunks 10
       PYTHONPATH=/root/repo python3 tools/gen10_chunked_parity.py \
          --sf-dir /tmp/gen_sf1 --query bestfit_pack --preset bfd_shard
"""

from __future__ import annotations

import argparse
import os
import time


def _replay_shard(doc_path: str, where: str, sql: str, threads: int):
    import duckdb

    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads = {threads}")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{doc_path}') WHERE {where}"
    )
    out = con.execute(sql).df()
    con.close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--query", default="gopher_repetition")
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--cpus", default="16")
    ap.add_argument(
        "--preset",
        choices=["doc_mod", "bfd_shard"],
        default="doc_mod",
        help="shard predicate: doc_id modulus (per-document queries) "
        "or the bestfit_pack content-hash shard key (per-shard folds; "
        "forces chunks=16 to match the operator's n_shards)",
    )
    ap.add_argument(
        "--parallel",
        type=int,
        default=1,
        help="replay shards in N worker processes (each shard is an "
        "independent statement over a disjoint document set, so "
        "parallel replay is sound by the same factorization argument "
        "as chunking itself); per-worker DuckDB threads are capped so "
        "N workers do not thrash the box",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", args.cpus)
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", args.cpus)

    import duckdb
    import numpy as np
    import pandas as pd

    from cubert_spark import get_session
    from cubert_spark.oracle import _canon_pdf, _dtype_kind, _hash_frame
    from cubert_spark.queries import all_oracles, all_queries

    spark = get_session(
        "gen10-chunked", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    t0 = time.time()
    spdf = all_queries()[args.query](spark, args.sf_dir).toPandas()
    t_spark = time.time() - t0
    print(f"spark: {len(spdf)} rows in {t_spark:.1f}s")

    sql = all_oracles()[args.query]
    doc_path = os.path.join(args.sf_dir, "documents.parquet")
    if args.preset == "bfd_shard":
        from cubert_spark.queries.datapipe import _hash16_sql

        # one replay chunk per BFD shard — the fold's own independence
        # boundary (curation.bestfit_pack n_shards=16 declared row)
        args.chunks = 16
        pred = f"({_hash16_sql('doc_id', 'bfd')}) % 16 = {{k}}"
    else:
        pred = f"doc_id % {args.chunks} = {{k}}"
    t0 = time.time()
    if args.parallel > 1:
        import multiprocessing as mp

        with mp.Pool(args.parallel) as pool:
            parts = pool.starmap(
                _replay_shard,
                [
                    (doc_path, pred.format(k=k), sql,
                     max(1, 32 // args.parallel))
                    for k in range(args.chunks)
                ],
            )
        for k, p in enumerate(parts):
            print(f"  replay shard {k}: {len(p)} rows")
    else:
        parts = []
        for k in range(args.chunks):
            parts.append(
                _replay_shard(doc_path, pred.format(k=k), sql, 0)
            )
            print(f"  replay shard {k}: {len(parts[-1])} rows "
                  f"(t={time.time() - t0:.0f}s)")
    dpdf = pd.concat(parts, ignore_index=True)
    t_duck = time.time() - t0
    print(f"duckdb chunked replay: {len(dpdf)} rows in {t_duck:.1f}s")

    scanon = _canon_pdf(spdf[sorted(spdf.columns)], "spark")
    dcanon = _canon_pdf(dpdf[sorted(dpdf.columns)], "duckdb")
    skinds = {c: _dtype_kind(scanon[c].dtype) for c in scanon.columns}
    dkinds = {c: _dtype_kind(dcanon[c].dtype) for c in dcanon.columns}
    assert skinds == dkinds, f"dtype-kind mismatch: {skinds} vs {dkinds}"
    ok = len(scanon) == len(dcanon) and np.array_equal(
        _hash_frame(scanon), _hash_frame(dcanon)
    )
    print(
        f"{args.query} @ {args.sf_dir}: "
        f"{'MATCH' if ok else 'MISMATCH'} "
        f"({len(scanon)} rows; spark {t_spark:.1f}s, "
        f"replay {t_duck:.1f}s over {args.chunks} shards)"
    )
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
