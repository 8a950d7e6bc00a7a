#!/usr/bin/env python
"""Scale-curve data generator: reproduce the TESTDATA.md synthetic
schema at arbitrary SF so the scaling exponents of heavy queries can
be measured beyond the driver-provided sf0.1 (r6 VERDICT task 4 —
"a super-linear outlier is the 100 TB smoking gun no sf0.1 bench can
see").

The driver's generator is not published, so this reproduces the
DISTRIBUTION SHAPE calibrated from the provided sf0.01/sf0.1 parquet
(uniform keys, Poisson-4 lines-per-order via uniform l_orderkey
draws, exponential event values, 31-word document bag, 10-cluster
unit-norm embeddings, fixed 25-nation/5-region dims), deterministic
under numpy default_rng(seed). `--validate` compares a generated dir
against a reference dir on the summary stats that drive query cost
(row counts, key cardinalities, group sizes, value ranges).

Scaling protocol (matches observed testdata ratios):
  customer 15k*x  supplier 1k*x  part 20k*x  orders 150k*x
  lineitem 600k*x events 100k*x (users 1.5k*x) documents 5k*x
  embeddings 2000*(4**log10(x)) [sublinear: 500@0.01, 2000@0.1, 8000@1]
where x = sf/0.1. Never writes into /root/testdata.
"""

from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch", "shuffle",
]

ORDER_EPOCH = np.datetime64("1995-01-01")
ORDER_DAYS = 2404  # -> max 2001-08-01
EVENT_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
EVENT_SPAN_US = 30 * 86400 * 1_000_000  # Jan 2024


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def _zipf_keys(rng, n_keys: int, size: int, s: float) -> np.ndarray:
    """Bounded Zipf(s) draw over [0, n_keys): rank r (1-based) gets
    P ∝ 1/r^s, and key identity == rank-1, so key 0 is ALWAYS the
    planted hot key (what the profile_skew pytest pin asserts). At
    s=1.2 the hot key holds ~1/H_n(1.2) ≈ 20% of all rows — the
    condition the skew toolkit (operators/skew.py) exists for and
    which the uniform default testdata never produces (r12 VERDICT
    task #3)."""
    w = 1.0 / np.arange(1, n_keys + 1, dtype=np.float64) ** s
    return rng.choice(n_keys, size=size, p=w / w.sum())


def generate(sf: float, out_dir: str, seed: int = 42, zipf_s: float = 0.0) -> None:
    os.makedirs(out_dir, exist_ok=True)
    x = sf / 0.1
    n_cust = int(round(15000 * x))
    n_supp = int(round(1000 * x))
    n_part = int(round(20000 * x))
    n_ord = int(round(150000 * x))
    n_li = int(round(600000 * x))
    n_ev = int(round(100000 * x))
    n_users = int(round(1500 * x))
    n_doc = int(round(5000 * x))
    n_emb = int(round(2000 * 4 ** math.log10(max(x, 1e-9))))

    rng = np.random.default_rng(seed)

    # region / nation: fixed dims at every SF
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    ck = np.arange(n_cust, dtype=np.int64)
    _write(out_dir, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    sk = np.arange(n_supp, dtype=np.int64)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part, dtype=np.int64)
    names = np.array([f"{a} {n}" for a in ADJS for n in NOUNS])
    _write(out_dir, "part", pa.table({
        "p_partkey": pk,
        "p_name": names[rng.integers(0, 64, n_part)],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * (pk % 1000), 1),
    }))

    ok = np.arange(n_ord, dtype=np.int64)
    odate = ORDER_EPOCH + rng.integers(0, ORDER_DAYS + 1, n_ord).astype(
        "timedelta64[D]"
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": (
            _zipf_keys(rng, n_cust, n_ord, zipf_s)
            if zipf_s > 0
            else rng.integers(0, n_cust, n_ord)
        ),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: l_orderkey uniform over orders (-> Poisson(4) group
    # sizes with an exact global total), shipdate independent of the
    # order's date (observed offset range is +-the full span)
    lod = ORDER_EPOCH + rng.integers(0, ORDER_DAYS + 1, n_li).astype(
        "timedelta64[D]"
    ) + rng.integers(1, 96, n_li).astype("timedelta64[D]")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": np.sort(rng.integers(0, n_ord, n_li)),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": lod.astype("datetime64[us]"),
    }))

    ts = EVENT_EPOCH + rng.integers(0, EVENT_SPAN_US, n_ev).astype(
        "timedelta64[us]"
    )
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": np.sort(ts),
        "user_id": (
            _zipf_keys(rng, n_users, n_ev, zipf_s)
            if zipf_s > 0
            else rng.integers(0, n_users, n_ev)
        ),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10..100 words from the 31-word vocab; ~0.16% of docs
    # overwritten as exact duplicates of an earlier doc (the planted
    # dup groups the dedup operators find)
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    n_dup = max(1, int(round(n_doc * 8 / 5000)))
    dup_to = rng.choice(n_doc, n_dup * 2, replace=False)
    for a, b in zip(dup_to[:n_dup], dup_to[n_dup:]):
        texts[int(b)] = texts[int(a)]
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 gaussian clusters on the unit sphere
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(scale=0.35, size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


def validate(gen_dir: str, ref_dir: str) -> dict:
    """Summary-stat comparison generated-vs-reference: the stats that
    drive query cost. Returns {check: (gen, ref, ok)}."""
    import duckdb

    con = duckdb.connect()
    out = {}

    def q(d, sql):
        return con.execute(sql.format(d=d)).fetchone()

    checks = {
        "lineitem_rows": "select count(*) from '{d}/lineitem.parquet'",
        "orders_rows": "select count(*) from '{d}/orders.parquet'",
        "docs_rows": "select count(*) from '{d}/documents.parquet'",
        "emb_rows": "select count(*) from '{d}/embeddings.parquet'",
        "lines_per_order_p99": (
            "select quantile_cont(c, 0.99) from (select count(*) c from "
            "'{d}/lineitem.parquet' group by l_orderkey)"
        ),
        "avg_doc_words": (
            "select avg(len(string_split(text,' '))) from "
            "'{d}/documents.parquet'"
        ),
        "event_value_mean": "select avg(value) from '{d}/events.parquet'",
        "distinct_users": (
            "select count(distinct user_id) from '{d}/events.parquet'"
        ),
    }
    for name, sql in checks.items():
        g, r = q(gen_dir, sql)[0], q(ref_dir, sql)[0]
        ok = abs(float(g) - float(r)) <= 0.15 * max(abs(float(r)), 1.0)
        out[name] = (g, r, ok)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--validate-against", default=None)
    ap.add_argument(
        "--zipf-s", type=float, default=0.0,
        help="if >0, draw o_custkey and events.user_id Zipf(s) "
             "(key 0 = hottest) instead of uniform — skew-toolkit "
             "stress data",
    )
    args = ap.parse_args()
    if os.path.realpath(args.out).startswith("/root/testdata"):
        raise SystemExit("refusing to write into /root/testdata")
    generate(args.sf, args.out, args.seed, zipf_s=args.zipf_s)
    print(f"generated sf{args.sf} at {args.out}")
    if args.validate_against:
        res = validate(args.out, args.validate_against)
        print(json.dumps({k: [str(v[0]), str(v[1]), v[2]] for k, v in res.items()}, indent=1))
        if not all(v[2] for v in res.values()):
            raise SystemExit("validation FAILED")


if __name__ == "__main__":
    main()
