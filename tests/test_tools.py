"""tools/ harness tests: the SF generator must be deterministic (same
seed -> identical data) and honor the scaling protocol — the scaling
exponents in SCALE.md are only meaningful if the generator is a pure
function of (sf, seed)."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_generator_deterministic_and_scaled(tmp_path):
    from gen_testdata import generate

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(0.001, a, seed=42)
    generate(0.001, b, seed=42)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        ha = con.execute(
            f"select count(*), sum(hash(t::VARCHAR)) from '{a}/{t}.parquet' t"
        ).fetchone()
        hb = con.execute(
            f"select count(*), sum(hash(t::VARCHAR)) from '{b}/{t}.parquet' t"
        ).fetchone()
        assert ha == hb, t
    # scaling protocol: row counts follow TESTDATA ratios
    n_li = con.execute(f"select count(*) from '{a}/lineitem.parquet'").fetchone()[0]
    n_doc = con.execute(f"select count(*) from '{a}/documents.parquet'").fetchone()[0]
    assert n_li == 6000 and n_doc == 50
    # a different seed produces different data
    c = str(tmp_path / "c")
    generate(0.001, c, seed=43)
    hc = con.execute(
        f"select sum(hash(t::VARCHAR)) from '{c}/lineitem.parquet' t"
    ).fetchone()
    ha2 = con.execute(
        f"select sum(hash(t::VARCHAR)) from '{a}/lineitem.parquet' t"
    ).fetchone()
    assert hc != ha2


def test_zipf_generator_plants_hot_key_and_profile_flags_it(tmp_path, spark):
    """`--zipf-s` (r12 VERDICT task #3): key 0 must be the planted hot
    key on the skewed columns, and `profile_skew` must flag it with a
    skew_ratio orders above the uniform draw's (~2-3 at this SF) —
    the diagnosis half of the skew toolkit, pinned on the data shape
    it exists for."""
    from gen_testdata import generate

    from cubert_spark.operators.skew import profile_skew

    z, u = str(tmp_path / "zipf"), str(tmp_path / "uni")
    generate(0.01, z, seed=42, zipf_s=1.2)
    generate(0.01, u, seed=42)
    for tbl, col in (("orders", "o_custkey"), ("events", "user_id")):
        zdf = spark.read.parquet(os.path.join(z, f"{tbl}.parquet"))
        top = {
            r.rnk: r
            for r in profile_skew(zdf, [col], top_k=1).collect()
        }
        assert top[1].key_value == "0", (tbl, top)
        udf_ = spark.read.parquet(os.path.join(u, f"{tbl}.parquet"))
        utop = {
            r.rnk: r
            for r in profile_skew(udf_, [col], top_k=1).collect()
        }
        # Zipf(1.2) hot key holds ~20% of rows: the ratio scales with
        # n_keys (thousands on orders at sf1, ~40 on events at this
        # SF) but is always far above the uniform draw's ~1-3
        assert top[1].skew_ratio > 20 * utop[1].skew_ratio, (
            tbl,
            top[1].skew_ratio,
            utop[1].skew_ratio,
        )
        # the zipf option must not touch table sizes (same sf contract)
        assert zdf.count() == udf_.count(), tbl


def test_warm_codegen_runs_queries_and_returns_wall(spark):
    """warm_codegen (r13 cold-JVM mitigation) drives each callable
    against the tiny dir the given number of times and reports wall
    seconds."""
    from cubert_spark.session import warm_codegen

    calls = []

    def fake_query(s, d):
        calls.append(d)
        return s.range(5).selectExpr("id", "id * 2 AS twice")

    wall = warm_codegen(spark, [fake_query], "/root/testdata/sf0.001", repeats=2)
    assert calls == ["/root/testdata/sf0.001"] * 2
    assert wall > 0
