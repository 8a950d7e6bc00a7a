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
