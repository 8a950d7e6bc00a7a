"""Incremental summary rewrite tests (plans.summary): the rewrite must
be result-identical to direct aggregation, across full/partial summary
coverage and incremental updates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubert_spark.catalog import load_table
from cubert_spark.plans.summary import SummarySpec, SummaryStore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def fact(spark):
    o = load_table(spark, SF, "orders")
    return o.withColumn("price_dec", F.col("o_totalprice").cast("decimal(18,2)"))


SPEC = SummarySpec(
    time_col="o_orderdate",
    dims=("o_orderpriority", "o_orderstatus"),
    measures=(("SUM", "price_dec"), ("COUNT", "o_orderkey"), ("MIN", "o_totalprice")),
    distinct_col="o_custkey",
)


def _direct(fact, start, end, dims):
    rng = fact.filter(F.to_date("o_orderdate").between(F.lit(start), F.lit(end)))
    return (
        rng.groupBy(*dims)
        .agg(
            F.sum("price_dec").alias("sum__price_dec"),
            F.count(F.lit(1)).alias("count__o_orderkey"),
            F.min("o_totalprice").alias("min__o_totalprice"),
            F.countDistinct("o_custkey").alias("count_distinct__o_custkey"),
        )
    )


def _as_dict(df, dims):
    return {
        tuple(r[d] for d in dims): (
            float(r["sum__price_dec"]),
            r["count__o_orderkey"],
            r["min__o_totalprice"],
            r["count_distinct__o_custkey"],
        )
        for r in df.collect()
    }


def test_rewrite_matches_direct_full_coverage(spark, fact, tmp_path):
    store = SummaryStore(str(tmp_path / "s1"), SPEC)
    store.build(fact)
    start, end = "1995-01-01", "1997-12-31"
    dims = ["o_orderpriority"]
    got = _as_dict(store.rewrite(spark, fact, start, end, dims), dims)
    want = _as_dict(_direct(fact, start, end, dims), dims)
    assert got == want


def test_rewrite_splices_missing_days(spark, fact, tmp_path):
    # summarize only the early years; query a range extending beyond
    store = SummaryStore(str(tmp_path / "s2"), SPEC)
    early = fact.filter(F.to_date("o_orderdate") < F.lit("1998-01-01"))
    store.build(early)
    start, end = "1997-06-01", "1999-12-31"
    dims = ["o_orderpriority", "o_orderstatus"]
    got = _as_dict(store.rewrite(spark, fact, start, end, dims), dims)
    want = _as_dict(_direct(fact, start, end, dims), dims)
    assert got == want


def test_incremental_update_then_rewrite(spark, fact, tmp_path):
    store = SummaryStore(str(tmp_path / "s3"), SPEC)
    early = fact.filter(F.to_date("o_orderdate") < F.lit("1996-01-01"))
    store.build(early)
    n0 = len(store.summarized_days(spark))
    added = store.incremental_update(spark, fact)
    assert added > 0
    assert len(store.summarized_days(spark)) == n0 + added
    # second update is a no-op
    assert store.incremental_update(spark, fact) == 0
    start, end = "1995-01-01", "2001-12-31"
    dims = ["o_orderstatus"]
    got = _as_dict(store.rewrite(spark, fact, start, end, dims), dims)
    want = _as_dict(_direct(fact, start, end, dims), dims)
    assert got == want


def test_rollup_to_subset_dims(spark, fact, tmp_path):
    # summary stores (priority, status); query rolls up to () — the
    # summary-cube upward re-aggregation property
    store = SummaryStore(str(tmp_path / "s4"), SPEC)
    store.build(fact)
    got = store.rewrite(spark, fact, "1995-01-01", "2001-12-31", []).collect()[0]
    want = _direct(fact, "1995-01-01", "2001-12-31", []).collect()[0]
    assert float(got["sum__price_dec"]) == float(want["sum__price_dec"])
    assert got["count_distinct__o_custkey"] == want["count_distinct__o_custkey"]


def test_metadata_roundtrip(tmp_path):
    store = SummaryStore(str(tmp_path / "s5"), SPEC)
    reopened = SummaryStore(str(tmp_path / "s5"))
    assert reopened.spec == SPEC
