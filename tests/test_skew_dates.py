"""Skew operators, int-date helpers, date-range loads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubert_spark.functions.registry import date_to_yyyymmdd, yyyymmdd_to_date
from cubert_spark.operators.skew import salted_count_distinct, salted_topn


def test_salted_count_distinct_matches_plain(spark):
    # hot key: 0 carries 80% of rows
    rows = [(0 if i % 5 else i % 7, i % 97) for i in range(5000)]
    df = spark.createDataFrame(rows, "k int, m int")
    plain = {
        r["k"]: r["cd"]
        for r in df.groupBy("k").agg(F.countDistinct("m").alias("cd")).collect()
    }
    salted = {
        r["k"]: r["count_distinct_m"]
        for r in salted_count_distinct(df, ["k"], "m", num_salts=8).collect()
    }
    assert salted == plain


def test_salted_count_distinct_extra_aggs(spark):
    df = spark.createDataFrame([(1, 5, 2.0), (1, 5, 3.0), (2, 6, 4.0)], "k int, m int, v double")
    out = {
        r["k"]: (r["count_distinct_m"], r["sv"])
        for r in salted_count_distinct(
            df, ["k"], "m", num_salts=4, extra_aggs=[F.sum("v").alias("sv")]
        ).collect()
    }
    assert out == {1: (1, 5.0), 2: (1, 4.0)}


def test_salted_topn_matches_plain(spark):
    rows = [(i % 3, i, float((i * 37) % 101)) for i in range(999)]
    df = spark.createDataFrame(rows, "k int, id int, v double")
    order = [F.col("v").desc(), F.col("id")]
    from cubert_spark.operators import top_n

    plain = {(r["k"], r["id"]) for r in top_n(df, 5, ["k"], order).collect()}
    salted = {(r["k"], r["id"]) for r in salted_topn(df, 5, ["k"], order, num_salts=4).collect()}
    assert salted == plain


def test_int_date_roundtrip(spark):
    df = spark.createDataFrame([(20240131,), (19991231,)], "d int")
    out = df.select(
        yyyymmdd_to_date(F.col("d")).alias("dt")
    ).select(date_to_yyyymmdd(F.col("dt")).alias("back"), "dt")
    rows = {r["back"]: str(r["dt"]) for r in out.collect()}
    assert rows == {20240131: "2024-01-31", 19991231: "1999-12-31"}


def test_load_date_range(spark, tmp_path):
    from cubert_spark.catalog import load_date_range

    for day, n in [("2024-01-01", 2), ("2024-01-02", 3), ("2024-01-05", 4)]:
        spark.range(n).withColumn("day", F.lit(day)).write.parquet(
            str(tmp_path / f"daily/{day}")
        )
    df = load_date_range(
        spark, str(tmp_path / "daily/{date}"), "2024-01-01", "2024-01-03"
    )
    assert df.count() == 5  # jan 3-4 missing -> skipped
    with pytest.raises(FileNotFoundError):
        load_date_range(spark, str(tmp_path / "daily/{date}"), "2024-02-01", "2024-02-03")
