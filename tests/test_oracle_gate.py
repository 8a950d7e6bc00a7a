"""Self-tests for the strict parity gate (cubert_spark.oracle).

The r5 postmortem: five queries shipped green under the old loose
comparator and failed the driver's dtype-sensitive pandas
canonicalizer. The gate now replicates the driver, and these seeded
probes pin the two failure classes so they stay structurally
impossible:

- HUGEINT drift: DuckDB ``SUM(BIGINT)`` lands in pandas as float64
  while Spark emits int64 — equal values, different dtype kind, must
  FAIL.
- list-typed output: the driver's canonicalizer raises ``unhashable
  type: 'list'`` — the gate must fail (not crash) on array columns.
"""

from __future__ import annotations

import duckdb
import pytest

from cubert_spark.oracle import compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (2, 20)) v(k, x)")
    return con


def test_equal_frames_pass(spark, duck):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, x int")
    res = compare("eq", df, "SELECT k, x FROM t", duck)
    assert res.match, res.detail


def test_seeded_hugeint_oracle_fails(spark, duck):
    # 30 == SUM(x) numerically, but DuckDB SUM(BIGINT) -> HUGEINT ->
    # pandas float64 vs Spark int64: the driver hashes these apart,
    # and so must the local gate.
    df = spark.createDataFrame([(30,)], "s long")
    res = compare("hugeint", df, "SELECT SUM(x) AS s FROM t", duck)
    assert not res.match
    assert "dtype mismatch" in res.detail

    # the CAST discipline fixes it
    res2 = compare(
        "hugeint_cast", df, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM t", duck
    )
    assert res2.match, res2.detail


def test_seeded_array_output_fails(spark, duck):
    df = spark.createDataFrame([(1, [1, 2, 3])], "k int, arr array<int>")
    res = compare("arr", df, "SELECT k, [1, 2, 3] AS arr FROM t WHERE k = 1", duck)
    assert not res.match
    assert "canonicalizer failure" in res.detail


def test_int_vs_float_value_equal_fails(spark, duck):
    df = spark.createDataFrame([(1.0,), (2.0,)], "k double")
    res = compare("kinds", df, "SELECT k FROM t", duck)
    assert not res.match
    assert "dtype mismatch" in res.detail


def test_value_mismatch_fails_with_diff(spark, duck):
    df = spark.createDataFrame([(1, 10), (2, 21)], "k int, x int")
    res = compare("vals", df, "SELECT k, x FROM t", duck)
    assert not res.match
    assert "hash mismatch" in res.detail


def test_int_width_difference_passes(spark, duck):
    # int32 vs int64 is parquet-width noise, not a real difference
    df = spark.createDataFrame([(1,), (2,)], "k int")
    res = compare("width", df, "SELECT CAST(k AS BIGINT) AS k FROM t", duck)
    assert res.match, res.detail


def test_null_bearing_int_passes(spark, duck):
    # nullable ints surface as float64 (Spark) / Int64-or-float64
    # (DuckDB); the gate folds both to float64 so equal values pass
    df = spark.createDataFrame([(1, None), (2, 20)], "k int, x int")
    res = compare(
        "nulls", df,
        "SELECT k, CASE WHEN k = 1 THEN NULL ELSE x END AS x FROM t", duck,
    )
    assert res.match, res.detail


def test_date_and_timestamp_pass(spark, duck):
    df = spark.createDataFrame(
        [("1995-01-01", "1995-01-01 12:30:45")], "d string, ts string"
    ).selectExpr("CAST(d AS DATE) d", "CAST(ts AS TIMESTAMP) ts")
    res = compare(
        "dates", df,
        "SELECT DATE '1995-01-01' AS d, TIMESTAMP '1995-01-01 12:30:45' AS ts",
        duck,
    )
    assert res.match, res.detail


def test_decimal_to_double_string_detour_is_bit_stable(spark, duck):
    """r13 failure class (caught live at gen10): once a DECIMAL sum
    exceeds double precision (~17-18 significant digits), the DIRECT
    decimal->double cast can drift 1 ulp between engines (Spark
    single-rounds via BigDecimal; DuckDB's int128 path double-rounds)
    — but routing both engines through the decimal's digit STRING is
    IEEE-correctly-rounded everywhere. This seeds the class: over a
    battery of 18-digit scale-6 decimals, the detoured spelling (the
    r13 dsum/dsum_sql rule) must hash-MATCH; and we record that the
    battery contains at least one value where the two engines' direct
    casts were observed to differ at gen10 magnitude."""
    import random

    rng = random.Random(13)
    # 18 significant digits at scale 6: the gen10 sum_charge regime
    vals = [
        f"{rng.randrange(10**11, 10**12)}.{rng.randrange(0, 10**6):06d}"
        for _ in range(500)
    ]
    vals.append("281260852696.224600")  # the literal that hashed red at gen10
    rows = ", ".join(f"(CAST('{v}' AS DECIMAL(30,6)))" for v in vals)
    spark_df = spark.sql(
        "SELECT CAST(CAST(CAST(s AS DECIMAL(30,6)) AS STRING) AS DOUBLE) AS d "
        f"FROM (SELECT explode(array({', '.join(repr(v) for v in vals)})) AS s)"
    )
    res = compare(
        "detour",
        spark_df,
        f"SELECT CAST(CAST(v AS VARCHAR) AS DOUBLE) AS d FROM (VALUES {rows}) t(v)",
        duck,
    )
    assert res.match, res.detail
    # ... and the detour is NECESSARY, not vacuous: the direct casts
    # disagree on a large fraction of this battery (137/501 measured —
    # every hand-rolled CAST(decimal AS DOUBLE) oracle is a latent
    # gen-scale hash mismatch)
    duck_direct = [
        r[0]
        for r in duck.execute(
            f"SELECT CAST(v AS DOUBLE) FROM (VALUES {rows}) t(v)"
        ).fetchall()
    ]
    spark_direct = [
        r.d
        for r in spark.sql(
            "SELECT CAST(CAST(s AS DECIMAL(30,6)) AS DOUBLE) AS d FROM "
            f"(SELECT explode(array({', '.join(repr(v) for v in vals)})) AS s)"
        ).collect()
    ]
    n_drift = sum(1 for a, b in zip(duck_direct, spark_direct) if a != b)
    assert n_drift > 0, "direct cast agreed everywhere: detour premise gone?"
