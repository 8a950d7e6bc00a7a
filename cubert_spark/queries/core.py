"""Core relational queries (SURVEY.md §2.2, §2.3, §2.4 scalar set,
§2.6): GENERATE/FILTER, GROUP BY aggregate matrix, joins, DISTINCT,
SORT/LIMIT, RANK/TOP-N, DUPLICATE, GATHER/COMBINE, dictionary
ENCODE, FLATTEN-as-wordcount, scalar functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubert_spark.catalog import load_table
from cubert_spark.operators import (
    distinct,
    duplicate,
    filter_by,
    gather,
    generate,
    group_by,
    join,
    hash_join,
    rs_join,
    limit,
    rank,
    sort,
    top_n,
)
from cubert_spark.operators.dictionary import build_dictionary, encode
from cubert_spark.queries._util import davg, davg_sql, dsum, dsum_sql


# --- GENERATE / FILTER ------------------------------------------------------

def q_generate_filter(spark: SparkSession, sf: str) -> DataFrame:
    """FROM lineitem GENERATE exprs; FILTER BY predicate.

    Per-row double arithmetic — IEEE-identical across engines.
    Exercises: FilterOperator, GenerateOperator, pushdown (predicate
    reaches the parquet scan).
    """
    li = load_table(spark, sf, "lineitem")
    out = filter_by(li, (F.col("l_quantity") > 45) & (F.col("l_discount") < 0.05))
    return generate(
        out,
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.col("l_returnflag"),
    )


SQL_GENERATE_FILTER = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_returnflag
FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.05
"""


# --- GROUP BY aggregate matrix (TPC-H Q1 flavor) ----------------------------

def q1_groupby_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship scan-aggregate: the full Cubert aggregation set over
    lineitem (SUM/COUNT/MIN/MAX + derived AVG), grouped by the
    return/status flags. Catalyst plans partial (combiner) + final
    hash aggregation; shuffle carries only group keys."""
    li = load_table(spark, sf, "lineitem")
    out = filter_by(li, F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    return group_by(
        out,
        ["l_returnflag", "l_linestatus"],
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_groupby_all(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP x BY ALL (GroupByOperator.java:86-89): whole-relation
    aggregate, no keys."""
    li = load_table(spark, sf, "lineitem")
    return group_by(
        li,
        [],
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


SQL_GROUPBY_ALL = f"""
SELECT COUNT(*) AS n_rows,
       {dsum_sql('l_extendedprice')} AS total_price,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
"""


def q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Exact COUNT_DISTINCT in plain GROUP BY
    (CountDistinctAggregation.java:28 — reference needs sorted input;
    Spark's distinct-aggregate rewrite needs nothing)."""
    o = load_table(spark, sf, "orders")
    return group_by(
        o,
        ["o_orderpriority"],
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_COUNT_DISTINCT = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def q_bitwise_or(spark: SparkSession, sf: str) -> DataFrame:
    """BITWISE_OR presence-bitmap aggregation
    (BitwiseORAggregation.java:26)."""
    li = load_table(spark, sf, "lineitem")
    return group_by(
        li,
        ["l_returnflag"],
        F.bit_or(F.expr("shiftleft(1, l_linenumber)")).alias("linenum_bits"),
    )


SQL_BITWISE_OR = """
SELECT l_returnflag,
       BIT_OR(1 << l_linenumber) AS linenum_bits
FROM lineitem
GROUP BY l_returnflag
"""


def q_collect_bag(spark: SparkSession, sf: str) -> DataFrame:
    """BAG / CREATE_ARRAYLIST aggregation (ArrayListAggregation.java:35)
    — canonicalized with sort_array so the unordered collect compares
    deterministically."""
    n = load_table(spark, sf, "nation")
    return group_by(
        n,
        ["n_regionkey"],
        F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations"),
    )


SQL_COLLECT_BAG = """
SELECT n_regionkey,
       ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), '|') AS nations
FROM nation
GROUP BY n_regionkey
"""


# --- joins ------------------------------------------------------------------

def q_join_inner(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle equi-join orders x lineitem + re-aggregation (the
    reduce-side join macro, ShuffleRewriter.java:549). AQE picks
    broadcast when the filtered side is small."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey, "inner")
    return group_by(
        j,
        ["o_orderpriority"],
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_JOIN_INNER = f"""
SELECT o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT OUTER merge-join semantics (MergeJoinOperator.java:86-96):
    customers with their order counts, keeping customers without
    orders (count 0 distinguishes the null-extension)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return group_by(
        j,
        ["c_mktsegment"],
        F.count("o_orderkey").alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_customers"),
    )


SQL_JOIN_LEFT = """
SELECT c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       COUNT(DISTINCT c_custkey) AS n_customers
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join on disjoint-ish key sets: supplier vs customer
    per nation — exercises both-side null extension."""
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer")
    sa = group_by(s, ["s_nationkey"], F.count(F.lit(1)).alias("n_supp")).withColumnRenamed(
        "s_nationkey", "nationkey"
    )
    ca = group_by(c, ["c_nationkey"], F.count(F.lit(1)).alias("n_cust")).withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    return sa.join(ca, on="nationkey", how="full").select(
        "nationkey",
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
    )


SQL_JOIN_FULL = """
WITH sa AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1),
     ca AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1)
SELECT COALESCE(sa.nationkey, ca.nationkey) AS nationkey,
       COALESCE(n_supp, 0) AS n_supp,
       COALESCE(n_cust, 0) AS n_cust
FROM sa FULL OUTER JOIN ca ON sa.nationkey = ca.nationkey
"""


def q_join_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI (engine extensions; absent from the
    reference, SURVEY.md §2.3 'Not present'): customers with orders vs
    without, as one labeled union."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    semi = join(c, o.withColumnRenamed("o_custkey", "c_custkey"), ["c_custkey"], "LEFT SEMI")
    anti = join(c, o.withColumnRenamed("o_custkey", "c_custkey"), ["c_custkey"], "LEFT ANTI")
    return gather(
        group_by(semi, [], F.count(F.lit(1)).alias("n")).withColumn("side", F.lit("with_orders")),
        group_by(anti, [], F.count(F.lit(1)).alias("n")).withColumn("side", F.lit("without_orders")),
    )


SQL_JOIN_SEMI_ANTI = """
SELECT COUNT(*) AS n, 'with_orders' AS side
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT COUNT(*) AS n, 'without_orders' AS side
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_mesh_join(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-way star join with broadcast dimensions (Cubert pattern:
    LOAD-CACHED dims + HASH-JOIN per block, HashJoinOperator.java:39;
    here region/nation broadcast, fact never leaves its partitions
    until the final small aggregation). Output naming uses the
    reference's ``block___col`` convention (MergeJoinOperator.java:63).
    """
    r = load_table(spark, sf, "region")
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    dims = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name", "r_name")
    )
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(dims, c.c_nationkey == dims.n_nationkey)
    )
    return group_by(
        j,
        ["r_name", "n_name"],
        dsum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    ).withColumnsRenamed({"r_name": "region___name", "n_name": "nation___name"})


SQL_MESH_JOIN = f"""
SELECT r_name AS region___name, n_name AS nation___name,
       {dsum_sql('o_totalprice')} AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_rs_join_guard(spark: SparkSession, sf: str) -> DataFrame:
    """Reduce-side join with the duplicate-free dimension guard
    (CHANGELOG:17): nation is unique on n_nationkey, so the guard
    passes and results equal a plain join."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    j = rs_join(c, n, ["c_nationkey"], how="INNER", check_unique_dim=True)
    return group_by(j, ["n_name"], F.count(F.lit(1)).alias("n_customers"))


SQL_RS_JOIN = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- distinct / sort / limit / rank / topn ---------------------------------

def q_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """DISTINCT (DistinctOperator.java:27 + shuffle macro)."""
    li = load_table(spark, sf, "lineitem")
    return distinct(li.select("l_returnflag", "l_linestatus"))


SQL_DISTINCT = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Global SORT + LIMIT (SHUFFLE SORTED ON + LimitOperator.java:34).
    Deterministic: orderkey tiebreak."""
    o = load_table(spark, sf, "orders")
    return limit(
        sort(o.select("o_orderkey", "o_totalprice"), F.col("o_totalprice").desc(), "o_orderkey"),
        100,
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q_rank(spark: SparkSession, sf: str) -> DataFrame:
    """RANK ... GROUP BY ... ORDER BY (RankOperator.java:24) with a
    deterministic total order per group."""
    o = load_table(spark, sf, "orders")
    ranked = rank(
        o,
        "rnk",
        group_by=["o_custkey"],
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
    )
    return filter_by(ranked, F.col("rnk") <= 2).select(
        "o_custkey", "o_orderkey", "rnk"
    )


SQL_RANK = """
SELECT o_custkey, o_orderkey, CAST(rnk AS INT) AS rnk FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 2
"""


def q_topn(spark: SparkSession, sf: str) -> DataFrame:
    """TOP n FROM x GROUP BY g ORDER BY o (TopNOperator.java:32).
    Spark plans a WindowGroupLimit: per-map-partition top-k before the
    shuffle — the scalable form."""
    o = load_table(spark, sf, "orders")
    return top_n(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        3,
        group_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )


SQL_TOPN = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


# --- duplicate / gather / combine ------------------------------------------

def q_duplicate(spark: SparkSession, sf: str) -> DataFrame:
    """DUPLICATE x 3 TIMES COUNTER AS copy (DuplicateOperator.java:35)."""
    r = load_table(spark, sf, "region")
    return duplicate(r.select("r_regionkey", "r_name"), 3, counter="copy")


SQL_DUPLICATE = """
SELECT r_regionkey, r_name, CAST(g AS INT) AS copy
FROM region, generate_series(1, 3) AS t(g)
"""


def q_gather(spark: SparkSession, sf: str) -> DataFrame:
    """GATHER (UNION ALL, GatherOperator.java:29) of two filtered
    slices — overlap preserved (bag semantics)."""
    e = load_table(spark, sf, "events")
    clicks = filter_by(e, F.col("event_type") == "click")
    big = filter_by(e, F.col("value") > 90)
    return group_by(
        gather(clicks, big),
        ["event_type"],
        F.count(F.lit(1)).alias("n"),
    )


SQL_GATHER = """
SELECT event_type, COUNT(*) AS n FROM (
  SELECT * FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT * FROM events WHERE value > 90
) GROUP BY event_type
"""


# --- dictionary / scalar functions / wordcount ------------------------------

def q_dict_encode(spark: SparkSession, sf: str) -> DataFrame:
    """ENCODE ON l_returnflag USING inline dictionary
    (DictionaryEncodeOperator.java:48): codes are dense ranks in value
    order; broadcast join keeps the fact unshuffled."""
    li = load_table(spark, sf, "lineitem")
    d = build_dictionary(li, "l_returnflag")
    enc = encode(li.select("l_orderkey", "l_linenumber", "l_returnflag"), d, ["l_returnflag"])
    return group_by(
        enc,
        ["l_returnflag"],
        F.count(F.lit(1)).alias("n"),
    ).withColumnRenamed("l_returnflag", "flag_code")


SQL_DICT_ENCODE = """
WITH dict AS (
  SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY value) AS INT) AS code
  FROM (SELECT DISTINCT l_returnflag AS value FROM lineitem WHERE l_returnflag IS NOT NULL)
)
SELECT code AS flag_code, COUNT(*) AS n
FROM lineitem JOIN dict ON l_returnflag = dict.value
GROUP BY code
"""


def q_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """The Cubert scalar function set (§2.8): CASE, NVL, CONCAT,
    MATCHES, casts, arithmetic incl. integer semantics."""
    from cubert_spark.functions import call
    from cubert_spark.functions.registry import case

    c = load_table(spark, sf, "customer")
    return c.select(
        F.col("c_custkey"),
        call("CONCAT", F.lit("cust:"), F.col("c_name")).alias("tag"),
        case(
            F.col("c_acctbal") < 0, F.lit("debt"),
            F.col("c_acctbal") < 5000, F.lit("low"),
            default=F.lit("high"),
        ).alias("bal_band"),
        call("NVL", F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        call("MATCHES", F.col("c_name"), F.lit(".*[07]$")).alias("name_ends_07"),
        call("CASTTOINT", F.col("c_acctbal")).alias("bal_int"),
        (F.col("c_custkey") % 10).alias("bucket"),
    )


SQL_SCALAR_FUNCTIONS = """
SELECT c_custkey,
       'cust:' || c_name AS tag,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
       REGEXP_FULL_MATCH(c_name, '.*[07]$') AS name_ends_07,
       CAST(TRUNC(c_acctbal) AS INT) AS bal_int,
       c_custkey % 10 AS bucket
FROM customer
"""


def q_wordcount(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's canonical example (release/examples/wordcount.cmr)
    over documents: FLATTEN text into words -> GROUP BY word COUNT.
    Exercises FLATTEN BAG (explode) + shuffle agg with combiner."""
    d = load_table(spark, sf, "documents")
    words = d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    return group_by(words, ["word"], F.count(F.lit(1)).alias("cnt"))


SQL_WORDCOUNT = """
SELECT word, COUNT(*) AS cnt
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
GROUP BY word
"""


def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT (SURVEY.md §2.6 'Not present' in the
    reference — free in Spark): customers ordering in both 1995 and
    1996 vs only 1995."""
    o = load_table(spark, sf, "orders")
    y = o.withColumn("yr", F.year("o_orderdate"))
    k95 = y.filter("yr = 1995").select("o_custkey")
    k96 = y.filter("yr = 1996").select("o_custkey")
    both = k95.intersect(k96)
    only95 = k95.distinct().exceptAll(k96.distinct())
    return gather(
        group_by(both, [], F.count(F.lit(1)).alias("n")).withColumn("set_op", F.lit("both_years")),
        group_by(only95, [], F.count(F.lit(1)).alias("n")).withColumn("set_op", F.lit("only_1995")),
    )


SQL_SET_OPS = """
WITH k95 AS (SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995),
     k96 AS (SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996)
SELECT COUNT(*) AS n, 'both_years' AS set_op FROM (SELECT * FROM k95 INTERSECT SELECT * FROM k96)
UNION ALL
SELECT COUNT(*) AS n, 'only_1995' AS set_op FROM (SELECT DISTINCT o_custkey FROM k95 EXCEPT SELECT DISTINCT o_custkey FROM k96)
"""


def q_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL-sketch count-distinct — the 100 TB scale path where exact
    distinct is unnecessary. Driver-checkable contract: the sketch
    estimate itself is engine-specific, so the query emits the exact
    count plus a ``within_5pct`` boolean asserting the sketch landed
    inside HLL's published error envelope (relSD defaults to 0.05);
    the oracle derives the same columns from exact math (TRUE
    literal), so a sketch regression flips the hash red."""
    o = load_table(spark, sf, "orders")
    g = group_by(
        o,
        ["o_orderpriority"],
        # rsd 0.01 (2^14 registers): measured error <=1% at the test
        # SFs, so the 5% envelope holds with 5x margin (the default
        # rsd 0.05 measured up to 9.7% off — outside its own 1-sigma)
        F.approx_count_distinct("o_custkey", 0.01).alias("__approx"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    within = (
        F.abs(F.col("__approx") - F.col("exact_customers"))
        <= F.col("exact_customers") * F.lit(0.05)
    ).alias("within_5pct")
    return g.select("o_orderpriority", "exact_customers", within)


def q_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q5-style depth query: 4-table join chain (lineitem ⋈
    orders ⋈ customer ⋈ nation) → revenue per nation. The big fact
    side shuffles only on join keys; the dim tables (customer at this
    ratio, nation always) broadcast under the session's AQE/broadcast
    thresholds — plan asserted in tests/test_plans.py. Revenue is a
    per-row IEEE product summed through DECIMAL (engine-exact)."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q3-style shipping priority: top-10 orders by outstanding
    revenue (lines unshipped at the cutoff) for one market segment.
    The selective dim filter (1/5 of customers) broadcasts; the fact
    side shuffles only on its join keys; the final top-10 plans
    TakeOrderedAndProject (per-partition top-k, never a global sort).
    Revenue is the per-row IEEE product summed through DECIMAL, so
    ordering and values replay exactly in the oracle."""
    cutoff = "1998-06-01"
    c = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf, "orders").filter(
        F.to_date("o_orderdate") < F.lit(cutoff)
    )
    li = load_table(spark, sf, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit(cutoff)
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q18-style large-volume customers: orders whose total
    line quantity exceeds a threshold, joined back to customer, top
    100 by quantity. The HAVING subquery becomes an aggregated
    semi-side join: lineitem aggregates ONCE (keyed agg with map-side
    combine), the filtered keys then join orders/customer; top-100
    plans TakeOrderedAndProject. Quantity sums run through DECIMAL."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


def q_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q6-style forecast revenue change: one filtered scan, one
    global aggregate — every predicate (date band, discount band,
    quantity cap) pushes to the parquet scan; zero joins, zero wide
    shuffles (partial -> final agg only). Revenue through DECIMAL."""
    li = load_table(spark, sf, "lineitem")
    out = li.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    return out.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_FORECAST_REVENUE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def q_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q7-style bilateral shipping volume: revenue flowing
    between two nation pairs per year — a 6-table join chain
    (lineitem |><| orders |><| customer |><| nation AND |><| supplier
    |><| nation again on the other leg). Both nation dims broadcast
    (they are 25 rows at any SF); the fact side shuffles only on its
    join keys; the cross-pair predicate prunes before aggregation.
    Revenue through DECIMAL."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    su = load_table(spark, sf, "supplier")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # Nation names from the testdata domain (NATION_0..NATION_24) so
    # the pair predicate actually selects rows — TPC-H's FRANCE/GERMANY
    # literals would collapse to an empty relation here and make the
    # oracle parity vacuous (r6 ADVICE).
    pair_ok = (
        (F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_19")
    ) | (
        (F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_11")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(n1, su.s_nationkey == F.col("n1_key"))
        .join(n2, c.c_nationkey == F.col("n2_key"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("l_year"),
        )
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


SQL_NATION_VOLUME = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(CAST(l_shipdate AS DATE)) AS l_year,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_19')
   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_11')
GROUP BY 1, 2, 3
"""


def q_shipmode_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q12-style conditional priority split: per line status in
    one shipping year, how many lines belong to high- vs low-priority
    orders (the testdata schema has no shipmode/receipt columns, so
    the Q12 SHAPE — band-filtered fact join + conditional-CASE counts
    — runs on the status dimension). One join on the order key, exact
    integer aggregation, the date band pushed to the lineitem scan."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    band = li.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        band.join(o, band.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_SHIPMODE_PRIORITY = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
GROUP BY l_linestatus
"""


def q_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q14-style promotion effect: the share of one month's
    revenue from PROMO parts. Part (the smaller side at any ratio of
    this schema) broadcasts; numerator and denominator are both
    DECIMAL-exact sums; the final percentage is ONE IEEE divide of the
    two exact decimals cast to double."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    band = li.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-10-01"))
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    g = band.join(p, band.l_partkey == p.p_partkey).agg(
        dsum(F.when(promo, rev).otherwise(F.lit(0.0))).alias("promo_revenue"),
        dsum(rev).alias("total_revenue"),
    )
    return g.select(
        "promo_revenue",
        "total_revenue",
        (
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")
        ).alias("promo_pct"),
    )


SQL_PROMO_REVENUE = f"""
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM (
  SELECT {dsum_sql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_revenue,
         {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-10-01'
)
"""


def q_approx_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate-percentile sketch with a driver-checkable contract
    (the quantile sibling of q_approx_count_distinct's HLL contract):
    per order priority, the EXACT discrete median plus a
    ``within_rank_eps`` boolean asserting Spark's approx_percentile
    (GK sketch, accuracy 10000 -> rank error <= 1e-4) landed inside
    the exact [q49, q51] value band — a 100x-slack envelope. The
    oracle derives both from exact math (quantile_disc + TRUE). At
    100 TB the sketch is the only viable path (mergeable, bounded
    memory); this row keeps it honest against the exact answer the
    small SFs can still afford."""
    o = load_table(spark, sf, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50_exact"),
        F.expr(
            "percentile_disc(0.49) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("__lo"),
        F.expr(
            "percentile_disc(0.51) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("__hi"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("__apx"),
    )
    within = (
        (F.col("__apx") >= F.col("__lo")) & (F.col("__apx") <= F.col("__hi"))
    ).alias("within_rank_eps")
    return g.select("o_orderpriority", "p50_exact", within)


SQL_APPROX_QUANTILE = """
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.5) AS p50_exact,
       TRUE AS within_rank_eps
FROM orders
GROUP BY o_orderpriority
"""


def q_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q10-style returned-item reporting: top-20 customers by
    revenue lost to returns in a quarter. Fact side filters push to
    the lineitem scan (returnflag) and orders scan (date band); the
    nation dim broadcasts; top-20 plans TakeOrderedAndProject.
    Revenue through DECIMAL."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1998-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1998-04-01"))
    )
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


SQL_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1998-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


SQL_LARGE_ORDERS = f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
  FROM lineitem GROUP BY 1
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, CAST(o_orderdate AS DATE), l_orderkey
LIMIT 10
"""


SQL_REVENUE_BY_NATION = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES = {
    "generate_filter": q_generate_filter,
    "q1_groupby_agg": q1_groupby_agg,
    "groupby_all": q_groupby_all,
    "count_distinct": q_count_distinct,
    "bitwise_or": q_bitwise_or,
    "collect_bag": q_collect_bag,
    "join_inner": q_join_inner,
    "join_left_outer": q_join_left_outer,
    "join_full_outer": q_join_full_outer,
    "join_semi_anti": q_join_semi_anti,
    "mesh_join": q_mesh_join,
    "rs_join_guard": q_rs_join_guard,
    "distinct": q_distinct,
    "sort_limit": q_sort_limit,
    "rank": q_rank,
    "topn": q_topn,
    "duplicate": q_duplicate,
    "gather": q_gather,
    "dict_encode": q_dict_encode,
    "scalar_functions": q_scalar_functions,
    "wordcount": q_wordcount,
    "set_ops": q_set_ops,
    "approx_count_distinct": q_approx_count_distinct,
    "approx_quantile": q_approx_quantile,
    "revenue_by_nation": q_revenue_by_nation,
    "shipping_priority": q_shipping_priority,
    "large_orders": q_large_orders,
    "returned_items": q_returned_items,
    "forecast_revenue": q_forecast_revenue,
    "nation_volume": q_nation_volume,
    "shipmode_priority": q_shipmode_priority,
    "promo_revenue": q_promo_revenue,
}

SQL_APPROX_COUNT_DISTINCT = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS within_5pct
FROM orders
GROUP BY o_orderpriority
"""

ORACLES = {
    "set_ops": SQL_SET_OPS,
    # approx_count_distinct: the sketch estimate is engine-specific, so
    # the contract is exact count + a within-envelope boolean the
    # oracle asserts from exact math (TRUE).
    "approx_count_distinct": SQL_APPROX_COUNT_DISTINCT,
    "approx_quantile": SQL_APPROX_QUANTILE,
    "nation_volume": SQL_NATION_VOLUME,
    "shipmode_priority": SQL_SHIPMODE_PRIORITY,
    "promo_revenue": SQL_PROMO_REVENUE,
    "generate_filter": SQL_GENERATE_FILTER,
    "q1_groupby_agg": SQL_Q1,
    "groupby_all": SQL_GROUPBY_ALL,
    "count_distinct": SQL_COUNT_DISTINCT,
    "bitwise_or": SQL_BITWISE_OR,
    "collect_bag": SQL_COLLECT_BAG,
    "join_inner": SQL_JOIN_INNER,
    "join_left_outer": SQL_JOIN_LEFT,
    "join_full_outer": SQL_JOIN_FULL,
    "join_semi_anti": SQL_JOIN_SEMI_ANTI,
    "mesh_join": SQL_MESH_JOIN,
    "rs_join_guard": SQL_RS_JOIN,
    "distinct": SQL_DISTINCT,
    "sort_limit": SQL_SORT_LIMIT,
    "rank": SQL_RANK,
    "topn": SQL_TOPN,
    "duplicate": SQL_DUPLICATE,
    "gather": SQL_GATHER,
    "dict_encode": SQL_DICT_ENCODE,
    "scalar_functions": SQL_SCALAR_FUNCTIONS,
    "wordcount": SQL_WORDCOUNT,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "large_orders": SQL_LARGE_ORDERS,
    "returned_items": SQL_RETURNED_ITEMS,
    "forecast_revenue": SQL_FORECAST_REVENUE,
}
