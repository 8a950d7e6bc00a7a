"""Data-quality expectations — declarative table checks evaluated as
ONE long-format report (the dbt-test / Great-Expectations pattern,
public, re-expressed as pure DataFrame algebra): each rule compiles to
an aggregate or anti-join counting VIOLATIONS, so the whole suite is a
handful of scans with map-side-combined counts — no row ever leaves
the executors, and a green suite costs one number per rule.

Rules (each a (rule, col_name, n_violations, n_checked) row):

- ``not_null(col)``        — NULL cells.
- ``unique(*cols)``        — rows in excess of one per key.
- ``accepted_values(col, values)`` — non-NULL cells outside the
  domain (NULLs are not_null's business — dbt semantics; every rule
  here follows the same NULL doctrine).
- ``in_range(col, lo, hi)``— non-NULL cells outside [lo, hi].
- ``foreign_key(col, dim_df, dim_col)`` — non-null child keys with
  no parent (LEFT ANTI join; the dim side broadcasts when small).

No reference analog (`/root/reference` has no data-quality surface);
extension motivated by the same pipeline-hygiene needs as VALIDATE
(`src/operator/ValidationOperator.java`), which checks schema shape —
these check VALUES.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    rule: str
    column: str
    counter: object  # aggregate Column counting violations (None: join rule)
    join_probe: tuple | None = field(default=None)  # (dim_df, dim_col, col)


def not_null(col: str) -> Expectation:
    return Expectation(
        "not_null", col, F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
    )


def accepted_values(col: str, values: list) -> Expectation:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(list(values))
    return Expectation(
        "accepted_values", col, F.sum(F.when(bad, 1).otherwise(0))
    )


def in_range(col: str, lo, hi) -> Expectation:
    bad = F.col(col).isNotNull() & (~F.col(col).between(lo, hi))
    return Expectation(
        "in_range", col, F.sum(F.when(bad, 1).otherwise(0))
    )


def unique(*cols: str) -> Expectation:
    return Expectation("unique", ",".join(cols), None)


def foreign_key(col: str, dim_df: DataFrame, dim_col: str) -> Expectation:
    return Expectation(
        "foreign_key", col, None, join_probe=(dim_df, dim_col, col)
    )


def run_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate every rule; return (rule, col_name, n_violations,
    n_checked) rows, one per rule, deterministic order-free.

    Plan shape: all aggregate-style rules AND every foreign_key's
    non-null n_checked counter fuse into ONE pass over the table (a
    single agg with many counters); each unique() adds one keyed agg;
    each foreign_key() adds one anti-join whose dim side broadcasts
    under the session threshold. Violations are counted, never
    collected. Counters coalesce to 0 so an empty table reports clean
    zeros, not NULLs."""
    if not rules:
        raise ValueError("run_expectations: empty rule list")
    agg_rules = [r for r in rules if r.counter is not None]
    fk_rules = [r for r in rules if r.rule == "foreign_key"]
    outs = []

    # one fused pass: total row count, every aggregate rule's
    # violation counter, and each FK rule's non-null child-key count
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(agg_rules):
        aggs.append(
            F.coalesce(r.counter.cast("bigint"), F.lit(0)).alias(f"__v{i}")
        )
    fk_index = {id(r): j for j, r in enumerate(fk_rules)}
    for j, r in enumerate(fk_rules):
        _, _, col = r.join_probe
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0))
                .cast("bigint"),
                F.lit(0),
            ).alias(f"__fk{j}")
        )
    # lazy checkpoint (r16): with FK rules the fused 1-row agg feeds
    # the stack() report AND every foreign_key's n_checked crossJoin —
    # without the cut each consumer re-runs the full table scan
    # (3 scans for the 2-FK suite; dq_expectations A/B 2.1 -> 1.6 s at
    # sf0.1, and 2 scans of the fact table saved at any scale).
    # Without FK rules `one` has exactly one consumer, so the cut
    # would be pure barrier overhead — skipped.
    one = df.agg(*aggs)
    if fk_rules:
        from cubert_spark.checkpoints import lazy_checkpoint

        one = one.transform(lazy_checkpoint)
    one = F.broadcast(one)

    if agg_rules:
        # rule/column names are interpolated into a SQL stack()
        # expression; double any single quote so a name containing a
        # quote can't break the parse or inject expression text
        def _q(s: str) -> str:
            return "'" + str(s).replace("'", "''") + "'"

        stack_args = [
            f"{_q(r.rule)}, {_q(r.column)}, __v{i}"
            for i, r in enumerate(agg_rules)
        ]
        outs.append(
            one.select(
                F.expr(
                    f"stack({len(agg_rules)}, "
                    + ", ".join(stack_args)
                    + ") as (rule, col_name, n_violations)"
                ),
                F.col("__n").alias("n_checked"),
            ).select("rule", "col_name", "n_violations", "n_checked")
        )
    for r in rules:
        if r.rule == "unique":
            cols = r.column.split(",")
            per_key = df.groupBy(*[F.col(c) for c in cols]).agg(
                F.count(F.lit(1)).alias("__c")
            )
            outs.append(
                per_key.agg(
                    F.coalesce(
                        F.sum(F.col("__c") - 1).cast("bigint"), F.lit(0)
                    ).alias("n_violations"),
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("n_checked"),
                ).select(
                    F.lit("unique").alias("rule"),
                    F.lit(r.column).alias("col_name"),
                    "n_violations",
                    "n_checked",
                )
            )
        elif r.rule == "foreign_key":
            # id()-keyed lookup: list.index would invoke the dataclass
            # __eq__ over Column/DataFrame fields (fragile) and rescan
            # the list per rule
            j = fk_index[id(r)]
            dim_df, dim_col, col = r.join_probe
            child = df.select(F.col(col)).filter(F.col(col).isNotNull())
            orphans = child.join(
                dim_df.select(F.col(dim_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            outs.append(
                orphans.agg(F.count(F.lit(1)).alias("n_violations"))
                .crossJoin(one.select(F.col(f"__fk{j}").alias("n_checked")))
                .select(
                    F.lit("foreign_key").alias("rule"),
                    F.lit(r.column).alias("col_name"),
                    "n_violations",
                    "n_checked",
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
