"""Deterministic in-engine model training: a least-squares linear
probe fitted by FULL-BATCH gradient descent, entirely as Spark
aggregations (public lineage: linear probes — Alain & Bengio 2016,
"Understanding intermediate layers using linear classifier probes";
fastText-style shallow quality classifiers — Joulin et al. 2017; the
GPT-3/LLaMA quality-filter classifiers are exactly such shallow
models trained on corpus features).

Why full-batch GD and squared loss, not SGD and logistic: the point
of an IN-ENGINE trainer is bit-reproducibility of the fitted filter
model (a quality classifier that drifts across retrains silently
changes the corpus). Squared loss keeps every scalar step inside
correctly-rounded IEEE ops (+, *, /); logistic's exp() is NOT
correctly rounded across libms and would break cross-engine hashes.

Gradient-sum determinism — why a SORTED TWO-LEVEL FOLD and not a
DECIMAL sum: casting an arbitrary double to DECIMAL rounds it, and
the engines disagree on the rounding INPUT — Spark rounds the
double's shortest decimal string (BigDecimal.valueOf), DuckDB rounds
the exact binary value — so any term whose shortest repr carries a
'5' at the cut digit diverges (measured: 1.0000000000005 ->
1.000000000001 in Spark, 1.000000000000 in DuckDB). The dsum
doctrine survives this only because its inputs are exact at the cast
scale (prices, counts); gradient terms are arbitrary doubles, so the
cast is unsound here. Instead every cross-row sum is the repo's
fixed-order float fold (the bm25/margin_align pattern): fold terms
in id order within content-keyed shards (id % n_shards), then fold
the shard sums in shard order — pure IEEE adds in an identical order
in both engines, bit-exact for ANY doubles.

Scale shape (100 TB): each epoch is ONE two-level keyed aggregation
over the corpus producing d+2 numbers; the driver folds only those
(the kmeans_lloyd bounded-collect precedent). Per-shard state is
|corpus|/n_shards terms — size n_shards so that stays in one task's
memory (the bestfit_pack sharding argument; for extreme corpora the
fold extends to a deeper tree, same construction). No corpus
shuffle beyond the one shard-key aggregation; epochs are sequential
full scans — cache the bounded-width feature projection upstream if
scans dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from cubert_spark.checkpoints import lazy_checkpoint


def _term_fold(i: int):
    """2-arg merge lambda for term i (a default-arg closure would make
    pyspark count three parameters and bind the 3-arg HOF variant)."""
    def f(acc, s):
        return acc + s[f"t{i}"]

    return f


def _folded_sums(df: DataFrame, group, order_col: str, terms) -> DataFrame:
    """All of a group's ordered float folds off ONE sorted struct list
    (r17): the old per-term spelling (one _folded_sum agg per term) ran one
    collect_list + sort_array per term — d+3 object aggs buffering the
    same (order, ...) rows. Here the terms ride a single collected
    struct, sorted once by ``order_col`` (the struct's FIRST field, so
    sort_array's order on distinct keys is exactly the old per-term
    order), and each term folds over that bound array in a follow-up
    projection. Fold order and IEEE adds are identical term-for-term,
    so the sums are bit-identical to the per-term spelling; ``group``
    may be a (name, expr) pair. Appends count column ``__n``."""
    gname, gexpr = group
    lst = df.groupBy(gexpr.alias(gname)).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    *[t.alias(f"t{i}") for i, (_, t) in enumerate(terms)],
                )
            )
        ).alias("__lst"),
        F.count(F.lit(1)).alias("__n"),
    )
    return lst.select(
        F.col(gname),
        *[
            F.aggregate(F.col("__lst"), F.lit(0.0), _term_fold(i)).alias(a)
            for i, (a, _) in enumerate(terms)
        ],
        F.col("__n"),
    )


def _lvl2_fold(lvl1: DataFrame, terms) -> DataFrame:
    """Level-2 fold: shard sums folded in shard order, same
    one-collected-struct spelling as :func:`_folded_sums` (order col
    __s is unique per row, so struct sort == the old per-term sort);
    n stays the exact bigint sum of the shard counts."""
    lst = lvl1.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__s").alias("o"),
                    *[F.col(a).alias(f"t{i}") for i, (a, _) in enumerate(terms)],
                )
            )
        ).alias("__lst"),
        F.sum("__n").alias("n"),
    )
    return lst.select(
        *[
            F.aggregate(F.col("__lst"), F.lit(0.0), _term_fold(i)).alias(a)
            for i, (a, _) in enumerate(terms)
        ],
        F.col("n"),
    )


def linear_probe_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    id_col: str = "doc_id",
    epochs: int = 3,
    lr_num: int = 1,
    lr_den: int = 8,
    n_shards: int = 256,
) -> DataFrame:
    """Fit ``y ~ w0 + w . x`` by ``epochs`` full-batch GD steps from
    w = 0 with the exact-rational learning rate ``lr_num/lr_den``
    (1/8 default — a power of two, so the scalar multiply is exact in
    binary): per epoch,

        r_i    = w0 + w . x_i - y_i          (row-local doubles)
        grad_j = 2/n * fold(r_i * x_ij)      (sorted two-level fold)
        w_j   -= lr * grad_j

    ``id_col`` must be a unique row key — it is the fold order (and
    the shard key, id % n_shards), which is what makes the gradient
    bit-reproducible across runs, engines, and repartitions.

    Returns one row per epoch: (epoch, w0, w_1..w_d as ``w_<col>``,
    mse) where ``mse`` is the loss UNDER THE PRE-UPDATE weights (the
    loss whose gradient produced this epoch's step) and the weights
    are AFTER the step — reading down the rows shows the descent.
    """
    if epochs < 1:
        raise ValueError(f"linear_probe_train: epochs must be >= 1, got {epochs}")
    if not feature_cols:
        raise ValueError("linear_probe_train: feature_cols is empty")
    spark = df.sparkSession
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    lr = lr_num / lr_den  # exact when lr_den is a power of two
    d = len(feature_cols)
    # r16 (guide §5 cache-on-reuse + the module doc's own advice):
    # checkpoint the bounded-width feature projection ONCE so epochs
    # 2..n re-read blocks instead of re-running the upstream
    # featurization. (Shipping the epoch weights as broadcast data
    # instead of literals was ALSO tried to stabilize the codegen
    # shape across epochs — it measured SLOWER: the 1-row nested-loop
    # join costs more than the per-epoch recompile at these plan
    # sizes — so weights stay literals.)
    proj = list(dict.fromkeys([id_col, *feature_cols, label_col]))
    df = df.select(*[F.col(c) for c in proj]).transform(lazy_checkpoint)
    w = [0.0] * (d + 1)  # [bias, w_1..w_d]
    out_rows = []
    for epoch in range(1, epochs + 1):
        pred = F.lit(w[0])
        for j, x in enumerate(xs):
            pred = pred + F.lit(w[j + 1]) * x
        r = pred - y
        terms = [("g0", r)] + [
            (f"g{j + 1}", r * x) for j, x in enumerate(xs)
        ] + [("sse", r * r)]
        lvl1 = _folded_sums(
            df, ("__s", F.col(id_col) % n_shards), id_col, terms
        )
        lvl2 = _lvl2_fold(lvl1, terms)
        row = lvl2.collect()[0]
        n = float(row["n"])
        mse = row["sse"] / n
        for j in range(d + 1):
            # 2/n * g, then one exact lr multiply and one subtract —
            # all correctly rounded on identical inputs
            w[j] = w[j] - lr * (2.0 * row[f"g{j}"] / n)
        out_rows.append((epoch, *w, mse))
    schema = ", ".join(
        ["epoch int", "w0 double"]
        + [f"w_{c} double" for c in feature_cols]
        + ["mse double"]
    )
    return spark.createDataFrame(out_rows, schema)


#: fastText's sigmoid discretization constants (public: fastText
#: src/utils.cc — the shallow quality classifiers train with a
#: PRECOMPUTED 512-bin sigmoid table clipped at |z| = 8, not libm
#: exp() per example).
SIGMOID_TABLE_SIZE = 512
MAX_SIGMOID = 8


def sigmoid_table() -> list[float]:
    """The fastText sigmoid table: t[i] = sigma(i*16/512 - 8) for
    i = 0..512. Built ONCE driver-side (math.exp); the Spark
    expression and the DuckDB oracle both embed THESE literals, so
    the engines never call their own libm exp — the whole reason a
    logistic-loss trajectory can be bit-exact cross-engine (the
    module doc's exp() objection, answered the way fastText answers
    it)."""
    import math

    step = 2 * MAX_SIGMOID / SIGMOID_TABLE_SIZE
    return [
        1.0 / (1.0 + math.exp(MAX_SIGMOID - i * step))
        for i in range(SIGMOID_TABLE_SIZE + 1)
    ]


def logistic_probe_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    id_col: str = "doc_id",
    epochs: int = 3,
    lr_num: int = 1,
    lr_den: int = 8,
    n_shards: int = 256,
) -> DataFrame:
    """Classification probe (r15 VERDICT task 6 — the fastText-style
    quality-classifier shape; Joulin et al. 2017): fit a logistic
    model p = sigma(w0 + w . x) on a {0,1} label by full-batch GD
    from w = 0, with the SAME bit-reproducible discipline as
    linear_probe_train:

        z_i    = w0 + w . x_i                 (row-local doubles)
        p_i    = table-sigma(z_i)             (fastText 512-bin
                                               lookup, clip |z|>=8)
        grad_j = 1/n * fold((p_i - y_i) x_ij) (sorted two-level fold)
        w_j   -= lr * grad_j

    The sigmoid is the fastText precomputed-table one (see
    ``sigmoid_table``): index = clamp(floor((z+8)*32)) — add/multiply
    by powers of two (exact) + floor (exact) + array lookup — so no
    engine evaluates exp() and the trajectory hashes bit-identically.
    The per-epoch metric is the Brier score mean((p-y)^2) (multiply/
    add only; log-loss would reintroduce libm ln into the hashed
    output).

    Returns one row per epoch: (epoch, w0, w_<col>.., brier) — brier
    under the PRE-update weights, weights after the step, exactly the
    linear probe's reading-down-the-rows contract. Scale shape is
    identical too: one two-level keyed aggregation per epoch, d+2
    numbers collected."""
    if epochs < 1:
        raise ValueError(
            f"logistic_probe_train: epochs must be >= 1, got {epochs}"
        )
    if not feature_cols:
        raise ValueError("logistic_probe_train: feature_cols is empty")
    spark = df.sparkSession
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    lr = lr_num / lr_den
    d = len(feature_cols)
    arr = F.array(*[F.lit(v) for v in sigmoid_table()])
    scale = SIGMOID_TABLE_SIZE / (2 * MAX_SIGMOID)  # 32.0, exact
    # r16: same move as linear_probe_train (see its comment) —
    # checkpoint the feature projection once; weights stay literals
    # (the broadcast-weights variant measured slower there too).
    proj = list(dict.fromkeys([id_col, *feature_cols, label_col]))
    df = df.select(*[F.col(c) for c in proj]).transform(lazy_checkpoint)
    w = [0.0] * (d + 1)
    out_rows = []
    for epoch in range(1, epochs + 1):
        z = F.lit(w[0])
        for j, x in enumerate(xs):
            z = z + F.lit(w[j + 1]) * x
        idx = F.greatest(
            F.lit(0),
            F.least(
                F.lit(SIGMOID_TABLE_SIZE),
                F.floor((z + F.lit(float(MAX_SIGMOID))) * F.lit(scale)).cast(
                    "int"
                ),
            ),
        )
        p = (
            F.when(z <= -float(MAX_SIGMOID), F.lit(0.0))
            .when(z >= float(MAX_SIGMOID), F.lit(1.0))
            .otherwise(F.element_at(arr, idx + 1))
        )
        r = p - y
        terms = [("g0", r)] + [
            (f"g{j + 1}", r * x) for j, x in enumerate(xs)
        ] + [("se", r * r)]
        lvl1 = _folded_sums(
            df, ("__s", F.col(id_col) % n_shards), id_col, terms
        )
        lvl2 = _lvl2_fold(lvl1, terms)
        row = lvl2.collect()[0]
        n = float(row["n"])
        brier = row["se"] / n
        for j in range(d + 1):
            w[j] = w[j] - lr * (row[f"g{j}"] / n)
        out_rows.append((epoch, *w, brier))
    schema = ", ".join(
        ["epoch int", "w0 double"]
        + [f"w_{c} double" for c in feature_cols]
        + ["brier double"]
    )
    return spark.createDataFrame(out_rows, schema)
