"""Bigram language-model perplexity scoring — the classic corpus
quality filter (CCNet / Wenzek et al. 2020 lineage, public: score
documents by LM perplexity and keep the fluent tail; here the LM is
an add-one-smoothed bigram model trained on the corpus itself, so
the whole operator is closed-form relational and oracle-replayable).

No reference analog (the reference has no text operators); LLM-data
north-star surface like textstats.quality_score.

Determinism discipline: every probability is a ratio of exact bigint
counts — (c(x,y)+1)/(c(x)+V) — so both engines compute the identical
IEEE double before the single ln() per bigram; per-doc sums then
ROUND(,9) away the <=2-ulp libm drift and the perplexity exp()
ROUND(,6) (the documented decayed_revenue float doctrine, small-
magnitude regime: avg_nll is in [0, ln V]).

Scale shape: one explode into tokens (|tokens| rows), two corpus
aggregate tables (unigram, bigram — vocabulary-sized, orders below
the corpus), two equi-joins on token keys (inverted-index style,
never all-pairs; common-word skew is AQE's skew-join case), one
keyed per-doc aggregate. 100 TB: token-key joins shuffle |tokens|
narrow rows; the vocab aggregates stay joinable (never collected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cubert_spark.datapipe.dedup import _spread
from cubert_spark.checkpoints import eager_checkpoint


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc bigram perplexity under the corpus-trained add-one
    bigram LM. Output: (id, n_bigrams, avg_nll, ppl) where
    avg_nll = ROUND(avg(-ln p), 9), ppl = ROUND(exp(avg_nll), 6).
    Docs with < 2 tokens have no bigrams and are absent."""
    # array aliased in its own projection FIRST (the catalogued
    # explode trap: inlining the split re-runs it per exploded row)
    base = _spread(df, id_col).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    # uni feeds TWO consumers (the |V| aggregate and the per-bigram
    # join) — checkpoint the vocabulary-sized aggregate once so the
    # full-corpus token explode is not re-executed per consumer (the
    # components.py multi-consumer lineage rule)
    uni = (
        base.select(F.explode_outer("__w").alias("x"))
        .filter(F.col("x").isNotNull())
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("c_x"))
        .transform(eager_checkpoint)
    )
    # |vocab| as a 1-row broadcast stat join (documented lint class)
    vocab = F.broadcast(uni.agg(F.count(F.lit(1)).alias("V")))
    # bigrams via the descending-sequence guard (sequence(0,-1) runs
    # DESCENDING in Spark — short docs must short-circuit)
    bg_arr = base.select(
        F.col(id_col),
        F.expr(
            "CASE WHEN size(__w) >= 2 THEN "
            "transform(sequence(0, size(__w) - 2), "
            "i -> struct(__w[i] AS x, __w[i+1] AS y)) "
            "ELSE array() END"
        ).alias("__bg"),
    )
    bg = (
        bg_arr.select(F.col(id_col), F.explode_outer("__bg").alias("b"))
        .filter(F.col("b").isNotNull())
        .select(id_col, F.col("b.x").alias("x"), F.col("b.y").alias("y"))
    )
    bgc = bg.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    # p as a ratio of exact bigint counts -> identical double cross-
    # engine; ln is the only libm call
    p = (F.col("c_xy") + F.lit(1)).cast("double") / (
        F.col("c_x") + F.col("V")
    ).cast("double")
    scored = (
        bg.join(bgc, ["x", "y"])
        .join(uni, "x")
        .crossJoin(vocab)
        .select(F.col(id_col), (-F.log(p)).alias("__nll"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("__nll").alias("__avg_nll"),
    )
    return agg.select(
        F.col(id_col),
        "n_bigrams",
        F.round("__avg_nll", 9).alias("avg_nll"),
        F.round(F.exp("__avg_nll"), 6).alias("ppl"),
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    thresholds: str = "exact",
) -> DataFrame:
    """CCNet's head/middle/tail corpus split (public: Wenzek et al.
    2020 §4.3 — per-language, rank documents by LM perplexity and cut
    into equal thirds; the head feeds high-quality training mixes, the
    tail gets filtered or down-weighted). Scores come from the
    corpus-trained bigram LM above; the split is per ``lang_col`` so
    no language's fluency scale is judged by another's.

    Determinism: the ranking key is (ppl, id) — ppl is already on the
    ROUND(,6) grid both engines agree on, and the id tie-break makes
    the order total, so NTILE bucket boundaries replay exactly.

    Two threshold tiers:

    - ``thresholds="exact"`` (the oracle-compared path): per-language
      NTILE over a window — one shuffle on lang + a per-language
      sort. Correct at any scale but the sort is the cost: a
      100 TB / ~30-language corpus sorts ~3 TB per language.
    - ``thresholds="sketch"`` (the 100 TB path): per-language
      GK-sketch quantile cuts (percentile_approx, one mergeable agg)
      broadcast back onto the corpus — zero sorts, one tiny agg +
      one map stage. Bucket boundaries are approximate within the
      sketch's rank error; CCNet itself uses precomputed threshold
      constants, i.e. exactly this shape. Not oracle-compared (the
      sketch is Spark-specific); parity with the exact tier is
      pytest-pinned on agreement rate instead.

    Output: (id, lang, ppl, bucket) where bucket is 'head' /
    'middle' / 'tail' for n_buckets=3 (CCNet's setting), else the
    1-based bucket index as a string.
    """
    if n_buckets < 2:
        raise ValueError(f"perplexity_buckets: n_buckets must be >= 2, got {n_buckets}")
    if thresholds not in ("exact", "sketch"):
        raise ValueError(
            f"perplexity_buckets: thresholds must be 'exact' or 'sketch', got {thresholds!r}"
        )
    from pyspark.sql import Window

    scored = lm_perplexity(df, text_col, id_col)
    j = scored.join(df.select(F.col(id_col), F.col(lang_col)), id_col)
    if thresholds == "exact":
        w = Window.partitionBy(lang_col).orderBy(
            F.col("ppl").asc(), F.col(id_col).asc()
        )
        idx = F.ntile(n_buckets).over(w)
    else:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = j.groupBy(lang_col).agg(
            F.percentile_approx("ppl", qs, 10000).alias("__cuts")
        )
        j = j.join(F.broadcast(cuts), lang_col)
        # bucket = 1 + #cuts strictly below this ppl (upper-inclusive
        # buckets, matching NTILE's "boundary row stays low" side)
        idx = F.lit(1) + F.aggregate(
            F.col("__cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("ppl") > c, 1).otherwise(0),
        )
    if n_buckets == 3:
        bucket = (
            F.when(idx == 1, F.lit("head"))
            .when(idx == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        bucket = idx.cast("string")
    return j.select(
        F.col(id_col), F.col(lang_col), F.col("ppl"), bucket.alias("bucket")
    )


def kneser_ney_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram model BUILD (public: Kneser &
    Ney 1995; Chen & Goodman 1998's interpolated form; the smoothing
    KenLM implements — the filter-model CCNet trains on reference
    text and scores crawls with). This builds the model table IN the
    engine, so a pipeline can train its quality-filter LM and apply
    it (lm_perplexity's join shape) without leaving the cluster:

        p_KN(w|v) = max(c(v,w) - D, 0) / c(v)  +  lam(v) * p_cont(w)
        lam(v)    = D * N1+(v.) / c(v)
        p_cont(w) = N1+(.w) / N1+(..)

    where N1+ are continuation counts (distinct-context counts — the
    KN insight that 'Francisco' is frequent but follows only 'San').

    Determinism doctrine: D is the fixed rational 3/4, so every term
    is a SINGLE correctly-rounded divide of exact bigint counts —
    max(c-3/4, 0)/c(v) = (4c-3)/(4*c(v)) for observed bigrams (c>=1,
    so the max never binds), lam = (3*N1+(v.))/(4*c(v)), p_cont =
    N1+(.w)/N1+(..) — and the final fma-free `t1 + lam*pc` is one
    IEEE multiply + one add on identical doubles: bit-identical
    cross-engine, no rounding needed.

    Scale shape: one token explode (|tokens| rows), bigram + context
    + continuation aggregates (vocabulary-bounded, orders below the
    corpus), equi-joins on token keys, one 1-row N1+(..) broadcast
    (documented stat-join lint class). 100 TB: identical to
    lm_perplexity's cost class — token-key shuffles, vocab-sized
    model output, nothing corpus-quadratic.

    Output: (v, w, c_vw, prob, lambda_v, pcont_w) for every OBSERVED
    bigram; unseen-pair probability is lambda_v * pcont_w by the
    interpolation identity, so the table + the two factor columns
    evaluate ANY pair (the sum-to-1-per-context identity is pytest-
    pinned).

    ``order`` (r15 VERDICT task 5 — KenLM's standard filter model is
    a 5-gram): order >= 3 builds the full RECURSIVE interpolated-KN
    model (Chen & Goodman 1998 eq. 18ff) under the same exact-
    rational doctrine. Counts follow the KN prescription: the top
    level uses raw n-gram counts; every middle level k uses
    CONTINUATION counts N1+(. g) read off the raw (k+1)-gram table;
    the unigram level is p_cont. All discounts are the fixed rational
    D = 3/4, so every term stays one correctly-rounded divide of
    exact bigint products and the interpolation is a fixed tree of
    IEEE multiply/adds — bit-identical cross-engine with no rounding
    step anywhere (the divide/multiply/add-only doctrine; pow/exp
    never appear). Output for order >= 3: (w1..w{n}, c, prob,
    lambda_top, p_backoff) for every OBSERVED n-gram, where
    p_backoff is the (n-1)-level probability of w{n} given w2..w{n-1}
    — prob = t_n + lambda_top * p_backoff by construction, and
    unseen-context evaluation recurses exactly as in the bigram case.

    Scale shape for order n: ONE window-explode definition (each
    token position carries its next n-1 successors, null-padded at
    doc end); every level-k table is a prefix aggregate of that
    explode — n-1 token-keyed shuffles, model tables all vocabulary-
    bounded, nothing corpus-quadratic. Spark recomputes the explode
    per aggregate (lineage), trading n-1 scan passes for never
    materializing a token-scale intermediate.
    """
    from cubert_spark.datapipe.dedup import _spread

    if order < 2:
        raise ValueError(f"kneser_ney_lm: order must be >= 2, got {order}")
    if order > 2:
        return _kneser_ney_higher(df, text_col, id_col, order)

    base = _spread(df, id_col).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    bg_arr = base.select(
        F.expr(
            "CASE WHEN size(__w) >= 2 THEN "
            "transform(sequence(0, size(__w) - 2), "
            "i -> struct(__w[i] AS v, __w[i+1] AS w)) "
            "ELSE array() END"
        ).alias("__bg")
    )
    bg = (
        bg_arr.select(F.explode_outer("__bg").alias("b"))
        .filter(F.col("b").isNotNull())
        .select(F.col("b.v").alias("v"), F.col("b.w").alias("w"))
    )
    # observed-bigram counts feed three downstream aggregates —
    # checkpoint once so the corpus explode is not re-executed per
    # consumer (the components.py multi-consumer lineage rule)
    bgc = (
        bg.groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c_vw"))
        .transform(eager_checkpoint)
    )
    ctx = bgc.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"),
        F.count(F.lit(1)).alias("n1p_v"),  # N1+(v.)
    )
    cont = bgc.groupBy("w").agg(F.count(F.lit(1)).alias("n1p_w"))  # N1+(.w)
    nbi = F.broadcast(bgc.agg(F.count(F.lit(1)).alias("n_bi")))  # N1+(..)
    return (
        bgc.join(ctx, "v")
        .join(cont, "w")
        .crossJoin(nbi)
        .select(
            "v",
            "w",
            "c_vw",
            (
                (4 * F.col("c_vw") - 3).cast("double")
                / (4 * F.col("c_v")).cast("double")
                + (
                    (3 * F.col("n1p_v")).cast("double")
                    / (4 * F.col("c_v")).cast("double")
                )
                * (F.col("n1p_w").cast("double") / F.col("n_bi").cast("double"))
            ).alias("prob"),
            (
                (3 * F.col("n1p_v")).cast("double")
                / (4 * F.col("c_v")).cast("double")
            ).alias("lambda_v"),
            (F.col("n1p_w").cast("double") / F.col("n_bi").cast("double")).alias(
                "pcont_w"
            ),
        )
    )


def _kneser_ney_higher(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Order-n (n >= 3) recursive interpolated KN — see kneser_ney_lm's
    docstring for the math and the determinism argument. Level
    tables:

    - ``A_k`` (raw k-gram counts, k = 2..n): prefix aggregates of ONE
      null-padded window explode (position i carries w[i..i+n-1];
      try_element_at keeps ANSI mode happy at doc tails).
    - top level n: t_n = (4c-3)/(4*den_n), lam_n = 3*typ_n/(4*den_n)
      with den_n(h) = sum_w c(hw) (sum-to-1 normalization, the same
      choice as the bigram path), typ_n(h) = N1+(h.).
    - middle level k: continuation counts nc_k(g) = N1+(.g) = row
      count of A_{k+1} grouped by its k-suffix; den_k(h) = N1+(.h.),
      typ_k(h) = |{w : N1+(.hw) > 0}|.
    - unigram: p1(w) = N1+(.w)/N1+(..) off A_2 (== the bigram path's
      pcont_w).

    Every observed n-gram's k-suffix is an observed continuation at
    level k (the n-gram itself left-extends it), so the level joins
    below are never null-producing inner joins."""
    from cubert_spark.datapipe.dedup import _spread

    base = _spread(df, id_col).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    fields = ", ".join(
        f"try_element_at(__w, i + {j + 1}) AS g{j}" for j in range(n)
    )
    win = (
        base.select(
            F.expr(
                "CASE WHEN size(__w) >= 1 THEN "
                f"transform(sequence(0, size(__w) - 1), i -> "
                f"struct({fields})) ELSE array() END"
            ).alias("__win")
        )
        .select(F.explode_outer("__win").alias("b"))
        .filter(F.col("b").isNotNull())
        .select(*[F.col(f"b.g{j}").alias(f"g{j}") for j in range(n)])
    )

    # ONE corpus pass for ALL levels (r17): count the full null-padded
    # n-tuples once (tail-padded rows keep their null g-columns as
    # groupBy values), checkpoint that vocabulary-bounded table, and
    # read every raw k-gram table off it as a re-aggregation —
    # win.filter(g{k-1} NOT NULL).groupBy(g0..g{k-1}).count()
    # == padded.filter(g{k-1} NOT NULL).groupBy(g0..g{k-1}).sum(c),
    # because a position contributes to level k iff it has >= k
    # successors (nulls are tail padding only: g{k-1} present implies
    # the whole k-prefix is present). The r16 spelling checkpointed
    # each A_k separately, paying n-1 full token-explode passes; this
    # pays exactly one, and the A_k reaggregations run over the padded
    # table's checkpointed blocks (orders below the corpus).
    padded = (
        win.groupBy(*[f"g{j}" for j in range(n)])
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(eager_checkpoint)
    )

    def gram_counts(k: int) -> DataFrame:
        return (
            padded.filter(F.col(f"g{k - 1}").isNotNull())
            .groupBy(*[f"g{j}" for j in range(k)])
            .agg(F.sum("c").alias("c"))
        )

    a = {k: gram_counts(k) for k in range(2, n + 1)}

    top = a[n]
    ctx = top.groupBy(*[f"g{j}" for j in range(n - 1)]).agg(
        F.sum("c").alias("den_n"), F.count(F.lit(1)).alias("typ_n")
    )
    out = top.join(ctx, [f"g{j}" for j in range(n - 1)])

    # middle levels: continuation tables off the raw (k+1)-gram counts
    for k in range(2, n):
        sfx = [f"g{j}" for j in range(1, k + 1)]  # k-suffix of A_{k+1}
        ck = (
            a[k + 1]
            .groupBy(*[F.col(c).alias(f"m{k}_{i}") for i, c in enumerate(sfx)])
            .agg(F.count(F.lit(1)).alias(f"nc{k}"))
        )
        dk = ck.groupBy(
            *[F.col(f"m{k}_{i}").alias(f"d{k}_{i}") for i in range(k - 1)]
        ).agg(
            F.sum(f"nc{k}").alias(f"den{k}"),
            F.count(F.lit(1)).alias(f"typ{k}"),
        )
        ck = ck.join(
            dk,
            [
                ck[f"m{k}_{i}"] == dk[f"d{k}_{i}"]
                for i in range(k - 1)
            ],
        ).drop(*[f"d{k}_{i}" for i in range(k - 1)])
        # the top row's level-k gram is its tokens g{n-k}..g{n-1}
        out = out.join(
            ck,
            [
                out[f"g{n - k + i}"] == ck[f"m{k}_{i}"]
                for i in range(k)
            ],
        ).drop(*[f"m{k}_{i}" for i in range(k)])

    c1 = a[2].groupBy(F.col("g1").alias("m1_0")).agg(
        F.count(F.lit(1)).alias("nc1")
    )
    nb = F.broadcast(a[2].agg(F.count(F.lit(1)).alias("n_bi")))
    out = out.join(c1, out[f"g{n - 1}"] == c1["m1_0"]).drop("m1_0").crossJoin(
        nb
    )

    def _div(num, den):
        return num.cast("double") / den.cast("double")

    # bottom-up interpolation: identical expression TREE on both
    # engines -> identical correctly-rounded IEEE result
    p = _div(F.col("nc1"), F.col("n_bi"))
    for k in range(2, n):
        t_k = _div(4 * F.col(f"nc{k}") - 3, 4 * F.col(f"den{k}"))
        lam_k = _div(3 * F.col(f"typ{k}"), 4 * F.col(f"den{k}"))
        p = t_k + lam_k * p
    lam_top = _div(3 * F.col("typ_n"), 4 * F.col("den_n"))
    prob = _div(4 * F.col("c") - 3, 4 * F.col("den_n")) + lam_top * p
    return out.select(
        *[F.col(f"g{j}").alias(f"w{j + 1}") for j in range(n)],
        F.col("c"),
        prob.alias("prob"),
        lam_top.alias("lambda_top"),
        p.alias("p_backoff"),
    )
