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
        .localCheckpoint(eager=True)
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
