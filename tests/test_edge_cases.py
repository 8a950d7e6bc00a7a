"""Edge-case robustness: empty inputs, degenerate parameters —
operators must return correct empty/degenerate results, not crash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubert_spark.datapipe import curation, dedup, sampling, similarity, textstats
from cubert_spark.operators import group_by, grouping_combos, join, top_n


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_on_empty(empty_docs):
    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, 0.5).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs, 0.5).count() == 0


def test_textstats_on_empty_and_blank(spark, empty_docs):
    assert textstats.quality_features(empty_docs).count() == 0
    one = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = textstats.repetition_stats(one).collect()[0]
    assert row["dup_line_frac"] == 0.0 and row["top_bigram_frac"] == 0.0
    assert textstats.pii_counts(one).collect()[0]["n_emails"] == 0


def test_curation_on_empty_and_degenerate(spark, empty_docs):
    assert curation.contamination(empty_docs, empty_docs).count() == 0
    assert curation.remove_boilerplate(empty_docs).count() == 0
    assert curation.sequence_pack(empty_docs).count() == 0
    one = spark.createDataFrame([(1, "")], "doc_id long, text string")
    # empty text: one (empty) line kept, one whitespace token counted
    r = curation.remove_boilerplate(one).collect()[0]
    assert r["clean_text"] == "" and r["n_removed"] == 0
    p = curation.sequence_pack(one, capacity=8).collect()[0]
    assert p["start_offset"] == 0 and p["start_bin"] == 0 == p["end_bin"]
    # contamination against an empty train side never reports
    assert curation.contamination(empty_docs, one).count() == 0


def test_cosine_topk_k_exceeds_corpus(spark):
    vecs = [(i, [float(i), 1.0]) for i in range(3)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(df, df.filter("vec_id = 0"), k=10)
    # only 2 neighbors exist (self excluded)
    assert out.count() == 2


def test_sampling_extreme_fractions(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    assert sampling.deterministic_sample(df, "k", 0.0).count() == 0
    assert sampling.deterministic_sample(df, "k", 1.0).count() == 100
    tr, te = sampling.train_test_split(df, "k", 0.0)
    assert tr.count() == 100 and te.count() == 0


def test_group_by_empty_input(spark):
    e = spark.createDataFrame([], "k int, v int")
    assert group_by(e, ["k"], ("SUM", "v", "s")).count() == 0
    # GROUP BY ALL over empty input: one row of null/zero aggregates
    row = group_by(e, [], ("COUNT", "*", "n"), ("SUM", "v", "s")).collect()[0]
    assert row["n"] == 0 and row["s"] is None


def test_join_both_empty(spark):
    a = spark.createDataFrame([], "k int, x int")
    b = spark.createDataFrame([], "k int, y int")
    assert join(a, b, ["k"], "FULL OUTER").count() == 0


def test_topn_n_exceeds_group(spark):
    d = spark.createDataFrame([(1, 5), (1, 3)], "k int, v int")
    assert top_n(d, 10, ["k"], [F.col("v")]).count() == 2


def test_grouping_combos_zero(spark):
    d = spark.createDataFrame([("a", 1)], "g string, v int")
    out = grouping_combos(d, ["g"], 0, ("SUM", "v", "s"))
    # arity <= 0 means only the grand total
    assert out.count() == 1 and out.collect()[0]["s"] == 1


def test_connected_components_empty(spark):
    from cubert_spark.datapipe import components

    e = spark.createDataFrame([], "id_a long, id_b long")
    assert components.connected_components(e).count() == 0
