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


def test_bloom_empty_key_set(spark):
    """An empty dim set builds an empty bitmap and prunes EVERYTHING
    (no word rows to join) — the degenerate case stays correct."""
    from cubert_spark.operators.bloom import bloom_build, bloom_prune

    keys = spark.range(0).selectExpr("id AS k")
    big = spark.range(100).selectExpr("id AS k", "id AS p")
    bm = bloom_build(keys, "k")
    assert bm.count() == 0
    assert bloom_prune(big, "k", bm).count() == 0


def test_skyline_single_and_empty_groups(spark):
    """Single-row groups are their own frontier; empty input yields
    empty output with the input schema preserved."""
    from cubert_spark.operators.skyline import skyline2d

    one = spark.createDataFrame([("g", 1, 2, 3)], "g string, rid long, x long, y long")
    assert [r.rid for r in skyline2d(one, ["g"], "x", "y").collect()] == [1]
    empty = one.filter("rid < 0")
    out = skyline2d(empty, ["g"], "x", "y")
    assert out.count() == 0
    assert out.columns == ["g", "x", "rid", "y"] or set(out.columns) == {"g", "x", "rid", "y"}


def test_kmv_k1_and_identical_sets(spark):
    """k=1 degenerates sanely (n=1, jaccard from the single digest);
    identical sets give inter_est == union_est exactly when k covers."""
    from cubert_spark.datapipe.sketches import kmv_set_ops

    a = spark.range(0, 50).selectExpr("id AS k")
    r = kmv_set_ops(a, "k", a, "k", k=1024).collect()[0]
    assert r.n == 50 and r.inter_k == 50
    assert r.union_est == 50.0 and r.inter_est == 50.0
    r1 = kmv_set_ops(a, "k", a, "k", k=1).collect()[0]
    assert r1.n == 1 and r1.inter_k == 1


def test_containment_pairs_identical_and_disjoint(spark):
    """Identical docs give containment 1.0 both ways; shingle-disjoint
    docs produce no pair row at all."""
    from cubert_spark.datapipe.dedup import containment_pairs

    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),
        (3, "x y z w q r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.cont_ab, r.cont_ba)
           for r in containment_pairs(df, 0.5).collect()}
    assert got == {(1, 2): (1.0, 1.0)}


def test_scd2_single_event_user(spark):
    """A user with one change has one open-ended version."""
    from cubert_spark.queries.events import q_scd2_build  # noqa: F401  (shape via direct frame)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 6.0), (3, 20, 7.0)],
        "event_id long, user_id long, value double",
    ).withColumn("vf_us", F.col("event_id") * 1000)
    w = Window.partitionBy("user_id").orderBy("vf_us", "event_id")
    out = {r.event_id: r.vt_us for r in df.withColumn("vt_us", F.lead("vf_us").over(w)).collect()}
    assert out == {1: None, 2: 3000, 3: None}


def test_bfs_unreached_and_source_overlap(spark):
    """Sources at hop 0 even when also reachable later; disconnected
    vertices absent from the output."""
    from cubert_spark.datapipe.components import bfs_hops

    edges = spark.createDataFrame([(1, 2), (2, 3), (8, 9)], "src long, dst long")
    src = spark.createDataFrame([(2,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, src, max_hops=3).collect()}
    assert got == {2: 0, 1: 1, 3: 1}
