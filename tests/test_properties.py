"""Property-based tests (hypothesis) — beyond the reference's
fixture-only strategy (SURVEY.md §5): generated inputs over the pure
frontends (schema grammar, .cmr expression translation, sampling
arithmetic), where thousands of examples run without a Spark job."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cubert_spark.schema import parse_schema, to_cubert_string
from cubert_spark.script.cmr import _Parser, tokenize

_IDENT = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True)
_SCALAR = st.sampled_from(
    ["BYTE", "BOOLEAN", "INT", "LONG", "FLOAT", "DOUBLE", "STRING", "BYTES"]
)


def _type_strategy(depth: int = 2):
    # Cubert nested-type grammar: ARRAY (T) / BAG (T) / MAP (T)
    if depth == 0:
        return _SCALAR
    inner = _type_strategy(depth - 1)
    return st.one_of(
        _SCALAR,
        inner.map(lambda t: f"ARRAY ({t})"),
        inner.map(lambda t: f"MAP ({t})"),
    )


@given(
    st.lists(
        st.tuples(_IDENT, _type_strategy()), min_size=1, max_size=6, unique_by=lambda x: x[0]
    )
)
@settings(max_examples=200, deadline=None)
def test_schema_string_roundtrip(fields):
    """parse(to_string(parse(s))) == parse(s) for generated Cubert
    schema strings — the frontend every LOAD goes through."""
    s = ", ".join(f"{t} {n}" for n, t in fields)
    st1 = parse_schema(s)
    assert [f.name for f in st1.fields] == [n for n, _ in fields]
    s2 = to_cubert_string(st1)
    assert parse_schema(s2) == st1


@given(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.sampled_from(["+", "-", "*", ">", ">=", "==", "!="]),
)
@settings(max_examples=200, deadline=None)
def test_expression_translation_arith(a, b, op):
    """Any integer comparison/arithmetic expression translates to SQL
    with == -> = and structure preserved."""
    p = _Parser(tokenize(f"{a} {op} {b};"))
    out = p.expression(stop=(";",))
    want_op = "=" if op == "==" else op
    # tokens survive: both operands and the translated operator appear
    assert str(abs(a)) in out and str(abs(b)) in out and want_op in out


@given(st.text(alphabet=st.characters(blacklist_characters='"\\', codec="ascii"), max_size=20))
@settings(max_examples=200, deadline=None)
def test_expression_string_literals_single_quoted(s):
    """Every double-quoted script literal becomes a valid SQL
    single-quoted literal (embedded quotes doubled)."""
    p = _Parser(tokenize(f'x == "{s}";'))
    out = p.expression(stop=(";",))
    m = re.search(r"x = '(.*)'$", out, re.DOTALL)
    assert m is not None
    assert m.group(1) == s.replace("'", "''")


@given(st.integers(min_value=0, max_value=65536), st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=500, deadline=None)
def test_sampling_cut_disjoint_exhaustive(h, frac):
    """The hash16 cut used by deterministic_sample / train_test_split
    partitions the hash space: every value is on exactly one side."""
    cut = int(frac * 65536)
    assert (h < cut) != (h >= cut)


@given(
    st.text(
        alphabet=st.characters(codec="ascii", blacklist_categories=("Cc",)),
        max_size=200,
    )
)
@settings(max_examples=300, deadline=None)
def test_cmr_parser_total(src):
    """The .cmr frontend is total over arbitrary input: it either
    parses or raises ScriptError — never an unclassified crash."""
    from cubert_spark.script.cmr import ScriptError, compile_script

    try:
        compile_script(src)
    except ScriptError:
        pass


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),        # group
            st.integers(0, 8),        # x
            st.integers(0, 8),        # y
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_skyline2d_matches_bruteforce_property(spark, rows):
    """skyline2d == quadratic domination filter on random small
    datasets (duplicates included — Hypothesis generates plenty)."""
    from cubert_spark.operators.skyline import skyline2d

    data = [(g, i, x, y) for i, (g, x, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "g int, rid long, x long, y long")
    got = sorted(r.rid for r in skyline2d(df, ["g"], "x", "y").collect())
    want = sorted(
        rid
        for g, rid, x, y in data
        if not any(
            g2 == g and x2 >= x and y2 >= y and (x2 > x or y2 > y)
            for g2, _r, x2, y2 in data
        )
    )
    assert got == want


@given(
    st.sets(st.integers(0, 400), min_size=1, max_size=120),
    st.sets(st.integers(0, 400), min_size=1, max_size=120),
)
@settings(max_examples=8, deadline=None)
def test_kmv_exact_regime_property(spark, sa, sb):
    """With k >= |A u B|, KMV set ops return EXACT union and
    intersection cardinalities for arbitrary overlapping sets."""
    from cubert_spark.datapipe.sketches import kmv_set_ops

    a = spark.createDataFrame([(v,) for v in sa], "k long")
    b = spark.createDataFrame([(v,) for v in sb], "k long")
    r = kmv_set_ops(a, "k", b, "k", k=1024).collect()[0]
    assert r.n == len(sa | sb)
    assert r.union_est == float(len(sa | sb))
    assert r.inter_k == len(sa & sb)
    assert r.inter_est == float(len(sa & sb))


@given(
    st.lists(
        st.lists(st.integers(0, 25), min_size=3, max_size=10),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=8, deadline=None)
def test_containment_pairs_matches_bruteforce_property(spark, docs):
    """containment_pairs == the quadratic set-containment filter on
    random small corpora (3-gram shingle sets over word tokens)."""
    from cubert_spark.datapipe.dedup import containment_pairs

    texts = [" ".join(f"w{t}" for t in d) for d in docs]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.6
    got = {
        (r.id_a, r.id_b): (r.inter, r.sz_a, r.sz_b)
        for r in containment_pairs(df, t).collect()
    }

    def sh(words):
        w = words.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()

    want = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            sa, sb = sh(texts[a]), sh(texts[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and (inter / len(sa) >= t or inter / len(sb) >= t):
                want[(a, b)] = (inter, len(sa), len(sb))
    assert got == want


@given(
    st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(0, 5)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_mode_by_group_matches_python_property(spark, rows):
    """The struct-max mode (ties to smallest value) equals the Python
    Counter model on random grouped data."""
    from collections import Counter

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "g string, v long")
    counts = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    best = counts.groupBy("g").agg(
        F.max(F.struct(F.col("cnt").alias("c"), (-F.col("v")).alias("nv"))).alias("b")
    )
    got = {r.g: (-r.b.nv, r.b.c) for r in best.collect()}
    want = {}
    for g in {g for g, _ in rows}:
        c = Counter(v for gg, v in rows if gg == g)
        m = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
        want[g] = m
    assert got == want
