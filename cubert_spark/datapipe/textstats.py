"""Text analysis operators: tokenization, quality scoring, language
ID, fingerprinting. All pure pyspark.sql.functions (JVM codegen) — a
100 TB corpus pass stays whole-stage-compiled with zero Python cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from cubert_spark.checkpoints import lazy_checkpoint

#: Tiny per-language stopword lists for the n-gram/stopword language
#: heuristic. Deliberately minimal & deterministic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: runs of letters, digits, or single
    punctuation — the standard pre-tokenizer split, countable without a
    vocab. regexp-based, JVM-side."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punctuation and
    stopword ratios. Ratios are int/int double divisions — exact and
    engine-portable."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS["en"])))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    return (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn("n_punct", n_punct)
        .withColumn("punct_ratio", n_punct.cast("double") / F.length(t))
        .withColumn("stopword_ratio", stop_hits.cast("double") / n_tok)
        .withColumn(
            "mean_token_len",
            (F.length(t) - n_tok + 1).cast("double") / n_tok,
        )
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language heuristic: count per-language stopword
    hits, argmax with a fixed precedence (en > es > fr > und)."""
    toks = tokens(F.lower(F.col(text_col)))

    def _pred(ws):
        # single-arg lambda: F.filter dispatches on arity, a second
        # parameter would receive the element index
        return lambda w: w.isin(*ws)

    hits = {lang: F.size(F.filter(toks, _pred(ws))) for lang, ws in STOPWORDS.items()}
    pred = (
        F.when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0), "en")
        .when((hits["es"] >= hits["fr"]) & (hits["es"] > 0), "es")
        .when(hits["fr"] > 0, "fr")
        .otherwise("und")
    )
    return df.withColumn(out_col, pred)


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (empty when fewer than k words)."""
    w = F.split(text, " ")
    return F.when(
        F.size(w) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - k),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp", k: int = 4) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 over word
    k-gram shingles, suffixed with the token count. Stable across
    engines/runs (md5, not engine hash)."""
    sh = shingles(F.col(text_col), k)
    min_h = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.withColumn(
        out_col,
        F.concat_ws("-", F.coalesce(min_h, F.lit("empty")), token_count(F.col(text_col))),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals (pure
    expressions, zero Python):

    - ``dup_line_frac``   — fraction of lines that are duplicates of an
      earlier line (repetitive boilerplate / chat logs).
    - ``top_bigram_frac`` — fraction of word-bigram occurrences taken
      by the single most frequent bigram (looping text).

    The standard corpus-quality cuts (e.g. drop docs with
    dup_line_frac > 0.3) are then plain filters.
    """
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))

    toks = tokens(F.col(text_col))
    # bigram list: zip tokens with themselves shifted by one
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    n_bg = F.size(bigrams)
    # max occurrence count of any single bigram
    max_bg = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda g: F.size(F.filter(bigrams, lambda x: x == g)),
        )
    )
    top_bigram_frac = F.when(
        n_bg > 0, max_bg.cast("double") / n_bg
    ).otherwise(F.lit(0.0))
    return df.withColumn("dup_line_frac", dup_line_frac).withColumn(
        "top_bigram_frac", top_bigram_frac
    )


#: PII-ish patterns (redaction pre-screen): permissive by design — a
#: counting screen, not a validator.
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "n_ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document counts of email / phone / IPv4 lookalikes — the
    screening pass before a redaction or drop decision. Regex-only,
    JVM-side; at corpus scale this is a single scan."""
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            name, F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        )
    return out


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-support novelty score per document — the integer-exact
    cousin of an LM-perplexity quality filter (CCNet lineage): a
    document whose word bigrams barely occur elsewhere in the corpus
    is an outlier (novel, noisy, or misfiled); one whose bigrams are
    all corpus-common is boilerplate-ish. Because the signal is built
    from exact counts and one exact DECIMAL ratio (no logarithms), a
    SQL engine reproduces it bit-for-bit — unlike float perplexity,
    whose last-ulp log() differences break cross-engine checks.

    Output: (id, n_bigrams, n_unique_here, novelty) where
    n_unique_here counts the doc's distinct bigrams appearing in no
    OTHER document and novelty = n_unique_here / n_bigrams (an
    int/int double division — one IEEE operation, identically rounded
    in every engine; the same ratio discipline as quality_features).
    Docs with < 2 words report 0 bigrams and novelty 0.

    Scale shape: one explode scan -> distinct (doc, bigram) ->
    corpus doc-frequency groupBy -> equi-join back on the bigram ->
    per-doc agg. Every shuffle is on the bigram or the doc id.
    """
    from cubert_spark.datapipe.dedup import _spread

    w = F.split(F.col(text_col), " ")
    bigrams = F.when(
        F.size(w) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = _spread(df, id_col).select(F.col(id_col), bigrams.alias("__bg"))
    bg = base.select(
        F.col(id_col), F.explode_outer("__bg").alias("bigram")
    ).filter(F.col("bigram").isNotNull())
    docfreq = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        bg.join(docfreq.hint("merge"), "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique_here"),
        )
    )
    novelty = F.col("n_unique_here").cast("double") / F.col("n_bigrams").cast("double")
    # left join so bigram-less docs (fewer than 2 words) still report
    all_docs = df.select(F.col(id_col))
    return (
        all_docs.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("n_unique_here"), F.lit(0)).cast("bigint").alias("n_unique_here"),
            F.coalesce(novelty, F.lit(0.0)).alias("novelty"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf — the
    standard keyword-extraction / topic-labeling pass over a corpus.

    Terms are lowercase ``[a-z0-9]+`` runs. The idf factor is the raw
    rational N/df rather than log(N/df): the score is then a fixed
    composition of two IEEE-754 ops (a divide and a multiply), which
    both engines round identically, so the ranking — and the emitted
    score — replay bit-for-bit in the DuckDB oracle. (log-idf ranks
    differently and is a one-line swap where cross-engine bit-exact
    replay isn't required.)

    Output: (id, term, tf, df, score, rnk), rnk 1..k per document,
    ties broken by term.

    Scale shape: explode -> (id, term) count with map-side partial agg
    -> term-keyed doc-frequency agg -> equi-join back on the term ->
    per-doc top-k via row_number, which Spark plans as WindowGroupLimit
    (running top-k per partition — never materializes whole groups).
    The corpus size N joins in as a broadcast single-row aggregate, so
    the whole plan is one lazy DAG with no driver-side action.
    """
    from cubert_spark.datapipe.dedup import _spread

    from pyspark.sql import Window

    t = _spread(df, id_col).select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("term"),
    )
    tf = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("__n").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "score", F.col("rnk").cast("int").alias("rnk"))
    )


def hashed_weights(n_buckets: int, seed: int, scale: int = 50) -> list[int]:
    """Seeded integer weight vector for :func:`hashed_linear_score` —
    exposed so oracle SQL can fold the exact same weights in as
    literals. Integer (quantized) weights keep the margin exact in
    bigint arithmetic — no float accumulation order to worry about."""
    import random

    rng = random.Random(seed)
    return [rng.randint(-scale, scale) for _ in range(n_buckets)]


def hashed_linear_score(
    df: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "hls",
) -> DataFrame:
    """Linear text-classifier inference at corpus scale (the
    fasttext-style quality-classifier pattern): hashed bag-of-words
    features scored against an in-plan weight vector.

    Terms are lowercase ``[a-z0-9]+`` runs; each term maps to bucket
    ``hash16(salt||term) % len(weights)`` (md5 — engine-portable) and
    contributes its bucket's weight to the document margin. Weights
    are integers (a quantized classifier, the deployment norm), so
    the margin is an exact bigint sum — order-independent with no
    float discipline needed; the length-normalized score is one IEEE
    divide. Output: (id, n_terms, margin, score, pred).

    Scale shape: the entire inference is ONE JVM-side map stage —
    terms array -> in-array higher-order fold over bucket weights.
    Zero shuffles, zero Python, nothing materialized per term; the
    weight vector folds into the plan as a literal (fine for the
    hashed-feature sizes a linear classifier uses; a 10M-param model
    would broadcast-join a weight table instead).

    This engine ships the inference mechanism with seeded placeholder
    weights (:func:`hashed_weights`); a production pipeline supplies
    weights from its trained classifier.
    """
    n = len(weights)
    warr = F.array(*[F.lit(int(w)).cast("bigint") for w in weights])

    def bucket(term: Column) -> Column:
        h = F.md5(F.concat(F.lit(salt), term))
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n

    terms = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    margin = F.aggregate(
        terms,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(warr, bucket(t) + 1),
    )
    out = df.select(
        F.col(id_col),
        F.size(terms).alias("n_terms"),
        margin.alias("margin"),
    )
    return out.select(
        id_col,
        "n_terms",
        "margin",
        F.when(F.col("n_terms") > 0,
               F.col("margin").cast("double") / F.col("n_terms").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("score"),
        (F.col("margin") >= 0).alias("pred"),
    )


def hashed_bow_embedding(
    df: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "hbe",
) -> DataFrame:
    """Feature-hashing document embedder (Weinberger et al. 2009, the
    'hashing trick'): lowercase ``[a-z0-9]+`` terms hash into ``dim``
    buckets (md5 — engine-portable), bucket counts L2-normalize into a
    dense unit vector. The deterministic baseline featurizer that
    makes the engine's chunk -> embed -> ANN pipeline runnable without
    any model artifact; swap in real model embeddings column-for-
    column when available.

    Output: (id, vec array<double>, n_terms). Exactness: counts are
    integers, the squared norm is an exact bigint fold, sqrt/divide
    are correctly-rounded IEEE — vectors replay bit-for-bit in the
    oracle. Documents with no terms embed as the zero vector.

    Scale shape: one JVM map stage — md5 once per term, then an
    O(dim x terms) in-array bucket count; zero shuffles.
    """
    terms = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )

    def bucket(t: Column) -> Column:
        h = F.md5(F.concat(F.lit(salt), t))
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % dim

    from cubert_spark.datapipe.dedup import _spread

    # materialize the bucket array in its own projection so the md5s
    # run once per term (CollapseProject keeps the multiply-referenced
    # alias — the same trap catalogued for the ngram explode); _spread
    # parallelizes the per-doc md5+count work when the scan has fewer
    # splits than cores (no-op at real scale)
    base = _spread(df, id_col).select(
        F.col(id_col),
        F.transform(terms, bucket).alias("__b"),
        F.size(terms).alias("n_terms"),
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.size(F.filter(F.col("__b"), lambda b: b == j)).cast("bigint"),
    )
    ss = F.aggregate(counts, F.lit(0).cast("bigint"), lambda a, c: a + c * c)
    norm = F.sqrt(ss.cast("double"))
    vec = F.when(
        ss > 0, F.transform(counts, lambda c: c.cast("double") / norm)
    ).otherwise(F.transform(counts, lambda c: F.lit(0.0)))
    return base.select(id_col, vec.alias("vec"), "n_terms")


def bm25_search(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical top-``k`` retrieval by Okapi BM25 (k1=1.2, b=0.75) —
    the classic ranked keyword search over a corpus, completing the
    engine's retrieval surface next to the embedding ANN paths.

    ``queries`` is a small literal list of (query_id, query_text);
    terms are the same lowercase ``[a-z0-9]+`` runs as tfidf.

    Exactness doctrine (cross-engine bit replay):

    - idf uses the rational (N+1)/(df+0.5) = 2(N+1)/(2df+1) — no log,
      same move as ``tfidf_top_terms``.
    - Each per-term score is ONE IEEE divide of two exactly-computed
      bigints: clearing the k1/b decimals and avgdl=T/N gives
      score_t = 44*tf*T*(N+1) / ((10*T*tf + 3*T + 9*dl*N)*(2*df+1)),
      integer-exact below 2^53 at test SFs (at production scale swap
      the bigint clearing for the direct double composition — the
      ranking is what matters there, not oracle replay).
    - The per-doc score is a term-ORDER-FIXED float fold: scores
      collect into an array sorted by term and fold left from 0.0.
      Float addition is deterministic given order, so the sum (not
      just the ranking) replays bit-for-bit in DuckDB via
      ``list_reduce(list(s ORDER BY term), (a,b) -> a+b)``.

    Output: (query_id, doc_id, n_hit, score, rnk), rnk 1..k per query,
    ties broken by doc_id.

    Scale shape: the corpus-side explode/aggs are the tfidf plan; the
    query set broadcasts to prune the (doc, term) table down to query
    terms BEFORE any further join, so everything after the prune is
    candidate-sized. df and dl join back by term/id equi-joins; corpus
    stats (N, T) enter as a broadcast single-row aggregate; final
    top-k plans as WindowGroupLimit.
    """
    from pyspark.sql import Window

    from cubert_spark.datapipe.dedup import _spread

    spark = df.sparkSession
    qrows = sorted(
        {
            (int(qid), term)
            for qid, qtext in queries
            for term in set(__import__("re").findall(r"[a-z0-9]+", qtext.lower()))
        }
    )
    qterms = spark.createDataFrame(qrows, "query_id int, term string")
    qterm_list = sorted({term for _, term in qrows})

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    base = _spread(df, id_col)
    # r16 restructure. The old spelling built the FULL corpus
    # (doc, term) tf table and evaluated it four ways (hits, dfreq,
    # dl, stats->dl) — four tokenizer passes and three corpus-wide
    # shuffles for quantities the query set mostly doesn't need:
    # - dl == the doc's total token count (sum over terms of tf), an
    #   in-row size() of the token array that rides THROUGH the
    #   pruned explode (the ngram_jaccard carry-|doc| move) — the
    #   per-doc dl join vanishes entirely
    # - the exploded tokens prune IN-ROW to the literal query-term
    #   set before any aggregation (guide §3.2: reduce before the
    #   exchange), so the only token shuffle is candidate-sized
    # - df for the query terms comes from the pruned tf (identical
    #   values: df counts docs containing the term)
    # - corpus stats (N, T) are one separate scan folding size(toks)
    #   in-row — a 1-row aggregate, no shuffle
    # Three tokenizer passes in the static plan (stats + one per tf
    # consumer: dfreq and hits each evaluate the pruned explode; AQE
    # exchange reuse collapses the identical tf exchanges at runtime)
    # versus four full passes + three corpus-wide (doc, term)
    # shuffles before. Lazy-checkpointing tf to dedupe the pass was
    # A/B'd and REVERTED (2.0 -> 2.5 s at sf0.1: the materialization
    # barrier costs more than the candidate-sized recompute).
    stats = (
        base.select(F.size(toks).cast("bigint").alias("dl"))
        .filter(F.col("dl") > 0)
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("dl").alias("__t"))
    )

    # both catalogued Generate traps apply (see ngram_jaccard_pairs):
    # the token array is aliased in its own projection so the regexp
    # runs once per doc (not once in the project and once in the
    # Generate), and explode_outer + a null post-filter keeps
    # InferFiltersFromGenerate from duplicating the array build
    t = (
        base.select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").cast("bigint").alias("dl"),
            F.explode_outer(
                F.filter(F.col("__toks"), lambda x: x.isin(qterm_list))
            ).alias("term"),
        )
        .filter(F.col("term").isNotNull())
    )
    # candidate-sized; feeds both dfreq and hits
    tf = t.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
    )
    num = F.lit(44) * F.col("tf") * F.col("__t") * (F.col("__n") + 1)
    den = (
        F.lit(10) * F.col("__t") * F.col("tf")
        + F.lit(3) * F.col("__t")
        + F.lit(9) * F.col("dl") * F.col("__n")
    ) * (F.lit(2) * F.col("df") + 1)
    scored = hits.select(
        "query_id", id_col, "term", (num.cast("double") / den.cast("double")).alias("s")
    )
    agg = scored.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "n_hit", "score", "rnk")
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compressibility per document — the classic cheap
    redundancy signal (Gopher-lineage quality filtering, public):
    highly repetitive machine-generated text compresses far better
    than natural prose, so a very LOW ratio flags boilerplate/spam and
    a ratio near 1 flags high-entropy noise.

    Arrow-batched ``mapInPandas`` (the Python work is one C zlib call
    per doc — no row-at-a-time UDF); a FIXED level makes the output
    bytes, lengths, and ratio deterministic for a given zlib build
    (pytest model-checks exact equality against the Python reference;
    no DuckDB oracle — SQL engines have no zlib, so the driver records
    the rows-only check).

    Output: (id, raw_len, comp_len, ratio = comp_len/raw_len; ratio
    NULL for empty docs)."""
    import pandas as pd

    out_schema = f"{id_col} long, raw_len int, comp_len int, ratio double"

    def kernel(batches):
        import zlib

        for pdf in batches:
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf[text_col]]
            rl = [len(b) for b in raw]
            cl = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_len": rl,
                    "comp_len": cl,
                    "ratio": [c / r if r else None for c, r in zip(cl, rl)],
                }
            )

    from cubert_spark.datapipe.dedup import _spread

    return _spread(df.select(id_col, text_col), id_col).mapInPandas(
        kernel, out_schema
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over a positional inverted index — the
    position-aware retrieval step BM25 (bag-of-words) cannot do.
    Each document explodes to (id, word, pos); the i-th phrase word
    must appear at pos = start + i, so the phrase is an i-fold
    equi-join on (id, pos offset) — at scale each join keys on the
    (word-filtered) posting lists, never a scan per phrase word.
    Output: (id, n_matches) per matching doc, match count = distinct
    start positions.

    Word tokenization = split on single space (the corpus convention
    shared with shingles/token_count)."""
    words = phrase.split(" ")
    if not words:
        raise ValueError("empty phrase")
    from cubert_spark.datapipe.dedup import _spread

    base = _spread(df, id_col).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    pos = base.select(
        F.col(id_col), F.posexplode_outer("__w").alias("pos", "w")
    ).filter(F.col("w").isNotNull())
    # filter to the phrase's vocabulary FIRST: posting lists for the
    # phrase words only (pushdown-friendly IN-filter)
    out = (
        pos.filter(F.col("w") == words[0])
        .select(F.col(id_col), F.col("pos").alias("start"))
    )
    for i, wd in enumerate(words[1:], start=1):
        nxt = pos.filter(F.col("w") == wd).select(
            F.col(id_col), (F.col("pos") - i).alias("start")
        )
        out = out.join(nxt, [id_col, "start"])
    return out.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matches"))


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top collocations by PMI over adjacent word pairs (bigrams) —
    the classic corpus-statistics op (Church & Hanks 1990, public).
    Log-free determinism: PMI = log(p_xy/(p_x p_y)) is MONOTONE in
    the lift ratio n_xy*N/(n_x*n_y), so the ranking orders by the
    exact-DECIMAL lift and never evaluates a logarithm — consumers
    take the log if they want nats. Counts are token occurrences
    (unigram N = total tokens, bigram count over adjacent pairs).

    One explode + two keyed aggs + two broadcast-sized joins
    (vocabulary aggregates); the 20-row post-limit rank is the same
    documented pattern as heavy_hitters/top_paths."""
    from pyspark.sql import Window

    from cubert_spark.datapipe.dedup import _spread

    base = _spread(df, id_col).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    uni = (
        base.select(F.explode_outer("__w").alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = uni.agg(F.sum("n").alias("N"))
    # sequence(0, -1) runs DESCENDING in Spark (the catalogued
    # fuzzy_pairs guard): short docs must short-circuit to no bigrams
    bg_arr = base.select(
        F.expr(
            "CASE WHEN size(__w) >= 2 THEN "
            "transform(sequence(0, size(__w) - 2), "
            "i -> struct(__w[i] AS x, __w[i+1] AS y)) "
            "ELSE array() END"
        ).alias("__bg")
    )
    big = (
        bg_arr.select(F.explode_outer("__bg").alias("b"))
        .filter(F.col("b").isNotNull())
        .select("b.x", "b.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    nx = uni.select(F.col("w").alias("x"), F.col("n").alias("n_x"))
    ny = uni.select(F.col("w").alias("y"), F.col("n").alias("n_y"))
    # lift through ONE IEEE divide of exact bigint products (decimal
    # division scales differ BETWEEN engines — Spark truncates the
    # quotient to its result scale, DuckDB to another; bigint cross
    # products are exact in both and the single divide is identical)
    lift = (F.col("n_xy") * F.col("N")).cast("double") / (
        F.col("n_x") * F.col("n_y")
    ).cast("double")
    scored = (
        big.join(F.broadcast(nx), "x")
        .join(F.broadcast(ny), "y")
        .crossJoin(F.broadcast(total))
        .withColumn("lift", lift)
    )
    w = Window.orderBy(F.desc("lift"), "x", "y")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= top_k)
        .select("x", "y", "n_xy", "n_x", "n_y", "lift", "rnk")
    )


#: redaction placeholders, applied in this chain order (deterministic
#: in both engines — each step operates on the previous step's output)
PII_REDACTIONS = (
    ("n_emails", "<EMAIL>"),
    ("n_phones", "<PHONE>"),
    ("n_ipv4", "<IP>"),
)


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """REDACTION companion to :func:`pii_counts` (the NeMo-Curator /
    Dolma-style PII scrub, public toolchain lineage): mask email /
    phone / IPv4 lookalikes with typed placeholders. Pure codegen
    regexp_replace chain — one scan, zero shuffle; the patterns are
    exactly PII_PATTERNS (already proven engine-portable by the
    pii_counts oracle row). Output: (id, redacted, n_redacted) with
    the count taken on the ORIGINAL text."""
    red = F.col(text_col)
    for key, token in PII_REDACTIONS:
        red = F.regexp_replace(red, PII_PATTERNS[key], token)
    n = None
    for key, _ in PII_REDACTIONS:
        c = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS[key]), F.lit(0))
        )
        n = c if n is None else (n + c)
    return df.select(
        F.col(id_col),
        red.alias("redacted"),
        n.cast("bigint").alias("n_redacted"),
    )


#: The Gopher rule set's required stop words (Rae et al. 2021,
#: Appendix A.1.1: a document must contain at least 2 of these).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality-filter rule set (public: Rae et al. 2021,
    Appendix A.1.1 — the document-level heuristics most later corpora
    kept: MassiveWeb, RefinedWeb §3.1.2, FineWeb). Emits every rule as
    its own boolean plus the conjunction, for ALL documents — filter
    on ``keep`` or inspect per-rule pass rates to tune a corpus.

    Rules (thresholds per the paper):
    - word count in [min_words, max_words]
    - mean word length in [3, 10] characters
    - >= 80% of words contain at least one alphabetic character
    - contains >= 2 of the 8 required stop words
    - <= 30% of lines end with an ellipsis
    - < 90% of lines start with a bullet character
    - symbol-to-word ratio (# or ...) < 0.1

    Determinism: every ratio threshold is spelled as an INTEGER
    cross-multiplication (e.g. ``10 * n_sym < n_words`` instead of
    ``n_sym / n_words < 0.1``) — no float is ever computed, so the
    flags replay bit-for-bit in any engine. Null text yields
    all-false flags on both engines (COALESCE at the rule level).

    Scale shape: one codegen projection over the scan — zero
    shuffles, zero UDFs; the filter rides the parquet read at any
    corpus size.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
    )
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    lower_toks = F.transform(toks, lambda w: F.lower(w))
    stop_present = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lower_toks, s),
        )
    )
    n_sym = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), F.lit(0)))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    ell_lines = F.size(F.filter(lines, lambda line: line.endswith("...")))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda line: line.startswith("-")
            | line.startswith("*")
            | line.startswith("•"),
        )
    )

    def rule(c):
        return F.coalesce(c, F.lit(False))

    r_wc = rule((n >= min_words) & (n <= max_words))
    r_mwl = rule((sum_len >= 3 * n) & (sum_len <= 10 * n))
    r_alpha = rule(5 * alpha_words >= 4 * n)
    r_stop = rule(stop_present >= 2)
    r_ell = rule(10 * ell_lines <= 3 * n_lines)
    r_bullet = rule(10 * bullet_lines < 9 * n_lines)
    r_sym = rule(10 * n_sym < n)
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_words"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_alpha.alias("r_alpha_frac"),
        r_stop.alias("r_stopwords"),
        r_ell.alias("r_ellipsis_lines"),
        r_bullet.alias("r_bullet_lines"),
        r_sym.alias("r_symbol_ratio"),
        (r_wc & r_mwl & r_alpha & r_stop & r_ell & r_bullet & r_sym).alias(
            "keep"
        ),
    )


# C4 line-terminal punctuation marks (Raffel et al. 2020 §2.2: "only
# retained lines that ended in a terminal punctuation mark (i.e. a
# period, exclamation mark, question mark, or end quotation mark)")
C4_TERMINALS = (".", "!", "?", '"')


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning heuristics (public: Raffel et al. 2020 §2.2 —
    the web-corpus filter T5 trained on; kept by mC4, FLAN, Dolma's
    C4 subset). Line-level rules prune the page; page-level rules
    flag it. Emits every signal for ALL documents — filter on
    ``keep`` or inspect per-rule rates to tune a corpus.

    A line SURVIVES iff all of:
    - it ends with a terminal punctuation mark (``. ! ? "``)
    - it has >= ``min_words_per_line`` whitespace-separated words
    - it does not contain the word "javascript" (any case)

    A page is KEPT iff all of:
    - the lowercased page does not contain "lorem ipsum"
    - the page does not contain a curly brace ``{``
    - the cleaned page has >= ``min_sentences`` sentences (sentence
      := one ``[.!?]`` occurrence in the surviving text — C4 counts
      sentences post-cleaning)
    - at least one line survived

    C4's final rule (the bad-words screen) is the separate
    ``curation.blocklist_filter`` operator and composes after this.

    Determinism: pure string predicates and integer counts — no
    float is ever computed, so the flags and the reassembled
    ``clean_text`` replay bit-for-bit in any engine. Null text
    yields all-false flags and an empty clean_text on both engines.

    Scale shape (100 TB): one codegen projection over the scan —
    zero shuffles, zero UDFs, rides the parquet read at any corpus
    size (the same posture as ``gopher_rules``).
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def survives(line: Column) -> Column:
        s = F.trim(line)
        ends = s.endswith(C4_TERMINALS[0])
        for mark in C4_TERMINALS[1:]:
            ends = ends | s.endswith(mark)
        n_words = F.size(F.split(s, " +"))
        no_js = ~F.contains(F.lower(s), F.lit("javascript"))
        return ends & (n_words >= min_words_per_line) & no_js

    kept = F.filter(lines, survives)
    clean = F.coalesce(F.array_join(kept, "\n"), F.lit(""))
    n_lines = F.coalesce(F.size(lines), F.lit(0))
    n_kept = F.coalesce(F.size(kept), F.lit(0))
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), F.lit(0)))
    has_lorem = F.coalesce(
        F.contains(F.lower(t), F.lit("lorem ipsum")), F.lit(False)
    )
    has_brace = F.coalesce(F.contains(t, F.lit("{")), F.lit(False))
    keep = (
        ~has_lorem
        & ~has_brace
        & (n_sent >= min_sentences)
        & (n_kept >= 1)
    )
    return df.select(
        F.col(id_col),
        n_lines.cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        n_sent.cast("int").alias("n_sentences"),
        clean.alias("clean_text"),
        keep.alias("keep"),
    )


#: Gopher A.1.2 keep-thresholds in percent: signal <= T% of the
#: char/line mass (Rae et al. 2021, Table A1)
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_ppm": 30, "dup_para_ppm": 30,
    "dup_line_char_ppm": 20, "dup_para_char_ppm": 20,
    "top2_char_ppm": 20, "top3_char_ppm": 18, "top4_char_ppm": 16,
    "dup5_char_ppm": 15, "dup6_char_ppm": 14, "dup7_char_ppm": 13,
    "dup8_char_ppm": 12, "dup9_char_ppm": 11, "dup10_char_ppm": 10,
}


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The FULL Gopher within-document repetition rule set (public:
    Rae et al. 2021, Appendix A.1.2 Table A1 — the 13 signals kept by
    MassiveWeb, RefinedWeb and FineWeb): duplicate line / paragraph
    fractions (by count and by character mass), top-{2,3,4}-gram
    character fractions, and duplicate-{5..10}-gram character
    coverage. ``repetition_stats`` is the 2-signal in-array sketch;
    this is the complete set in the DISTRIBUTED spelling.

    Conventions (documented because the paper leaves them open):
    - a duplicate line/paragraph is every occurrence AFTER the first
      of an identical unit (so frac = (n - n_distinct) / n); units
      are trimmed-non-empty segments of '\\n' / '\\n\\n' splits
    - character mass is the sum of TOKEN lengths (whitespace
      excluded); the top-n-gram numerator is count * token-chars of
      the gram, ties broken to the lexicographically smallest gram
    - duplicate-n-gram coverage marks every token POSITION inside
      any occurrence of an n-gram seen more than once, without
      double counting overlaps, and weighs positions by token length
    All signals are floor-ppm integers (x * 1e6 // mass) and every
    keep-threshold is the integer cross-multiplication
    ``100 * x <= T * mass`` — no float anywhere, so the flags replay
    bit-for-bit in any engine. Empty/null docs pass every rule
    (nothing is repeated).

    Scale shape (100 TB): every signal is PER-DOCUMENT (each former
    groupBy key set included the doc id), so the whole rule set is one
    zero-shuffle projection over the scan (r17): per n, the doc's
    grams are array_sort'ed and counted by sorted-run folds —
    O(L log L) per doc, NOT the quadratic in-array scan of
    ``repetition_stats``'s top_bigram_frac (count-per-gram via a
    nested filter), which is why the r13 spelling went distributed.
    The r13-r16 distributed spelling exploded to (doc, n, pos, gram)
    — ~9x token count — and moved the gram STRINGS through keyed
    shuffles (gram counts, duplicated-occurrence re-join, distinct
    covered positions, token-length join, per-doc fold: ~45x token
    mass of shuffle payload for the n>=5 branch alone, the suite's
    heaviest shuffle). Exact string equality on sorted runs replaces
    every one of those exchanges with in-row folds; results are
    bit-identical by construction (no hashing anywhere, unlike the
    rejected xxhash64-gram design).
    """
    from cubert_spark.datapipe.dedup import _spread

    t = F.col(text_col)
    toks = F.split(t, r"\s+")

    def let(val: Column, fn) -> Column:
        # single-evaluation binding: fn's argument is a bound lambda
        # VALUE, so k references cost one evaluation (Spark
        # expressions are trees, not DAGs, and higher-order functions
        # run interpreted with no codegen subexpression elimination —
        # see the in-row note below)
        return F.transform(F.array(val), fn).getItem(0)

    def seg_struct(sep: str) -> Column:
        # the split + trim-filter and its array_distinct each bind
        # once; the old per-column spelling re-ran them 4-6x per row
        def with_units(units: Column) -> Column:
            def with_distinct(du: Column) -> Column:
                z = F.lit(0).cast("bigint")
                return F.struct(
                    F.coalesce(F.size(units), F.lit(0))
                    .cast("bigint")
                    .alias("n"),
                    F.coalesce(F.size(du), F.lit(0))
                    .cast("bigint")
                    .alias("nd"),
                    F.coalesce(
                        F.aggregate(
                            units, z, lambda a, x: a + F.length(x)
                        ),
                        z,
                    ).alias("c"),
                    F.coalesce(
                        F.aggregate(du, z, lambda a, x: a + F.length(x)),
                        z,
                    ).alias("dc"),
                )

            return let(F.array_distinct(units), with_distinct)

        return let(
            F.filter(F.split(t, sep), lambda x: F.trim(x) != F.lit("")),
            with_units,
        )

    base = _spread(df, id_col).select(
        F.col(id_col),
        seg_struct("\n").alias("__ls"),
        seg_struct("\n\n").alias("__ps"),
        toks.alias("__toks"),
    )
    # (no checkpoint: since the r17 in-row rewrite below, base has a
    # single consumer — the one staged projection chain)

    # --- in-row n-gram signals (r17) -----------------------------------
    # Every n-gram signal is per-document (each former groupBy key set
    # included the doc id), so gram counting never needs to leave the
    # row: sort the doc's grams (exact strings — nothing hashed) and
    # read counts off the sorted runs. O(L log L) per doc — NOT the
    # quadratic in-array scan repetition_stats uses. Two evaluation
    # disciplines shape the spelling (higher-order functions are
    # CodegenFallback: interpreted, no codegen subexpression
    # elimination, so Spark expression TREES re-evaluate every
    # repeated subexpression):
    # 1. reused intermediates bind ONCE via the let idiom
    #    transform(array(v), x -> body)[0] — x is a bound lambda
    #    VALUE, so k references cost one evaluation (a naive tree
    #    spelling re-sorted each gram array ~5-8x: 8.9 s vs the
    #    4.45 s distributed baseline at sf0.1);
    # 2. the nine gram levels build INCREMENTALLY in one fold (level
    #    n = level n-1 zip'd with the n-shifted token array, one
    #    binary space-concat per gram — identical strings to
    #    concat_ws over the token slice because space-joining is
    #    associative), which is ~n x fewer interpreted element ops
    #    than per-gram slice+concat_ws, in ONE projection column —
    #    chained per-level withColumns measured 2.4 s of per-run
    #    DRIVER analysis (15+ eager re-analyses of a growing lambda-
    #    heavy tree); the fold keeps construction at ~0.1 s.
    tok = F.col("__toks")
    # size() on a bound attribute is O(1); referencing the expression
    # repeatedly inside the level guards costs nothing material
    nt = F.coalesce(F.size(tok), F.lit(0))
    zero = F.lit(0).cast("bigint")

    ls, ps = F.col("__ls"), F.col("__ps")
    carry_exprs = [
        F.col(id_col),
        (ls["n"] - ls["nd"]).alias("__dl"), ls["n"].alias("__nl"),
        (ls["c"] - ls["dc"]).alias("__dlc"), ls["c"].alias("__cl"),
        (ps["n"] - ps["nd"]).alias("__dp"), ps["n"].alias("__np"),
        (ps["c"] - ps["dc"]).alias("__dpc"), ps["c"].alias("__cp"),
        # token mass folds in-row over the token array (bigint adds
        # are associative-exact): no explode, no shuffle, no join
        F.coalesce(
            F.aggregate(tok, zero, lambda a, x: a + F.length(x)), zero
        ).alias("__mass"),
    ]
    carry = [
        F.col(id_col),
        "__dl", "__nl", "__dlc", "__cl",
        "__dp", "__np", "__dpc", "__cp",
        "__mass",
    ]

    # __lv = [grams(2), ..., grams(10)] — levels 2..10, each gram
    # array built exactly once, all in one column
    def next_level(cur: Column, n: Column) -> Column:
        return F.when(
            nt >= n,
            F.zip_with(
                F.slice(cur, 1, nt - n + 1),
                F.slice(tok, n, nt - n + 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))

    levels = F.aggregate(
        F.sequence(F.lit(2), F.lit(10)),
        F.struct(
            tok.alias("cur"),
            F.array().cast("array<array<string>>").alias("out"),
        ),
        lambda acc, n: let(
            next_level(acc["cur"], n),
            lambda nx: F.struct(
                nx.alias("cur"),
                F.concat(acc["out"], F.array(nx)).alias("out"),
            ),
        ),
        lambda acc: acc["out"],
    )
    staged = base.select(*carry_exprs, "__toks", levels.alias("__lv"))
    lv = F.col("__lv")

    def top_numer(n: int) -> Column:
        # winner = (max count, ties to the lexicographically smallest
        # gram), numer = cnt * token-chars — identical to the old
        # min(struct(-cnt, gram, numer)) agg. One ascending sorted
        # pass: a run's length exceeds the best only strictly, so an
        # equal-count later (= lexicographically larger) gram never
        # displaces the first. Grams are never '' (n >= 2 always has
        # a separator), so the '' init sentinel cannot match a gram.
        init = F.struct(
            F.lit("").alias("pg"), zero.alias("run"),
            zero.alias("bc"), F.lit("").alias("bg"),
        )

        def step(acc: Column, g: Column) -> Column:
            run2 = F.when(g == acc["pg"], acc["run"] + 1).otherwise(
                F.lit(1).cast("bigint")
            )
            better = run2 > acc["bc"]
            return F.struct(
                g.alias("pg"),
                run2.alias("run"),
                F.when(better, run2).otherwise(acc["bc"]).alias("bc"),
                F.when(better, g).otherwise(acc["bg"]).alias("bg"),
            )

        # empty gram array -> bc=0, bg='' -> numer 0 (the old left
        # join produced null there; the final coalesce made it 0)
        return F.aggregate(
            F.array_sort(lv.getItem(n - 2)),
            init,
            step,
            lambda acc: acc["bc"]
            * (F.length(acc["bg"]).cast("bigint") - F.lit(n - 1)),
        )

    def dup_chars(n: int) -> Column:
        # duplicate-coverage: token positions inside any
        # >=2-occurrence n-gram, deduped (array_distinct == the old
        # (id, n, p).distinct()), each weighted by its token's length
        # (the old toklens join, now an element_at into the row's own
        # array). An entry of the (g, p)-sorted array is duplicated
        # iff a neighbor shares its gram — exact string equality.
        def with_srt(srt: Column) -> Column:
            sz = F.size(srt)

            def with_nxt(nxt: Column) -> Column:
                # nxt[i] = (srt[i].g == srt[i+1].g); zip_with pads
                # the sliced copy with null -> coalesce(.., false)
                prv = F.concat(
                    F.array(F.lit(False)), F.slice(nxt, 1, sz - 1)
                )
                dup_pos = F.filter(
                    F.zip_with(
                        srt,
                        F.zip_with(nxt, prv, lambda x, y: x | y),
                        lambda e, f: F.when(f, e["p"]).otherwise(-1),
                    ),
                    lambda p: p >= 0,
                )
                covered = F.array_distinct(
                    F.flatten(
                        F.transform(
                            dup_pos, lambda p: F.sequence(p, p + n - 1)
                        )
                    )
                )
                return F.aggregate(
                    covered,
                    zero,
                    lambda a, p: a
                    + F.length(F.element_at(tok, p + 1)).cast("bigint"),
                )

            body = let(
                F.zip_with(
                    srt,
                    F.slice(srt, 2, sz),
                    lambda a, b: F.coalesce(a["g"] == b["g"], F.lit(False)),
                ),
                with_nxt,
            )
            # sz < 2 can hold no duplicate; the guard also keeps the
            # slice/zip tail arithmetic off empty arrays
            return F.when(sz >= 2, body).otherwise(zero)

        return let(
            F.array_sort(
                F.transform(
                    lv.getItem(n - 2),
                    lambda x, i: F.struct(
                        x.alias("g"), i.cast("int").alias("p")
                    ),
                )
            ),
            with_srt,
        )

    out = staged.select(
        *carry,
        *[top_numer(n).alias(f"__top{n}") for n in (2, 3, 4)],
        *[dup_chars(n).alias(f"__dup{n}") for n in range(5, 11)],
    )

    sig = [
        ("dup_line_ppm", "__dl", "__nl"),
        ("dup_para_ppm", "__dp", "__np"),
        ("dup_line_char_ppm", "__dlc", "__cl"),
        ("dup_para_char_ppm", "__dpc", "__cp"),
        ("top2_char_ppm", "__top2", "__mass"),
        ("top3_char_ppm", "__top3", "__mass"),
        ("top4_char_ppm", "__top4", "__mass"),
    ] + [(f"dup{n}_char_ppm", f"__dup{n}", "__mass") for n in range(5, 11)]
    # the ppm is the exact integer `div` (no float detour); every
    # numerator/denominator is a non-null bigint attribute of `out`
    # (seg_struct fields and folds all coalesce to 0), so the ppm and
    # the keep cross-multiplication read the columns directly — the
    # old intermediate __x_/__d_ renaming projection is fused away
    # (one fewer eager analysis pass; values identical)
    keep = F.lit(True)
    cols = [F.col(id_col)]
    for name, xn, dn in sig:
        cols.append(
            F.expr(
                f"CASE WHEN {dn} > 0 THEN "
                f"({xn} * 1000000) div {dn} "
                f"ELSE CAST(0 AS BIGINT) END"
            ).alias(name)
        )
        pct = GOPHER_REPETITION_THRESHOLDS[name]
        keep = keep & (100 * F.col(xn) <= pct * F.col(dn))
    cols.append(keep.alias("keep"))
    return out.select(*cols)


#: Per-language code-signal regexes for code_detect — module-level so
#: the DuckDB oracle folds the IDENTICAL patterns (RE2 and Java agree
#: on this subset: literals, alternation, \b word boundaries).
CODE_LANG_PATTERNS = {
    "python": r"\bdef |\bimport |\bself\.|\belif ",
    "js": r"\bfunction\b|=>|\bconst |\bvar ",
    "java": r"\bpublic |\bvoid |\bstatic |\bnew ",
    "c": r"#include|\bprintf|\bmalloc|->",
}

#: Structural code signals (language-agnostic).
CODE_STRUCT_PATTERNS = {
    "n_braces": r"[{}]",
    "n_semis": r";",
    "n_indent_lines": r"(?m)^(\t+| {2,})\S",
}


def code_detect(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Code-vs-prose routing (public lineage: The Stack / StarCoder —
    Kocetkov et al. 2022 — and every mixed pretraining pipeline that
    routes code and prose into different cleaning + mixing branches):
    per-document structural signals (braces, semicolons, indented
    lines) decide ``is_code`` by an integer cross-multiplication rule
    (the gopher_rules convention — no float thresholds), and
    per-language keyword counts pick ``code_lang`` by argmax with a
    fixed python > js > java > c tie priority (deterministic, spelled
    identically in the oracle).

    is_code  <=>  1000 * s >= 10 * n_chars  AND  s >= 5,
    where s = n_braces + n_semis + n_indent_lines (>= ~1% structural
    signal density and an absolute floor so short prose with one ';'
    never flips).

    Scale shape: regex counts ride the scan (single codegen
    projection, zero shuffles) — the gopher_filter cost class.

    Output: (id, n_braces, n_semis, n_indent_lines, is_code,
    code_lang) — code_lang is NULL for prose or zero-signal docs.
    """
    cnt = {
        name: F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        )
        for name, pat in {**CODE_STRUCT_PATTERNS, **CODE_LANG_PATTERNS}.items()
    }
    s = cnt["n_braces"] + cnt["n_semis"] + cnt["n_indent_lines"]
    is_code = (s * 1000 >= 10 * F.length(F.col(text_col))) & (s >= 5)
    py, js, jv, c = (cnt[k] for k in ("python", "js", "java", "c"))
    lang = (
        F.when(py + js + jv + c == 0, F.lit(None).cast("string"))
        .when((py >= js) & (py >= jv) & (py >= c), F.lit("python"))
        .when((js >= jv) & (js >= c), F.lit("js"))
        .when(jv >= c, F.lit("java"))
        .otherwise(F.lit("c"))
    )
    return df.select(
        F.col(id_col),
        cnt["n_braces"].cast("int").alias("n_braces"),
        cnt["n_semis"].cast("int").alias("n_semis"),
        cnt["n_indent_lines"].cast("int").alias("n_indent_lines"),
        is_code.alias("is_code"),
        F.when(is_code, lang).otherwise(F.lit(None).cast("string")).alias(
            "code_lang"
        ),
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_docs: int = 100,
) -> DataFrame:
    """Heaps-law vocabulary-growth curve (public: Heaps 1978; the
    corpus diagnostic behind tokenizer/vocab sizing and crawl-
    saturation checks — a flattening curve says new data stops
    bringing new vocabulary): cumulative distinct-token count and
    cumulative token count after every ``bucket_docs``-document
    prefix of the corpus in ``id_col`` order.

    Spelled WITHOUT any cumulative-distinct scan: a token is new in
    the bucket where its FIRST occurrence lives (min id), so
    cum_vocab is a running sum over per-bucket first-occurrence
    counts — one token-keyed aggregate (vocabulary-sized), one
    bucket-keyed aggregate (|corpus|/bucket_docs rows), and one
    window over the BUCKET table only. Pure integer arithmetic.

    Scale shape (100 TB): the token explode and min-id aggregate are
    the lm_perplexity cost class (token-key shuffles, map-side
    combinable); the unpartitioned running-sum window sees only
    bucket rows (documented lint class — e.g. 10M docs / 1000 =
    10k rows), never the corpus.

    Output: (bucket, cum_tokens, cum_vocab) — bucket b covers docs
    with id div bucket_docs <= b.
    """
    if bucket_docs < 1:
        raise ValueError(
            f"vocab_growth: bucket_docs must be >= 1, got {bucket_docs}"
        )
    from pyspark.sql import Window

    from cubert_spark.datapipe.dedup import _spread

    base = _spread(df, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    # integer div, never float-divide-then-cast (precision-exact at
    # any id magnitude)
    bucket_of = lambda c: F.expr(f"{c} div {int(bucket_docs)}")  # noqa: E731
    occ = base.groupBy(bucket_of(id_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("__n_tok")
    )
    firsts = (
        base.groupBy("tok")
        .agg(F.min(id_col).alias("__first_id"))
        .groupBy(bucket_of("__first_id").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("__n_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        occ.join(firsts, "bucket", "left")
        .select(
            "bucket",
            F.sum("__n_tok").over(w).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("__n_new"), F.lit(0).cast("bigint")))
            .over(w)
            .alias("cum_vocab"),
        )
    )
