"""Text analysis operators: tokenization, quality scoring, language
ID, fingerprinting. All pure pyspark.sql.functions (JVM codegen) — a
100 TB corpus pass stays whole-stage-compiled with zero Python cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
