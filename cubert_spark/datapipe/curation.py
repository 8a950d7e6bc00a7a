"""Corpus-curation operators for LLM training-data pipelines:
cross-split contamination detection, boilerplate line removal, and
sequence packing. All three are standard pretraining-pipeline stages
(the C4/Gopher/RefinedWeb lineage) expressed Spark-first.

Scale posture shared by all three: the only shuffles are key-equi
joins and keyed aggregations; nothing routes through the driver, and
the one *ordered* operator (sequence packing) uses a two-level
distributed prefix sum instead of a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cubert_spark.datapipe.dedup import _spread
from cubert_spark.datapipe.textstats import shingles


def contamination(
    train: DataFrame,
    test: DataFrame,
    min_shared: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Train/test contamination report: for every test document that
    shares at least ``min_shared`` distinct word ``k``-gram shingles
    with some training document, the number of contaminating train
    docs and the maximum shingle overlap.

    Output: (test_id, n_train_docs, max_shared) — the screen run
    before any benchmark evaluation: a test item whose n-grams appear
    nearly verbatim in training data measures memorization, not
    generalization.

    Scale shape: both sides explode to (id, shingle) and meet in ONE
    equi-join on the shingle (inverted index — never doc x doc);
    posting-list skew from stopword shingles is cut by
    ``max_doc_freq`` on the TRAIN side (document frequency computed
    over the training corpus, the big side at 100 TB).
    """
    tr = _spread(train, id_col).select(
        F.col(id_col).alias("train_id"),
        F.explode(shingles(F.col(text_col), k)).alias("shingle"),
    )
    if max_doc_freq is not None:
        freq = tr.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        tr = tr.join(
            freq.filter(F.col("df") <= max_doc_freq).select("shingle"), "shingle"
        )
    te = _spread(test, id_col).select(
        F.col(id_col).alias("test_id"),
        F.explode(shingles(F.col(text_col), k)).alias("shingle"),
    )
    pair_overlap = (
        te.join(tr, "shingle")
        .groupBy("test_id", "train_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return pair_overlap.groupBy("test_id").agg(
        F.count(F.lit(1)).alias("n_train_docs"),
        F.max("shared").alias("max_shared"),
    )


def boilerplate_lines(
    df: DataFrame,
    min_doc_freq: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus's boilerplate line set: (line, doc_freq) for every
    distinct line appearing in at least ``min_doc_freq`` distinct
    documents (cookie banners, nav bars, license footers). Document
    frequency — not occurrence count — so a line repeated inside one
    page doesn't qualify. One explode + one groupBy; doc-level
    distinctness comes free from the pre-aggregation distinct."""
    ln = (
        _spread(df, id_col)
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .distinct()
    )
    return (
        ln.groupBy("line")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
    )


def remove_boilerplate(
    df: DataFrame,
    min_doc_freq: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style boilerplate removal: drop every line whose document
    frequency across the corpus is >= ``min_doc_freq``, reassembling
    each document from its surviving lines in original order. Output:
    (id, clean_text, n_removed). Documents whose every line is
    boilerplate survive with empty text (downstream length filters
    decide their fate — this operator never drops rows).

    Scale shape: posexplode -> broadcast-able anti-join against the
    (small by construction) boilerplate line set -> groupBy(id)
    ordered reassembly via array_sort on (pos, line) structs — the
    reassembly is a single keyed aggregation, no window.
    """
    bp = boilerplate_lines(df, min_doc_freq, text_col, id_col).select("line")
    ln = _spread(df, id_col).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    kept = ln.join(bp, "line", "left_anti")
    total = ln.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_lines"))
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        total.join(reassembled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("__n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup, first occurrence wins
    (the RefinedWeb/CCNet line-dedup stage): every distinct non-blank
    paragraph survives exactly once in the whole corpus — at its first
    occurrence in (id, position) order — and all later repeats are
    dropped. Complements :func:`remove_boilerplate`: that drops ALL
    occurrences of high-frequency lines; this keeps exactly one
    canonical occurrence of EVERY repeated paragraph. Blank paragraphs
    are formatting, not content — always kept.

    Output: (id, clean_text, n_removed); never drops rows.

    Scale shape: posexplode -> one keyed aggregation per distinct
    paragraph computing the winning (id, pos) as a MIN over a packed
    struct (combiner-friendly partial agg — no window over the
    exploded table) -> equi-join back -> keyed ordered reassembly via
    array_sort, same as remove_boilerplate. Paragraph-content skew is
    bounded: the agg value is one struct regardless of posting count.
    """
    ln = _spread(df, id_col).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "para"),
    )
    dedupable = F.trim(F.col("para")) != ""
    winners = (
        ln.filter(dedupable)
        .groupBy("para")
        .agg(F.min(F.struct(id_col, "pos")).alias("__w"))
        .select(
            "para",
            F.col(f"__w.{id_col}").alias("__wid"),
            F.col("__w.pos").alias("__wpos"),
        )
    )
    kept = (
        ln.join(winners, "para", "left")
        .filter(
            ~dedupable
            | ((F.col(id_col) == F.col("__wid")) & (F.col("pos") == F.col("__wpos")))
        )
        .select(id_col, "pos", "para")
    )
    total = ln.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_lines"))
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return total.join(reassembled, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        (F.col("__n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("int")
        .alias("n_removed"),
    )


def sequence_pack(
    df: DataFrame,
    capacity: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_size: int = 4096,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard pretraining
    batching strategy: documents are concatenated in ``id_col`` order
    and the token stream is cut into fixed-``capacity`` context
    windows. Output per document: (id, n_tokens, start_offset,
    start_bin, end_bin) where offsets index the global token stream
    and bins are the context windows the document's tokens land in
    (end_bin > start_bin means the document straddles a boundary).

    The global running offset is a DISTRIBUTED two-level prefix sum,
    not a single-partition global window: documents bucket into
    contiguous id shards (floor(id / shard_size)); shard totals are
    tiny (|docs| / shard_size rows), so their running offsets compute
    in one small window; each document then adds its intra-shard
    cumulative sum (window partitioned BY SHARD — bounded state) to
    its shard's offset. At 100 TB the big table never sees an
    unpartitioned window.
    """
    toks = _spread(df, id_col).select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), "\\s+")).alias("n_tokens"),
        F.floor(F.col(id_col) / shard_size).alias("__shard"),
    )
    shard_totals = toks.groupBy("__shard").agg(F.sum("n_tokens").alias("__tot"))
    w_shard = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_totals.select(
        "__shard",
        F.coalesce(F.sum("__tot").over(w_shard), F.lit(0)).alias("__shard_off"),
    )
    w_in = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        toks.join(F.broadcast(offsets), "__shard")
        .withColumn(
            "start_offset",
            (F.col("__shard_off") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))).cast(
                "bigint"
            ),
        )
        .withColumn("start_bin", F.floor(F.col("start_offset") / capacity))
        .withColumn(
            "end_bin",
            F.floor(
                (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / capacity
            ),
        )
    )
    return packed.select(id_col, "n_tokens", "start_offset", "start_bin", "end_bin")


def bestfit_pack(
    df: DataFrame,
    capacity: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "bfd",
) -> DataFrame:
    """Best-fit-decreasing sequence packing (public: Ding et al. 2024,
    "Fewer Truncations Improve Language Modeling", best-fit packing):
    instead of concatenating documents and cutting at ``capacity``
    boundaries (sequence_pack above — which truncates ~straddling
    documents), assign each document WHOLE to the open bin with the
    smallest residual capacity that still fits it, visiting documents
    longest-first. No document is ever split; bins are context
    windows with only padding waste.

    Deterministic spelling of the paper's greedy: within a shard,
    visit docs by (n_tokens DESC, id ASC); a doc goes to the bin with
    the MINIMUM residual >= its length (ties -> the earliest-opened
    bin), else opens a new bin. A doc LONGER than ``capacity`` opens
    its own bin whose residual goes negative and never fits anything
    else — it gets a private bin, un-truncated, flagged ``oversize``
    (chunk upstream via chunk_documents if that matters). Every step
    is integer arithmetic on a residual list, so a recursive-CTE SQL
    oracle replays the fold bit-for-bit.

    Scale shape (100 TB): true global BFD is sequential, so the
    corpus is sharded by the content hash (hash16(id, salt) mod
    ``n_shards`` — the token_budget_select move) and BFD runs
    INDEPENDENTLY per shard inside one Arrow-batched applyInPandas
    pass: one shuffle on the shard key, bounded per-task state, zero
    driver involvement. Packing quality degrades only by the shard
    boundary effect (each shard wastes at most one bin's tail), which
    vanishes as shards grow; the paper itself packs within chunks.
    Set ``n_shards`` so |corpus| / n_shards stays comfortably in one
    task's memory (the per-doc state is one int).

    Output: (id, n_tokens, shard, bin, oversize) — bin is the 0-based
    bin index WITHIN the shard; (shard, bin) is the global window key.
    """
    from collections.abc import Iterator  # noqa: F401 (parallel to peers)

    import pandas as pd

    from cubert_spark.datapipe.dedup import _spread
    from cubert_spark.datapipe.sampling import hash16

    if capacity < 1 or n_shards < 1:
        raise ValueError("bestfit_pack: capacity and n_shards must be >= 1")
    # NULL text packs as a 0-token doc (r14 ADVICE): size(split(NULL))
    # is NULL, which reached the Arrow kernel as NaN and crashed
    # int(n) while the oracle emitted a NULL row. Convention: NULL
    # text occupies zero capacity but keeps its id in the output (the
    # same keep-the-row convention as mixture_sample's null-hardening),
    # mirrored by the coalesce in SQL_BESTFIT_PACK.
    toks = _spread(df, id_col).select(
        F.col(id_col),
        F.coalesce(
            F.size(F.split(F.trim(F.col(text_col)), "\\s+")).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("n_tokens"),
        (hash16(F.col(id_col), salt) % n_shards).alias("shard"),
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        resid: list[int] = []
        bins: list[int] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            best_i = -1
            for i, r in enumerate(resid):
                # best fit: smallest residual that still fits; ties
                # resolve to the EARLIEST bin because strict <
                if r >= n and (best_i < 0 or r < resid[best_i]):
                    best_i = i
            if best_i < 0:
                resid.append(capacity - n)
                bins.append(len(resid) - 1)
            else:
                resid[best_i] -= n
                bins.append(best_i)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        pdf["oversize"] = pdf["n_tokens"] > capacity
        return pdf

    return (
        toks.groupBy("shard")
        .applyInPandas(
            kernel,
            schema=(
                f"{id_col} long, n_tokens bigint, shard int, "
                "bin int, oversize boolean"
            ),
        )
        .select(id_col, "n_tokens", "shard", "bin", "oversize")
    )


#: (pattern, replacement) chain for normalize_text — module-level so
#: the DuckDB oracle folds the IDENTICAL patterns (both engines'
#: regex dialects — Java and RE2 — agree on this subset: character
#: classes, bounded repetition, multiline ^/$).
NORMALIZE_STEPS = (
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""),  # control chars (keep \n \t \r)
    (r"\r\n?", "\n"),                            # CRLF / CR -> LF
    (r"[ \t]+", " "),                            # collapse runs of spaces/tabs
    (r"(?m)^ | $", ""),                          # trim line edges
    (r"\n{3,}", "\n\n"),                         # squeeze blank-line runs
)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic text normalization — the cheap cleanup pass every
    crawl pipeline runs before dedup/scoring (control-char strip,
    newline canonicalization, whitespace collapse, line-edge trim,
    blank-run squeeze), as a pure whole-stage-codegen regexp chain:
    zero shuffles, zero Python, engine-portable patterns
    (NORMALIZE_STEPS). Output: (id, clean_text, n_chars_before,
    n_chars_after)."""
    out = F.col(text_col)
    for pat, rep in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    out = F.btrim(out)
    return df.select(
        F.col(id_col),
        out.alias("clean_text"),
        F.length(text_col).cast("int").alias("n_chars_before"),
        F.length(out).cast("int").alias("n_chars_after"),
    )


def unicode_nfc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fix_mojibake: bool = False,
) -> DataFrame:
    """Unicode NFC normalization (Unicode Standard Annex #15 —
    public): compose decomposed sequences (e + U+0301 -> é), map
    singleton compatibility points that NFC covers (U+212B ANGSTROM
    SIGN -> Å), compose Hangul jamo — the canonicalization pass crawl
    pipelines (CCNet lineage; ftfy, R. Speer 2019, is the public
    tool) run before hashing/dedup so byte-different spellings of the
    SAME text stop defeating exact dedup. normalize_text (above)
    covers the whitespace/control tier; this covers the codepoint
    tier Spark has no builtin for.

    Determinism: NFC is fully specified by the Unicode character
    database — Python's unicodedata and DuckDB's utf8proc agree
    bit-for-bit on assigned codepoints (pinned in
    tests/test_datapipe.py over composed/decomposed/singleton/jamo
    cases), so the output is oracle-replayable via nfc_normalize().

    ``fix_mojibake=True`` prepends the classic double-encoding repair
    (UTF-8 bytes read as Latin-1, ftfy's core heuristic, simplified):
    re-encode to Latin-1 and re-decode as UTF-8 IF that round-trips
    cleanly AND strictly shrinks the text (a real repair always does:
    each mojibake char pair collapses to one codepoint) — pytest-
    pinned, not oracle-declared (the heuristic is a Python-side
    detour DuckDB cannot replay).

    Scale shape (100 TB): zero shuffles — one Arrow-batched
    mapInPandas projection; Python is unavoidable here (no JVM NFC
    builtin) but it is the vectorized batch path, never per-row UDF
    dispatch. Output: (id, nfc_text, changed, n_cp_before,
    n_cp_after) — codepoint counts, so the delta is the number of
    compositions applied."""
    import unicodedata
    from collections.abc import Iterator

    import pandas as pd

    def _repair(t: str) -> str:
        try:
            fixed = t.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return t
        return fixed if len(fixed) < len(t) else t

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    rows.append(
                        {
                            id_col: int(i),
                            "nfc_text": None,
                            "changed": None,
                            "n_cp_before": None,
                            "n_cp_after": None,
                        }
                    )
                    continue
                t = _repair(text) if fix_mojibake else text
                n = unicodedata.normalize("NFC", t)
                rows.append(
                    {
                        id_col: int(i),
                        "nfc_text": n,
                        "changed": n != text,
                        "n_cp_before": len(text),
                        "n_cp_after": len(n),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel,
        schema=(
            f"{id_col} long, nfc_text string, changed boolean, "
            "n_cp_before int, n_cp_after int"
        ),
    )


def blocklist_filter(
    df: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    case_insensitive: bool = True,
) -> DataFrame:
    """Banned-phrase screening (the safety/compliance filter stage):
    flag every document containing any of ``phrases`` as a literal
    substring and report the first match in document order. One
    compiled alternation regex evaluated JVM-side — zero shuffles,
    one scan; N phrases cost one DFA pass per document, not N scans.

    Output: (id, blocked, first_match). Phrases are regex-escaped, so
    arbitrary literals (dots, brackets) are safe. For very large
    blocklists (millions of phrases) swap the folded literal for a
    broadcast token-join against an exploded token table — the regex
    alternation form is right up to ~thousands of phrases.
    """
    import re as _re

    pat = "|".join(_re.escape(p) for p in phrases)
    if case_insensitive:
        pat = "(?i)" + pat
    first = F.regexp_extract(F.col(text_col), pat, 0)
    return df.select(
        F.col(id_col),
        (first != "").alias("blocked"),
        F.when(first != "", first).alias("first_match"),
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Data-quality profile — the validation pass a pipeline runs on
    every new data drop: per column, row count, null count, exact
    distinct count, and min/max (as strings, so one long-format schema
    covers every column type). Output: (col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val), one row per profiled column.

    Scale shape: ONE aggregation job. The multiple exact
    count-distincts plan as a single Expand pass (rows x |cols|) with
    partial aggregation — the standard profiling trade; swap in
    approx_count_distinct for trillion-row drops where exactness isn't
    worth the expand factor.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__rows_{c}").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
        )
        for c in cols
    ])
    return one.select(F.explode(rows).alias("p")).select("p.*")


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-token-window chunks —
    the embedding/RAG prep stage: every chunk is ``chunk_tokens``
    whitespace tokens with ``overlap`` tokens shared with its
    predecessor, and the final partial chunk is kept (so every token
    lands in at least one chunk). Output: (id, chunk_idx, chunk_text,
    n_tokens); documents with no tokens yield no chunks.

    Scale shape: a per-row sequence + slice + posexplode — one scan,
    no shuffle, no window; chunk boundaries are pure arithmetic on the
    token array, so the operator is embarrassingly parallel and
    replayable in SQL.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    n = F.size(toks)
    # start offsets 1, 1+stride, ... while start <= n (1-based slice)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(1), F.greatest(n - chunk_tokens + 1, F.lit(1)), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    # a tail window that the arithmetic sequence stopped short of
    last = F.element_at(starts, -1)
    starts = F.when(
        (n > 0) & (last + chunk_tokens - 1 < n),
        F.concat(starts, F.array(last + stride)),
    ).otherwise(starts)
    base = _spread(df, id_col).select(
        F.col(id_col), toks.alias("__t"), starts.alias("__s")
    )
    chunk = F.slice(F.col("__t"), F.col("s"), chunk_tokens)
    return (
        base.select(F.col(id_col), "__t", F.posexplode("__s").alias("chunk_idx", "s"))
        .select(
            id_col,
            "chunk_idx",
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("n_tokens"),
        )
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> DataFrame:
    """One-call dataset datasheet — the summary block of a dataset
    card (public practice: Datasheets for Datasets, Gebru et al.):
    long-format (metric, key, value) rows covering

    - size:      docs, total tokens, total chars
    - dedup:     distinct contents, exact-dup docs (count beyond the
                 first copy of each content hash)
    - languages: doc count per ``lang_col`` value (skipped if None)
    - quality:   token-count p10/p50/p90 (percentile_disc — actual
                 elements, engine-exact)

    Three keyed aggregates + one tiny union — each branch reads the
    corpus once and reduces immediately; nothing quadratic, nothing
    driver-side. Values are exact bigints cast to double only for the
    shared long-format column."""
    from cubert_spark.datapipe.textstats import token_count

    base = _spread(df, id_col).select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        *( [F.col(lang_col).alias("__lang")] if lang_col else [] ),
    )
    v = F.col("v").cast("double")

    size = base.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_count(F.col("__t"))).alias("tokens"),
        F.sum(F.length("__t")).alias("chars"),
    ).selectExpr(
        "stack(3, 'size', 'docs', double(docs),"
        " 'size', 'tokens', double(tokens),"
        " 'size', 'chars', double(chars)) AS (metric, key, v)"
    )
    dup = (
        base.groupBy(F.md5("__t").alias("__h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("distinct_contents"),
            F.sum(F.col("n") - 1).alias("exact_dup_docs"),
        )
        .selectExpr(
            "stack(2, 'dedup', 'distinct_contents', double(distinct_contents),"
            " 'dedup', 'exact_dup_docs', double(exact_dup_docs)) AS (metric, key, v)"
        )
    )
    qual = base.select(token_count(F.col("__t")).alias("tc")).agg(
        F.expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY tc)").alias("p10"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY tc)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY tc)").alias("p90"),
    ).selectExpr(
        "stack(3, 'quality', 'tokens_p10', double(p10),"
        " 'quality', 'tokens_p50', double(p50),"
        " 'quality', 'tokens_p90', double(p90)) AS (metric, key, v)"
    )
    out = size.unionByName(dup).unionByName(qual)
    if lang_col:
        langs = base.groupBy("__lang").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("languages").alias("metric"),
            F.col("__lang").cast("string").alias("key"),
            F.col("n").cast("double").alias("v"),
        )
        out = out.unionByName(langs)
    return out.select("metric", "key", v.alias("value"))


def duplicate_spans(
    df: DataFrame,
    span_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated-span detection — the n-gram-hash spelling of
    exact-substring training-data dedup (Lee et al. 2021's ExactSubstr
    finds repeated spans with a suffix array; production corpus
    pipelines approximate it with fixed-length token-window hashes,
    which shuffles |tokens| small rows instead of building a
    distributed suffix array): every ``span_tokens``-token window
    hashes to md5(terms joined by 0x1f); a span is duplicated when its
    hash occurs more than once in the corpus (across OR within docs —
    self-repetition is the same training-data pathology).

    Output per doc: (id, n_spans, n_dup_spans, dup_frac) where
    dup_frac is ONE IEEE divide of two exact bigints (0.0 for docs
    too short to have spans). Downstream: filter high-dup_frac docs,
    or join back to cut the spans themselves.

    Scale shape: one map stage emits (id, span_hash), one groupBy on
    the hash (partial-agg combines repeated spans early), one semi
    join back, one per-doc agg. No arrays ever shuffle — only 16-byte
    hashes."""
    k = span_tokens
    terms = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    base = _spread(df, id_col).select(F.col(id_col), terms.alias("__t"))
    starts = F.when(
        F.size("__t") >= k, F.sequence(F.lit(0), F.size("__t") - k)
    ).otherwise(F.array().cast("array<int>"))
    ex = base.select(
        id_col,
        F.explode_outer(starts).alias("__i"),
        F.col("__t"),
    ).filter(F.col("__i").isNotNull())
    spans = ex.select(
        id_col,
        F.md5(F.concat_ws("\x1f", F.slice("__t", F.col("__i") + 1, k))).alias(
            "__sh"
        ),
    )
    occ = spans.groupBy("__sh").agg(F.count(F.lit(1)).alias("__nocc"))
    per_doc = (
        spans.join(occ, "__sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("__nocc") > 1, 1).otherwise(0)).alias(
                "n_dup_spans"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.coalesce("n_dup_spans", F.lit(0)).cast("double")
                / F.coalesce("n_spans", F.lit(1)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def decontaminate_spans(
    df: DataFrame,
    bench: DataFrame,
    n: int = 13,
    window: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Aggressive span decontamination (public: Brown et al. 2020,
    GPT-3 paper, Appendix C): wherever a training document shares an
    n-gram with the benchmark set, remove the colliding n-gram PLUS a
    symmetric window around it and split the document into the
    surviving pieces — the conservative upgrade over doc-level
    screens like ``contamination``, which keep or drop whole
    documents. The paper removes 200 characters around a 13-gram
    collision and discards docs split into > 10 pieces; this
    operator works in TOKEN space (``window`` tokens each side) so
    every split point is an engine-exact integer, and it emits
    ``n_pieces`` for the caller to apply the discard policy.

    Output: (id_col, piece_id, start_tok, end_tok, piece_text,
    n_pieces). Uncontaminated docs return as their own single piece
    (piece_id 1, the full token range); fully-redacted docs return
    NO rows. ``[start_tok, end_tok)`` is 0-based over the doc's
    whitespace tokens.

    Scale shape (100 TB): the benchmark n-gram set is a
    benchmark-sized DISTINCT aggregate (broadcast — it scales with
    the eval suite, not the corpus); the corpus explodes to (id,
    position, gram) — |tokens| rows, the duplicate_spans class — and
    meets the bench set in ONE equi-join (inverted index, never doc
    x bench-doc). Span merge is the classic running-max interval
    fold, partitioned per doc; piece complement + slicing are
    in-array expressions. No window is ever unpartitioned, nothing
    quadratic anywhere.
    """
    if n < 1 or window < 0:
        raise ValueError("n must be >= 1 and window >= 0")
    toks = F.split(F.col(text_col), " ")
    base = _spread(df, id_col).select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__nt")
    )
    bgrams = (
        bench.select(
            F.explode(shingles(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    garr = F.when(
        F.col("__nt") >= n,
        F.transform(
            F.sequence(F.lit(0), F.col("__nt") - n),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        F.col(id_col), F.posexplode(garr).alias("pos", "gram")
    )
    hits = grams.join(bgrams, "gram").select(id_col, "pos")
    spans0 = hits.select(
        F.col(id_col),
        F.greatest(F.col("pos") - window, F.lit(0)).alias("s"),
        (F.col("pos") + n + window).alias("e"),
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    run = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grouped = spans0.withColumn(
        "__ng", (F.col("s") > F.coalesce(run, F.lit(-1))).cast("int")
    ).withColumn("__grp", F.sum("__ng").over(w))
    merged = grouped.groupBy(id_col, "__grp").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    spans_per_doc = merged.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__spans")
    )
    enriched = base.join(spans_per_doc, id_col, "left").withColumn(
        "__spans",
        F.coalesce(
            F.col("__spans"),
            F.array().cast("array<struct<s:int,e:int>>"),
        ),
    )
    m = F.size(F.col("__spans"))
    nt = F.col("__nt")

    def piece(k: Column):
        ps = F.when(k == 0, F.lit(0)).otherwise(
            F.least(F.element_at(F.col("__spans"), k).getField("e"), nt)
        )
        pe = F.when(k == m, nt).otherwise(
            F.element_at(F.col("__spans"), k + 1).getField("s")
        )
        return F.struct(ps.alias("ps"), pe.alias("pe"))

    pieces = F.filter(
        F.transform(F.sequence(F.lit(0), m), piece),
        lambda p: p.getField("pe") > p.getField("ps"),
    )
    out = enriched.withColumn("__pieces", pieces).select(
        F.col(id_col),
        F.col("__toks"),
        F.size(F.col("__pieces")).alias("n_pieces"),
        F.posexplode(F.col("__pieces")).alias("__k", "__p"),
    )
    return out.select(
        F.col(id_col),
        (F.col("__k") + 1).cast("int").alias("piece_id"),
        F.col("__p").getField("ps").cast("bigint").alias("start_tok"),
        F.col("__p").getField("pe").cast("bigint").alias("end_tok"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("__toks"),
                F.col("__p").getField("ps") + 1,
                F.col("__p").getField("pe") - F.col("__p").getField("ps"),
            ),
        ).alias("piece_text"),
        F.col("n_pieces").cast("bigint").alias("n_pieces"),
    )


#: RefinedWeb line-wise correction rules (Penedo et al. 2023,
#: Appendix G.2): the social-media counter vocabulary
REFINEDWEB_COUNTER_WORDS = (
    "like", "likes", "comment", "comments", "share", "shares",
    "view", "views", "point", "points", "vote", "votes", "retweet",
    "retweets", "follower", "followers", "upvote", "upvotes",
)


def refinedweb_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_removed_pct: int = 5,
) -> DataFrame:
    """RefinedWeb line-wise corrections (public: Penedo et al. 2023,
    "The RefinedWeb Dataset for Falcon LLM", §3.1.3 + Appendix G.2):
    after document-level filtering, individual junk LINES remain —
    social-media counters, navigation stubs, all-caps headers,
    bare numbers. Remove them; if the removed mass exceeds
    ``max_removed_pct`` percent of the document's characters, drop
    the whole document.

    A line is REMOVED iff any of (trimmed):
    - mainly uppercase: more than half of its alphabetic chars are
      uppercase (and it has at least one)
    - numerical-only: nothing but digits once spaces are removed
    - a counter: ``<digits> <counter-word>`` (e.g. "3 likes",
      "70 comments")
    - a one-word stub: a single token

    Determinism: string predicates + integer cross-multiplications
    (``100 * removed_chars > pct * total_chars``) — no float, flags
    and the reassembled clean_text replay bit-for-bit. Null text
    yields keep=false and an empty clean_text.

    Scale shape (100 TB): one codegen projection over the scan —
    zero shuffles, zero UDFs (the c4_rules / gopher_rules posture).

    Output: (id_col, n_lines, n_removed, removed_char_ppm,
    clean_text, keep).
    """
    t = F.col(text_col)
    lines = F.filter(
        F.split(t, "\n"), lambda x: F.trim(x) != F.lit("")
    )

    counter_alt = "|".join(REFINEDWEB_COUNTER_WORDS)

    def removed(line: Column) -> Column:
        s = F.trim(line)
        alpha = F.length(F.regexp_replace(s, "[^A-Za-z]", ""))
        upper = F.length(F.regexp_replace(s, "[^A-Z]", ""))
        mainly_upper = (alpha >= 1) & (2 * upper > alpha)
        numeric_only = F.regexp_replace(s, " ", "").rlike("^[0-9]+$")
        counter = F.lower(s).rlike(f"^[0-9]+ ({counter_alt})$")
        one_word = ~s.contains(" ")
        return mainly_upper | numeric_only | counter | one_word

    kept = F.filter(lines, lambda x: ~removed(x))
    gone = F.filter(lines, removed)

    def charsum(arr: Column) -> Column:
        return F.coalesce(
            F.aggregate(
                arr, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
            ),
            F.lit(0).cast("bigint"),
        )

    n_lines = F.coalesce(F.size(lines), F.lit(0)).cast("bigint")
    n_removed = F.coalesce(F.size(gone), F.lit(0)).cast("bigint")
    rc, tc = charsum(gone), charsum(lines)
    keep = F.coalesce(
        (100 * rc <= max_removed_pct * tc) & (F.size(kept) >= 1),
        F.lit(False),
    )
    base = df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_removed.alias("n_removed"),
        rc.alias("__rc"),
        tc.alias("__tc"),
        F.coalesce(F.array_join(kept, "\n"), F.lit("")).alias("clean_text"),
        keep.alias("keep"),
    )
    return base.select(
        F.col(id_col),
        "n_lines",
        "n_removed",
        F.expr(
            "CASE WHEN __tc > 0 THEN (__rc * 1000000) div __tc "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("removed_char_ppm"),
        "clean_text",
        "keep",
    )


#: Query parameters stripped by canonical_url — the tracking/session
#: params the Dolma and RefinedWeb URL-dedup passes discard (public:
#: Soldaini et al. 2024 Dolma dedupe-by-URL; Penedo et al. 2023
#: RefinedWeb URL normalization). Module-level so the DuckDB oracle
#: folds the IDENTICAL anchored pattern.
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)"


def canonical_url(url: Column) -> Column:
    """Deterministic URL canonicalization as a pure codegen expression
    chain (zero shuffles, zero Python): strip the fragment, lowercase
    scheme+host, drop default :80/:443 ports, collapse duplicate path
    slashes, strip the trailing slash (bare host renders as '/'),
    drop tracking query params (TRACKING_PARAM_RE) while PRESERVING
    the order of the survivors (param reordering can change server
    semantics, so it is deliberately NOT done — documented contract).
    Path and query case is preserved (paths are case-sensitive).
    Assumes ABSOLUTE scheme://host URLs (the crawl-pipeline case);
    schemeless/relative inputs canonicalize to their path+query only
    — filter or resolve them upstream."""
    u = F.regexp_replace(url, "#.*$", "")
    head = F.lower(
        F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    )
    # default-port stripping is SCHEME-SENSITIVE (r15 ADVICE): :80 is
    # only a default for http and :443 only for https — stripping
    # either blindly would merge http://host:443 (a real non-default
    # port) with the bare host and drop a genuinely distinct page
    head = F.regexp_replace(head, "^(http://.*):80$", "$1")
    head = F.regexp_replace(head, "^(https://.*):443$", "$1")
    path = F.regexp_extract(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    query = F.regexp_extract(u, "\\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike("^" + TRACKING_PARAM_RE + "="),
    )
    q2 = F.array_join(kept, "&")
    return F.concat(
        head,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level dedup (public: Dolma's dedupe-by-URL pass — the
    cheapest dedup tier every crawl pipeline runs BEFORE content
    dedup, since a re-crawled page is a guaranteed duplicate):
    canonicalize (canonical_url), keep the smallest id per canonical
    key. Output: (canonical_url, kept_{id}, n_dups).

    Scale shape (100 TB): the canonicalization rides the scan
    (whole-stage codegen); the dedup is ONE map-side-combinable
    groupBy on the canonical key — the dedup_exact cost class, zero
    pair expansion, no skew beyond the key distribution itself."""
    return (
        df.select(canonical_url(F.col(url_col)).alias("canonical_url"),
                  F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(f"kept_{id_col}"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    span_len: int = 3,
    salt: str = "span",
) -> DataFrame:
    """Deterministic span-corruption PLAN for T5/UL2-style denoising
    objectives (public: Raffel et al. 2020 §3.1.4 span corruption;
    Tay et al. 2022 UL2 mixture-of-denoisers): for every full
    ``window``-token window of a document, mask one ``span_len``-token
    span whose offset is the content hash hash16(id:span_id) mod
    (window - span_len + 1) — a corruption rate of span_len/window
    (18.75% at the 3/16 default, the T5 ballpark) that is
    reproducible across runs, engines, and repartitions (the
    deterministic-sampling doctrine: training-data corruption masks
    must replay exactly or checkpoint resume shifts the objective).
    Windows are non-overlapping by construction so spans never
    collide; a trailing partial window is left unmasked (documented).

    Scale shape: one codegen projection + one explode to |windows|
    rows (~|tokens|/window) — no shuffle at all; the plan is a pure
    map over the scan.

    Output: (id, span_id, start, length) with start a global 0-based
    token index.
    """
    if window < 1 or not 1 <= span_len <= window:
        raise ValueError(
            f"span_corruption: need 1 <= span_len <= window, got "
            f"window={window} span_len={span_len}"
        )
    from cubert_spark.datapipe.dedup import _spread
    from cubert_spark.datapipe.sampling import hash16

    base = _spread(df, id_col).select(
        F.col(id_col),
        F.expr(f"size(split({text_col}, ' ')) div {int(window)}").alias(
            "__wins"
        ),
    )
    spans = base.filter(F.col("__wins") > 0).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("__wins") - 1)
        ).alias("span_id"),
    )
    off = hash16(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col("span_id").cast("string"),
        ),
        salt,
    ) % (window - span_len + 1)
    return spans.select(
        F.col(id_col),
        "span_id",
        (F.col("span_id") * window + off).cast("bigint").alias("start"),
        F.lit(span_len).cast("int").alias("length"),
    )


def chat_assembly(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn",
    role_col: str = "role",
    text_col: str = "text",
    max_tokens: int = 1024,
) -> DataFrame:
    """SFT conversation assembly (public lineage: instruction-tuning
    data prep — Ouyang et al. 2022; the ChatML rendering convention
    and FastChat-style templates): order each conversation's turns,
    render them as ``<|im_start|>{role}\\n{text}<|im_end|>`` blocks
    joined by newlines, and enforce a token budget by keeping the
    LONGEST SUFFIX of turns that fits — the keep-recent-context rule
    chat training uses (dropping the tail would cut the assistant
    answer being trained on). The newest turn always survives, even
    alone over budget (flagged ``truncated`` along with any
    suffix-cut conversation; chunk upstream if that matters).

    Deterministic: whitespace token counts (integer), suffix
    selection via a reverse running sum per conversation, assembly
    via the sort_array ordered fold — no nondeterministic
    concat ordering anywhere.

    Scale shape (100 TB): one shuffle on the conversation key; the
    reverse-cumulative window and the reassembly fold are both
    bounded by turns-per-conversation. The render is pure codegen.

    Output: (conv, n_turns_total, n_turns_kept, n_tokens_kept, text,
    truncated).
    """
    if max_tokens < 1:
        raise ValueError(
            f"chat_assembly: max_tokens must be >= 1, got {max_tokens}"
        )
    rendered = _spread(df, conv_col).select(
        F.col(conv_col),
        F.col(order_col),
        F.concat(
            F.lit("<|im_start|>"),
            F.col(role_col),
            F.lit("\n"),
            F.col(text_col),
            F.lit("<|im_end|>"),
        ).alias("__r"),
        # NULL text counts as 0 tokens (the bestfit_pack NULL
        # convention): without the coalesce, Spark's conditional SUM
        # yields 0 for an all-NULL-text kept set while SQL SUM yields
        # NULL — a cross-engine parity break (r15 ADVICE)
        F.coalesce(
            F.size(F.split(F.trim(F.col(text_col)), "\\s+")).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("__tok"),
    )
    w_desc = Window.partitionBy(conv_col).orderBy(F.col(order_col).desc())
    marked = rendered.select(
        conv_col,
        order_col,
        "__r",
        "__tok",
        (
            (
                F.sum("__tok").over(
                    w_desc.rowsBetween(Window.unboundedPreceding, 0)
                )
                <= max_tokens
            )
            | (F.row_number().over(w_desc) == 1)
        ).alias("__keep"),
    )
    # ONE keyed aggregation over the already-conv-partitioned window
    # output (no second totals/kept split re-executing the lineage):
    # totals and kept stats are conditional aggregates, the render is
    # an in-array filter over the ordered struct fold
    asm = marked.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns_total"),
        F.sum(F.col("__keep").cast("bigint")).alias("n_turns_kept"),
        F.sum(F.when(F.col("__keep"), F.col("__tok")).otherwise(0)).alias(
            "n_tokens_kept"
        ),
        F.concat_ws(
            "\n",
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(order_col), F.col("__r"), F.col("__keep")
                            )
                        )
                    ),
                    lambda st: st["__keep"],
                ),
                lambda st: st["__r"],
            ),
        ).alias("text"),
    )
    return asm.select(
        conv_col,
        "n_turns_total",
        "n_turns_kept",
        "n_tokens_kept",
        "text",
        (
            (F.col("n_turns_kept") < F.col("n_turns_total"))
            | (F.col("n_tokens_kept") > max_tokens)
        ).alias("truncated"),
    )


def ict_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sent_len: int = 12,
    keep_one_in: int = 10,
    salt: str = "ict",
) -> DataFrame:
    """Inverse Cloze Task pair generation (public: Lee et al. 2019,
    "Latent Retrieval for Weakly Supervised Open Domain Question
    Answering" §3.1 — the retriever-pretraining objective: one
    sentence becomes the pseudo-query, the rest of its passage the
    positive context; the sentence stays IN the context for 1/k of
    examples so the model also learns string overlap). Deterministic
    throughout: pseudo-sentences are fixed ``sent_len``-token windows
    (the corpus has no sentence punctuation — the chunk_documents
    convention), the query sentence and the keep decision are
    content-hash draws (hash16), so pairs replay bit-for-bit across
    runs/engines/repartitions.

    Docs with fewer than 2 pseudo-sentences are absent (no context to
    pair). Output: (id, n_sent, query_idx, kept_in_context, query,
    context).

    Scale shape (100 TB): zero shuffles, zero joins — the whole
    operator is one codegen projection over the scan (split +
    transform + filter + array_join); the training-pair export rides
    the same pass."""
    from cubert_spark.datapipe.sampling import hash16

    if sent_len < 1:
        raise ValueError(f"ict_pairs: sent_len must be >= 1, got {sent_len}")
    if keep_one_in < 1:
        raise ValueError(
            f"ict_pairs: keep_one_in must be >= 1, got {keep_one_in}"
        )
    base = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    n_sent = F.expr(
        f"(size(__w) + {sent_len - 1}) div {sent_len}"
    ).cast("int")
    sents = F.expr(
        f"transform(sequence(0, ((size(__w) + {sent_len - 1}) div "
        f"{sent_len}) - 1), i -> array_join(slice(__w, i * {sent_len} + 1, "
        f"{sent_len}), ' '))"
    )
    staged = base.select(
        F.col(id_col),
        n_sent.alias("n_sent"),
        sents.alias("__s"),
        (hash16(F.col(id_col), salt) % n_sent).alias("query_idx"),
        (hash16(F.col(id_col), salt + ":keep") % keep_one_in == 0).alias(
            "kept_in_context"
        ),
    ).filter(F.col("n_sent") >= 2)
    return staged.select(
        F.col(id_col),
        "n_sent",
        "query_idx",
        "kept_in_context",
        F.element_at("__s", F.col("query_idx") + 1).alias("query"),
        F.array_join(
            F.filter(
                F.col("__s"),
                lambda s, i: (i != F.col("query_idx"))
                | F.col("kept_in_context"),
            ),
            " ",
        ).alias("context"),
    )


def bitext_filter(
    df: DataFrame,
    src_col: str = "src_text",
    tgt_col: str = "tgt_text",
    id_col: str = "pair_id",
    max_ratio: int = 2,
    min_tokens: int = 4,
) -> DataFrame:
    """Bitext hard-rule filtering (public: Bicleaner hardrules,
    Ramirez-Sanchez et al. 2020; the WMT parallel-corpus-filtering
    task lineage — the cheap rule tier every bitext pipeline runs
    BEFORE model-based scoring like margin_align): flag and gate
    candidate translation pairs on

    - ``identical``: lowercased sides equal (copy, not translation);
    - ``too_short``: either side under ``min_tokens`` tokens;
    - ``ratio_ok``: token-length ratio within ``max_ratio``, spelled
      as the integer cross-multiply max(n) <= ratio * min(n) — no
      float division, engine-exact at any length;
    - ``digit_ok``: the digit SEQUENCES of the two sides match
      (numbers must survive translation — the hardrules number
      check), digits extracted with one global regexp_replace;
    - ``pass`` = none of the above violated.

    Output: (id, n_src, n_tgt, identical, too_short, ratio_ok,
    digit_ok, pass).

    Scale shape (100 TB): pure codegen projection over the pair scan
    — zero shuffles, zero joins; candidate-pair construction is
    upstream (margin_align_ann / aligned-crawl keys)."""
    if max_ratio < 1:
        raise ValueError(
            f"bitext_filter: max_ratio must be >= 1, got {max_ratio}"
        )
    src = F.col(src_col)
    tgt = F.col(tgt_col)
    n_src = F.size(F.split(src, " ")).cast("bigint")
    n_tgt = F.size(F.split(tgt, " ")).cast("bigint")
    digits = lambda c: F.regexp_replace(c, "[^0-9]", "")  # noqa: E731
    staged = df.select(
        F.col(id_col),
        n_src.alias("n_src"),
        n_tgt.alias("n_tgt"),
        (F.lower(src) == F.lower(tgt)).alias("identical"),
        ((n_src < min_tokens) | (n_tgt < min_tokens)).alias("too_short"),
        (
            F.greatest(n_src, n_tgt)
            <= F.lit(int(max_ratio)) * F.least(n_src, n_tgt)
        ).alias("ratio_ok"),
        (digits(src) == digits(tgt)).alias("digit_ok"),
    )
    return staged.withColumn(
        "pass",
        ~F.col("identical")
        & ~F.col("too_short")
        & F.col("ratio_ok")
        & F.col("digit_ok"),
    )
