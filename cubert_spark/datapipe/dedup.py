"""Deduplication operators for document corpora.

Four tiers, cheapest-first — the standard large-corpus dedup funnel:

1. ``exact_dedup``        — md5 content hash, one shuffle on the hash.
2. ``simhash``            — 32-bit near-dup fingerprint; equal
   fingerprints cluster trivially.
3. ``minhash_lsh_pairs``  — MinHash signatures + banded LSH candidate
   generation + exact-Jaccard verification (the scale path: candidate
   join is on band keys, never all-pairs).
4. ``ngram_jaccard_pairs``— exact Jaccard via a shingle inverted-index
   join (quadratic only within shingle posting lists; used as the
   verifier inside minhash and as ground truth on smaller slices).

All hashes are md5-based (deterministic, engine-portable — the DuckDB
oracles reproduce them bit-for-bit). At 100 TB: every step is
shuffle-on-key + partial aggregation; posting lists for ultra-common
shingles are the skew risk, handled by dropping top-frequency shingles
(``max_doc_freq``) — the standard stopword-shingle cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cubert_spark.datapipe.textstats import shingles

#: the single live shingle-table cache (see minhash_lsh_pairs)
_live_shingle_cache: DataFrame | None = None


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: keep the min-id representative per
    distinct text. Returns (rep_id, n_copies, content_hash)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- SimHash ----------------------------------------------------------------

def _hex_nibble(h: Column, idx: int) -> Column:
    """Integer value of hex digit idx (0-based) of an md5 string."""
    return F.conv(F.substring(h, idx + 1, 1), 16, 10).cast("int")


def simhash32(text: Column) -> Column:
    """32-bit SimHash over distinct word tokens.

    bit_j(doc) = majority over tokens of bit_j(md5(token)); bits taken
    from the first 8 hex nibbles. Built entirely from JVM expressions
    (aggregate over the token array) — no UDF, and reproducible in SQL.
    """
    toks = F.array_distinct(F.split(text, " "))
    hashes = F.transform(toks, lambda t: F.md5(t))
    out = F.lit(0).cast("bigint")
    for j in range(32):
        nib, bit = divmod(j, 4)
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(_hex_nibble(h, nib), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        out = out + F.when(votes > 0, F.lit(2 ** j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return out


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cluster docs by equal SimHash fingerprint; returns clusters with
    more than one member (near-dup groups)."""
    return (
        df.select(F.col(id_col), simhash32(F.col(text_col)).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


# --- n-gram Jaccard ---------------------------------------------------------

def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Distinct (id, shingle) pairs; optional stopword-shingle cut at
    ``max_doc_freq`` to bound posting-list skew."""
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("shingle")
    )
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.filter(F.col("df") <= max_doc_freq).select("shingle"), "shingle")
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via inverted-index self-join.

    Output: (id_a, id_b, jac) with id_a < id_b, jac >= threshold.
    Intersection counted by the shingle join; union from per-doc
    shingle counts (|A|+|B|-inter). The join shuffles on the shingle —
    never an all-pairs product.
    """
    sh = shingle_table(df, text_col, id_col, k, max_doc_freq)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sza = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sza, "id_a")
        .join(szb, "id_b")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


# --- MinHash + LSH ----------------------------------------------------------

def minhash_signature(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-doc MinHash signature: h_i = min over shingles of
    hash(i, shingle). One groupBy computes all hashes (num_hashes
    min-aggregates, map-side partial).

    hash_fn: "md5" (default — engine-portable, the DuckDB oracle
    reproduces it bit-for-bit) or "xxhash64" (JVM-native 64-bit,
    ~4-5x faster end-to-end measured at sf0.1 — the production setting
    when cross-engine reproducibility is not required).

    md5 lane packing: lane i is the i-th 8-hex-char (32-bit) chunk of
    md5(f"{i//4}|" + shingle) — num_hashes lanes cost ceil(n/4) digests
    per shingle row, not n. The r02->r03 bench drift traced to exactly
    this digest count (md5 was 5x xxhash64 end-to-end; see SCALE.md);
    chunking buys the md5 path back ~2.5x with identical statistics
    (independent uniform 32-bit lanes). Fixed-width lowercase-hex
    substrings compare lexicographically == numerically, so MIN is the
    same in Spark and DuckDB (`substr(md5(..), 1+8*(i%4), 8)`)."""
    if hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        digests = {
            d: F.md5(F.concat(F.lit(f"{d}|"), F.col("shingle")))
            for d in {i // 4 for i in range(num_hashes)}
        }
        aggs = [
            F.min(F.substring(digests[i // 4], 1 + 8 * (i % 4), 8)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Band the signature: band key = hash of the band's signature
    slice. Output: (id, band_idx, band_key) — the LSH bucket join key."""
    assert num_hashes % band_size == 0
    bands = []
    for b in range(num_hashes // band_size):
        cols = [F.col(f"h{b * band_size + r}") for r in range(band_size)]
        if hash_fn == "xxhash64":
            key = F.xxhash64(*cols).cast("string")
        else:
            key = F.md5(F.concat(*cols))
        bands.append(F.struct(F.lit(b).alias("band_idx"), key.alias("band_key")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    max_doc_freq: int | None = None,
    hash_fn: str = "md5",
    persist_shingles: bool = True,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    Scale shape: shingle explode -> groupBy(id) signatures -> explode
    bands -> self-join on (band_idx, band_key) -> distinct candidate
    pairs -> verify via the shingle inverted index. The only joins are
    key-equi joins on hash values; skew bounded by band collision
    rates + ``max_doc_freq``.
    """
    # The shingle table feeds both the signature branch and the
    # verify branch; persisting it (MEMORY_AND_DISK, so at corpus
    # scale it spills to a disk-materialized intermediate — the moral
    # equivalent of writing it once as a checkpointed dataset) beats
    # recomputing the explode for each consumer 1.5x measured at
    # sf0.1. CacheManager holds strong references, so repeated calls
    # in one long session would accumulate caches unboundedly — each
    # call therefore unpersists the previous call's shingle cache (at
    # most ONE alive; earlier returned plans still compute, just
    # uncached).
    sh = shingle_table(df, text_col, id_col, k, max_doc_freq)
    if persist_shingles:
        global _live_shingle_cache
        prev = _live_shingle_cache
        same = False
        if prev is not None:
            try:
                # the md5 and xxhash64 signature paths share one
                # identical shingle plan — reuse its warm cache
                # instead of dropping and rebuilding it
                same = prev._jdf.queryExecution().analyzed().sameResult(
                    sh._jdf.queryExecution().analyzed()
                )
            except Exception:  # noqa: BLE001 - session may be gone
                prev = None
        if same:
            sh = prev
        else:
            if prev is not None:
                try:
                    prev.unpersist()
                except Exception:  # noqa: BLE001
                    pass
            sh = sh.persist()
            _live_shingle_cache = sh
    sig = minhash_signature(sh, id_col, num_hashes, hash_fn)
    bands = lsh_bands(sig, id_col, num_hashes, band_size, hash_fn)
    ca = bands.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    cb = bands.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    cand = (
        ca.join(cb, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact verification restricted to candidate docs BEFORE the
    # inverted-index self-join: semi-join the shingle table down to
    # docs that appear in any candidate pair, so the quadratic step
    # runs on the (tiny) near-dup population, not the whole corpus.
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # Verify by per-doc shingle SETS + array_intersect: two equi-joins
    # on doc id and one codegen expression per candidate pair. Beats
    # the inverted-index pairwise join (shuffle of every co-occurring
    # shingle posting + a pair-keyed groupBy) 1.4x measured at sf0.1,
    # same exact Jaccard. Set size is bounded by document length, and
    # collect_set runs only on candidate docs (semi-join prune).
    docsh = (
        sh.join(cand_ids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("__sh"))
    )
    a = docsh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sa"))
    b = docsh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    jac = inter.cast("double") / (
        F.size("__sa") + F.size("__sb") - inter
    ).cast("double")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )
