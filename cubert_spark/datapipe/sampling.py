"""Deterministic sampling for training-data pipelines.

Random `df.sample()` is nondeterministic across runs/partitionings —
useless for reproducible corpus construction. These operators key the
sampling decision on a content/id hash (md5, engine-portable): the
same row is in or out of the sample forever, across engines, retries
and re-partitions. This is the standard trick for holdout splits and
downsampling at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits of hash used for the sampling decision (16 bits = 1/65536
#: granularity; plenty for corpus fractions).
_SPACE = 1 << 16


def hash16(col: Column, salt: str = "") -> Column:
    """First 16 bits of md5(salt || value) as an int — portable to
    any engine with md5+substring (see the DuckDB oracle mirror).

    NULL keys hash as the literal string ``__null__`` so null-keyed
    rows land deterministically on one side of every cut instead of
    being silently dropped by a null comparison."""
    h = F.md5(F.concat(F.lit(salt), F.coalesce(col.cast("string"), F.lit("__null__"))))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def deterministic_sample(
    df: DataFrame, key: str | Column, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows where hash16(key) < fraction * 2^16. Deterministic,
    reproducible, partition-independent; ``salt`` decorrelates
    independent samples over the same keys."""
    col = F.col(key) if isinstance(key, str) else key
    return df.filter(hash16(col, salt) < int(fraction * _SPACE))


def train_test_split(
    df: DataFrame, key: str | Column, test_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic split keyed on content —
    the leak-proof way to hold out eval data (same document always
    lands on the same side, even across dataset versions)."""
    col = F.col(key) if isinstance(key, str) else key
    cut = int(test_fraction * _SPACE)
    is_test = hash16(col, salt) < cut
    return df.filter(~is_test), df.filter(is_test)


def weighted_deterministic_sample(
    df: DataFrame,
    key: str | Column,
    weight: str | Column,
    scale: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability ``min(1, scale * weight)``,
    decided by the row's content hash — the quality-weighted corpus
    downsample (keep high-quality documents preferentially) that
    stays reproducible across runs, engines, and repartitions.

    Pure column expressions, no shuffle; ``weight`` is any in-[0,1]
    score column (clip upstream if needed)."""
    col = F.col(key) if isinstance(key, str) else key
    w = F.col(weight) if isinstance(weight, str) else weight
    threshold = F.least(F.lit(1.0), w * F.lit(scale)) * F.lit(_SPACE)
    return df.filter(hash16(col, salt).cast("double") < threshold)


def per_group_deterministic_sample(
    df: DataFrame,
    key: str | Column,
    group_col: str,
    n_per_group: int,
    salt: str = "",
) -> DataFrame:
    """At most ``n_per_group`` rows per group, chosen by content-hash
    order (dataset balancing: cap every language/source/domain at the
    same budget, reproducibly). One shuffle on the group key; Catalyst
    plans the rank-filter as WindowGroupLimit, so each partition keeps
    only its running top-n instead of materializing whole groups."""
    import uuid

    from pyspark.sql import Window

    col = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(group_col).orderBy(
        hash16(col, salt), col.cast("string")
    )
    rn = f"__rn_{uuid.uuid4().hex[:8]}"  # never collides with user cols
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n_per_group)
        .drop(rn)
    )


def stratified_deterministic_sample(
    df: DataFrame, key: str | Column, strata_col: str, fractions: dict, salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic fractions (e.g. downsample by
    language): ``fractions`` maps stratum value -> fraction; missing
    strata keep everything."""
    col = F.col(key) if isinstance(key, str) else key
    h = hash16(col, salt)
    expr = None
    for value, frac in fractions.items():
        branch = (F.col(strata_col) == value) & (h >= int(frac * _SPACE))
        expr = branch if expr is None else (expr | branch)
    return df.filter(~expr) if expr is not None else df


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "mix",
    size_col: str | None = None,
) -> DataFrame:
    """Deterministic dataset mixing — downsample each source so the
    output matches the target mixture ``weights`` (e.g. 50% web /
    30% books / 20% code) while keeping as much data as possible:
    the effective total is the largest T with share_s * T <= count_s
    for every weighted source (the scarcest source is kept whole and
    every other source is cut to proportion). Sources absent from
    ``weights`` are dropped; a weighted source with NO rows in ``df``
    — or, under ``size_col``, whose sizes are all NULL (summed size
    0) — is ignored when sizing T (it can't constrain a mix it
    contributes nothing to) rather than forcing the whole output
    empty; its rows are likewise excluded from the output, since a
    source with no measurable size cannot be cut to proportion.
    Membership
    is the content-keyed md5 gate, so the mix is stable across runs
    and engines.

    Every arithmetic step is a fixed composition of IEEE-754 divides
    and multiplies on values both engines agree on (counts + weight
    literals), so the kept set replays bit-for-bit in the oracle.

    Scale shape: per-source counts are a tiny keyed agg (|sources|
    rows) that broadcasts back; the big table sees one pushed filter
    on the md5 gate — no shuffle of the corpus at any scale.

    ``size_col``: mix by a SIZE measure instead of row count — pass an
    integer column (e.g. a token count) and every share/T computation
    runs over summed sizes: the mixture real LLM data recipes specify
    ("50% of TOKENS from web"), not document counts. Per-source
    expected kept-size then matches the target shares in expectation
    (rows are still kept whole via the same md5 gate — a row-level
    gate cannot cut mid-document, so realized token shares concentrate
    around the target as corpus size grows). Sums of bigints keep the
    arithmetic engine-exact, same as counts.
    """
    total = float(sum(weights.values()))
    shares = {s: w / total for s, w in weights.items()}
    share = F.element_at(
        F.create_map(*[F.lit(x) for s, w in shares.items() for x in (s, w)]),
        F.col(source_col),
    )
    size = (
        F.count(F.lit(1))
        if size_col is None
        else F.sum(F.col(size_col).cast("bigint"))
    )
    counts = (
        df.filter(F.col(source_col).isin(list(shares)))
        .groupBy(source_col)
        # a weighted source whose size_col is all NULL sums to NULL:
        # coalesce to 0 and treat it like the no-rows case (excluded
        # from sizing T and from the output — a source with no
        # measurable size cannot be proportionally cut)
        .agg(F.coalesce(size.cast("bigint"), F.lit(0)).alias("__cnt"))
        .filter(F.col("__cnt") > 0)
        .withColumn("__share", share)
    )
    t = counts.agg(
        F.min(F.col("__cnt").cast("double") / F.col("__share")).alias("__t")
    )
    frac = (
        counts.crossJoin(F.broadcast(t))
        .select(
            source_col,
            ((F.col("__share") * F.col("__t")) / F.col("__cnt").cast("double")).alias(
                "__frac"
            ),
        )
    )
    gate = hash16(F.col(key), salt).cast("double") < F.col("__frac") * float(_SPACE)
    return (
        df.join(F.broadcast(frac), source_col)
        .filter(gate)
        .drop("__frac")
    )


def token_budget_select(
    df: DataFrame,
    budget_frac: float | None = None,
    budget_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    priority: Column | None = None,
    salt: str = "budget",
    n_shards: int = 256,
) -> DataFrame:
    """Token-budget corpus assembly: keep documents in ``priority``
    order while the running token total stays within the budget — the
    "take the best N tokens" selection step every sized pretraining
    mix runs (DataComp-LM-style top-fraction-by-score selection;
    Chinchilla-style token-count targets). The rule is a deterministic
    PREFIX cut, not a knapsack: the first document that would overflow
    the budget is dropped and nothing later back-fills, so membership
    is reproducible and engine-portable.

    ``priority`` is an integer Column (lower = selected first; ties
    broken by id — the order is total). Default: the ID-keyed md5
    hash16 (hash16(id_col) — pass a content hash as id_col to make
    it content-keyed, the epoch_shuffle distinction), i.e. a uniform
    deterministic subsample up to the budget. Budget: ``budget_tokens`` (absolute) or ``budget_frac``
    (fraction of the corpus's total tokens — the scale-free spelling;
    one bigint total x one literal = one correctly-rounded multiply,
    exact on both engines).

    Scale shape — the global running sum is the DISTRIBUTED two-level
    prefix sum (the sequence_pack / r13-dictionary idiom), not a
    single-partition window: priority splits into ``n_shards``
    VALUE-CONTIGUOUS ranges off a 1-row min/max stat, shard totals
    (n_shards rows) take the only unpartitioned window, and each doc
    adds its within-shard cumulative sum (window partitioned by
    shard). Priorities concentrated in one value range would serialize
    their shard — the default hash16 is uniform; pre-scale custom
    scores with that in mind.

    Output: (id, n_tokens, cum_tokens) for kept docs only.
    """
    if (budget_frac is None) == (budget_tokens is None):
        raise ValueError(
            "token_budget_select: pass exactly one of budget_frac / budget_tokens"
        )
    if n_shards < 1:
        raise ValueError(f"token_budget_select: n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    h = (priority if priority is not None else hash16(F.col(id_col), salt)).cast(
        "bigint"
    )
    from cubert_spark.datapipe.dedup import _spread

    # NOTE (r16 A/B, reverted): lazy-checkpointing this projection —
    # it feeds the min/max/total stat and both consumers of ``t`` —
    # measured consistently SLOWER at sf0.1 (1.2-1.5 -> 1.4-1.7 s over
    # four interleaved sessions): the split-tokenize recompute is
    # cheaper than materializing |docs| x 3 blocks plus the extra job
    # barrier. Recompute kept.
    toks = _spread(df, id_col).select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), "\\s+")).cast("bigint").alias(
            "n_tokens"
        ),
        h.alias("__h"),
    )
    stats = toks.agg(
        F.min("__h").alias("__mn"),
        F.max("__h").alias("__mx"),
        F.sum("n_tokens").alias("__tot"),
    )
    if budget_frac is not None:
        thresh = F.floor(F.col("__tot") * F.lit(float(budget_frac))).cast("bigint")
    else:
        thresh = F.lit(int(budget_tokens)).cast("bigint")
    # value-contiguous shards: floor((h - min) / width) with width
    # sized so the shard id lands in [0, n_shards)
    width = F.expr(f"(__mx - __mn) div {n_shards} + 1")
    t = toks.crossJoin(F.broadcast(stats)).select(
        id_col,
        "n_tokens",
        "__h",
        F.expr("(__h - __mn)").cast("bigint").alias("__rel"),
        thresh.alias("__thresh"),
        width.alias("__w"),
    )
    t = t.withColumn("__shard", F.expr("__rel div __w"))
    shard_totals = t.groupBy("__shard").agg(F.sum("n_tokens").alias("__tot"))
    w_shard = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_totals.select(
        "__shard",
        F.coalesce(F.sum("__tot").over(w_shard), F.lit(0)).alias("__off"),
    )
    w_in = (
        Window.partitionBy("__shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.join(F.broadcast(offsets), "__shard")
        .withColumn(
            "cum_tokens",
            (F.col("__off") + F.sum("n_tokens").over(w_in)).cast("bigint"),
        )
        .filter(F.col("cum_tokens") <= F.col("__thresh"))
        .select(id_col, "n_tokens", "cum_tokens")
    )


def rendezvous_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding: each key's shard
    is argmax over s in [0, n_shards) of md5(salt || s || ':' || key)
    — the consistent-assignment scheme where growing the fleet from n
    to n+1 shards moves only ~1/(n+1) of the keys (each key moves iff
    the NEW shard wins its rendezvous), versus mod-hashing which
    reshuffles nearly everything. The stable-routing primitive for
    incremental corpus sharding, ANN index partitions, and cache
    placement.

    Scale shape: one codegen projection — n_shards md5s per row,
    array argmax via array_max over (hash, shard) structs, zero
    shuffles. Deterministic and engine-portable (oracle replays the
    same md5 race in DuckDB); ties (2^-64 per pair) break toward the
    higher shard id via the struct compare.

    Output: df columns + ``shard`` int."""
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("__null__"))
    entries = [
        F.struct(
            F.md5(F.concat(F.lit(f"{salt}{s}:"), key)).alias("h"),
            F.lit(s).alias("s"),
        )
        for s in range(n_shards)
    ]
    shard = F.array_max(F.array(*entries))["s"].alias("shard")
    return df.select("*", shard)


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic training-epoch shuffle + balanced shard export:
    every row gets a (shard, epoch_pos) address under a seeded md5
    permutation — the standard shape for writing an epoch of training
    data as n_shards files each readable in a reproducible
    pseudorandom order (change ``seed`` per epoch for a fresh
    permutation; same seed always replays the same order, which is
    what makes a 100 TB training run resumable and debuggable).

    Mechanics: h = md5(seed || ':' || id); shard = first 32 hash bits
    mod n_shards (uniform, so shard sizes concentrate at N/n_shards);
    epoch_pos = dense 1-based rank of h within the shard (ties broken
    by id for full determinism on the 2^-128 collision).

    Scale shape: one codegen projection + ONE shuffle on shard + an
    in-partition sort — exactly the cost of physically writing the
    shards (`.repartition(shard).sortWithinPartitions(h)`), which a
    caller exporting files gets for free by writing this frame
    partitioned on ``shard``. No global total order is materialized:
    a cross-shard ORDER BY would range-partition the whole corpus for
    an ordering property no shard reader ever observes. Pick
    n_shards >= cluster parallelism at scale so the sort stage uses
    every core.

    Output: (id_col, shard int, epoch_pos bigint); engine-portable
    (the oracle replays hash, shard, and rank bit-for-bit)."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    base = df.select(F.col(id_col), h.alias("__h"))
    shard = (
        F.conv(F.substring("__h", 1, 8), 16, 10).cast("bigint")
        % F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        base.select(F.col(id_col), "__h", shard.alias("shard"))
        .select(
            F.col(id_col),
            "shard",
            F.row_number().over(w).cast("bigint").alias("epoch_pos"),
        )
    )


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    key: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened multi-source sampling (the mC4 / XLM-R
    alpha-sampling idiom, public: Xue et al. 2021 §3.1, Conneau et al.
    2020 §3): sample source s with probability proportional to
    share_s^alpha, flattening the head so low-resource sources are not
    drowned by the dominant one. Expressed as a deterministic keep
    rate per source — rate_s = (min_cnt / cnt_s)^(1-alpha) — which is
    exactly proportional to share_s^(alpha-1) (the per-ROW upweight
    the alpha-distribution implies) normalized so the SMALLEST source
    is kept whole and every larger source is downsampled toward it.
    alpha=1 keeps everything (no flattening); alpha=0 equalizes all
    source counts; the mC4 paper's useful range sits between.

    Determinism doctrine: at the default alpha=0.5 the rate is one
    IEEE divide + one sqrt — BOTH correctly-rounded operations per
    IEEE 754, so the rate (and therefore the md5-gated kept set)
    replays bit-for-bit in any engine from the same integer counts.
    Other alphas go through pow(), whose libm implementations are NOT
    correctly rounded and may disagree across engines by an ulp —
    fine in production (a 2^-52 rate wobble moves ~nothing), but only
    the sqrt spelling is oracle-hash-comparable, so the declared
    query pins alpha=0.5.

    Scale shape: per-source counts are a tiny keyed agg broadcast
    back onto the corpus; the big table sees one pushed md5-gate
    filter — zero corpus shuffles at any scale (the mixture_sample
    shape).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"temperature_mix: alpha must be in [0, 1], got {alpha}")
    # NULL sources form their own deterministic group (a bare inner
    # join on source_col would silently drop them — even at alpha=1.0
    # where every row must survive). r14 ADVICE: the old "\u0000"
    # string sentinel was IN-BAND — a real source equal to the NUL
    # string (or a non-string source whose string cast collided)
    # silently merged with the NULL group and took its rate. groupBy
    # already treats NULL as its own group natively, so group on the
    # RAW column and join back null-safely (eqNullSafe) — no
    # sentinel, no cast, no collision class at all.
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    mn = counts.agg(F.min("__cnt").alias("__mn"))
    ratio = F.col("__mn").cast("double") / F.col("__cnt").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    elif alpha == 1.0:
        rate = F.lit(1.0)
    elif alpha == 0.0:
        rate = ratio
    else:
        # not correctly rounded -> not oracle-comparable (docstring)
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "__src", rate.alias("__rate")
    )
    gate = hash16(F.col(key), salt).cast("double") < F.col("__rate") * float(_SPACE)
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__src")),
        )
        .filter(gate)
        .drop("__rate", "__src")
    )


def per_group_cap(
    df: DataFrame,
    group_col: str = "source",
    key: str = "doc_id",
    cap: int = 100,
    salt: str = "cap",
) -> DataFrame:
    """Per-group document cap: keep at most ``cap`` rows per group,
    chosen by a deterministic content-hash ranking (md5(salt || key),
    ties by key) — the per-domain quota a crawl-curation pipeline runs
    so no single domain dominates the corpus (the RefinedWeb /
    CCNet-lineage "cap documents per registered domain" stage, public:
    Penedo et al. 2023 §3.1 discuss URL-level caps). Hash order (not
    arrival order) makes the kept set a stable uniform sample of each
    group across dataset versions: a group that grows only SWAPS
    members with probability ~cap/|group|, it never shifts wholesale.

    Scale shape: rank-within-group <= k is the WindowGroupLimit plan
    (the topn operator's assertion): Spark inserts a per-PARTITION
    group-limit below the shuffle, so each map task forwards at most
    ``cap`` rows per group it sees — the shuffle carries
    O(tasks * cap) per heavy group, not the group's full row count.
    The hot-domain skew case (one domain = 1% of a 100 TB crawl) is
    exactly what that partial limit bounds.

    Output: df columns + ``rk`` (1-based rank within the group's kept
    sample — callers wanting the quota sample only may drop it)."""
    if cap < 1:
        raise ValueError(f"per_group_cap: cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    h = F.md5(
        F.concat(
            F.lit(salt), F.coalesce(F.col(key).cast("string"), F.lit("__null__"))
        )
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
    )


def dsir_log_weights(
    df: DataFrame,
    log_ratio_millinats: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling — Xie et al. 2023, arXiv:2302.03169, public): score
    every document by how target-like it looks under two hashed
    n-gram multinomials, log w(x) = sum over the doc's features of
    log p_target[bucket] - log p_raw[bucket]. Features are lowercase
    word unigrams AND bigrams (the paper's featurizer), hashed into
    ``B = len(log_ratio_millinats)`` buckets via md5 (engine-portable,
    the hashed_bow_embedding spelling).

    The two multinomials are trained OFFLINE in DSIR (a tiny target
    sample vs a raw-corpus sample); this operator takes their
    per-bucket log-ratios as caller literals in MILLI-NATS (ints), so
    the per-doc weight is an exact bigint fold — bit-replayable in
    any engine, no libm log in the pipeline. At 100 TB this is the
    whole point: scoring is ONE codegen map stage (md5 per feature +
    a literal-array lookup), zero shuffles, and the model parameters
    ride along as a broadcast literal instead of a join.

    Output: (id, n_feats, logw_millinats bigint). Docs with no terms
    score 0 on 0 features (kept — the resampler decides their fate).
    """
    if not log_ratio_millinats:
        # b = 0 would feed `% 0` into the bucket expression and
        # surface as a confusing ANSI runtime error mid-job
        raise ValueError("log_ratio_millinats must be non-empty")
    # null text scores like empty text (0 features, weight 0) — a
    # bare regexp over NULL would propagate NULL through the fold
    terms = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit("[a-z0-9]+"),
        F.lit(0),
    )
    from cubert_spark.datapipe.dedup import _spread

    # terms aliased in their own projection: every downstream feature
    # expression references the array many times (the catalogued
    # CollapseProject md5 trap)
    base = _spread(df, id_col).select(F.col(id_col), terms.alias("__t"))
    # bigrams only when >= 2 terms: sequence(1, n-1) DESCENDS when
    # n-1 < 1 (sequence(1, 0) = [1, 0]) and would fabricate features
    bigrams = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__t") - 1),
            lambda i: F.concat(
                F.element_at("__t", i), F.lit("_"), F.element_at("__t", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(F.col("__t"), bigrams)
    b = len(log_ratio_millinats)
    lr = F.array(*[F.lit(int(v)).cast("bigint") for v in log_ratio_millinats])
    bucket1 = lambda t: (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), t)), 1, 4), 16, 10)
        .cast("int") % b
    )
    with_f = base.select(F.col(id_col), feats.alias("__f"))
    logw = F.aggregate(
        F.transform(F.col("__f"), bucket1),
        F.lit(0).cast("bigint"),
        lambda acc, bk: acc + F.element_at(lr, bk + 1),
    )
    return with_f.select(
        F.col(id_col),
        F.size("__f").cast("bigint").alias("n_feats"),
        logw.alias("logw_millinats"),
    )


def dsir_resample(
    df: DataFrame,
    log_ratio_millinats: list[int],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    seed: str = "g0",
) -> DataFrame:
    """DSIR's selection step: sample ``k`` documents WITHOUT
    replacement with probability proportional to their importance
    weight, via the Gumbel-top-k trick the paper uses — priority =
    log w(x) + Gumbel(0,1), take the k largest. Gumbel noise is
    derived deterministically from the row's ID hash
    (u = (hash16(id, seed) + 0.5) / 2^16, g = -ln(-ln(u))), so the
    sample is reproducible across runs, engines, retries, and
    repartitions — the same property every other sampler in this
    module guarantees. (ID-keyed, not content-keyed: re-keying the
    corpus changes the draw; duplicate-content rows draw
    independently. Pass a content hash as id_col for content-keyed
    noise.)

    Scale shape: one map stage for scoring + ONE global top-k
    (TakeOrderedAndProject — per-partition heaps of size k, never a
    full sort). Output: (id, logw_millinats, priority double), the k
    selected rows.

    Note on oracles: priority involves ln (libm) — fine for SELECTION
    (priorities of distinct docs differ by >> 1 ulp except engineered
    ties, broken by id), but the declared driver row attests the
    exact-integer weight ranking instead (dsir_weights); this
    resampler is pytest-pinned (determinism across repartitions +
    proportionality on a planted corpus)."""
    w = dsir_log_weights(df, log_ratio_millinats, text_col, id_col, salt)
    u = (hash16(F.col(id_col), seed).cast("double") + F.lit(0.5)) / F.lit(
        float(_SPACE)
    )
    g = -F.log(-F.log(u))
    pri = (F.col("logw_millinats").cast("double") / F.lit(1000.0)) + g
    return (
        w.select(F.col(id_col), "logw_millinats", pri.alias("priority"))
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(k)
    )


def doremi_weights(
    df: DataFrame,
    domain_col: str = "source",
    loss_col: str = "excess_milli",
    rounds: int = 5,
    eta_ppm: int = 10_000,
    smooth_ppm: int = 100_000,
) -> DataFrame:
    """DoReMi domain reweighting (public: Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    Algorithm 1) — the Group-DRO multiplicative-weights fold that
    turns per-example EXCESS LOSS (proxy-model loss minus reference-
    model loss, here supplied as a bigint milli-nat column) into
    per-domain mixture weights for the main training run.

    This is the STATIC-LOSS variant: the paper recomputes per-domain
    excess loss as the proxy model trains; offline, against a fixed
    loss column, the per-domain mean is a constant, so `rounds`
    multiplicative-weights steps factor into a single closed form
    u_i ** rounds with ONE final normalization. The update itself is
    the LINEARIZED (Freund-Schapire) rule

        u_i = 1_000_000 + (eta_ppm * lbar_i) // 1000

    with lbar_i = max(0, floor-mean of the domain's excess milli-nats)
    (Group DRO clips negative excess — a domain the proxy already
    beats the reference on gets no extra mass), followed by uniform
    smoothing: w = (1 - c) * normalized + c / n_domains, everything
    in exact ppm integers.

    Determinism: the corpus pass is one exact bigint (sum, count)
    aggregation; the fold runs in Python's unbounded ints on the
    collected |domains|-row table (the bounded-driver-fold
    convention of kmeans_lloyd), and every step stays HUGEINT-
    expressible (u_i**rounds * 1e6 <= ~1e37 at the defaults) so a
    SQL oracle replays it bit-for-bit.

    Scale shape (100 TB): ONE map-side-combined groupBy over the
    corpus (partial aggregation in every task, |domains| rows out);
    the driver fold touches |domains| rows — corpus-independent.

    Output: (domain, n_docs, lbar_milli, weight_ppm), one row per
    domain, ordered by domain name.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    stats = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(loss_col).cast("bigint")).alias("sum_loss"),
        )
        .collect()
    )
    folded = []
    for r in sorted(stats, key=lambda r: r["domain"]):
        n = int(r["n_docs"])
        # floor division (Python // floors; the oracle replays it
        # with the pmod spelling), then the Group-DRO clip; an
        # all-NULL loss column sums to NULL -> treat as 0 loss
        # (the unimax_budget null-size convention)
        lbar = max(0, int(r["sum_loss"] or 0) // n)
        folded.append((r["domain"], n, lbar))
    us = [
        (1_000_000 + (eta_ppm * lbar) // 1000) ** rounds
        for (_, _, lbar) in folded
    ]
    tot = sum(us)
    nd = len(folded)
    out = []
    for (dom, n, lbar), u in zip(folded, us):
        w = (u * 1_000_000) // tot
        w = ((1_000_000 - smooth_ppm) * w) // 1_000_000 + smooth_ppm // nd
        out.append((dom, n, lbar, w))
    return df.sparkSession.createDataFrame(
        out,
        "domain string, n_docs bigint, lbar_milli bigint, weight_ppm bigint",
    )


def unimax_budget(
    df: DataFrame,
    source_col: str = "source",
    size_col: str | None = None,
    budget: int = 1_000_000,
    max_epochs: int = 4,
) -> DataFrame:
    """UniMax budget allocation (public: Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining", Algorithm 1): spread a total unit
    budget (tokens/chars/docs) across sources AS UNIFORMLY AS
    POSSIBLE subject to no source being repeated more than
    ``max_epochs`` times — the closed-form answer to temperature
    tuning that never over-epochs a low-resource source.

    Water-filling, exactly as the paper orders it: visit sources
    ASCENDING by their epoch cap (size * max_epochs); each gets
    min(cap, remaining_budget // remaining_sources). The fold is
    sequential integer arithmetic — Python ints on the collected
    |sources|-row table (the doremi_weights / kmeans convention),
    replayable bit-for-bit by a recursive-CTE SQL oracle.

    ``size_col=None`` counts rows (doc budget); pass a bigint column
    (e.g. a token count) to budget in those units.

    Scale shape (100 TB): ONE map-side-combined groupBy over the
    corpus; the fold touches |sources| rows — corpus-independent.

    Output: (source, n_units, cap_units, alloc_units, epochs_ppm)
    ordered by (cap_units, source) — the visit order; epochs_ppm =
    alloc * 1e6 // size is what ``repeat_upsample`` consumes.
    """
    if budget < 0 or max_epochs < 1:
        raise ValueError("budget must be >= 0 and max_epochs >= 1")
    unit = (
        F.count(F.lit(1)).cast("bigint")
        if size_col is None
        else F.sum(F.col(size_col).cast("bigint"))
    )
    stats = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(unit.alias("n_units"))
        .collect()
    )
    # ascending by cap, ties by source name — the deterministic
    # visit order the oracle's recursion replays
    rows = sorted(
        # a source whose size_col sums to NULL (all-null sizes)
        # contributes nothing: treat as 0 units
        ((r["source"], int(r["n_units"] or 0)) for r in stats),
        key=lambda x: (x[1] * max_epochs, x[0]),
    )
    out = []
    b_rem = budget
    m_rem = len(rows)
    for src, n in rows:
        cap = n * max_epochs
        share = b_rem // m_rem
        alloc = cap if cap < share else share
        b_rem -= alloc
        m_rem -= 1
        out.append(
            (src, n, cap, alloc, alloc * 1_000_000 // n if n > 0 else 0)
        )
    return df.sparkSession.createDataFrame(
        out,
        "source string, n_units bigint, cap_units bigint, "
        "alloc_units bigint, epochs_ppm bigint",
    )


def repeat_upsample(
    df: DataFrame,
    epochs_ppm: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_ppm: int = 1_000_000,
    salt: str = "repeat",
) -> DataFrame:
    """Materialize a per-source epoch plan as an exploded training
    stream (public lineage: Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models" — repeating data up to ~4
    epochs is near-free; UniMax's allocation is expressed in exactly
    these per-source epoch counts). ``epochs_ppm[src] = 2_300_000``
    means every doc of src appears in 2 full epochs and joins a
    third with probability 0.3 — decided by the deterministic
    content/id hash, so the stream replays bit-for-bit. Values below
    1e6 subsample (epoch plans double as downsampling plans).

    The fractional-epoch gate is the integer cross-multiplication
    ``hash16 * 1_000_000 < frac_ppm * 65536`` — no float anywhere.

    Scale shape (100 TB): zero shuffles — one generate/explode over
    the scan with a broadcast-literal plan; output size is exactly
    the planned token budget. Compose with ``epoch_shuffle`` to
    order the stream.

    Output: (id_col, source_col, epoch) — epoch is 1-based;
    a doc's fractional epoch (if won) is full_epochs + 1.
    """
    if not epochs_ppm:
        raise ValueError("epochs_ppm must be non-empty")
    bad = {s: v for s, v in epochs_ppm.items() if int(v) < 0}
    if bad or int(default_ppm) < 0:
        raise ValueError(f"epochs_ppm values must be >= 0: {bad or default_ppm}")
    src = F.col(source_col)

    def per_source(value_of) -> Column:
        # the plan is a dict of literals, so full/frac fold at plan
        # time in Python ints — the engine never divides
        return F.coalesce(
            *[
                F.when(src == F.lit(s), F.lit(int(value_of(v))).cast("bigint"))
                for s, v in sorted(epochs_ppm.items())
            ],
            F.lit(int(value_of(default_ppm))).cast("bigint"),
        )

    full = per_source(lambda v: v // 1_000_000)
    frac = per_source(lambda v: v % 1_000_000)
    gate = (
        hash16(F.col(id_col), salt).cast("bigint") * 1_000_000
        < frac * 65536
    )
    n_epochs = full + gate.cast("bigint")
    epochs = F.when(
        n_epochs >= 1, F.sequence(F.lit(1).cast("bigint"), n_epochs)
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(
        F.col(id_col), src.alias(source_col), F.explode(epochs).alias("epoch")
    )


def adaptive_quality_cut(
    df: DataFrame,
    group_col: str = "lang",
    score_col: str = "n_chars",
    drop_ppm: int = 300_000,
    id_col: str = "doc_id",
    salted: bool = False,
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group adaptive quality threshold (public: Penedo et al.
    2024, FineWeb/FineWeb-2 — per-LANGUAGE filter thresholds instead
    of one global cutoff, because a score distribution that is
    healthy for one language is the garbage tail of another): within
    each group, drop the lowest-scoring ``drop_ppm`` parts-per-million
    of rows and keep the rest.

    The cut is RANK-based, not value-based: keep rows whose ascending
    (score, id) rank exceeds floor(n_group * drop_ppm / 1e6). Pure
    integer arithmetic — no quantile interpolation (engines disagree
    on continuous-quantile float math), ties broken by id, so the
    kept set is exact and engine-portable. A group never loses
    everything: floor() guarantees at least the top row survives for
    drop_ppm < 1e6.

    Scale shape (100 TB): one shuffle on the group key; the rank is a
    per-group window but the FILTER is rank > constant-per-group, so
    Spark cannot group-limit it (the limit keeps the TOP, unbounded);
    state per group is the running count — the same cost class as
    per_group_cap's ranking. Groups are languages (hundreds, large) —
    skew bounded by the biggest language, the same skew the corpus
    itself has. When one language dominates (>50% of an
    English-heavy crawl — the COMMON case at 100 TB, not the
    corner), pass ``salted=True``: the two-phase rank below
    subdivides each group's shuffle into ``salt_buckets``
    score-range sub-partitions (range "salts" are the only salting
    that composes into EXACT global ranks — hash salts can't, since
    cross-salt rank offsets would need a merge of sorted streams):

      phase 0: per-group approximate score boundaries (one tiny agg;
               boundary quality only steers PARTITION BALANCE — the
               rank algebra below is exact for ANY cut points);
      phase 1: row_number within (group, bucket) — the row-bearing
               shuffle now keys on BOTH columns, so the hot group
               spreads over ``salt_buckets`` tasks;
      phase 2: per-(group, bucket) counts -> running-sum offsets
               (|groups| x ``salt_buckets`` rows, broadcast back);
               global rank = offset + local rank.

    Result-identical to the unsalted path by construction (the
    planted-skew pytest asserts exact equality); grp_rank stays INT —
    like the unsalted row_number, per-group size is bounded at 2^31.

    Output: df columns + ``grp_rank`` (1-based ascending quality rank
    within the group) for kept rows.
    """
    if not 0 <= drop_ppm < 1_000_000:
        raise ValueError(
            f"adaptive_quality_cut: drop_ppm must be in [0, 1e6), got {drop_ppm}"
        )
    from pyspark.sql import Window

    if salted:
        return _adaptive_cut_salted(
            df, group_col, score_col, drop_ppm, id_col, salt_buckets
        )

    # Explicit NULL placement (r14 ADVICE): Spark's bare asc() sorts
    # NULLs FIRST while DuckDB's bare ASC defaults to NULLS LAST — an
    # implicit default here silently diverges the kept set the moment
    # a NULL score appears. Convention: NULL score = unknown quality =
    # worst -> lowest ranks -> dropped first (NULLS FIRST on the
    # ascending rank), spelled explicitly in BOTH engines
    # (SQL_ADAPTIVE_CUT says NULLS FIRST).
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc_nulls_first(), F.col(id_col).asc_nulls_first()
    )
    wn = Window.partitionBy(group_col)
    ranked = df.withColumn("grp_rank", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    # integer div, not float floor — engine-exact at any group size
    cut = F.expr(f"(__n * CAST({int(drop_ppm)} AS BIGINT)) div 1000000")
    return ranked.filter(F.col("grp_rank") > cut).drop("__n")


def _adaptive_cut_salted(
    df: DataFrame,
    group_col: str,
    score_col: str,
    drop_ppm: int,
    id_col: str,
    salt_buckets: int,
) -> DataFrame:
    """The >50%-skew spelling of adaptive_quality_cut (r14 VERDICT
    task 4) — see its docstring for the three phases. Exactness
    argument: buckets are VALUE-disjoint (bucket = # boundaries
    strictly below the score, so score ties always share a bucket
    and NULLs land in bucket 0, preserving the NULLS FIRST
    convention), hence ascending (score, id) order across (bucket,
    local_rank) is the group's total order, and offset + local rank
    is the exact global row_number for ANY boundary values."""
    from pyspark.sql import Window

    sc = F.col(score_col).cast("double")
    probs = [i / salt_buckets for i in range(1, salt_buckets)]
    # The group key is part of the NULL language here (the unsalted
    # path ranks a NULL group like any other partition), so both
    # broadcast joins below must be null-SAFE: a bare equi-join on
    # group_col would silently drop every NULL-group row (r15 ADVICE,
    # same in-band-NULL join class as temperature_mix). Spelled as an
    # explicit eqNullSafe condition on a renamed right-side key.
    bounds = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.percentile_approx(sc, probs, 10_000).alias("__bounds")
    )
    bucket = F.aggregate(
        F.col("__bounds"),
        F.lit(0),
        # x < NULL-score is NULL -> otherwise(0): NULL scores sum to
        # bucket 0, ranked first there by the NULLS FIRST ordering
        lambda acc, x: acc + F.when(x < sc, 1).otherwise(0),
    )
    rows = (
        df.join(
            F.broadcast(bounds),
            F.col(group_col).eqNullSafe(F.col("__g")),
        )
        .drop("__g")
        # a group whose scores are ALL NULL yields NULL bounds ->
        # NULL bucket -> silently dropped by the offsets equi-join;
        # coalesce to the empty array so such groups land whole in
        # bucket 0 (where the NULLS FIRST ordering puts them anyway)
        .withColumn(
            "__bounds",
            F.coalesce(F.col("__bounds"), F.array().cast("array<double>")),
        )
        .withColumn("__b", bucket)
        .drop("__bounds")
    )
    wl = Window.partitionBy(group_col, "__b").orderBy(
        F.col(score_col).asc_nulls_first(), F.col(id_col).asc_nulls_first()
    )
    local = rows.withColumn("__lr", F.row_number().over(wl))
    cnts = local.groupBy(
        F.col(group_col).alias("__g"), F.col("__b").alias("__ob")
    ).agg(F.count(F.lit(1)).alias("__c"))
    wo = (
        Window.partitionBy("__g")
        .orderBy("__ob")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("__g")
    offs = cnts.select(
        "__g",
        "__ob",
        F.coalesce(F.sum("__c").over(wo), F.lit(0).cast("bigint")).alias(
            "__off"
        ),
        F.sum("__c").over(wn).alias("__n"),
    )
    cut = F.expr(f"(__n * CAST({int(drop_ppm)} AS BIGINT)) div 1000000")
    out_cols = [*df.columns, "grp_rank"]
    return (
        local.join(
            F.broadcast(offs),
            F.col(group_col).eqNullSafe(F.col("__g"))
            & (F.col("__b") == F.col("__ob")),
        )
        .withColumn(
            "grp_rank", (F.col("__off") + F.col("__lr")).cast("int")
        )
        .filter(F.col("grp_rank") > cut)
        .select(*out_cols)
    )
