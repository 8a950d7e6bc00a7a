"""Bloom-filter semi-join pruning — filter a 100 TB fact table by a
dim-side key set WITHOUT shuffling the fact side: the dim keys reduce
to a (num_bits/32)-row bitmap that broadcasts, and membership is pure
column arithmetic plus broadcast joins. False positives only (classic
Bloom guarantee: pruned ⊇ exact semi-join), never false negatives —
a downstream exact join stays correct, just smaller.

This is the runtime-filter idea (Spark's own InSubqueryExec /
bloom-filter join hint lineage, and the reference's mesh-join
LOAD-CACHED spirit at /root/reference/src/main/java/com/linkedin/
cubert/operator/MeshJoinOperator.java) made explicit, deterministic,
and oracle-replayable: positions are md5-derived, the bitmap is a
bit_or aggregate, so DuckDB reproduces every bit.

Hash choice mirrors the minhash family (dedup.minhash_signature):
``hash_fn="md5"`` (default) is the engine-portable oracle path —
every bit position replays in DuckDB; ``hash_fn="xxhash64"`` is the
production path — one JVM-native 64-bit hash per position, no crypto
digest or hex decode on the hot path (the fact-side probe runs
num_hashes hashes per row over the whole 100 TB scan, so digest cost
IS the operator's cost). **Non-oracle callers should pass
``hash_fn="xxhash64"`` on BOTH build and probe** — measured 4.3x
faster end-to-end at sf0.1 (0.78 s vs 3.35 s, r11 A/B); the md5
default exists so bit-for-bit DuckDB replay is the out-of-the-box
behavior, not because it is the recommended production spelling::

    bloom = bloom_build(dim_keys, "custkey", hash_fn="xxhash64")
    pruned = bloom_prune(fact, "custkey", bloom, hash_fn="xxhash64")

Build and probe must use the same hash_fn (enforced: an unknown
value raises, and mismatched sides fail loudly in tests).

Sizing: num_bits=65536 / num_hashes=3 gives ~1.3 KB/1k keys; the
false-positive rate is (1 - e^(-kn/m))^k — for n=2k keys, m=64k bits,
k=3 that's ~0.6%. Scale num_bits with the key count; the bitmap stays
broadcast-small (m/32 bigints) into the millions of keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _digest_cols(key: Column, num_hashes: int, salt: str) -> list[Column]:
    """ceil(num_hashes/4) md5 digest expressions for a key. Callers
    MUST alias these in their own projection before chunking —
    referencing the raw expression from several chunk expressions
    re-evaluates the digest per chunk (CollapseProject keeps a
    multiply-referenced alias; the catalogued md5 lesson)."""
    out = []
    for g in range((num_hashes + 3) // 4):
        salt_g = f"{salt}|" if g == 0 else f"{salt}{g}|"
        out.append(F.md5(F.concat(F.lit(salt_g), key.cast("string"))))
    return out


def _chunk_positions(num_bits: int, num_hashes: int) -> list[Column]:
    """Bit positions from pre-aliased digest columns __h0, __h1, ...:
    position i = 32-bit chunk i%4 of digest i//4, mod num_bits — one
    digest per 4 hashes (the minhash md5-lane chunking), engine-
    portable (DuckDB: ('0x' || substr(md5(..), 1+8j, 8))::BIGINT)."""
    return [
        F.conv(F.substring(F.col(f"__h{i // 4}"), 1 + 8 * (i % 4), 8), 16, 10)
        .cast("bigint")
        % num_bits
        for i in range(num_hashes)
    ]


def _check_hash_fn(hash_fn: str) -> None:
    """Unknown hash_fn must raise, never fall back: a build/probe
    mismatch ('xxHash64' on one side) would silently compute md5
    positions against an xxhash64 bitmap — nearly every true match
    fails the bit test, i.e. silent false NEGATIVES, the one failure
    the operator promises never to produce."""
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(
            f"bloom: unknown hash_fn {hash_fn!r} (use 'md5' or 'xxhash64'; "
            "build and probe must pass the SAME value)"
        )


def _xx_positions(key: Column, num_bits: int, num_hashes: int, salt: str) -> list[Column]:
    """Production positions: pmod(xxhash64(salt, i, key), num_bits) —
    xxhash64 is signed, so pmod (not %) keeps positions in [0, m).
    NULL keys get NULL positions (xxhash64 SKIPS null arguments, so a
    bare call would hash the salt alone and give every NULL key a real
    bit — build would pollute the bitmap and probe would PASS null-key
    rows, diverging from the md5 twin, whose null digest drops them)."""
    return [
        F.when(
            key.isNotNull(),
            F.pmod(F.xxhash64(F.lit(salt), F.lit(i), key), F.lit(num_bits)),
        ).cast("bigint")
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 65536,
    num_hashes: int = 3,
    salt: str = "bloom",
    hash_fn: str = "md5",
) -> DataFrame:
    """Build the bitmap: (word bigint, bits bigint) with word =
    pos >> 5 and bit pos&31 OR-ed in (32 bits per word: bit 63 would
    overflow engines that CHECK bigint shifts, e.g. DuckDB) — at most
    num_bits/32 rows
    regardless of key count, bit_or-mergeable across partial
    builds (the agg IS the merge)."""
    _check_hash_fn(hash_fn)
    if hash_fn == "xxhash64":
        pos_structs = F.array(
            *_xx_positions(F.col(key_col), num_bits, num_hashes, salt)
        )
        with_h = keys
    else:
        hs = _digest_cols(F.col(key_col), num_hashes, salt)
        with_h = keys.select(*[h.alias(f"__h{g}") for g, h in enumerate(hs)])
        pos_structs = F.array(*_chunk_positions(num_bits, num_hashes))
    return (
        with_h.select(F.explode(pos_structs).alias("pos"))
        .select(
            F.shiftright("pos", 5).alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = 65536,
    num_hashes: int = 3,
    salt: str = "bloom",
    hash_fn: str = "md5",
) -> DataFrame:
    """Keep only rows whose key MAY be in the bloom set: for each of
    the num_hashes positions, the bitmap word must exist and have the
    bit set. num_hashes broadcast hash joins — the big side never
    shuffles, which is the operator's entire reason to exist."""
    _check_hash_fn(hash_fn)
    if hash_fn == "xxhash64":
        # project each xxhash64 position ONCE as an aliased __p{i}
        # and derive __w{i}/__b{i} from the alias — inlining the
        # position into both withColumns evaluates the hash twice per
        # row unless codegen CSE happens to catch it (the catalogued
        # md5 lesson; probe cost IS this operator's cost)
        xs = _xx_positions(F.col(key_col), num_bits, num_hashes, salt)
        out = df.select("*", *[p.alias(f"__p{i}") for i, p in enumerate(xs)])
        positions = [F.col(f"__p{i}") for i in range(num_hashes)]
        digest_drops = [f"__p{i}" for i in range(num_hashes)]
    else:
        hs = _digest_cols(F.col(key_col), num_hashes, salt)
        out = df.select(
            "*", *[h.alias(f"__h{g}") for g, h in enumerate(hs)]
        )
        positions = _chunk_positions(num_bits, num_hashes)
        digest_drops = [f"__h{g}" for g in range((num_hashes + 3) // 4)]
    for i, p in enumerate(positions):
        out = out.withColumn(f"__w{i}", F.shiftright(p, 5)).withColumn(
            f"__b{i}", (p % 32).cast("int")
        )
        bm = F.broadcast(
            bloom.select(
                F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__bits{i}")
            )
        )
        out = out.join(bm, f"__w{i}").filter(
            F.expr(f"(shiftright(__bits{i}, __b{i}) & 1) = 1")
        )
    drops = digest_drops
    drops += [c for i in range(num_hashes) for c in (f"__w{i}", f"__b{i}", f"__bits{i}")]
    return out.drop(*drops)
