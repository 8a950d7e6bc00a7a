"""Cubert operator semantics as DataFrame combinators (SURVEY.md §2).

Each function is a thin, declarative wrapper: it builds a Catalyst plan
and never materializes data on the driver. Partitioning/sort
preconditions that Cubert checks at compile time (PostCondition.java)
are *provided* by Spark's EnsureRequirements instead — the combinator
states the requirement (groupBy, window, join keys) and Catalyst
inserts exchanges/sorts only when actually needed, which is how a
blockgen'd (bucketed) input avoids the shuffle exactly like Cubert.
"""

from cubert_spark.operators.rowops import (
    generate,
    filter_by,
    flatten,
    duplicate,
    tee,
)
from cubert_spark.operators.groupby import group_by, AGGS, agg_column
from cubert_spark.operators.cube import (
    cube,
    rollup,
    grouping_sets,
    grouping_combos,
)
from cubert_spark.operators.joins import join, merge_join, hash_join, rs_join
from cubert_spark.operators.setops import (
    distinct,
    sort,
    sort_within_blocks,
    limit,
    gather,
    combine,
)
from cubert_spark.operators.rank import rank, top_n
from cubert_spark.operators.dictionary import (
    build_dictionary,
    encode,
    decode,
    refresh_dictionary,
)
from cubert_spark.operators.blockgen import blockgen, load_block, BlockSpec
from cubert_spark.operators.bloom import bloom_build, bloom_prune
from cubert_spark.operators.skyline import skyline2d
from cubert_spark.operators.cdc import apply_changelog

__all__ = [
    "generate",
    "filter_by",
    "flatten",
    "duplicate",
    "tee",
    "group_by",
    "AGGS",
    "agg_column",
    "cube",
    "rollup",
    "grouping_sets",
    "grouping_combos",
    "join",
    "merge_join",
    "hash_join",
    "rs_join",
    "distinct",
    "sort",
    "sort_within_blocks",
    "limit",
    "gather",
    "combine",
    "rank",
    "top_n",
    "build_dictionary",
    "encode",
    "decode",
    "refresh_dictionary",
    "blockgen",
    "load_block",
    "BlockSpec",
    "bloom_build",
    "bloom_prune",
    "skyline2d",
    "apply_changelog",
]
