#!/usr/bin/env python
"""Scaling-exponent measurement (r6 VERDICT task 4): run the heaviest
bench queries at two generated SFs (tools/gen_testdata.py) and report
per-query wall-time ratios and scaling exponents.

exponent = log(t_hi / t_lo) / log(input_growth), where input_growth
is the growth of the query's DOMINANT input between the two SFs
(lineitem/orders/documents grow 10x from sf0.1 to sf1; embeddings
grows 4x by the testdata's own sublinear protocol). A linear-shaped
operator should land near 1.0 at 100% CPU utilization; exponents
>~1.3 are the super-linear outliers that become 100 TB smoking guns.
Same protocol as bench.py: fresh session, warmups, noop sink,
min-of-n.

Overhead correction (r7 ADVICE): both wall times include a fixed
per-query constant (plan construction, analysis/optimization) that
deflates the exponent when t_lo is sub-second. Each timing therefore
subtracts a measured PLAN-ONLY baseline (build the DataFrame and
force the physical plan, no execution) at its own SF, and any query
whose corrected t_lo is still under ``--t-lo-floor`` seconds is
marked ``"low_confidence": true`` — its exponent is
constant-dominated and should be re-measured at a larger lo SF
before being quoted.

Usage:
  python tools/gen_testdata.py --sf 0.1 --out /tmp/gen_sf0.1
  python tools/gen_testdata.py --sf 1   --out /tmp/gen_sf1
  python tools/scaling_curve.py --lo /tmp/gen_sf0.1 --hi /tmp/gen_sf1
"""

from __future__ import annotations

import argparse
import json
import math
import time

#: query -> dominant input table (for the growth denominator)
HEAVY = {
    "fuzzy_pairs2": "customer",
    "fuzzy_pairs_blocked": "customer",
    "semantic_dedup": "embeddings",
    "bloom_prune": "lineitem",
    "minhash_lsh": "documents",
    "pq_adc_topk": "embeddings",
    "pagerank": "documents",
    "triangle_count": "documents",
    "embedding_neardup": "embeddings",
    "bm25_search": "documents",
    "ivf_topk": "embeddings",
    # second tier (r7 table, re-measured r10 with the corrected
    # plan-only baseline subtraction + --t-lo-floor protocol)
    "dedup_clusters": "documents",
    "ngram_jaccard": "documents",
    "hard_negatives": "embeddings",
    "contamination": "documents",
    "golden_record": "customer",
    "neardup_ingest": "documents",
    "tfidf_top_terms": "documents",
    "sequence_pack": "documents",
    "lm_perplexity": "documents",
    "paragraph_dedup": "documents",
    # r10: the iterative operator (3 Lloyd rounds over embeddings)
    "kmeans_lloyd": "embeddings",
    # r11: the scale-safe (corpus-relative stopword cut) spelling —
    # the benched row since r11; uncut ngram_jaccard stays above for
    # cross-round comparability
    "ngram_jaccard_cut": "documents",
    # r11: exact percentile per cuboid (Expand + partial percentile
    # buffers) — expect ~linear (one shuffle, 4x Expand fan-out)
    "cube_median": "lineitem",
    # r12: the dedup end-cap composite (cut pairs -> CC -> anti-join)
    # — its exponent was previously implied by dedup_clusters' under
    # the UNCUT pair source; measured directly since the r11 source
    # switch (69775ce)
    "neardup_dedup": "documents",
    # r12 new operators: DSIR scoring (one map stage + TakeOrdered —
    # expect ~linear) and winnowing pairs (posting-set aggs with the
    # df cut bounding pair expansion)
    "dsir_weights": "documents",
    "winnow_pairs": "documents",
    # r13 second half: SoftDedup commonness reweighting (3 linear
    # keyed shuffles, zero pair expansion — expect ~linear), the
    # CCNet bucket split (lm_perplexity + per-lang NTILE sort),
    # temperature-flattened sampling (tiny agg + pushed gate), and
    # the per-domain quota (WindowGroupLimit partial top-k)
    "soft_dedup": "documents",
    "perplexity_buckets": "documents",
    "temperature_mix": "documents",
    "domain_cap": "documents",
    # token-budget prefix selection (two-level prefix sum) and
    # token-share mixing (tiny agg + pushed gate)
    "token_budget": "documents",
    "token_mixture": "documents",
    "gopher_filter": "documents",
    "cluster_reps": "documents",
    # r13 batch 4: C4 cleaning (pure scan — expect ~linear), DoReMi
    # weights (one groupBy + |domains|-row driver fold), and D4
    # prototype pruning (kmeans labeling + cluster_id rank shuffle)
    "c4_filter": "documents",
    "doremi_weights": "documents",
    "proto_prune": "embeddings",
    # r13 batch 5: one groupBy + bounded fold / zero-shuffle generate
    "unimax_budget": "documents",
    "repeat_upsample": "documents",
    # r13 batch 6: |tokens|-row gram explode + bench join + interval
    # fold (the duplicate_spans cost class — expect ~linear)
    "decontaminate_spans": "documents",
    # r14: Arrow NFC kernel (zero shuffles — expect ~linear in chars),
    # per-shard BFD greedy (one shard shuffle + bounded kernel state),
    # and the bounded-X margin miner (|X| fixed -> ~linear in |Y|)
    "unicode_nfc": "documents",
    "adaptive_cut": "documents",
    "bestfit_pack": "documents",
    "margin_align": "embeddings",
    # r15: production margin tier (IVF probe + candidate margin rule +
    # one exact-tier ground-truth pass — the bounded-X shape again)
    "margin_align_prod": "embeddings",
    # r15 batch 2: vocab-bounded model build (expect sublinear — the
    # token explode is the data term), 3 corpus scans + bounded folds,
    # one canonical-key groupBy, and a zero-shuffle map
    "kneser_ney_lm": "documents",
    "linear_probe": "documents",
    "url_dedup": "documents",
    "span_corruption": "documents",
    "code_detect": "documents",
    "vocab_growth": "documents",
    "chat_assembly": "documents",
    # r13 batch 7: ~9x token explode + keyed gram counts + coverage
    # joins (the heaviest text operator — expect ~linear, watch it)
    "gopher_repetition": "documents",
    # r13 batch 8: pure codegen scan (c4_filter's profile)
    "refinedweb_lines": "documents",
}


def table_rows(d: str, t: str) -> int:
    import duckdb

    return duckdb.connect().execute(
        f"select count(*) from '{d}/{t}.parquet'"
    ).fetchone()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", required=True)
    ap.add_argument("--hi", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of HEAVY")
    ap.add_argument("--t-lo-floor", type=float, default=0.3,
                    help="corrected t_lo below this marks the "
                         "exponent low-confidence")
    args = ap.parse_args()

    from cubert_spark import get_session
    from cubert_spark.queries import all_queries, folded_queries

    names = list(HEAVY) if not args.queries else args.queries.split(",")
    spark = get_session(
        "scaling-curve",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    merged = {**all_queries(), **folded_queries()}
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    #: queries whose jobs run EAGERLY while the DataFrame is built
    #: (iterative driver loops / eager localCheckpoints: the expensive
    #: work runs before the noop sink). For these "plan-only" would
    #: execute the whole query, so the baseline subtraction must be
    #: skipped — their wall time IS the execution time. The
    #: CC/graph composites checkpoint their pair graph and every
    #: iteration eagerly (components.py), which made their r12
    #: first-pass "corrected" times nonsense (t at the 1e-3 clamp).
    EAGER = {
        "cluster_reps",
        # the multiplicative-weights / water-fill folds collect their
        # |domains|-row stats while the DataFrame is built
        "doremi_weights",
        "unimax_budget",
        # prototype_prune's Lloyd iterations run eagerly at build
        "proto_prune",
        "kmeans_lloyd",
        "dedup_clusters",
        "neardup_dedup",
        "triangle_count",
        "pagerank",
        "golden_record",
        "bfs_hops",
    }

    def plan_only(name: str, sf_dir: str) -> float:
        """Fixed per-query constant: build the DataFrame and force
        analysis + optimization + physical planning, execute nothing.
        min-of-n like the wall timings (same noise model)."""
        if name in EAGER:
            return 0.0
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = merged[name](spark, sf_dir)
            df._jdf.queryExecution().executedPlan()
            runs.append(time.perf_counter() - t0)
        return min(runs)

    def bench(sf_dir: str) -> dict[str, float]:
        out = {}
        for name in names:
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                merged[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            # subtract the measured plan-only constant so the exponent
            # compares EXECUTION times, not execution + fixed overhead
            out[name] = round(max(min(runs) - plan_only(name, sf_dir), 1e-3), 3)
        return out

    t_lo = bench(args.lo)
    t_hi = bench(args.hi)
    result = {}
    for name in names:
        t = HEAVY.get(name, "lineitem")
        growth = table_rows(args.hi, t) / table_rows(args.lo, t)
        ratio = t_hi[name] / t_lo[name] if t_lo[name] > 0 else float("inf")
        result[name] = {
            "t_lo": t_lo[name],
            "t_hi": t_hi[name],
            "ratio": round(ratio, 2),
            "input": t,
            "input_growth": round(growth, 2),
            "exponent": round(math.log(ratio) / math.log(growth), 2)
            if ratio > 0 and growth > 1
            else None,
            # constant-dominated lo measurement: exponent unreliable,
            # re-measure with a larger lo SF before quoting
            "low_confidence": t_lo[name] < args.t_lo_floor,
        }
        if name in EAGER:
            # the overhead correction was SKIPPED (plan-only would run
            # the whole query): fixed per-iteration driver costs stay
            # inside both timings and deflate the exponent — flag it
            # so the number is never quoted as a corrected figure
            result[name]["eager_uncorrected"] = True
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
