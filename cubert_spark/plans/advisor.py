"""Scale advisor — project a plan's data volumes to N× today's input
and report where it breaks BEFORE running it on the big cluster.

The question every operator here is designed around — "would this
plan survive 100 TB?" — made executable: walk the optimized logical
plan, take Catalyst's per-node size estimates (`stats.sizeInBytes`,
the same numbers AQE plans with), multiply by the projection factor,
and report each shuffle boundary and broadcast with its projected
bytes plus the knob that keeps it healthy (shuffle partition count
for ~target-sized partitions; broadcast demotion when a "small" side
outgrows the threshold).

Catalyst's estimates are heuristics (filter selectivities are
guesses), so the output is an ADVISOR, not a gate — but the failure
modes it flags (a broadcast that 1000×'s past the threshold, a
shuffle needing 100k partitions on a 200-partition config) are
exactly the ones that surface only on the big run otherwise.

No reference analog: Cubert made users pick reducer counts and block
costs by hand per job (src/plan/physical/JobExecutor.java); this is
the Spark-era inverse — read the optimizer's own cost model and tell
the user what to set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

#: logical nodes that compile to a shuffle exchange (hash or range)
_SHUFFLE_NODES = {
    "Aggregate": "hash on grouping keys",
    "Join": "hash on join keys (unless one side broadcasts)",
    "Sort": "range (global sort only)",
    "RepartitionByExpression": "hash on repartition keys",
    "Repartition": "round-robin",
    "Window": "hash on partition spec",
    "Deduplicate": "hash on dedup keys",
    "Distinct": "hash on all columns",
}


@dataclass
class ScaleFinding:
    node: str
    detail: str
    est_bytes_now: int
    est_bytes_at_factor: int
    advice: str
    confidence: str = "scan-derived"


def _size(jnode) -> int:
    try:
        return int(jnode.stats().sizeInBytes())  # py4j converts BigInt
    except Exception:
        return -1


def _is_shuffling(jnode, name: str) -> bool:
    """True when this logical node compiles to an exchange. Sort and
    Repartition carry flags: Sort(global=false) is
    sortWithinPartitions and Repartition(shuffle=false) is coalesce —
    neither shuffles."""
    try:
        if name == "Sort":
            return bool(getattr(jnode, "global")())
        if name == "Repartition":
            return bool(jnode.shuffle())
    except Exception:
        pass
    return True


def scale_projection(
    df: DataFrame,
    factor: float = 1000.0,
    target_partition_bytes: int = 256 << 20,
    broadcast_threshold: int | None = None,
) -> list[ScaleFinding]:
    """Project every shuffle boundary and join input of ``df``'s
    optimized plan to ``factor``× current size. Returns one finding
    per boundary with the projected bytes and concrete advice.

    ``factor`` scales every relation uniformly — the right model for
    "same pipeline, bigger corpus"; when dimensions are fixed-size
    (nation, region) the broadcast advice is conservative.
    ``broadcast_threshold`` defaults to the SESSION's
    spark.sql.autoBroadcastJoinThreshold so "broadcasts today" means
    what this session would actually plan."""
    if broadcast_threshold is None:
        raw = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        broadcast_threshold = _parse_bytes(raw)
    plan = df._jdf.queryExecution().optimizedPlan()
    findings: list[ScaleFinding] = []

    def visit(node) -> bool:
        """Bottom-up single pass; returns whether the subtree contains
        a Join (ONE traversal total — a per-node _has_join_below walk
        would be quadratic in py4j round-trips)."""
        name = node.nodeName()
        children = node.children()
        has_join = name == "Join"
        child_bytes = 0
        joins_below = False
        child_sizes = []
        for i in range(children.size()):
            child = children.apply(i)
            joins_below = visit(child) or joins_below
            sz = _size(child)
            child_sizes.append(sz)
            if sz > 0:
                child_bytes += sz
        if name in _SHUFFLE_NODES and _is_shuffling(node, name):
            projected = int(child_bytes * factor)
            parts = max(1, projected // target_partition_bytes)
            findings.append(
                ScaleFinding(
                    node=name,
                    detail=_SHUFFLE_NODES[name],
                    est_bytes_now=child_bytes,
                    est_bytes_at_factor=projected,
                    advice=(
                        f"shuffle ~{_fmt(projected)} at {factor:g}x -> "
                        f"needs ~{parts} partitions of "
                        f"{_fmt(target_partition_bytes)} (AQE coalesces "
                        "down; a fixed spark.sql.shuffle.partitions below "
                        "this spills)"
                    ),
                    confidence=(
                        # Catalyst's SizeInBytesOnly visitor estimates a
                        # join's output multiplicatively — a WILD upper
                        # bound; AQE re-plans from true runtime sizes
                        "upper-bound (post-join static estimate)"
                        if joins_below
                        else "scan-derived"
                    ),
                )
            )
        if name == "Join":
            # flag each side that is broadcast-sized today but not at
            # factor x — the silent plan flip that turns a map-side
            # join into the pipeline's biggest shuffle
            for sz in child_sizes:
                if sz <= 0:
                    continue
                projected = int(sz * factor)
                if sz <= broadcast_threshold < projected:
                    findings.append(
                        ScaleFinding(
                            node="Join(side)",
                            detail="broadcast-sized today, NOT at factor",
                            est_bytes_now=sz,
                            est_bytes_at_factor=projected,
                            advice=(
                                f"side is {_fmt(sz)} now (broadcasts) but "
                                f"~{_fmt(projected)} at {factor:g}x — the "
                                "plan silently flips to a shuffle join; "
                                "pre-bucket both sides on the join key, or "
                                "keep the dim genuinely bounded"
                            ),
                        )
                    )
        return has_join or joins_below

    visit(plan)
    return findings


def _parse_bytes(v) -> int:
    """spark.sql.autoBroadcastJoinThreshold accepts '10MB'-style
    strings or plain byte counts."""
    s = str(v).strip().lower()
    for suf, mul in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                     ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                     ("b", 1)):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mul)
    return int(s)


def _fmt(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB", "PiB"):
        if abs(n) < 1024:
            return f"{n:.0f}{unit}"
        n /= 1024
    return f"{n:.0f}EiB"


def report(df: DataFrame, factor: float = 1000.0, **kw) -> str:
    """Human-readable projection report (one line per finding)."""
    lines = [f"scale projection at {factor:g}x:"]
    for f in scale_projection(df, factor, **kw):
        lines.append(
            f"  {f.node:28s} now={_fmt(f.est_bytes_now):>8s} "
            f"at_factor={_fmt(f.est_bytes_at_factor):>8s} "
            f"[{f.confidence}]  {f.advice}"
        )
    if len(lines) == 1:
        lines.append("  no shuffle boundaries — plan is a pure map pipeline")
    return "\n".join(lines)
