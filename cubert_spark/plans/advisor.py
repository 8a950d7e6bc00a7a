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


def _has_join_below(jnode) -> bool:
    for n in _walk(jnode):
        if n.nodeName() == "Join":
            return True
    return False


def _walk(jnode):
    yield jnode
    children = jnode.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _size(jnode) -> int:
    try:
        return int(jnode.stats().sizeInBytes())  # py4j converts BigInt
    except Exception:
        return -1


def scale_projection(
    df: DataFrame,
    factor: float = 1000.0,
    target_partition_bytes: int = 256 << 20,
    broadcast_threshold: int = 32 << 20,
) -> list[ScaleFinding]:
    """Project every shuffle boundary and join input of ``df``'s
    optimized plan to ``factor``× current size. Returns one finding
    per boundary with the projected bytes and concrete advice.

    ``factor`` scales every relation uniformly — the right model for
    "same pipeline, bigger corpus"; when dimensions are fixed-size
    (nation, region) the broadcast advice is conservative."""
    plan = df._jdf.queryExecution().optimizedPlan()
    findings: list[ScaleFinding] = []
    for node in _walk(plan):
        name = node.nodeName()
        if name in _SHUFFLE_NODES:
            children = node.children()
            child_bytes = 0
            joins_below = False
            for i in range(children.size()):
                child = children.apply(i)
                s = _size(child)
                if s > 0:
                    child_bytes += s
                joins_below = joins_below or _has_join_below(child)
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
            children = node.children()
            for i in range(children.size()):
                s = _size(children.apply(i))
                if s <= 0:
                    continue
                projected = int(s * factor)
                if s <= broadcast_threshold < projected:
                    findings.append(
                        ScaleFinding(
                            node="Join(side)",
                            detail="broadcast-sized today, NOT at factor",
                            est_bytes_now=s,
                            est_bytes_at_factor=projected,
                            advice=(
                                f"side is {_fmt(s)} now (broadcasts) but "
                                f"~{_fmt(projected)} at {factor:g}x — the "
                                "plan silently flips to a shuffle join; "
                                "pre-bucket both sides on the join key, or "
                                "keep the dim genuinely bounded"
                            ),
                        )
                    )
    return findings


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
