"""Declared query inventory: one entry per implemented operator from
SURVEY.md §2 (+ datapipe extensions), each with a DuckDB oracle.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` is
the equivalent ANSI SQL. Column names are aliased identically on both
sides (the driver hash-compares after sorting columns by name).
"""

from __future__ import annotations

from cubert_spark.queries import (
    core,
    datapipe,
    events,
    extensions,
    olap,
    physical,
    scriptq,
)

_MODULES = (core, olap, events, datapipe, extensions, scriptq, physical)

# Declaration order is a freshness-rotation policy, not a hand-tuned
# list: the attestation driver checks the first N declared queries per
# round, so we declare least-recently-green-attested first (computed
# from the CORRECTNESS_r*.json records the driver itself wrote; ties
# broken by name). Standing rule this implements: no query goes two
# rounds without re-attestation, and never-green queries (new, or
# previously mismatched) always rotate to the front. The policy is
# data-derived and deterministic — adding a query or a new round's
# record re-ranks everything with no manual edits.


def _last_green_round() -> dict[str, int]:
    """name -> last round whose driver record attested the query green
    (hash_match for oracled queries; presence of the declared rows-only
    record for no-oracle ones). Unrecorded / never-green -> absent."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                records = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in records.items():
            green = rec.get("hash_match") is True or (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered(merged):
    last = _last_green_round()
    return {
        name: merged[name]
        for name in sorted(merged, key=lambda n: (last.get(n, 0), n))
    }


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _ordered(out)
