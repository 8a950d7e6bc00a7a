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


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
