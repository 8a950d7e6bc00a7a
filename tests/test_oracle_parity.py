"""The local correctness gate: every declared query must match its
DuckDB oracle at sf0.001 (the driver re-runs the same check at sf0.01).
"""

from __future__ import annotations

import pytest

from cubert_spark.oracle import compare, duck_connect
from cubert_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()

# Queries allowed to return 0 rows at sf0.001 (the gate SF) — each with
# the reason the emptiness is legitimate. Everything else failing with
# "vacuous" means its predicate selects nothing from the testdata and
# the green hash verifies no math (the r6 nation_volume bug class).
VACUOUS_OK: dict[str, str] = {}


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_dir, duck):
    if name not in ORACLES:
        pytest.skip("no oracle (rows-only query)")
    df = QUERIES[name](spark, sf_dir)
    res = compare(name, df, ORACLES[name], duck)
    assert res.match, f"{name}: {res.detail}"
    assert not res.vacuous or name in VACUOUS_OK, (
        f"{name}: 0==0-row parity is vacuous — the query's predicates"
        " select nothing from the testdata, so the green hash verifies"
        " no math; fix the predicate or allowlist with a reason"
    )
