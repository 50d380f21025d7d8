"""Fast oracle-SQL validity gate (round-10 verdict Next #2).

Every registered exact-oracle string must at least PARSE AND BIND in
DuckDB against the real table views — ``EXPLAIN <sql>`` plans the query
without executing it, so the whole catalog checks in seconds instead of
the ~13-minute full value-comparison gate.  This is the tripwire that
would have caught round 10's ``corpus_curriculum_order`` duplicate-CTE
bug (the program's only driver CORRECTNESS failure ever): a
syntactically or semantically broken oracle now fails ANY local pytest
run instantly, not just the full gate.
"""

from __future__ import annotations

import duckdb
import pytest

from exosql_spark.catalog import all_queries

_QUERIES = all_queries()
_EXACT = sorted(n for n, q in _QUERIES.items() if q.oracle)


@pytest.mark.parametrize("name", _EXACT)
def test_oracle_sql_binds(name, duck):
    """EXPLAIN = parse + bind + plan, zero execution."""
    try:
        duck.execute(f"EXPLAIN {_QUERIES[name].oracle}")
    except duckdb.Error as e:  # pragma: no cover - failure path
        pytest.fail(f"{name}: oracle SQL does not bind in DuckDB: {e}")


def test_validity_gate_catches_broken_sql(duck):
    """Prove the gate has teeth: the exact bug class that shipped in
    round 10 (duplicate CTE name) must raise at EXPLAIN time."""
    broken = (
        "WITH h AS (SELECT 1 AS x), h AS (SELECT 2 AS x) "
        "SELECT * FROM h"
    )
    with pytest.raises(duckdb.Error):
        duck.execute(f"EXPLAIN {broken}")
    # ...and so must a reference to a column that doesn't exist.
    with pytest.raises(duckdb.Error):
        duck.execute("EXPLAIN SELECT no_such_column FROM documents")
