"""Driver-contract sanity — fast, no Ray session.

* every ``oracle_sql()`` key must name a ``queries()`` entry (a
  dangling oracle would make the driver error rather than skip);
* every oracle must BIND in DuckDB against the real table schemas
  (``EXPLAIN`` — catches syntax/binder regressions in seconds without
  executing the recursive/unrolled CTEs).
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def test_every_oracle_has_a_query(contract):
    queries, oracles = contract
    dangling = set(oracles) - set(queries)
    assert not dangling, f"oracles without queries: {sorted(dangling)}"


def test_surface_size(contract):
    queries, oracles = contract
    assert len(queries) >= 99
    assert len(oracles) >= 75


def test_every_oracle_binds_in_duckdb(contract):
    _, oracles = contract
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    failures = []
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # binder/syntax error
            failures.append((name, str(exc).splitlines()[0]))
    assert not failures, failures
