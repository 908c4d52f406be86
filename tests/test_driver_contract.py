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


def test_window_rotation_is_disjoint_and_flagship_led(contract):
    """Round-keyed rotation: the 31 non-flagship window slots of
    consecutive rounds are disjoint slices of the gated pool (until the
    pool wraps), and the golden flagship stays pinned at the front for
    every round."""
    import __ray_entry__ as entry

    _, oracles = contract
    flagship = entry._GOLDEN_FLAGSHIP
    assert list(dict.fromkeys(flagship)) == flagship  # no dupes
    assert set(flagship) <= set(oracles)
    pool_size = len([k for k in oracles if k not in flagship])
    slots = entry._WINDOW - len(flagship)
    windows = [
        entry._rotated_window_keys(set(oracles), r)
        for r in range(1, 1 + pool_size // slots)
    ]
    for w in windows:
        assert len(w) == slots
        assert not (set(w) & set(flagship))
    for a, b in zip(windows, windows[1:]):
        assert not (set(a) & set(b)), "consecutive rounds overlap"
    # full coverage across one rotation cycle + the wrapping round
    seen = set().union(*windows) | set(
        entry._rotated_window_keys(set(oracles), 1 + len(windows))
    )
    assert seen == {k for k in oracles if k not in flagship}


def test_round_index_reads_correctness_files():
    import __ray_entry__ as entry

    # the repo carries rounds 1..4 → this session is round 5
    assert entry._round_index() >= 5


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
