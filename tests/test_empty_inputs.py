"""Robustness on legally-EMPTY inputs (0-row tables with the full
schema — an empty partition, a filtered-away shard): every operator
must either return a schema-correct empty/zero result or raise an
informative ValueError — never a KeyError/IndexError from deep inside
a kernel.

The sweep is MECHANICAL (round-4 verdict #7): it enumerates EVERY
``queries()`` key from ``__ray_entry__`` at collection time, so a new
operator can never ship unclassified — it lands in the default bucket
(must return 0 rows on an empty corpus) unless explicitly listed in
``NONZERO_ROWS`` (count-shaped outputs that stay one row of zeros) or
``RAISES`` (ops whose seeding/query contracts are violated by an empty
table and raise an informative ValueError). ``biggraph_*`` ops
synthesize their own graph and never read the corpus, so the empty
corpus is meaningless for them — they are derived (prefix-matched, not
hand-listed) and skipped.
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as _entry  # noqa: E402  (no ray.init at import)

SRC = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

ALL_QUERIES = sorted(_entry.queries())

# COUNT-shaped outputs: one row of zeros by design, never empty
NONZERO_ROWS = {
    "kg_linked_counts": 1,
    "kg_pipeline_linked_counts": 1,
    "q6_forecast_revenue": 1,
    "events_ks_stat": 1,
    "kg_ruleset_llm_agreement": 1,
    "q17_small_quantity_revenue": 1,
    "q19_disjunctive_revenue": 1,
}

# contract violations on empty embeddings -> informative ValueError
# (k-means seeding needs vec_ids 0..k-1; ANN query sets need vec_ids
# 0..q-1; PCA/coreset need a non-empty matrix)
RAISES = ["kmeans_clusters", "kmeans_exemplars", "dedup_semantic_pairs",
          "knn_brute", "knn_ivf", "knn_lsh", "knn_pq", "range_search",
          "knn_mips", "embedding_covariance", "coreset_fps",
          "pca_power_component",
          # round-5 mechanical sweep: same seeding/query contracts
          "dedup_semantic_clusters", "kmeans_separation", "knn_join",
          "knn_sq8"]

# corpus-independent ops (synthetic graph family): derived, not listed
INPUT_INDEPENDENT = [q for q in ALL_QUERIES if q.startswith("biggraph_")]

SWEEP = [q for q in ALL_QUERIES
         if q not in set(RAISES) and q not in set(INPUT_INDEPENDENT)]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tab.slice(0, 0), d / f"{t}.parquet")
    return str(d)


def _run(name, sf):
    """Returns (pandas_result, schema_column_names). Ray 2.49's
    ``to_pandas()`` drops columns on an empty Dataset, so the schema
    check reads the Dataset's own schema when one exists."""
    r = _entry.queries()[name](sf)
    if hasattr(r, "to_pandas") and hasattr(r, "schema"):  # ray Dataset
        schema = r.schema()
        return r.to_pandas(), list(schema.names) if schema else []
    df = r.to_pandas() if hasattr(r, "to_pandas") else r
    return df, list(df.columns)


def test_classification_covers_every_query():
    """The mechanical guarantee: the three buckets partition the whole
    queries() surface, and the explicit lists contain no stale names."""
    assert set(SWEEP) | set(RAISES) | set(INPUT_INDEPENDENT) == set(ALL_QUERIES)
    assert not set(RAISES) - set(ALL_QUERIES), "stale RAISES entries"
    assert not set(NONZERO_ROWS) - set(SWEEP), "stale NONZERO_ROWS entries"
    assert not set(RAISES) & set(INPUT_INDEPENDENT)


class TestEmptyInputs:
    @pytest.mark.parametrize("name", SWEEP)
    def test_empty_ok(self, ray_session, empty_sf, name):
        """Crash-freedom + the right row count (default 0; count-shaped
        overrides in NONZERO_ROWS). Column names are only asserted on
        NON-empty results: Ray 2.49 cannot propagate a schema through a
        zero-block Dataset, which is an upstream limitation, not an
        operator contract violation."""
        n_rows = NONZERO_ROWS.get(name, 0)
        df, cols = _run(name, empty_sf)
        assert len(df) == n_rows, f"{name}: {len(df)} rows"
        if n_rows > 0:
            assert len(cols) > 0, f"{name}: schema lost"

    @pytest.mark.parametrize("name", RAISES)
    def test_raises_value_error(self, ray_session, empty_sf, name):
        with pytest.raises(ValueError):
            _run(name, empty_sf)

    def test_zero_counts_row(self, ray_session, empty_sf):
        df, _ = _run("kg_linked_counts", empty_sf)
        assert df.iloc[0]["total_mentions"] == 0

    def test_pipeline_zero_counts_row(self, ray_session, empty_sf):
        """Round-5 fix: the flagship linked_counts KeyError'd on the
        schema-dropped empty collect; it must give one row of zeros."""
        df, _ = _run("kg_pipeline_linked_counts", empty_sf)
        row = df.iloc[0]
        assert row["total_entities"] == 0
        assert row["wikipedia_count"] == 0 and row["wikipedia_percent"] == 0.0
