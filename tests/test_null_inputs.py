"""Null-robustness: 15% NULLs injected into every nullable value
column (text/lang/source, event value/props/type, priorities, names).
The full 118-query sweep runs offline; here the one operator whose
semantics nulls actually change (user_journeys: string_agg SKIPS
nulls, count(*) does not) is pinned against DuckDB, plus a
crash-freedom pass over the text/value kernels that consume the
nulled columns."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
NULLABLE = {
    "documents": ["text", "lang", "source"],
    "events": ["value", "props", "event_type"],
    "orders": ["o_orderpriority"],
    "customer": ["c_name", "c_mktsegment"],
}
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def nulls_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulls_sf")
    rng = np.random.default_rng(7)
    for t in TABLES:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        cols = NULLABLE.get(t, [])
        arrays = {}
        for field in tab.schema:
            col = tab.column(field.name)
            if field.name in cols and len(tab):
                mask = rng.random(len(tab)) < 0.15
                vals = [None if m else v
                        for v, m in zip(col.to_pylist(), mask)]
                col = pa.array(vals, type=field.type)
            arrays[field.name] = col
        pq.write_table(pa.table(arrays), d / f"{t}.parquet")
    return str(d)


class TestNullInputs:
    def test_user_journeys_skips_null_types(self, ray_session, nulls_sf):
        """string_agg skips NULL initials; count(*) counts the row —
        asserted value-exact against DuckDB on the nulled corpus."""
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_JOURNEYS_ORACLE,
            user_journeys,
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{nulls_sf}/events.parquet'"
        )
        exp = (
            con.execute(USER_JOURNEYS_ORACLE).fetchdf()
            .sort_values("user_id").reset_index(drop=True)
        )
        got = (
            user_journeys(nulls_sf).to_pandas()
            .sort_values("user_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    @pytest.mark.parametrize("name", [
        "doc_stats", "quality_scores", "lang_id", "tfidf_top_terms",
        "redact_props", "events_value_stats", "events_value_histogram",
        "events_transitions", "user_event_mode", "events_type_percentiles",
        "dedup_exact", "top_revenue_orders",
    ])
    def test_no_crash_on_nulls(self, ray_session, nulls_sf, name):
        import __ray_entry__ as m

        r = m.queries()[name](nulls_sf)
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        assert df is not None
