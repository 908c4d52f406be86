"""Full-outer reconciliation join + grouped value histogram: oracle
parity at sf0.001 plus the semantics the corpus can't exhibit (keys
unmatched on EACH side of the outer join; negative values and exact
bin-edge assignment)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


class TestCustomerEventActivity:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            CUSTOMER_EVENT_ACTIVITY_ORACLE,
            customer_event_activity,
        )

        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        exp = (
            con.execute(CUSTOMER_EVENT_ACTIVITY_ORACLE)
            .df()
            .sort_values("custkey")
            .reset_index(drop=True)
        )
        got = (
            customer_event_activity(SF)
            .to_pandas()
            .sort_values("custkey")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype(np.int64), exp.astype(np.int64)
        )

    def test_both_unmatched_sides(self, ray_session, tmp_path):
        """Key 1 orders-only, key 3 events-only, key 2 on both sides —
        all three survive with zero fill (true FULL OUTER, not left or
        right outer)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            customer_event_activity,
        )

        pd.DataFrame({"o_custkey": [1, 1, 2]}).to_parquet(
            tmp_path / "orders.parquet"
        )
        pd.DataFrame(
            {"user_id": [2, 3, 3, 3],
             "ts": pd.to_datetime([0, 1, 2, 3], unit="s")}
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            customer_event_activity(str(tmp_path))
            .to_pandas()
            .set_index("custkey")
            .sort_index()
        )
        assert out.loc[1].tolist() == [2, 0]
        assert out.loc[2].tolist() == [1, 1]
        assert out.loc[3].tolist() == [0, 3]
        assert len(out) == 3


class TestEventsValueHistogram:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_VALUE_HISTOGRAM_ORACLE,
            events_value_histogram,
        )

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        exp = (
            con.execute(EVENTS_VALUE_HISTOGRAM_ORACLE)
            .df()
            .sort_values(["event_type", "bin"])
            .reset_index(drop=True)
        )
        got = (
            events_value_histogram(SF)
            .to_pandas()
            .sort_values(["event_type", "bin"])
            .reset_index(drop=True)
            .astype({"bin": np.int64, "n_events": np.int64})
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_bin_edges_and_negatives(self, ray_session, tmp_path):
        """Exact edge 50.0 lands in bin 1; 49.999... in bin 0; negative
        values floor DOWNWARD (-0.5 -> bin -1), matching SQL floor."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_value_histogram,
        )

        pd.DataFrame(
            {"event_type": ["click"] * 4,
             "value": [50.0, 49.999, -0.5, 100.0]}
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            events_value_histogram(str(tmp_path))
            .to_pandas()
            .set_index("bin")["n_events"]
            .sort_index()
        )
        assert out.to_dict() == {-1: 1, 0: 1, 1: 1, 2: 1}
