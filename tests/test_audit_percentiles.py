"""FK-integrity audit + exact per-type percentiles: oracle parity at
sf0.001 plus the semantics the clean corpus can't show (actual orphan
rows; percentile index arithmetic at tiny and tied inputs)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _oracle(sf: str, query: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con.execute(query).df()


class TestFkIntegrityAudit:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            FK_INTEGRITY_AUDIT_ORACLE,
            fk_integrity_audit,
        )

        exp = (
            _oracle(SF, FK_INTEGRITY_AUDIT_ORACLE)
            .sort_values("relation")
            .reset_index(drop=True)
        )
        got = (
            fk_integrity_audit(SF)
            .to_pandas()
            .sort_values("relation")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_detects_planted_orphans(self, ray_session, tmp_path):
        """Orphans are counted per CHILD ROW (two rows referencing the
        same missing parent = 2 orphans), matched rows are not."""
        from entity_extractor_linker_ray.pipelines.relational import (
            fk_integrity_audit,
        )

        pd.DataFrame(
            {"o_custkey": [1, 1, 2, 99, 99],
             "o_orderkey": [10, 11, 12, 13, 14]}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame({"c_custkey": [1, 2, 3], "c_nationkey": [0, 0, 7]}).to_parquet(
            tmp_path / "customer.parquet"
        )
        pd.DataFrame(
            {"l_orderkey": pd.Series([10, 999], dtype=np.int64)}
        ).to_parquet(tmp_path / "lineitem.parquet")
        pd.DataFrame({"n_nationkey": [0], "n_regionkey": [0]}).to_parquet(
            tmp_path / "nation.parquet"
        )
        pd.DataFrame({"r_regionkey": [0]}).to_parquet(tmp_path / "region.parquet")
        pd.DataFrame({"user_id": pd.Series([], dtype=np.int64)}).to_parquet(
            tmp_path / "events.parquet"
        )
        out = (
            fk_integrity_audit(str(tmp_path))
            .to_pandas()
            .set_index("relation")
        )
        row = out.loc["orders.o_custkey->customer.c_custkey"]
        assert row["n_orphans"] == 2 and row["n_child_rows"] == 5
        # customer.c_nationkey -> nation: key 7 missing (1 orphan of 3)
        row = out.loc["customer.c_nationkey->nation.n_nationkey"]
        assert row["n_orphans"] == 1 and row["n_child_rows"] == 3
        # lineitem -> orders: order 999 missing (1 orphan of 2)
        row = out.loc["lineitem.l_orderkey->orders.o_orderkey"]
        assert row["n_orphans"] == 1 and row["n_child_rows"] == 2


class TestEventsTypePercentiles:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_TYPE_PERCENTILES_ORACLE,
            events_type_percentiles,
        )

        exp = (
            _oracle(SF, EVENTS_TYPE_PERCENTILES_ORACLE)
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        got = (
            events_type_percentiles(SF)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)[exp.columns]
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_small_and_tied_inputs(self, ray_session, tmp_path):
        """N=1 puts every percentile on the single value; heavy ties
        resolve to the k-th smallest (cumulative walk, not midpoint
        interpolation)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_type_percentiles,
        )

        pd.DataFrame(
            {"event_type": ["solo"] + ["tied"] * 10,
             "value": [7.5] + [1.0] * 9 + [100.0]}
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            events_type_percentiles(str(tmp_path))
            .to_pandas()
            .set_index("event_type")
        )
        assert out.loc["solo"].tolist() == [7500, 7500, 7500, 1]
        # tied: N=10 -> k50=5 (value 1.0), k90=9 (1.0), k99=10 (100.0)
        assert out.loc["tied"].tolist() == [1000, 1000, 100000, 10]


class TestBlockInvariance:
    def test_percentiles_block_count_invariant(self, ray_session, tmp_path):
        """Splitting events into 7 unequal files (different partial
        histogram boundaries) must not move any percentile."""
        import os

        import pyarrow.parquet as pq

        from entity_extractor_linker_ray.pipelines.relational import (
            events_type_percentiles,
        )

        base = (
            events_type_percentiles(SF)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        t = pq.read_table(f"{SF}/events.parquet")
        os.mkdir(tmp_path / "events.parquet")
        bounds = [len(t) * i // 7 for i in range(8)]
        for i in range(7):
            pq.write_table(
                t.slice(bounds[i], bounds[i + 1] - bounds[i]),
                tmp_path / "events.parquet" / f"part_{i}.parquet",
            )
        got = (
            events_type_percentiles(str(tmp_path))
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, got)
