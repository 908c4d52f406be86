"""Fourteenth-session batch, part 18: telemetry zero-hour coverage and
cross-table balance-vs-revenue correlation."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _connect(sf=SF):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


class TestEventsZeroHourShare:
    def test_planted_dark_hours(self, ray_session, tmp_path):
        """Events at hours 0, 1, 4: span 5, present 3, zero 2 -> 0.4."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_zero_hour_share,
        )

        hours = np.array([0, 1, 1, 4], dtype=np.int64)
        pd.DataFrame(
            {"event_type": ["a"] * 4,
             "ts": pd.to_datetime(hours * 3_600_000_000, unit="us")}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_zero_hour_share(str(tmp_path))
        r = got.iloc[0]
        assert r["span_hours"] == 5 and r["present_hours"] == 3
        assert r["zero_hours"] == 2 and r["zero_share"] == 0.4

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_ZERO_HOUR_SHARE_ORACLE,
            events_zero_hour_share,
        )

        got = (
            events_zero_hour_share(SF)
            .sort_values("event_type").reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_ZERO_HOUR_SHARE_ORACLE).df()
            .sort_values("event_type").reset_index(drop=True)
        )
        assert len(got) == len(exp) == 5
        assert (got["zero_share"].to_numpy() == exp["zero_share"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestCustomerValueCorr:
    def test_planted_perfect_correlation(self, ray_session, tmp_path):
        """Revenue exactly proportional to balance -> corr == 1.0;
        a customer with no orders is excluded (inner join)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            customer_value_corr,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2, 3, 4], dtype=np.int64),
             "c_acctbal": [1.0, 2.0, 3.0, 99.0]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_custkey": np.array([1, 2, 3], dtype=np.int64),
             "o_totalprice": [10.0, 20.0, 30.0]}
        ).to_parquet(tmp_path / "orders.parquet")
        got = customer_value_corr(str(tmp_path))
        assert got.iloc[0]["n_customers"] == 3
        assert got.iloc[0]["corr"] == 1.0

    def test_anticorrelation(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            customer_value_corr,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2, 3], dtype=np.int64),
             "c_acctbal": [1.0, 2.0, 3.0]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_custkey": np.array([1, 2, 3], dtype=np.int64),
             "o_totalprice": [30.0, 20.0, 10.0]}
        ).to_parquet(tmp_path / "orders.parquet")
        got = customer_value_corr(str(tmp_path))
        assert got.iloc[0]["corr"] == -1.0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            CUSTOMER_VALUE_CORR_ORACLE,
            customer_value_corr,
        )

        got = customer_value_corr(SF)
        exp = _connect().execute(CUSTOMER_VALUE_CORR_ORACLE).df()
        assert int(got.iloc[0]["n_customers"]) == int(exp.iloc[0]["n_customers"])
        assert got.iloc[0]["corr"] == exp.iloc[0]["corr"]
