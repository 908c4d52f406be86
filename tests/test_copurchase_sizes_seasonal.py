"""Fourteenth-session batch, part 14: basket set-similarity self-join,
order-size distribution, seasonal-naive forecast backtest."""

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


class TestCustomerCopurchasePairs:
    def test_planted_overlap(self, ray_session, tmp_path):
        """custs 1,2 share parts {10,11,12}; cust 3 shares only {10}:
        with min_shared=3, only (1,2) survives; overlap = 100*3//3."""
        from entity_extractor_linker_ray.ops.dedupe import (
            customer_copurchase_pairs,
        )

        orders = []
        lines = []
        baskets = {1: [10, 11, 12], 2: [10, 11, 12, 13], 3: [10, 99]}
        okey = 0
        for cust, parts in baskets.items():
            for p in parts:
                orders.append((okey, cust))
                lines.append((okey, p))
                okey += 1
        pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"]).astype(
            np.int64).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(lines, columns=["l_orderkey", "l_partkey"]).astype(
            np.int64).to_parquet(tmp_path / "lineitem.parquet")
        got = customer_copurchase_pairs(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["cust_a"], r["cust_b"]) == (1, 2)
        assert r["n_common"] == 3
        # df window keeps parts bought by >=2 customers: cust1 keeps
        # {10,11,12}, cust2 keeps {10,11,12} (13 has df=1, dropped)
        assert r["n_a"] == 3 and r["n_b"] == 3
        assert r["overlap_pct"] == 100

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.dedupe import (
            customer_copurchase_oracle,
            customer_copurchase_pairs,
        )

        key = ["cust_a", "cust_b"]
        got = (
            customer_copurchase_pairs(SF).to_pandas()
            .sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(customer_copurchase_oracle()).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestOrderSizeDistribution:
    def test_planted_histogram(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            order_size_distribution,
        )

        pd.DataFrame(
            {"l_orderkey": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64)}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            order_size_distribution(str(tmp_path)).to_pandas()
            .sort_values("n_items").reset_index(drop=True)
        )
        assert got["n_items"].tolist() == [1, 2, 3]
        assert got["n_orders"].tolist() == [1, 1, 1]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDER_SIZE_DISTRIBUTION_ORACLE,
            order_size_distribution,
        )

        got = (
            order_size_distribution(SF).to_pandas()
            .sort_values("n_items").reset_index(drop=True)
        )
        exp = (
            _connect().execute(ORDER_SIZE_DISTRIBUTION_ORACLE).df()
            .sort_values("n_items").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert int(got["n_orders"].sum()) == int(exp["n_orders"].sum())
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestEventsSeasonalNaiveMae:
    def test_planted_weekly_pattern(self, ray_session, tmp_path):
        """Hours 0 and 168 have 2 events each, hour 169 has 1; the
        dense span is [0, 169]: predictions at h=168 (err 0) and
        h=169 (|1-0|=1) -> MAE = 0.5."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_seasonal_naive_mae,
        )

        hours = [0, 0, 168, 168, 169]
        pd.DataFrame(
            {"event_type": ["a"] * 5,
             "ts": pd.to_datetime(
                 np.array(hours, dtype=np.int64) * 3_600_000_000, unit="us")}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_seasonal_naive_mae(str(tmp_path))
        assert len(got) == 1
        r = got.iloc[0]
        assert r["n_hours"] == 2
        assert r["abs_err_sum"] == 1
        assert r["mae"] == 0.5

    def test_short_series_excluded(self, ray_session, tmp_path):
        """A type whose span is shorter than the lag has no backtest
        pairs and is absent."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_seasonal_naive_mae,
        )

        pd.DataFrame(
            {"event_type": ["short"] * 2,
             "ts": pd.to_datetime(
                 np.array([0, 100], dtype=np.int64) * 3_600_000_000,
                 unit="us")}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_seasonal_naive_mae(str(tmp_path))
        assert len(got) == 0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_SEASONAL_NAIVE_MAE_ORACLE,
            events_seasonal_naive_mae,
        )

        got = (
            events_seasonal_naive_mae(SF)
            .sort_values("event_type").reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_SEASONAL_NAIVE_MAE_ORACLE).df()
            .sort_values("event_type").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["mae"].to_numpy() == exp["mae"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
