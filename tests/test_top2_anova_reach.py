"""Fourteenth-session batch, part 12: two-largest order gaps, ANOVA
components by day-of-week, supplier nation reach."""

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


class TestCustomerTop2OrderGap:
    def test_planted_gaps_and_singles(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            customer_top2_order_gap,
        )

        pd.DataFrame(
            {"o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
             "o_orderkey": np.arange(4, dtype=np.int64),
             "o_totalprice": [5.0, 9.0, 7.0, 3.0]}
        ).to_parquet(tmp_path / "orders.parquet")
        got = (
            customer_top2_order_gap(str(tmp_path)).to_pandas()
            .sort_values("c_custkey").reset_index(drop=True)
        )
        assert got["top1_centi"].tolist() == [900, 300]
        assert got["top2_centi"].tolist() == [700, 0]
        assert got["gap_centi"].tolist() == [200, 0]
        assert got["n_orders_seen"].tolist() == [2, 1]

    def test_whale_scrambled_merge(self, ray_session, tmp_path):
        """300 scrambled orders for one account: the mergeable
        two-largest partial finds the true top pair."""
        from entity_extractor_linker_ray.pipelines.relational import (
            customer_top2_order_gap,
        )

        rng = np.random.RandomState(11)
        prices = rng.permutation(np.arange(1, 301)).astype(np.float64)
        pd.DataFrame(
            {"o_custkey": np.full(300, 5, dtype=np.int64),
             "o_orderkey": np.arange(300, dtype=np.int64),
             "o_totalprice": prices}
        ).to_parquet(tmp_path / "orders.parquet")
        got = customer_top2_order_gap(str(tmp_path)).to_pandas()
        r = got.iloc[0]
        assert r["top1_centi"] == 30000 and r["top2_centi"] == 29900
        assert r["gap_centi"] == 100

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            CUSTOMER_TOP2_ORDER_GAP_ORACLE,
            customer_top2_order_gap,
        )

        got = (
            customer_top2_order_gap(SF).to_pandas()
            .sort_values("c_custkey").reset_index(drop=True)
        )
        exp = (
            _connect().execute(CUSTOMER_TOP2_ORDER_GAP_ORACLE).df()
            .sort_values("c_custkey").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestEventsDowAnova:
    def test_planted_components(self, ray_session, tmp_path):
        """dow 0: values 1,3 (centi 100,300); dow 1: value 2:
        exact moments and ss_within = Σx² − (Σx)²/n."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_dow_anova_components,
        )

        base = pd.Timestamp("1970-01-01")  # epoch day 0 -> dow 0
        pd.DataFrame(
            {"ts": [base, base, base + pd.Timedelta(days=1)],
             "value": [1.0, 3.0, 2.0]}
        ).to_parquet(tmp_path / "events.parquet")
        got = (
            events_dow_anova_components(str(tmp_path))
            .sort_values("dow").reset_index(drop=True)
        )
        d0, d1 = got.iloc[0], got.iloc[1]
        assert d0["n"] == 2 and d0["sum_centi"] == 400
        assert d0["sumsq_centi2"] == 100_00 + 300 * 300
        assert d0["mean_centi"] == 200.0
        assert d0["ss_within"] == 100000.0 - 400.0 * 400 / 2  # = 20000
        assert d1["n"] == 1 and d1["ss_within"] == 0.0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_DOW_ANOVA_ORACLE,
            events_dow_anova_components,
        )

        got = (
            events_dow_anova_components(SF)
            .sort_values("dow").reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_DOW_ANOVA_ORACLE).df()
            .sort_values("dow").reset_index(drop=True)
        )
        assert len(got) == len(exp) == 7
        assert (got["ss_within"].to_numpy() == exp["ss_within"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestSupplierNationReach:
    def test_planted_reach(self, ray_session, tmp_path):
        """Supplier 1 sells into orders of customers in 2 nations;
        supplier 2 into 1; duplicate lineitems of the same order
        count once."""
        from entity_extractor_linker_ray.pipelines.relational import (
            supplier_nation_reach,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2], dtype=np.int64),
             "c_nationkey": np.array([10, 20], dtype=np.int64)}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_orderkey": np.array([100, 101], dtype=np.int64),
             "o_custkey": np.array([1, 2], dtype=np.int64)}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([100, 100, 101, 101], dtype=np.int64),
             "l_suppkey": np.array([1, 1, 1, 2], dtype=np.int64)}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            supplier_nation_reach(str(tmp_path)).to_pandas()
            .sort_values("suppkey").reset_index(drop=True)
        )
        assert got["suppkey"].tolist() == [1, 2]
        assert got["n_nations"].tolist() == [2, 1]
        assert got["n_orders"].tolist() == [2, 1]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            SUPPLIER_NATION_REACH_ORACLE,
            supplier_nation_reach,
        )

        got = (
            supplier_nation_reach(SF).to_pandas()
            .sort_values("suppkey").reset_index(drop=True)
        )
        exp = (
            _connect().execute(SUPPLIER_NATION_REACH_ORACLE).df()
            .sort_values("suppkey").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
