"""Fourteenth-session batch, part 3: Q7-shaped nation trade matrix,
scale-safe PERCENT_RANK window, segment x priority contingency."""

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


class TestTradeMatrixNations:
    def test_planted_matrix_cells(self, ray_session, tmp_path):
        """One customer in ALPHA, suppliers in ALPHA and BETA: the 1995
        order's two lineitems land in (ALPHA,ALPHA) and (ALPHA,BETA)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            trade_matrix_nations,
        )

        pd.DataFrame(
            {"n_nationkey": np.array([0, 1], dtype=np.int64),
             "n_name": ["ALPHA", "BETA"]}
        ).to_parquet(tmp_path / "nation.parquet")
        pd.DataFrame(
            {"c_custkey": np.array([1], dtype=np.int64),
             "c_nationkey": np.array([0], dtype=np.int64)}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"s_suppkey": np.array([5, 6], dtype=np.int64),
             "s_nationkey": np.array([0, 1], dtype=np.int64)}
        ).to_parquet(tmp_path / "supplier.parquet")
        pd.DataFrame(
            {"o_orderkey": np.array([100], dtype=np.int64),
             "o_custkey": np.array([1], dtype=np.int64),
             "o_orderdate": pd.to_datetime(["1995-06-15"])}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([100, 100], dtype=np.int64),
             "l_suppkey": np.array([5, 6], dtype=np.int64),
             "l_extendedprice": [10.0, 20.0],
             "l_discount": [0.0, 0.5]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            trade_matrix_nations(str(tmp_path)).to_pandas()
            .sort_values(["cust_nation", "supp_nation"]).reset_index(drop=True)
        )
        assert len(got) == 2
        assert got["cust_nation"].tolist() == ["ALPHA", "ALPHA"]
        assert got["supp_nation"].tolist() == ["ALPHA", "BETA"]
        assert got["year"].tolist() == [1995, 1995]
        assert got["revenue_centi"].tolist() == [1000, 1000]  # 10.00; 20*0.5

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            TRADE_MATRIX_NATIONS_ORACLE,
            trade_matrix_nations,
        )

        key = ["cust_nation", "supp_nation", "year"]
        got = (
            trade_matrix_nations(SF).to_pandas()
            .sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(TRADE_MATRIX_NATIONS_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestEventsPercentRank:
    def test_planted_tie_semantics(self, ray_session, tmp_path):
        """values [1,2,2,4]: RANK()-style ties -> pct 0, 1/3, 1/3, 1;
        a single-event type gets 0.0."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_percent_rank,
        )

        pd.DataFrame(
            {"event_id": np.arange(1, 6, dtype=np.int64),
             "event_type": ["a", "a", "a", "a", "solo"],
             "value": [0.01, 0.02, 0.02, 0.04, 9.99]}
        ).to_parquet(tmp_path / "events.parquet")
        got = (
            events_percent_rank(str(tmp_path)).to_pandas()
            .sort_values("event_id").reset_index(drop=True)
        )
        assert got["pct_rank"].tolist() == [0.0, 1 / 3, 1 / 3, 1.0, 0.0]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_PERCENT_RANK_ORACLE,
            events_percent_rank,
        )

        got = (
            events_percent_rank(SF).to_pandas()
            .sort_values("event_id").reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_PERCENT_RANK_ORACLE).df()
            .sort_values("event_id").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["pct_rank"].to_numpy() == exp["pct_rank"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestSegmentPriorityMix:
    def test_planted_shares(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            segment_priority_mix,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2], dtype=np.int64),
             "c_mktsegment": ["RETAIL", "AUTO"]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_custkey": np.array([1, 1, 1, 1, 2], dtype=np.int64),
             "o_orderpriority": ["HIGH", "HIGH", "HIGH", "LOW", "LOW"]}
        ).to_parquet(tmp_path / "orders.parquet")
        got = (
            segment_priority_mix(str(tmp_path))
            .sort_values(["segment", "priority"]).reset_index(drop=True)
        )
        assert got["segment"].tolist() == ["AUTO", "RETAIL", "RETAIL"]
        assert got["priority"].tolist() == ["LOW", "HIGH", "LOW"]
        assert got["n"].tolist() == [1, 3, 1]
        assert got["seg_share"].tolist() == [1.0, 0.75, 0.25]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            SEGMENT_PRIORITY_MIX_ORACLE,
            segment_priority_mix,
        )

        key = ["segment", "priority"]
        got = (
            segment_priority_mix(SF).sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(SEGMENT_PRIORITY_MIX_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["seg_share"].to_numpy() == exp["seg_share"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
