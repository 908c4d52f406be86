"""Eighth-session batch: weighted single-source shortest paths
(Bellman-Ford), TPC-H-Q3-shaped unshipped revenue, and the
decorrelated below-customer-average filter."""

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


def _weighted_edges():
    """a is the lexicographic source. Direct a-b costs 10 but the
    2-hop a-c-b costs 2 — pins the min-plus (not first-reach BFS)
    semantics. Chain b-d-e-f probes the hop-bound: within rounds=4,
    f's cheapest <=4-hop path is a-b-d-e-f = 13; at rounds=5 the
    5-hop a-c-b-d-e-f = 5 wins. g-h is disconnected from a. The
    duplicate a-c (weight 3) must lose to the weight-1 parallel."""
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {"subject": ["a", "a", "a", "c", "b", "d", "e", "g"],
             "object":  ["b", "c", "c", "b", "d", "e", "f", "h"],
             "weight": np.array([10, 1, 3, 1, 1, 1, 1, 1], dtype=np.int64)}
        )
    )


class TestKgShortestPaths:
    def test_planted_weighted_graph(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import kg_shortest_paths

        d4 = (
            kg_shortest_paths("unused", edges_ds=_weighted_edges())
            .to_pandas().set_index("node")["dist"]
        )
        assert d4["a"] == 0
        assert d4["c"] == 1
        assert d4["b"] == 2  # via c, NOT the direct weight-10 edge
        assert d4["d"] == 3 and d4["e"] == 4
        # hop bound: best <=4-hop path to f rides the expensive edge
        assert d4["f"] == 13
        # disconnected component never appears
        assert "g" not in d4.index and "h" not in d4.index

    def test_extra_round_relaxes_truncated_path(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import kg_shortest_paths

        d5 = (
            kg_shortest_paths("unused", rounds=5, edges_ds=_weighted_edges())
            .to_pandas().set_index("node")["dist"]
        )
        assert d5["f"] == 5  # the 5-hop all-cheap path now fits

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_shortest_paths,
            kg_shortest_paths_oracle,
        )

        got = (
            kg_shortest_paths(SF).to_pandas()
            .sort_values("node").reset_index(drop=True)
        )
        exp = (
            _connect().execute(kg_shortest_paths_oracle()).df()
            .sort_values("node").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


@pytest.fixture(scope="module")
def q3_dir(tmp_path_factory):
    """Boundary fixture: order date EQUAL to the cutoff is excluded
    (strict <), lineitem shipped ON the cutoff is excluded (strict >),
    wrong segment is excluded, and an order whose every line shipped
    early has no revenue row (inner join drops it)."""
    d = tmp_path_factory.mktemp("q3_sf")
    cut = pd.Timestamp("1998-06-01")
    pd.DataFrame(
        {"c_custkey": np.array([1, 2], dtype=np.int64),
         "c_mktsegment": ["BUILDING", "AUTOMOBILE"]}
    ).to_parquet(d / "customer.parquet")
    pd.DataFrame(
        {"o_orderkey": np.array([1, 2, 3, 4], dtype=np.int64),
         "o_custkey": np.array([1, 1, 2, 1], dtype=np.int64),
         "o_orderdate": pd.to_datetime(
             ["1998-05-31", "1998-06-01", "1998-05-01", "1998-05-01"]),
         "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW"]}
    ).to_parquet(d / "orders.parquet")
    pd.DataFrame(
        {"l_orderkey": np.array([1, 1, 1, 2, 4], dtype=np.int64),
         "l_extendedprice": [100.0, 999.0, 50.0, 77.0, 88.0],
         "l_discount": [0.10, 0.05, 0.0, 0.0, 0.0],
         "l_shipdate": pd.to_datetime(
             ["1998-06-02", cut, "1998-07-01", "1998-07-01", "1998-05-01"])}
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


class TestQ3UnshippedRevenue:
    def test_boundary_semantics_planted(self, ray_session, q3_dir):
        from entity_extractor_linker_ray.pipelines.relational import (
            q3_unshipped_revenue,
        )

        got = q3_unshipped_revenue(q3_dir).to_pandas()
        assert len(got) == 1  # o2 date-boundary, o3 segment, o4 no lines
        row = got.iloc[0]
        assert row["o_orderkey"] == 1
        # 10000c * (100-10) + 5000c * 100; the ON-cutoff line excluded
        assert row["revenue_c4"] == 100_00 * 90 + 50_00 * 100
        assert row["o_orderdate"] == "1998-05-31"
        assert row["o_orderpriority"] == "1-URGENT"

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q3_unshipped_revenue,
            q3_unshipped_revenue_oracle,
        )

        got = q3_unshipped_revenue(SF).to_pandas().reset_index(drop=True)
        exp = _connect().execute(q3_unshipped_revenue_oracle()).df()
        assert len(got) == len(exp) > 0
        # top-k is ORDERED output: compare row-by-row, not as a set
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)],
            exp[sorted(exp.columns)].reset_index(drop=True),
            check_dtype=False,
        )
        assert (np.diff(got["revenue_c4"].to_numpy()) <= 0).all()


class TestOrdersBelowCustomerAvg:
    def test_equal_orders_yield_nothing(self, ray_session, tmp_path):
        """All-equal orders are never STRICTLY below their own average
        — the integer cross-multiply comparison can't flip a boundary
        row the way a float average could."""
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_below_customer_avg,
        )

        pd.DataFrame(
            {"o_orderkey": np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
             "o_custkey": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
             # cust1: all equal -> none below; cust2: avg 20 -> only 10
             "o_totalprice": [15.0, 15.0, 15.0, 10.0, 20.0, 30.0]}
        ).to_parquet(tmp_path / "orders.parquet")
        got = orders_below_customer_avg(str(tmp_path)).to_pandas()
        assert got["o_orderkey"].tolist() == [4]
        assert got.iloc[0]["total_cents"] == 1000
        assert got.iloc[0]["cust_n_orders"] == 3
        assert got.iloc[0]["cust_sum_cents"] == 6000

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDERS_BELOW_CUSTOMER_AVG_ORACLE,
            orders_below_customer_avg,
        )

        got = (
            orders_below_customer_avg(SF).to_pandas()
            .sort_values("o_orderkey").reset_index(drop=True)
        )
        exp = (
            _connect().execute(ORDERS_BELOW_CUSTOMER_AVG_ORACLE).df()
            .sort_values("o_orderkey").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
