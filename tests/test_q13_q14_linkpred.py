"""Ninth-session batch: Q13-shaped order-count distribution,
Q14-shaped promo revenue share, and common-neighbor link prediction."""

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


class TestCustomerOrderCounts:
    def test_zero_order_customers_counted(self, ray_session, tmp_path):
        """The LEFT-JOIN subtlety: never-ordered customers land in the
        c_count=0 bucket; orders with an unknown custkey are dropped."""
        from entity_extractor_linker_ray.pipelines.relational import (
            customer_order_counts,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2, 3, 4], dtype=np.int64)}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_custkey": np.array([1, 1, 1, 2, 99], dtype=np.int64)}
        ).to_parquet(tmp_path / "orders.parquet")
        got = (
            customer_order_counts(str(tmp_path)).to_pandas()
            .set_index("c_count")["n_customers"]
        )
        assert got[0] == 2  # customers 3 and 4
        assert got[1] == 1 and got[3] == 1
        assert len(got) == 3  # custkey 99 contributed nothing

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            CUSTOMER_ORDER_COUNTS_ORACLE,
            customer_order_counts,
        )

        got = (
            customer_order_counts(SF).to_pandas()
            .sort_values("c_count").reset_index(drop=True)
        )
        exp = (
            _connect().execute(CUSTOMER_ORDER_COUNTS_ORACLE).df()
            .sort_values("c_count").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert got["n_customers"].sum() == 150  # every customer counted once
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestPromoRevenueShare:
    def test_planted_share_values(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            promo_revenue_share,
        )

        pd.DataFrame(
            {"p_partkey": np.array([1, 2], dtype=np.int64),
             "p_type": ["PROMO", "STANDARD"]}
        ).to_parquet(tmp_path / "part.parquet")
        pd.DataFrame(
            {"l_partkey": np.array([1, 2, 2], dtype=np.int64),
             "l_extendedprice": [100.0, 50.0, 10.0],
             "l_discount": [0.0, 0.10, 0.0],
             "l_shipdate": pd.to_datetime(
                 ["1998-01-05", "1998-01-20", "1998-02-01"])}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = promo_revenue_share(str(tmp_path)).to_pandas().set_index(
            "ship_month"
        ).sort_index()
        jan, feb = got.loc["1998-01"], got.loc["1998-02"]
        assert jan["promo_rev_c4"] == 100_00 * 100
        assert jan["total_rev_c4"] == 100_00 * 100 + 50_00 * 90
        assert jan["promo_share_pct"] == 100.0 * 1_000_000 / 1_450_000
        assert feb["promo_rev_c4"] == 0 and feb["promo_share_pct"] == 0.0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            PROMO_REVENUE_SHARE_ORACLE,
            promo_revenue_share,
        )

        got = (
            promo_revenue_share(SF).to_pandas()
            .sort_values("ship_month").reset_index(drop=True)
        )
        exp = (
            _connect().execute(PROMO_REVENUE_SHARE_ORACLE).df()
            .sort_values("ship_month").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        # the float share is one closed-form expression on both sides
        assert (
            got["promo_share_pct"].to_numpy()
            == exp["promo_share_pct"].to_numpy()
        ).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


def _planted_edges():
    """Square a-b-c-d + diagonal a-c + pendant e on a, all weight 10,
    plus a WEAK b-d edge (weight 1) that the above-mean cutoff drops
    (1·7 < 61 ≤ 10·7). Strong-graph candidates: (b,d) via {a,c} -> 2
    — a weak tie predicted strong — and (b,e),(c,e),(d,e) via {a}."""
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {"subject": ["a", "b", "c", "a", "a", "e", "b"],
             "object": ["b", "c", "d", "d", "c", "a", "d"],
             "weight": np.array([10, 10, 10, 10, 10, 10, 1], dtype=np.int64)}
        )
    )


class TestKgLinkCandidates:
    def test_planted_candidates_and_counts(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_link_candidates,
        )

        got = kg_link_candidates("unused", edges_ds=_planted_edges()).to_pandas()
        assert [tuple(r) for r in got.to_numpy()] == [
            ("b", "d", 2), ("b", "e", 1), ("c", "e", 1), ("d", "e", 1),
        ]

    def test_k_truncation_breaks_ties_deterministically(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_link_candidates,
        )

        got = kg_link_candidates(
            "unused", k=2, edges_ds=_planted_edges()
        ).to_pandas()
        # tie at n_common=1 resolves lexicographically: (b,e) wins
        assert [tuple(r) for r in got.to_numpy()] == [
            ("b", "d", 2), ("b", "e", 1),
        ]

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_link_candidates,
            kg_link_candidates_oracle,
        )

        got = kg_link_candidates(SF).to_pandas().reset_index(drop=True)
        exp = _connect().execute(kg_link_candidates_oracle()).df()
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)],
            exp[sorted(exp.columns)].reset_index(drop=True),
            check_dtype=False,
        )
