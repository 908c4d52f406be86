"""Eleventh-session batch: personalized PageRank, market-basket
type-pair lift, per-nation supplier revenue rank."""

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


class TestPersonalizedPagerank:
    def test_two_node_cycle_exact_fixed_point(self, ray_session):
        """Hand-unrolled integer fixed point on a ↔ b from source a
        (3 rounds), plus an isolated component c ↔ d that the walk
        never reaches — its rank must stay exactly 0 (no uniform
        teleport floor, unlike global PageRank)."""
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import pagerank

        edges = rd.from_pandas(
            pd.DataFrame(
                {"src": ["a", "b", "c", "d"],
                 "dst": ["b", "a", "d", "c"],
                 "weight": np.ones(4, dtype=np.int64)}
            )
        )
        got = (
            pagerank(edges, iters=3, num_partitions=4, source="a")
            .to_pandas().set_index("node")["rank"]
        )
        # r0: a=1e6 b=0 | r1: a=150000 b=850000
        # r2: a=150000+722500 b=127500 | r3: a=258375 b=741625
        assert got["a"] == 258375
        assert got["b"] == 741625
        assert got["c"] == 0 and got["d"] == 0

    def test_uniform_variant_unchanged(self, ray_session):
        """source=None must still be global PageRank — spot-check the
        two-node cycle against the single-machine replica."""
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            pagerank,
            pagerank_reference,
        )

        edges_df = pd.DataFrame(
            {"src": ["a", "b"], "dst": ["b", "a"],
             "weight": np.ones(2, dtype=np.int64)}
        )
        got = (
            pagerank(rd.from_pandas(edges_df), iters=4, num_partitions=4)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        exp = (
            pagerank_reference(edges_df, iters=4)
            .sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_personalized_pagerank,
            kg_personalized_pagerank_oracle,
        )

        got = (
            kg_personalized_pagerank(SF).to_pandas()
            .sort_values("node").reset_index(drop=True)
        )
        exp = (
            _connect().execute(kg_personalized_pagerank_oracle()).df()
            .sort_values("node").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["rank"].to_numpy() == exp["rank"].to_numpy()).all()


class TestDailyTypePairs:
    def test_planted_baskets(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            daily_type_pairs,
        )

        d1, d2 = pd.Timestamp("2024-03-01 08:00"), pd.Timestamp("2024-03-02 09:00")
        pd.DataFrame(
            {"user_id": np.array([1, 1, 1, 1, 2, 2, 2, 3], dtype=np.int64),
             # user1/day1 has A twice -> dedup inside the basket
             "ts": [d1, d1, d1, d2, d1, d1, d1, d1],
             "event_type": ["A", "A", "B", "A", "A", "B", "C", "B"]}
        ).to_parquet(tmp_path / "events.parquet")
        got = (
            daily_type_pairs(str(tmp_path)).to_pandas()
            .set_index(["t1", "t2"]).sort_index()
        )
        # baskets: u1d1{A,B} u1d2{A} u2d1{A,B,C} u3d1{B} -> n=4
        # singles: A=3 B=3 C=1; pairs: AB=2 AC=1 BC=1
        assert got.loc[("A", "B"), "n_pairs"] == 2
        assert got.loc[("A", "B"), "lift"] == 4 * 2 / (3 * 3)
        assert got.loc[("A", "C"), "n_pairs"] == 1
        assert got.loc[("A", "C"), "lift"] == 4 * 1 / (3 * 1)
        assert got.loc[("B", "C"), "lift"] == 4 * 1 / (3 * 1)
        assert len(got) == 3

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            DAILY_TYPE_PAIRS_ORACLE,
            daily_type_pairs,
        )

        got = (
            daily_type_pairs(SF).to_pandas()
            .sort_values(["t1", "t2"]).reset_index(drop=True)
        )
        exp = (
            _connect().execute(DAILY_TYPE_PAIRS_ORACLE).df()
            .sort_values(["t1", "t2"]).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["lift"].to_numpy() == exp["lift"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestSupplierRevenueRank:
    def test_ties_share_rank_and_zero_revenue_kept(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            supplier_revenue_rank,
        )

        pd.DataFrame(
            {"s_suppkey": np.array([1, 2, 3, 4], dtype=np.int64),
             "s_name": ["S1", "S2", "S3", "S4"],
             "s_nationkey": np.array([1, 1, 1, 2], dtype=np.int32)}
        ).to_parquet(tmp_path / "supplier.parquet")
        pd.DataFrame(
            # s1: 100.00 once; s2: 50.00 twice (exact tie with s1);
            # s3: nothing; suppkey 99 unknown -> dropped
            {"l_suppkey": np.array([1, 2, 2, 4, 99], dtype=np.int64),
             "l_extendedprice": [100.0, 50.0, 50.0, 10.0, 5.0],
             "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            supplier_revenue_rank(str(tmp_path)).to_pandas()
            .set_index("s_suppkey").sort_index()
        )
        assert got.loc[1, "rk"] == 1 and got.loc[2, "rk"] == 1  # shared
        assert got.loc[3, "rk"] == 3  # rank gap after the tie
        assert got.loc[3, "revenue_c4"] == 0  # LEFT: no lines, still ranked
        assert got.loc[4, "rk"] == 1  # its own nation's board
        assert len(got) == 4

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            SUPPLIER_REVENUE_RANK_ORACLE,
            supplier_revenue_rank,
        )

        got = (
            supplier_revenue_rank(SF).to_pandas()
            .sort_values("s_suppkey").reset_index(drop=True)
        )
        exp = (
            _connect().execute(SUPPLIER_REVENUE_RANK_ORACLE).df()
            .sort_values("s_suppkey").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
