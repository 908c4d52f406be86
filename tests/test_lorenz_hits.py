"""Thirteenth-session batch: Lorenz revenue-concentration deciles and
integer fixed-point HITS hubs/authorities."""

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


class TestRevenueConcentrationDeciles:
    def test_planted_lorenz_points(self, ray_session, tmp_path):
        """10 customers with revenues 1..10: decile k holds exactly
        customer k, cumulative share = (1+..+k)/55, exactly."""
        from entity_extractor_linker_ray.pipelines.relational import (
            revenue_concentration_deciles,
        )

        pd.DataFrame(
            {"o_custkey": np.arange(1, 11, dtype=np.int64),
             "o_totalprice": np.arange(1, 11, dtype=np.float64)}
        ).to_parquet(tmp_path / "orders.parquet")
        got = (
            revenue_concentration_deciles(str(tmp_path)).to_pandas()
            .sort_values("decile").reset_index(drop=True)
        )
        assert got["decile"].tolist() == list(range(1, 11))
        assert (got["n_customers"] == 1).all()
        assert got["revenue_centi"].tolist() == [k * 100 for k in range(1, 11)]
        cums = np.cumsum(np.arange(1, 11))
        assert got["cum_share"].tolist() == [c / 55 for c in cums]
        assert got["cum_share"].iloc[-1] == 1.0

    def test_ties_share_a_decile(self, ray_session, tmp_path):
        """VALUE cuts, not NTILE positions: equal revenues land in ONE
        decile regardless of arrival order."""
        from entity_extractor_linker_ray.pipelines.relational import (
            revenue_concentration_deciles,
        )

        pd.DataFrame(
            {"o_custkey": np.array([1, 2, 3, 4], dtype=np.int64),
             "o_totalprice": [5.0, 5.0, 5.0, 5.0]}
        ).to_parquet(tmp_path / "orders.parquet")
        got = revenue_concentration_deciles(str(tmp_path)).to_pandas()
        assert len(got) == 1
        assert got.iloc[0]["n_customers"] == 4
        assert got.iloc[0]["cum_share"] == 1.0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            REVENUE_CONCENTRATION_DECILES_ORACLE,
            revenue_concentration_deciles,
        )

        got = (
            revenue_concentration_deciles(SF).to_pandas()
            .sort_values("decile").reset_index(drop=True)
        )
        exp = (
            _connect().execute(REVENUE_CONCENTRATION_DECILES_ORACLE).df()
            .sort_values("decile").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["cum_share"].to_numpy() == exp["cum_share"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestKgHits:
    def test_planted_hand_unrolled(self, ray_session):
        """a→c (w1), b→c (w2): c is the only authority; b is the
        stronger hub. Three rounds hand-unrolled through the integer
        renormalization (d = max(max_raw // SCALE, 1))."""
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import kg_hits

        edges = rd.from_pandas(
            pd.DataFrame(
                {"subject": ["a", "b"], "object": ["c", "c"],
                 "weight": np.array([1, 2], dtype=np.int64)}
            )
        )
        got = kg_hits("unused", edges_ds=edges).to_pandas().set_index("node")
        assert got.loc["a", "hub"] == 520_833
        assert got.loc["b", "hub"] == 1_041_666
        assert got.loc["c", "hub"] == 0
        assert got.loc["c", "auth"] == 1_041_666
        assert got.loc["a", "auth"] == 0 and got.loc["b", "auth"] == 0
        assert len(got) == 3

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_hits,
            kg_hits_oracle,
        )

        got = (
            kg_hits(SF).to_pandas()
            .sort_values("node").reset_index(drop=True)
        )
        exp = (
            _connect().execute(kg_hits_oracle()).df()
            .sort_values("node").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["hub"].to_numpy() == exp["hub"].to_numpy()).all()
        assert (got["auth"].to_numpy() == exp["auth"].to_numpy()).all()
