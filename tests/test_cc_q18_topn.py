"""Tenth-session batch: per-node clustering coefficient, Q18-shaped
large-volume customers, per-brand top-N."""

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


def _planted_edges():
    """Square a-b-c-d + diagonal a-c + pendant e on a.
    Triangles: {a,b,c} and {a,c,d}. deg a=4 b=2 c=3 d=2 e=1."""
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {"subject": ["a", "b", "c", "a", "a", "e"],
             "object": ["b", "c", "d", "d", "c", "a"]}
        )
    )


class TestKgClusteringCoefficient:
    def test_planted_graph_values(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_clustering_coefficient,
        )

        df = (
            kg_clustering_coefficient("unused", edges_ds=_planted_edges())
            .to_pandas().set_index("node").sort_index()
        )
        assert df.loc["a", "degree"] == 4
        assert df.loc["a", "n_triangles"] == 2
        assert df.loc["a", "local_cc"] == 2 * 2 / (4 * 3)
        assert df.loc["b", "local_cc"] == 1.0  # its 2 neighbors linked
        assert df.loc["c", "n_triangles"] == 2
        assert df.loc["c", "local_cc"] == 2 * 2 / (3 * 2)
        assert df.loc["d", "local_cc"] == 1.0
        # degree-1 node: coefficient defined as 0, not NaN/inf
        assert df.loc["e", "n_triangles"] == 0
        assert df.loc["e", "local_cc"] == 0.0
        assert len(df) == 5

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_clustering_coefficient,
            kg_clustering_coefficient_oracle,
        )

        got = (
            kg_clustering_coefficient(SF).to_pandas()
            .sort_values("node").reset_index(drop=True)
        )
        exp = (
            _connect().execute(kg_clustering_coefficient_oracle()).df()
            .sort_values("node").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["local_cc"].to_numpy() == exp["local_cc"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestQ18LargeVolumeCustomers:
    def test_boundary_and_missing_customer(self, ray_session, tmp_path):
        """>= is inclusive at exactly min_qty; a qualifying order whose
        custkey has no customer row drops (inner-join semantics)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q18_large_volume_customers,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2], dtype=np.int64),
             "c_name": ["Customer#1", "Customer#2"]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_orderkey": np.array([10, 20, 30, 40], dtype=np.int64),
             "o_custkey": np.array([1, 1, 2, 99], dtype=np.int64),
             "o_totalprice": [1000.0, 500.0, 750.0, 900.0]}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([10, 10, 20, 30, 40], dtype=np.int64),
             # order 10: 300 total (in); 20: 249.99 (out, strict);
             # 30: exactly 250 (in, boundary); 40: 260 but custkey 99
             "l_quantity": [150.0, 150.0, 249.99, 250.0, 260.0]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            q18_large_volume_customers(str(tmp_path)).to_pandas()
            .sort_values("o_orderkey").reset_index(drop=True)
        )
        assert got["o_orderkey"].tolist() == [10, 30]
        assert got["c_name"].tolist() == ["Customer#1", "Customer#2"]
        assert got["sum_qty_c2"].tolist() == [30000, 25000]

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q18_large_volume_customers,
            q18_large_volume_customers_oracle,
        )

        got = (
            q18_large_volume_customers(SF).to_pandas()
            .sort_values("o_orderkey").reset_index(drop=True)
        )
        exp = (
            _connect().execute(q18_large_volume_customers_oracle()).df()
            .sort_values("o_orderkey").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestTopPartsPerBrand:
    def test_rank_and_tie_break(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            top_parts_per_brand,
        )

        pd.DataFrame(
            {"p_brand": ["A", "A", "A", "A", "B", "B"],
             "p_partkey": np.array([4, 2, 3, 1, 5, 6], dtype=np.int64),
             # A: tie at 9.00 -> partkey asc decides; B: only 2 parts
             "p_retailprice": [9.0, 9.0, 5.0, 10.0, 3.0, 7.0]}
        ).to_parquet(tmp_path / "part.parquet")
        got = (
            top_parts_per_brand(str(tmp_path)).to_pandas()
            .sort_values(["p_brand", "rn"]).reset_index(drop=True)
        )
        a = got[got["p_brand"] == "A"]
        assert a["p_partkey"].tolist() == [1, 2, 4]  # 10.0, then tie 2<4
        assert a["rn"].tolist() == [1, 2, 3]
        b = got[got["p_brand"] == "B"]
        assert b["p_partkey"].tolist() == [6, 5]  # short group kept whole
        assert b["rn"].tolist() == [1, 2]

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            top_parts_per_brand,
            top_parts_per_brand_oracle,
        )

        got = (
            top_parts_per_brand(SF).to_pandas()
            .sort_values(["p_brand", "rn"]).reset_index(drop=True)
        )
        exp = (
            _connect().execute(top_parts_per_brand_oracle()).df()
            .sort_values(["p_brand", "rn"]).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
