"""Fourteenth-session batch, part 17: duplicate-cluster size histogram
and global balance z-score outliers."""

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


class TestDedupClusterSizes:
    def test_planted_family_sizes(self, ray_session, tmp_path):
        """One triplet family + one pair family -> histogram rows
        (3, 1) and (2, 1)."""
        from entity_extractor_linker_ray.ops.graph_algos import (
            dedup_cluster_sizes,
        )

        a = ("the quick brown fox jumps over the lazy dog near "
             "the riverbank every single morning")
        b = ("completely different words about arrow batches "
             "streaming through object stores tonight quietly")
        pd.DataFrame(
            {"doc_id": np.arange(1, 7, dtype=np.int64),
             "text": [a, a, a, b, b,
                      "a unique document unlike any other in this corpus"],
             "lang": ["en"] * 6}
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            dedup_cluster_sizes(str(tmp_path)).to_pandas()
            .sort_values("cluster_size").reset_index(drop=True)
        )
        assert got["cluster_size"].tolist() == [2, 3]
        assert got["n_clusters"].tolist() == [1, 1]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            dedup_cluster_sizes,
            dedup_cluster_sizes_oracle,
        )

        got = (
            dedup_cluster_sizes(SF).to_pandas()
            .sort_values("cluster_size").reset_index(drop=True)
        )
        exp = (
            _connect().execute(dedup_cluster_sizes_oracle()).df()
            .sort_values("cluster_size").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestSupplierBalanceOutliers:
    def test_planted_outlier(self, ray_session, tmp_path):
        """Nine balanced suppliers and one whale: only the whale's |z|
        clears 1.5, and z matches the closed form."""
        from entity_extractor_linker_ray.pipelines.relational import (
            supplier_balance_outliers,
        )

        bal = [10.0] * 9 + [1000.0]
        pd.DataFrame(
            {"s_suppkey": np.arange(10, dtype=np.int64),
             "s_nationkey": np.zeros(10, dtype=np.int64),
             "s_acctbal": bal}
        ).to_parquet(tmp_path / "supplier.parquet")
        got = supplier_balance_outliers(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert r["s_suppkey"] == 9
        vc = np.array([1000] * 9 + [100000], dtype=np.int64)
        n = np.int64(10)
        mean = np.float64(vc.sum()) / n
        var = np.float64((vc * vc).sum()) / n - mean * mean
        assert r["z_score"] == (100000 - mean) / np.sqrt(var)

    def test_constant_flags_nothing(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            supplier_balance_outliers,
        )

        pd.DataFrame(
            {"s_suppkey": np.arange(4, dtype=np.int64),
             "s_nationkey": np.zeros(4, dtype=np.int64),
             "s_acctbal": [5.0] * 4}
        ).to_parquet(tmp_path / "supplier.parquet")
        got = supplier_balance_outliers(str(tmp_path))
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        assert len(got) == 0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            SUPPLIER_BALANCE_OUTLIERS_ORACLE,
            supplier_balance_outliers,
        )

        got = (
            supplier_balance_outliers(SF).to_pandas()
            .sort_values("s_suppkey").reset_index(drop=True)
        )
        exp = (
            _connect().execute(SUPPLIER_BALANCE_OUTLIERS_ORACLE).df()
            .sort_values("s_suppkey").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["z_score"].to_numpy() == exp["z_score"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
