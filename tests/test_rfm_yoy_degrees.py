"""Batch-9 additions: RFM scoring (aggregate → distribution → enrich),
year-over-year growth (fixed-offset self-join), and the KG degree
distribution (double groupby) — each value-exact against its DuckDB
oracle plus the semantics SQL can't isolate (tie scoring at quintile
cuts, missing-prior-year exclusion, degree histogram of a path)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _oracle(views: dict[str, str], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, path in views.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(np.float64).round(9)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestCustomerRfm:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            CUSTOMER_RFM_ORACLE,
            customer_rfm,
        )

        got = _canon(customer_rfm(SF).to_pandas())
        exp = _canon(_oracle({"orders": f"{SF}/orders.parquet"},
                             CUSTOMER_RFM_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_quintiles_and_ties(self, ray_session, tmp_path):
        """Five customers with strictly increasing frequency get f
        scores 1..5; two customers TIED on a metric's cut value get the
        same score (value-based quintiles, not positional NTILE)."""
        from entity_extractor_linker_ray.pipelines.relational import customer_rfm

        rows = []
        oid = 1
        # customer k (1..5) places k orders, all same day/price
        for cust in range(1, 6):
            for _ in range(cust):
                rows.append((oid, cust, "O", 100.0,
                             pd.Timestamp("2024-01-01"), "1-URGENT"))
                oid += 1
        orders = pd.DataFrame(
            rows, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                           "o_totalprice", "o_orderdate", "o_orderpriority"]
        )
        orders.to_parquet(tmp_path / "orders.parquet")

        got = customer_rfm(str(tmp_path)).to_pandas().set_index("custkey")
        assert list(got.sort_index()["f_score"]) == [1, 2, 3, 4, 5]
        # everyone shares one order day -> identical recency -> all
        # land in the SAME (lowest) r bucket: ties score identically
        assert got["r_score"].nunique() == 1


class TestYoyGrowth:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDERS_YOY_GROWTH_ORACLE,
            orders_yoy_growth,
        )

        got = _canon(orders_yoy_growth(SF).to_pandas())
        exp = _canon(_oracle({"orders": f"{SF}/orders.parquet"},
                             ORDERS_YOY_GROWTH_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_offset_join_semantics(self, ray_session, tmp_path):
        """Jan 2024 compares against Jan 2023 (not Dec 2023); months
        with no year-ago counterpart are excluded; the ratio is
        exact."""
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_yoy_growth,
        )

        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(1, 5, dtype=np.int64),
                "o_custkey": np.zeros(4, dtype=np.int64),
                "o_orderstatus": ["O"] * 4,
                "o_totalprice": [100.0, 999.0, 150.0, 10.0],
                "o_orderdate": pd.to_datetime(
                    ["2023-01-15", "2023-12-15", "2024-01-15", "2024-02-15"]
                ),
                "o_orderpriority": ["1-URGENT"] * 4,
            }
        )
        orders.to_parquet(tmp_path / "orders.parquet")

        got = orders_yoy_growth(str(tmp_path)).to_pandas()
        assert len(got) == 1  # only Jan 2024 has a Jan 2023
        row = got.iloc[0]
        assert row["month_idx"] == 2024 * 12 + 0
        assert row["prev_year_centi"] == 10000  # Jan 2023, NOT Dec 2023
        assert row["yoy_growth"] == 0.5  # 150 vs 100


class TestDegreeDistribution:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_degree_distribution,
            kg_degree_distribution_oracle,
        )

        got = _canon(kg_degree_distribution(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             kg_degree_distribution_oracle()))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_path_graph_histogram(self, ray_session, tmp_path):
        """spark—hash—vector: the middle node has degree 2, the two
        endpoints degree 1 → histogram {1: 2, 2: 1}. 'zzz' spacers keep
        the round-4 bigram vocabulary from adding extra nodes."""
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_degree_distribution,
        )

        docs = pd.DataFrame(
            {
                "doc_id": np.array([1, 2], dtype=np.int64),
                "text": ["spark zzz hash", "hash zzz vector"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": np.zeros(2, dtype=np.int64),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = (
            kg_degree_distribution(str(tmp_path))
            .to_pandas()
            .set_index("degree")["n_entities"]
            .to_dict()
        )
        assert got == {1: 2, 2: 1}
