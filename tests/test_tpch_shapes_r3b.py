"""Round-3 TPC-H shapes Q13/Q15/Q17/Q19/Q9: DuckDB value parity plus
the boundary semantics the oracles can't isolate — the zero-order
customer row, revenue ties at the max, the exact 20%-of-average cut,
and disjunct band edges."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "customer", "supplier", "nation",
          "region", "part")


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
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


class TestQ13:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            Q13_ORDER_COUNT_DISTRIBUTION_ORACLE,
            q13_order_count_distribution,
        )

        got = _canon(q13_order_count_distribution(SF))
        exp = _canon(_oracle(SF, Q13_ORDER_COUNT_DISTRIBUTION_ORACLE))
        pd.testing.assert_frame_equal(got, exp)

    def test_zero_order_customers_counted(self, ray_session, tmp_path):
        """Three customers, orders only for two of them: the c_count=0
        bucket must hold exactly the orphan — the LEFT-JOIN semantics
        computed WITHOUT a join."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q13_order_count_distribution,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2, 3], dtype=np.int64),
             "c_name": ["a", "b", "c"],
             "c_nationkey": np.zeros(3, dtype=np.int32),
             "c_acctbal": np.zeros(3),
             "c_mktsegment": ["X"] * 3}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_orderkey": np.array([10, 11, 12], dtype=np.int64),
             "o_custkey": np.array([1, 1, 2], dtype=np.int64),
             "o_orderstatus": ["F"] * 3,
             "o_totalprice": np.zeros(3),
             "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
             "o_orderpriority": ["1-URGENT"] * 3}
        ).to_parquet(tmp_path / "orders.parquet")

        got = q13_order_count_distribution(str(tmp_path)).set_index("c_count")
        assert got.loc[0, "custdist"] == 1
        assert got.loc[1, "custdist"] == 1
        assert got.loc[2, "custdist"] == 1


class TestQ15:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q15_top_supplier,
            q15_top_supplier_oracle,
        )

        got = _canon(q15_top_supplier(SF))
        exp = _canon(_oracle(SF, q15_top_supplier_oracle()))
        assert len(got) >= 1
        pd.testing.assert_frame_equal(got, exp)

    def test_ties_at_max_all_kept(self, ray_session, tmp_path):
        """Two suppliers with IDENTICAL window revenue both appear;
        the out-of-window line for supplier 3 is invisible."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q15_top_supplier,
        )

        pd.DataFrame(
            {"l_orderkey": np.array([1, 2, 3], dtype=np.int64),
             "l_partkey": np.ones(3, dtype=np.int64),
             "l_suppkey": np.array([1, 2, 3], dtype=np.int64),
             "l_linenumber": np.ones(3, dtype=np.int32),
             "l_quantity": np.ones(3),
             "l_extendedprice": np.array([100.0, 100.0, 900.0]),
             "l_discount": np.array([0.10, 0.10, 0.0]),
             "l_tax": np.zeros(3),
             "l_returnflag": ["N"] * 3,
             "l_linestatus": ["O"] * 3,
             "l_shipdate": pd.to_datetime(
                 ["1996-02-01", "1996-03-01", "1997-01-01"]),
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        pd.DataFrame(
            {"s_suppkey": np.array([1, 2, 3], dtype=np.int64),
             "s_name": ["s1", "s2", "s3"],
             "s_nationkey": np.zeros(3, dtype=np.int32),
             "s_acctbal": np.zeros(3)}
        ).to_parquet(tmp_path / "supplier.parquet")

        got = q15_top_supplier(str(tmp_path))
        assert sorted(got["s_suppkey"]) == [1, 2]
        assert (got["total_rev_c4"] == 100 * 100 * 90).all()


class TestQ17:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q17_small_quantity_revenue,
            q17_small_quantity_revenue_oracle,
        )

        got = _canon(q17_small_quantity_revenue(SF))
        exp = _canon(_oracle(SF, q17_small_quantity_revenue_oracle()))
        pd.testing.assert_frame_equal(got, exp)
        assert int(got["n_rows"].iloc[0]) > 0  # the cut actually bites

    def test_exact_20pct_boundary_excluded(self, ray_session, tmp_path):
        """Part with quantities [1, 4, 5, 10]: avg = 5, cut is
        qty < 1.0 — NOTHING qualifies at qty=1 (strict <). With
        quantities [1, 9, 10, 20]: avg = 10, cut qty < 2 keeps only
        the qty=1 row."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q17_small_quantity_revenue,
        )

        def write(d, quantities):
            d.mkdir(exist_ok=True)
            n = len(quantities)
            pd.DataFrame(
                {"l_orderkey": np.arange(n, dtype=np.int64),
                 "l_partkey": np.ones(n, dtype=np.int64),
                 "l_suppkey": np.ones(n, dtype=np.int64),
                 "l_linenumber": np.ones(n, dtype=np.int32),
                 "l_quantity": np.array(quantities, dtype=np.float64),
                 "l_extendedprice": np.full(n, 10.0),
                 "l_discount": np.zeros(n),
                 "l_tax": np.zeros(n),
                 "l_returnflag": ["N"] * n,
                 "l_linestatus": ["O"] * n,
                 "l_shipdate": pd.to_datetime(["1996-01-01"] * n)}
            ).to_parquet(d / "lineitem.parquet")
            pd.DataFrame(
                {"p_partkey": np.array([1], dtype=np.int64),
                 "p_name": ["x"], "p_brand": ["Brand#13"],
                 "p_type": ["t"], "p_size": np.array([1], dtype=np.int32),
                 "p_retailprice": np.array([1.0])}
            ).to_parquet(d / "part.parquet")

        d1 = tmp_path / "a"
        write(d1, [1, 4, 5, 10])
        got = q17_small_quantity_revenue(str(d1))
        assert int(got["n_rows"].iloc[0]) == 0  # qty=1 == 0.2*avg: excluded

        d2 = tmp_path / "b"
        write(d2, [1, 9, 10, 20])
        got2 = q17_small_quantity_revenue(str(d2))
        assert int(got2["n_rows"].iloc[0]) == 1
        assert int(got2["revenue_c"].iloc[0]) == 1000  # one 10.00 line


class TestQ19AndQ9:
    def test_q19_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q19_disjunctive_revenue,
            q19_disjunctive_revenue_oracle,
        )

        got = _canon(q19_disjunctive_revenue(SF))
        exp = _canon(_oracle(SF, q19_disjunctive_revenue_oracle()))
        pd.testing.assert_frame_equal(got, exp)
        assert int(got["n_rows"].iloc[0]) > 0

    def test_q9_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q9_profit_by_nation_year,
            q9_profit_by_nation_year_oracle,
        )

        got = _canon(q9_profit_by_nation_year(SF))
        exp = _canon(_oracle(SF, q9_profit_by_nation_year_oracle()))
        assert len(got) > 10  # nations × years actually fan out
        pd.testing.assert_frame_equal(got, exp)
