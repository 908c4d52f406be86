"""Round-3 batch 3: TPC-H Q21/Q22/Q8 shapes (adapted to this schema —
lineitem has no commit/receipt dates, customer has no phone)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _connect(sf=SF):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _to_pd(result):
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


def _cmp(got: pd.DataFrame, exp: pd.DataFrame):
    got = got[sorted(got.columns)].sort_values(sorted(got.columns))
    exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns))
    got = got.reset_index(drop=True)
    exp = exp.reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for col in got.columns:
        g, e = got[col], exp[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            np.testing.assert_allclose(
                g.astype(float), e.astype(float), rtol=0, atol=1e-9
            )
        else:
            assert g.astype(str).tolist() == e.astype(str).tolist(), col


class TestQ21SuppliersKeptWaiting:
    def test_planted_blame(self, ray_session, tmp_path):
        """Order 1 ('F', two suppliers, only supp 7 late) blames supp 7;
        order 2 ('F', ONE supplier late) is skipped (not multi-supplier);
        order 3 (both suppliers late) is skipped (not exactly one);
        order 4 ('O') is skipped (status)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q21_suppliers_kept_waiting,
        )

        base = np.datetime64("2024-01-01", "us")
        late = base + np.timedelta64(100, "D").astype("timedelta64[us]")
        ok = base + np.timedelta64(5, "D").astype("timedelta64[us]")
        pd.DataFrame(
            {"o_orderkey": np.array([1, 2, 3, 4], dtype=np.int64),
             "o_orderstatus": ["F", "F", "F", "O"],
             "o_orderdate": [base] * 4}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([1, 1, 2, 3, 3, 4, 4], dtype=np.int64),
             "l_suppkey": np.array([7, 8, 7, 7, 8, 7, 8], dtype=np.int64),
             "l_shipdate": [late, ok, late, late, late, late, ok]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        pd.DataFrame(
            {"s_suppkey": np.array([7, 8], dtype=np.int64),
             "s_name": ["S7", "S8"]}
        ).to_parquet(tmp_path / "supplier.parquet")

        got = _to_pd(q21_suppliers_kept_waiting(str(tmp_path)))
        assert got["s_suppkey"].tolist() == [7]
        assert got["s_name"].tolist() == ["S7"]
        assert got["numwait"].tolist() == [1]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q21_suppliers_kept_waiting,
            q21_suppliers_kept_waiting_oracle,
        )

        got = _to_pd(q21_suppliers_kept_waiting(SF))
        exp = _connect().execute(q21_suppliers_kept_waiting_oracle()).df()
        assert len(got) > 0
        _cmp(got, exp)


class TestQ22IdleCustomerBalance:
    def test_planted_anti_join(self, ray_session, tmp_path):
        """Positive-balance pop = {100, 300} → avg 200. Customer 1
        (bal 300 > avg, only a LOW order) qualifies; customer 2
        (bal 100 < avg) and customer 3 (bal 300 but has an URGENT
        order) do not; customer 4 is outside the segment set."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q22_idle_customer_balance,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2, 3, 4], dtype=np.int64),
             "c_mktsegment": ["MACHINERY", "MACHINERY", "FURNITURE",
                              "BUILDING"],
             "c_acctbal": [300.0, 100.0, 300.0, 900.0]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_custkey": np.array([3, 1], dtype=np.int64),
             "o_orderpriority": ["1-URGENT", "5-LOW"]}
        ).to_parquet(tmp_path / "orders.parquet")

        got = _to_pd(q22_idle_customer_balance(str(tmp_path)))
        assert got["segment"].tolist() == ["MACHINERY"]
        assert got["numcust"].tolist() == [1]
        assert got["totacctbal_cents"].tolist() == [30000]

    def test_boundary_customer_excluded(self, ray_session, tmp_path):
        """bal == avg does NOT qualify (strict >): pop {200, 200} →
        avg 200, both at the boundary, neither passes."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q22_idle_customer_balance,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2], dtype=np.int64),
             "c_mktsegment": ["MACHINERY", "MACHINERY"],
             "c_acctbal": [200.0, 200.0]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_custkey": np.array([], dtype=np.int64),
             "o_orderpriority": np.array([], dtype=object)}
        ).to_parquet(tmp_path / "orders.parquet")

        got = _to_pd(q22_idle_customer_balance(str(tmp_path)))
        assert len(got) == 0

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q22_idle_customer_balance,
            q22_idle_customer_balance_oracle,
        )

        got = _to_pd(q22_idle_customer_balance(SF))
        exp = _connect().execute(q22_idle_customer_balance_oracle()).df()
        _cmp(got, exp)


class TestNationMarketShare:
    def test_planted_shares(self, ray_session, tmp_path):
        """One region with one customer; two suppliers from different
        nations split a year's revenue 3:1 → shares 75/25. A second
        customer outside the region contributes nothing."""
        from entity_extractor_linker_ray.pipelines.relational import (
            nation_market_share,
        )

        pd.DataFrame(
            {"r_regionkey": np.array([0, 1], dtype=np.int32),
             "r_name": ["ASIA", "EUROPE"]}
        ).to_parquet(tmp_path / "region.parquet")
        pd.DataFrame(
            {"n_nationkey": np.array([0, 1, 2], dtype=np.int32),
             "n_name": ["N0", "N1", "N2"],
             "n_regionkey": np.array([0, 0, 1], dtype=np.int32)}
        ).to_parquet(tmp_path / "nation.parquet")
        pd.DataFrame(
            {"c_custkey": np.array([10, 11], dtype=np.int64),
             "c_nationkey": np.array([0, 2], dtype=np.int32)}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"s_suppkey": np.array([20, 21], dtype=np.int64),
             "s_nationkey": np.array([0, 1], dtype=np.int32)}
        ).to_parquet(tmp_path / "supplier.parquet")
        d = np.datetime64("2024-06-01", "us")
        pd.DataFrame(
            {"o_orderkey": np.array([1, 2], dtype=np.int64),
             "o_custkey": np.array([10, 11], dtype=np.int64),
             "o_orderdate": [d, d]}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([1, 1, 2], dtype=np.int64),
             "l_suppkey": np.array([20, 21, 20], dtype=np.int64),
             "l_extendedprice": [3.0, 1.0, 50.0],
             "l_discount": [0.0, 0.0, 0.0]}
        ).to_parquet(tmp_path / "lineitem.parquet")

        got = _to_pd(nation_market_share(str(tmp_path), region="ASIA"))
        assert got["o_year"].tolist() == [2024, 2024]
        assert got["supp_nation"].tolist() == ["N0", "N1"]
        assert got["rev_c4"].tolist() == [30000, 10000]
        assert got["year_rev_c4"].tolist() == [40000, 40000]
        np.testing.assert_allclose(got["share_pct"], [75.0, 25.0])

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            nation_market_share,
            nation_market_share_oracle,
        )

        got = _to_pd(nation_market_share(SF))
        exp = _connect().execute(nation_market_share_oracle()).df()
        assert len(got) > 0
        _cmp(got, exp)
