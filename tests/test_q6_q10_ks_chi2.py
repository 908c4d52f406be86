"""Fourteenth-session batch: TPC-H Q6/Q10 shapes, exact two-sample
Kolmogorov-Smirnov, and per-cell chi-square independence contributions."""

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


class TestQ6ForecastRevenue:
    def test_planted_filter_sum(self, ray_session, tmp_path):
        """Only the row inside the year AND the discount band AND under
        the quantity cutoff contributes; revenue is price_c2 * disc_c2."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q6_forecast_revenue,
        )

        pd.DataFrame(
            {"l_shipdate": pd.to_datetime(
                ["1997-06-01", "1996-06-01", "1997-06-01", "1997-06-01"]),
             "l_discount": [0.03, 0.03, 0.07, 0.03],
             "l_quantity": [10.0, 10.0, 10.0, 30.0],
             "l_extendedprice": [100.0, 100.0, 100.0, 100.0]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = q6_forecast_revenue(str(tmp_path))
        assert len(got) == 1
        # 10000 cents * 3 = 30000 (only row 0 qualifies)
        assert got.iloc[0]["revenue_c4"] == 30000
        assert got.iloc[0]["n_lines"] == 1

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            Q6_FORECAST_REVENUE_ORACLE,
            q6_forecast_revenue,
        )

        got = q6_forecast_revenue(SF)
        exp = _connect().execute(Q6_FORECAST_REVENUE_ORACLE).df()
        assert int(got.iloc[0]["revenue_c4"]) == int(exp.iloc[0]["revenue_c4"])
        assert int(got.iloc[0]["n_lines"]) == int(exp.iloc[0]["n_lines"]) > 0


class TestQ10ReturnedItems:
    def _mini(self, tmp_path):
        # two customers; cust 1 has two R lines in-window (300 + 200),
        # cust 2 one R line (400); out-of-window and non-R lines ignored
        pd.DataFrame(
            {"o_orderkey": np.array([10, 11, 12, 13], dtype=np.int64),
             "o_custkey": np.array([1, 1, 2, 1], dtype=np.int64),
             "o_orderdate": pd.to_datetime(
                 ["1997-02-01", "1997-03-01", "1997-02-15", "1996-02-01"])}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([10, 11, 12, 13, 10], dtype=np.int64),
             "l_extendedprice": [3.0, 2.0, 4.0, 9.0, 9.0],
             "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0],
             "l_returnflag": ["R", "R", "R", "R", "N"]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        pd.DataFrame(
            {"c_custkey": np.array([1, 2], dtype=np.int64),
             "c_name": ["alice", "bob"],
             "c_nationkey": np.array([7, 8], dtype=np.int64),
             "c_acctbal": [1.25, -3.5]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"n_nationkey": np.array([7, 8], dtype=np.int64),
             "n_name": ["FRANCE", "PERU"]}
        ).to_parquet(tmp_path / "nation.parquet")

    def test_planted_join_window_rank(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            q10_returned_items,
        )

        self._mini(tmp_path)
        got = q10_returned_items(str(tmp_path)).reset_index(drop=True)
        # cust 1: (300+200)*100 = 50000 c4 ; cust 2: 400*100 = 40000 c4
        assert got["c_custkey"].tolist() == [1, 2]
        assert got["revenue_c4"].tolist() == [50000, 40000]
        assert got["rn"].tolist() == [1, 2]
        assert got["c_name"].tolist() == ["alice", "bob"]
        assert got["n_name"].tolist() == ["FRANCE", "PERU"]
        assert got["acctbal_c2"].tolist() == [125, -350]

    def test_k_bounds_output(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            q10_returned_items,
        )

        self._mini(tmp_path)
        got = q10_returned_items(str(tmp_path), k=1)
        assert len(got) == 1
        assert got.iloc[0]["c_custkey"] == 1

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            Q10_RETURNED_ITEMS_ORACLE,
            q10_returned_items,
        )

        got = q10_returned_items(SF).reset_index(drop=True)
        exp = _connect().execute(Q10_RETURNED_ITEMS_ORACLE).df()
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)],
            exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestEventsKsStat:
    def _events(self, tmp_path, a_vals, b_vals):
        n_a, n_b = len(a_vals), len(b_vals)
        pd.DataFrame(
            {"event_type": ["click"] * n_a + ["purchase"] * n_b
                           + ["view"],  # other types must be ignored
             "value": list(a_vals) + list(b_vals) + [999.0]}
        ).to_parquet(tmp_path / "events.parquet")

    def test_planted_known_d(self, ray_session, tmp_path):
        """a = {1,2}, b = {2,3}: F_a - F_b is 0.5 at v=1 and v=2, 0 at
        v=3 -> D = 0.5 exactly."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_ks_stat,
        )

        self._events(tmp_path, [1.0, 2.0], [2.0, 3.0])
        got = events_ks_stat(str(tmp_path))
        assert got.iloc[0]["n_a"] == 2 and got.iloc[0]["n_b"] == 2
        assert got.iloc[0]["ks_d"] == 0.5

    def test_identical_distributions_zero(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            events_ks_stat,
        )

        self._events(tmp_path, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
        got = events_ks_stat(str(tmp_path))
        assert got.iloc[0]["ks_d"] == 0.0

    def test_disjoint_supports_one(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            events_ks_stat,
        )

        self._events(tmp_path, [1.0, 2.0], [10.0, 11.0])
        got = events_ks_stat(str(tmp_path))
        assert got.iloc[0]["ks_d"] == 1.0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_KS_STAT_ORACLE,
            events_ks_stat,
        )

        got = events_ks_stat(SF)
        exp = _connect().execute(EVENTS_KS_STAT_ORACLE).df()
        assert int(got.iloc[0]["n_a"]) == int(exp.iloc[0]["n_a"]) > 0
        assert int(got.iloc[0]["n_b"]) == int(exp.iloc[0]["n_b"]) > 0
        # bit-exact double, not approx: same closed-form expression shape
        assert got.iloc[0]["ks_d"] == exp.iloc[0]["ks_d"]


class TestChi2TypeDow:
    def test_independent_table_zero_contrib(self, ray_session, tmp_path):
        """Counts exactly proportional to row x col marginals give
        expected == n in every cell -> all contributions exactly 0.
        Two types x two dows, n_ij = 2 each (uniform)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            chi2_type_dow,
        )

        # epoch day 0 = dow 0; day 1 = dow 1 (epoch_days % 7 keying)
        base = pd.Timestamp("1970-01-01")
        rows = []
        for t in ["a", "b"]:
            for d in [0, 1]:
                for _ in range(2):
                    rows.append({"event_type": t,
                                 "ts": base + pd.Timedelta(days=d)})
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")
        got = chi2_type_dow(str(tmp_path))
        assert len(got) == 4
        assert (got["expected"] == 2.0).all()
        assert (got["chi2_contrib"] == 0.0).all()

    def test_planted_skew_closed_form(self, ray_session, tmp_path):
        """2x2 table [[3,1],[1,3]]: every marginal is 4, N=8, expected
        = 2 in each cell, contribution = (±1)^2 / 2 = 0.5."""
        from entity_extractor_linker_ray.pipelines.relational import (
            chi2_type_dow,
        )

        base = pd.Timestamp("1970-01-01")
        counts = {("a", 0): 3, ("a", 1): 1, ("b", 0): 1, ("b", 1): 3}
        rows = [
            {"event_type": t, "ts": base + pd.Timedelta(days=d)}
            for (t, d), c in counts.items() for _ in range(c)
        ]
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")
        got = chi2_type_dow(str(tmp_path))
        assert len(got) == 4
        assert (got["expected"] == 2.0).all()
        assert (got["chi2_contrib"] == 0.5).all()

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            CHI2_TYPE_DOW_ORACLE,
            chi2_type_dow,
        )

        key = ["event_type", "dow"]
        got = chi2_type_dow(SF).sort_values(key).reset_index(drop=True)
        exp = (
            _connect().execute(CHI2_TYPE_DOW_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["expected"].to_numpy() == exp["expected"].to_numpy()).all()
        assert (
            got["chi2_contrib"].to_numpy() == exp["chi2_contrib"].to_numpy()
        ).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestKsOneSideEmpty:
    def test_present_side_count_survives(self, ray_session, tmp_path):
        """ADVICE r2: when exactly one of the two types is absent the op
        must still report the present side's true count (ks_d pinned to
        0), matching the oracle's NULL-coalesced division."""
        import duckdb

        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_KS_STAT_ORACLE,
            events_ks_stat,
        )

        pd.DataFrame(
            {"event_type": ["click", "click", "view"],
             "value": [1.25, 2.50, 9.0]}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_ks_stat(str(tmp_path))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        exp = con.execute(EVENTS_KS_STAT_ORACLE).df()
        assert int(got.iloc[0]["n_a"]) == int(exp.iloc[0]["n_a"]) == 2
        assert int(got.iloc[0]["n_b"]) == int(exp.iloc[0]["n_b"]) == 0
        assert float(got.iloc[0]["ks_d"]) == float(exp.iloc[0]["ks_d"]) == 0.0
