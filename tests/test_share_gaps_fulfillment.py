"""Batch-7 additions: ratio-to-partition shares, dimension-coverage
anti join, grouped universal quantifier (fulfillment), and the Simpson
diversity index — each value-exact against its DuckDB oracle plus the
semantics SQL can't isolate (per-user share normalization, eventless
dimension rows, vacuous-truth orders, single-doc sources)."""

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


class TestUserTypeShare:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_TYPE_SHARE_ORACLE,
            user_type_share,
        )

        got = _canon(user_type_share(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             USER_TYPE_SHARE_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_shares_sum_to_one_per_user(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            user_type_share,
        )

        got = user_type_share(SF).to_pandas()
        sums = got.groupby("user_id")["share"].sum()
        assert np.allclose(sums.to_numpy(), 1.0, atol=1e-12)


class TestUserTypeGaps:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_TYPE_GAPS_ORACLE,
            user_type_gaps,
        )

        got = _canon(user_type_gaps(SF).to_pandas())
        exp = _canon(_oracle(
            {"events": f"{SF}/events.parquet",
             "customer": f"{SF}/customer.parquet"},
            USER_TYPE_GAPS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_eventless_customer_gaps_everything(self, ray_session, tmp_path):
        """A customer with no events gaps on EVERY type; a customer who
        did one of two types gaps only the other."""
        from entity_extractor_linker_ray.pipelines.relational import (
            user_type_gaps,
        )

        pd.DataFrame(
            {"c_custkey": np.array([1, 2], dtype=np.int64),
             "c_name": ["a", "b"], "c_nationkey": np.zeros(2, dtype=np.int64),
             "c_acctbal": np.zeros(2), "c_mktsegment": ["M", "M"]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"event_id": np.array([1, 2], dtype=np.int64),
             "user_id": np.array([1, 1], dtype=np.int64),
             "ts": pd.to_datetime(["2024-01-01 00:00"] * 2),
             "event_type": ["click", "view"],
             "value": np.zeros(2), "props": ["{}"] * 2}
        ).to_parquet(tmp_path / "events.parquet")

        got = user_type_gaps(str(tmp_path)).to_pandas()
        u1 = got[got["user_id"] == 1]
        u2 = sorted(got[got["user_id"] == 2]["event_type"])
        assert len(u1) == 0  # user 1 did both observed types
        assert u2 == ["click", "view"]  # eventless customer gaps all


class TestFulfillment:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDERS_FULFILLMENT_ORACLE,
            orders_fulfillment,
        )

        got = _canon(orders_fulfillment(SF).to_pandas())
        exp = _canon(_oracle(
            {"orders": f"{SF}/orders.parquet",
             "lineitem": f"{SF}/lineitem.parquet"},
            ORDERS_FULFILLMENT_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_all_semantics_and_vacuous_truth(self, ray_session, tmp_path):
        """One late line spoils an otherwise-punctual order (ALL, not
        ANY); an order with no lineitems is vacuously fulfilled."""
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_fulfillment,
        )

        pd.DataFrame(
            {"o_orderkey": np.array([1, 2, 3], dtype=np.int64),
             "o_custkey": np.zeros(3, dtype=np.int64),
             "o_orderstatus": ["O"] * 3,
             "o_totalprice": np.zeros(3),
             "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
             "o_orderpriority": ["1-URGENT"] * 3}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([1, 1, 2], dtype=np.int64),
             "l_partkey": np.zeros(3, dtype=np.int64),
             "l_suppkey": np.zeros(3, dtype=np.int64),
             "l_linenumber": np.array([1, 2, 1], dtype=np.int32),
             "l_quantity": np.ones(3), "l_extendedprice": np.ones(3),
             "l_discount": np.zeros(3), "l_tax": np.zeros(3),
             "l_returnflag": ["N"] * 3, "l_linestatus": ["O"] * 3,
             # order 1: one on-time + ONE LATE line -> not fulfilled
             # order 2: on time; order 3: no lines -> vacuously ok
             "l_shipdate": pd.to_datetime(
                 ["2024-01-15", "2024-06-01", "2024-02-01"])}
        ).to_parquet(tmp_path / "lineitem.parquet")

        got = orders_fulfillment(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_orders"] == 3
        assert got["n_fulfilled"] == 2  # orders 2 and 3


class TestDiversity:
    def test_matches_duckdb_bitexact(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            SOURCE_LANG_DIVERSITY_ORACLE,
            source_lang_diversity,
        )

        got = (
            source_lang_diversity(SF).to_pandas()
            .sort_values("source").reset_index(drop=True)
        )
        exp = (
            _oracle({"documents": f"{SF}/documents.parquet"},
                    SOURCE_LANG_DIVERSITY_ORACLE)
            .sort_values("source").reset_index(drop=True)
        )
        assert len(got) > 0
        assert (got["simpson"].to_numpy() == exp["simpson"].to_numpy()).all()

    def test_extremes(self, ray_session, tmp_path):
        """Monolingual source → 1.0; perfectly split source → the
        exact without-replacement probability; single-doc source → 1.0
        by definition (the N=1 guard)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            source_lang_diversity,
        )

        pd.DataFrame(
            {"doc_id": np.arange(1, 8, dtype=np.int64),
             "text": ["x"] * 7,
             "lang": ["en", "en", "en",        # mono: 1.0
                      "en", "en", "de",        # split 2/1 of 3
                      "fr"],                   # single doc
             "source": ["mono"] * 3 + ["mix"] * 3 + ["solo"],
             "n_chars": np.zeros(7, dtype=np.int64)}
        ).to_parquet(tmp_path / "documents.parquet")

        got = (
            source_lang_diversity(str(tmp_path))
            .to_pandas().set_index("source")["simpson"]
        )
        assert got["mono"] == 1.0
        assert got["mix"] == (2 * 1 + 0) / (3 * 2)  # 2/6
        assert got["solo"] == 1.0
