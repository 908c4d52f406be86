"""Fourteenth-session batch, part 7: BM25 saturation components and
acquisition-cohort repeat-purchase rates."""

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


class TestBm25Components:
    def test_planted_formula(self, ray_session, tmp_path):
        """doc1 = 'a a a b' (dl 4), doc2 = 'a c' (dl 2), avgdl 3:
        tf/df/dl exact, tf_sat equals the closed form bit-for-bit."""
        from entity_extractor_linker_ray.ops.textstats import bm25_components

        pd.DataFrame(
            {"doc_id": np.array([1, 2], dtype=np.int64),
             "text": ["a a a b", "a c"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            bm25_components(str(tmp_path)).to_pandas()
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        )
        assert got["term"].tolist() == ["a", "b", "a", "c"]
        assert got["tf"].tolist() == [3, 1, 1, 1]
        assert got["df"].tolist() == [2, 1, 2, 1]
        assert got["dl"].tolist() == [4, 4, 2, 2]
        avgdl = np.float64(6) / np.int64(2)

        def sat(tf, dl):
            dlr = np.float64(dl) / avgdl
            return (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dlr))

        expect = [sat(3, 4), sat(1, 4), sat(1, 2), sat(1, 2)]
        assert got["tf_sat"].tolist() == expect
        # length normalization: same tf in a SHORTER doc saturates higher
        assert sat(1, 2) > sat(1, 4)

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            BM25_COMPONENTS_ORACLE,
            bm25_components,
        )

        key = ["doc_id", "rank"]
        got = (
            bm25_components(SF).to_pandas()
            .sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(BM25_COMPONENTS_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["tf_sat"].to_numpy() == exp["tf_sat"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestRepeatPurchaseRate:
    def test_planted_cohorts(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            repeat_purchase_rate,
        )

        pd.DataFrame(
            {"o_custkey": np.array([1, 1, 2, 2, 3], dtype=np.int64),
             "o_orderkey": np.array([10, 11, 12, 13, 14], dtype=np.int64),
             "o_orderdate": pd.to_datetime(
                 ["1995-01-01", "1995-01-20",   # cust 1: repeat in 19 d
                  "1995-01-05", "1995-03-01",   # cust 2: gap 55 d -> no
                  "1995-02-02"])}               # cust 3: single order
        ).to_parquet(tmp_path / "orders.parquet")
        got = (
            repeat_purchase_rate(str(tmp_path))
            .sort_values("first_month").reset_index(drop=True)
        )
        assert got["first_month"].tolist() == [199501, 199502]
        assert got["n_customers"].tolist() == [2, 1]
        assert got["n_repeat_30d"].tolist() == [1, 0]
        assert got["repeat_share"].tolist() == [0.5, 0.0]

    def test_whale_customer_two_smallest_merge(self, ray_session, tmp_path):
        """Many scrambled orders for one customer: the mergeable
        two-smallest partial must still find the true first two."""
        from entity_extractor_linker_ray.pipelines.relational import (
            repeat_purchase_rate,
        )

        rng = np.random.RandomState(7)
        days = rng.permutation(np.arange(40, 400))  # later noise orders
        dates = (["1995-01-03", "1995-01-10"]
                 + [f"1995-01-01" for _ in range(0)]
                 + list(pd.to_datetime("1995-01-01")
                        + pd.to_timedelta(days, unit="D")))
        n = len(dates)
        pd.DataFrame(
            {"o_custkey": np.full(n, 42, dtype=np.int64),
             "o_orderkey": np.arange(n, dtype=np.int64),
             "o_orderdate": pd.to_datetime(dates)}
        ).sample(frac=1.0, random_state=3).to_parquet(
            tmp_path / "orders.parquet")
        got = repeat_purchase_rate(str(tmp_path))
        assert len(got) == 1
        r = got.iloc[0]
        # first two orders are Jan 3 and Jan 10 -> repeat within 30 d
        assert r["first_month"] == 199501
        assert r["n_customers"] == 1 and r["n_repeat_30d"] == 1

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            REPEAT_PURCHASE_RATE_ORACLE,
            repeat_purchase_rate,
        )

        got = (
            repeat_purchase_rate(SF)
            .sort_values("first_month").reset_index(drop=True)
        )
        exp = (
            _connect().execute(REPEAT_PURCHASE_RATE_ORACLE).df()
            .sort_values("first_month").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (
            got["repeat_share"].to_numpy() == exp["repeat_share"].to_numpy()
        ).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
