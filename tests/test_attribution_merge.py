"""Batch-6 additions: weighted means, max drawdown, linear multi-touch
attribution, and CDC MERGE — each value-exact against its DuckDB
oracle plus the semantics SQL can't isolate (weight dominance, the
cross-user cummax band trick, strict window edges and equal-credit
integer splits, delete-beats-update precedence)."""

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


def _events(ids, users, ts, types, values):
    return pd.DataFrame(
        {
            "event_id": np.asarray(ids, dtype=np.int64),
            "user_id": np.asarray(users, dtype=np.int64),
            "ts": pd.to_datetime(ts),
            "event_type": types,
            "value": np.asarray(values, dtype=np.float64),
            "props": ["{}"] * len(ids),
        }
    )


class TestWeightedDiscount:
    def test_matches_duckdb_bitexact(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LINEITEM_WEIGHTED_DISCOUNT_ORACLE,
            lineitem_weighted_discount,
        )

        got = (
            lineitem_weighted_discount(SF).to_pandas()
            .sort_values("l_returnflag").reset_index(drop=True)
        )
        exp = (
            _oracle({"lineitem": f"{SF}/lineitem.parquet"},
                    LINEITEM_WEIGHTED_DISCOUNT_ORACLE)
            .sort_values("l_returnflag").reset_index(drop=True)
        )
        assert len(got) > 0
        assert (got["weighted_discount_bp"].to_numpy()
                == exp["weighted_discount_bp"].to_numpy()).all()
        assert (got["plain_discount_bp"].to_numpy()
                == exp["plain_discount_bp"].to_numpy()).all()

    def test_weight_dominance(self, ray_session, tmp_path):
        """A 99-to-1 revenue split: the weighted blend sits next to the
        big line's discount, the plain mean halfway — the gap is the
        metric."""
        from entity_extractor_linker_ray.pipelines.relational import (
            lineitem_weighted_discount,
        )

        rows = pd.DataFrame(
            {
                "l_orderkey": np.array([1, 2], dtype=np.int64),
                "l_returnflag": ["X", "X"],
                "l_extendedprice": [9900.0, 100.0],
                "l_discount": [0.10, 0.50],
            }
        )
        rows.to_parquet(tmp_path / "lineitem.parquet")

        got = lineitem_weighted_discount(str(tmp_path)).to_pandas().iloc[0]
        # weighted: (990000*1000 + 10000*5000) / 1000000 = 1040 bp
        assert got["weighted_discount_bp"] == 1040.0
        assert got["plain_discount_bp"] == 3000.0


class TestDrawdown:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_VALUE_DRAWDOWN_ORACLE,
            user_value_drawdown,
        )

        got = _canon(user_value_drawdown(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             USER_VALUE_DRAWDOWN_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_drawdown_and_user_isolation(self, ray_session, tmp_path):
        """10→5→20→3 has max drawdown 17 (from the 20 peak, not the
        10); u2's tiny values directly after u1's peak must NOT
        inherit u1's running max (the band offset trick)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            user_value_drawdown,
        )

        rows = _events(
            [1, 2, 3, 4, 5, 6],
            [1, 1, 1, 1, 2, 2],
            ["2024-01-01 00:01", "2024-01-01 00:02", "2024-01-01 00:03",
             "2024-01-01 00:04", "2024-01-01 00:05", "2024-01-01 00:06"],
            ["x"] * 6,
            [10.0, 5.0, 20.0, 3.0, 1.0, 0.5],
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = user_value_drawdown(str(tmp_path)).to_pandas().set_index("user_id")
        assert got.loc[1, "max_drawdown_centi"] == 1700
        assert got.loc[1, "peak_centi"] == 2000
        # u2: own running max 1.0 → drawdown 0.5, NOT 20-0.5
        assert got.loc[2, "max_drawdown_centi"] == 50
        assert got.loc[2, "peak_centi"] == 100


class TestClickAttribution:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            CLICK_ATTRIBUTION_ORACLE,
            click_attribution,
        )

        got = _canon(click_attribution(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             CLICK_ATTRIBUTION_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_equal_split_and_window_edges(self, ray_session, tmp_path):
        """Two clicks before a purchase → 500000 micro-credits each; a
        click AT the purchase timestamp is excluded (strict <); a
        click 25h earlier is outside the 24h window; a second purchase
        re-credits the same click."""
        from entity_extractor_linker_ray.pipelines.relational import (
            click_attribution,
        )

        rows = _events(
            [1, 2, 3, 4, 5, 6, 7],
            [1, 1, 1, 1, 1, 2, 2],
            ["2024-01-01 10:00",   # 1: click (in window of 4 and 5)
             "2024-01-01 11:00",   # 2: click (in window)
             "2024-01-01 12:00",   # 3: click AT purchase ts — excluded
             "2024-01-01 12:00",   # 4: purchase (clicks 1,2)
             "2024-01-01 13:00",   # 5: purchase (clicks 1,2,3)
             "2023-12-31 10:00",   # 6: u2 click 25h before purchase
             "2024-01-01 11:00"],  # 7: u2 purchase — no clicks in window
            ["click", "click", "click", "purchase", "purchase",
             "click", "purchase"],
            [0.0] * 7,
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = (
            click_attribution(str(tmp_path))
            .to_pandas()
            .set_index("click_event_id")["credit_micros"]
        )
        # click 1: 500000 (purchase 4) + 333333 (purchase 5)
        assert got.loc[1] == 500_000 + 333_333
        assert got.loc[2] == 500_000 + 333_333
        # click 3: only purchase 5 (was AT purchase 4's ts)
        assert got.loc[3] == 333_333
        assert 6 not in got.index  # outside 24h


class TestCdcMerge:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.incremental import (
            DOCUMENTS_CDC_MERGE_ORACLE,
            documents_cdc_merge,
        )

        got = _canon(documents_cdc_merge(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             DOCUMENTS_CDC_MERGE_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_precedence(self, ray_session, tmp_path):
        """id 38 is both deleted (38%11==5) and updated (38%7==3):
        delete wins. id 3 is updated (+3 chars), id 5 deleted, id 2
        inserts a new key at 10000002 (+4 chars), id 1 passes through
        as base."""
        from entity_extractor_linker_ray.pipelines.incremental import (
            documents_cdc_merge,
        )

        docs = pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3, 5, 38], dtype=np.int64),
                "text": ["aa", "bbb", "cccc", "ddddd", "ee"],
                "lang": ["en"] * 5,
                "source": ["s"] * 5,
                "n_chars": np.zeros(5, dtype=np.int64),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = documents_cdc_merge(str(tmp_path)).to_pandas().set_index("doc_id")
        assert 5 not in got.index and 38 not in got.index  # deletes
        assert got.loc[1, "op"] == "base" and got.loc[1, "final_len"] == 2
        assert got.loc[3, "op"] == "update" and got.loc[3, "final_len"] == 7
        assert got.loc[2, "op"] == "base"  # id 2 itself stays
        assert got.loc[10_000_002, "op"] == "insert"
        assert got.loc[10_000_002, "final_len"] == 7  # 'bbb new'
