"""Fourteenth-session batch, part 20: character-class profiles and the
2-D quantity x price histogram."""

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


class TestCharClassProfile:
    def test_planted_composition(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import (
            char_class_profile,
        )

        pd.DataFrame(
            {"doc_id": np.arange(2, dtype=np.int64),
             "text": ["ab 12", "xyz"],
             "source": ["s1", "s1"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = char_class_profile(str(tmp_path))
        r = got.iloc[0]
        assert r["n_chars"] == 8         # 5 + 3
        assert r["n_digits"] == 2
        assert r["n_spaces"] == 1
        assert r["n_lower"] == 5         # a b x y z
        assert r["digit_share"] == 2 / 8
        assert r["space_share"] == 1 / 8

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            CHAR_CLASS_PROFILE_ORACLE,
            char_class_profile,
        )

        got = (
            char_class_profile(SF)
            .sort_values("source").reset_index(drop=True)
        )
        exp = (
            _connect().execute(CHAR_CLASS_PROFILE_ORACLE).df()
            .sort_values("source").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["digit_share"].to_numpy() == exp["digit_share"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestLineitemQtyPriceHistogram2d:
    def test_planted_cells(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            lineitem_qty_price_histogram2d,
        )

        pd.DataFrame(
            {"l_quantity": [5.0, 15.0, 15.0],
             "l_extendedprice": [100.0, 100.0, 25_000.0]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            lineitem_qty_price_histogram2d(str(tmp_path)).to_pandas()
            .sort_values(["qty_band", "price_band"]).reset_index(drop=True)
        )
        # bands: (0,0), (1,0), (1,2): price 25000.00 -> 2500000 centi // 1e6 = 2
        assert got[["qty_band", "price_band"]].values.tolist() == [
            [0, 0], [1, 0], [1, 2]]
        assert got["n_lines"].tolist() == [1, 1, 1]
        assert got["revenue_centi"].tolist() == [10000, 10000, 2500000]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LINEITEM_QTY_PRICE_HIST2D_ORACLE,
            lineitem_qty_price_histogram2d,
        )

        key = ["qty_band", "price_band"]
        got = (
            lineitem_qty_price_histogram2d(SF).to_pandas()
            .sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(LINEITEM_QTY_PRICE_HIST2D_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert int(got["n_lines"].sum()) == int(exp["n_lines"].sum())
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestCharClassEmptySource:
    def test_all_empty_texts_zero_shares(self, ray_session, tmp_path):
        """ADVICE r2: a source whose texts are all empty must emit 0.0
        shares (not NaN) and match the oracle's CASE-guarded division."""
        import duckdb

        from entity_extractor_linker_ray.ops.textstats import (
            CHAR_CLASS_PROFILE_ORACLE,
            char_class_profile,
        )

        pd.DataFrame(
            {"doc_id": [0, 1, 2],
             "text": ["", "", "a1 b"],
             "source": ["empty_feed", "empty_feed", "ok"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            char_class_profile(str(tmp_path))
            .sort_values("source")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
        )
        exp = (
            con.execute(CHAR_CLASS_PROFILE_ORACLE)
            .df()
            .sort_values("source")
            .reset_index(drop=True)
        )
        empty = got[got["source"] == "empty_feed"].iloc[0]
        assert empty["n_chars"] == 0
        assert empty["digit_share"] == 0.0 and empty["space_share"] == 0.0
        for col in ("n_chars", "n_digits", "digit_share", "space_share"):
            assert list(got[col]) == list(exp[col])


class TestHist2dNonIntegralQuantity:
    def test_fractional_quantity_band_floor(self, ray_session, tmp_path):
        """ADVICE r2: band assignment is floor() in BOTH engines, so a
        fractional quantity like 25.5 lands in band 2 on both sides
        (np truncation vs DuckDB half-away CAST used to disagree)."""
        import duckdb

        from entity_extractor_linker_ray.pipelines.relational import (
            LINEITEM_QTY_PRICE_HIST2D_ORACLE,
            lineitem_qty_price_histogram2d,
        )

        pd.DataFrame(
            {"l_quantity": [25.5, 24.5, 9.99],
             "l_extendedprice": [100.0, 100.0, 100.0]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            lineitem_qty_price_histogram2d(str(tmp_path))
            .to_pandas()
            .sort_values(["qty_band", "price_band"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet'"
        )
        exp = (
            con.execute(LINEITEM_QTY_PRICE_HIST2D_ORACLE)
            .df()
            .sort_values(["qty_band", "price_band"])
            .reset_index(drop=True)
        )
        # 24.5 and 25.5 both floor into band 2 (one merged cell, n=2);
        # 9.99 floors into band 0
        assert list(got["qty_band"]) == list(exp["qty_band"]) == [0, 2]
        assert list(got["n_lines"]) == list(exp["n_lines"]) == [1, 2]
