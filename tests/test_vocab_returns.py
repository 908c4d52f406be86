"""Fourteenth-session batch, part 19: Heaps-law vocabulary growth and
brand return rates."""

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


class TestVocabGrowthCurve:
    def test_planted_growth(self, ray_session, tmp_path):
        """10 docs: doc 0 introduces {a,b}, doc 5 adds {c}, doc 9 adds
        {d}; every other doc repeats {a}. New-term deciles are 0, 5, 9
        and the cumulative vocab ends at 4."""
        from entity_extractor_linker_ray.ops.textstats import (
            vocab_growth_curve,
        )

        texts = ["a b"] + ["a"] * 4 + ["a c"] + ["a"] * 3 + ["a d"]
        pd.DataFrame(
            {"doc_id": np.arange(10, dtype=np.int64), "text": texts}
        ).to_parquet(tmp_path / "documents.parquet")
        got = vocab_growth_curve(str(tmp_path))
        assert got["decile"].tolist() == list(range(10))
        assert (got["n_docs"] == 1).all()
        assert got["new_terms"].tolist() == [2, 0, 0, 0, 0, 1, 0, 0, 0, 1]
        assert got["vocab_size"].tolist() == [2, 2, 2, 2, 2, 3, 3, 3, 3, 4]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            VOCAB_GROWTH_CURVE_ORACLE,
            vocab_growth_curve,
        )

        got = (
            vocab_growth_curve(SF)
            .sort_values("decile").reset_index(drop=True)
        )
        exp = (
            _connect().execute(VOCAB_GROWTH_CURVE_ORACLE).df()
            .sort_values("decile").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        # the fixture corpus's small fixed vocab arrives in decile 0 —
        # the curve is monotone, not strictly growing (the planted test
        # above pins actual growth)
        assert (np.diff(got["vocab_size"].to_numpy()) >= 0).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestPartBrandReturnRate:
    def test_planted_rates(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            part_brand_return_rate,
        )

        pd.DataFrame(
            {"p_partkey": np.array([1, 2], dtype=np.int64),
             "p_brand": ["GOOD", "BAD"]}
        ).to_parquet(tmp_path / "part.parquet")
        pd.DataFrame(
            {"l_partkey": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
             "l_returnflag": ["N", "N", "N", "R", "R", "R"]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = (
            part_brand_return_rate(str(tmp_path))
            .sort_values("p_brand").reset_index(drop=True)
        )
        assert got["p_brand"].tolist() == ["BAD", "GOOD"]
        assert got["n_returns"].tolist() == [2, 1]
        assert got["return_share"].tolist() == [1.0, 0.25]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            PART_BRAND_RETURN_RATE_ORACLE,
            part_brand_return_rate,
        )

        got = (
            part_brand_return_rate(SF)
            .sort_values("p_brand").reset_index(drop=True)
        )
        exp = (
            _connect().execute(PART_BRAND_RETURN_RATE_ORACLE).df()
            .sort_values("p_brand").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (
            got["return_share"].to_numpy() == exp["return_share"].to_numpy()
        ).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
