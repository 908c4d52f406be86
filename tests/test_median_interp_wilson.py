"""Fourteenth-session batch, part 6: histogram-refinement exact grouped
median, linear gap interpolation, Wilson-bound quality rates."""

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


class TestOrderPriceMedian:
    def test_planted_odd_even_and_wide_range(self, ray_session, tmp_path):
        """Odd group -> middle element; even group -> LOWER median;
        values spanning many coarse buckets still select exactly."""
        from entity_extractor_linker_ray.pipelines.relational import (
            order_price_median_by_priority,
        )

        pd.DataFrame(
            {"o_orderpriority": ["A"] * 3 + ["B"] * 4 + ["C"] * 3,
             "o_totalprice": [1.0, 2.0, 3.0,          # A: median 2.00
                              1.0, 2.0, 3.0, 4.0,     # B: lower median 2.00
                              0.01, 50_000.0, 99_999.99]}  # C: wide range
        ).to_parquet(tmp_path / "orders.parquet")
        got = (
            order_price_median_by_priority(str(tmp_path))
            .sort_values("priority").reset_index(drop=True)
        )
        assert got["priority"].tolist() == ["A", "B", "C"]
        assert got["n_orders"].tolist() == [3, 4, 3]
        assert got["median_centi"].tolist() == [200, 200, 5_000_000]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDER_PRICE_MEDIAN_ORACLE,
            order_price_median_by_priority,
        )

        got = (
            order_price_median_by_priority(SF)
            .sort_values("priority").reset_index(drop=True)
        )
        exp = (
            _connect().execute(ORDER_PRICE_MEDIAN_ORACLE).df()
            .sort_values("priority").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestEventsGapInterpolate:
    def test_planted_linear_fill(self, ray_session, tmp_path):
        """Present hours 0 (1.0) and 3 (4.0): hours 1,2 get 2000/3000
        milli by linear interpolation and carry the interpolated flag."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_gap_interpolate,
        )

        hours_us = np.array([0, 3], dtype=np.int64) * 3_600_000_000
        pd.DataFrame(
            {"event_type": ["a", "a"],
             "ts": pd.to_datetime(hours_us, unit="us"),
             "value": [1.0, 4.0]}
        ).to_parquet(tmp_path / "events.parquet")
        got = (
            events_gap_interpolate(str(tmp_path)).to_pandas()
            .sort_values("hour").reset_index(drop=True)
        )
        assert got["hour"].tolist() == [0, 1, 2, 3]
        assert got["value_milli"].tolist() == [1000.0, 2000.0, 3000.0, 4000.0]
        assert got["is_interpolated"].tolist() == [0, 1, 1, 0]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_GAP_INTERPOLATE_ORACLE,
            events_gap_interpolate,
        )

        key = ["event_type", "hour"]
        got = (
            events_gap_interpolate(SF).to_pandas()
            .sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_GAP_INTERPOLATE_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (
            got["value_milli"].to_numpy() == exp["value_milli"].to_numpy()
        ).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestQualityPassWilson:
    def test_planted_rates_and_bound(self, ray_session, tmp_path):
        """3-of-4 pass: rate 0.75; the Wilson lower bound matches the
        closed form and sits strictly below the raw rate. The 19-token
        doc and the all-repeated doc both fail."""
        from entity_extractor_linker_ray.ops.textstats import quality_pass_wilson

        good = " ".join(f"tok{i}" for i in range(25))
        short = " ".join(f"tok{i}" for i in range(19))   # < 20 tokens
        repeated = " ".join(["same"] * 30)               # repetition 96 >= 50
        pd.DataFrame(
            {"doc_id": np.arange(4, dtype=np.int64),
             "text": [good, good, good + " extra", short],
             "lang": ["en"] * 4}
        ).to_parquet(tmp_path / "documents.parquet")
        got = quality_pass_wilson(str(tmp_path))
        r = got.iloc[0]
        assert r["n"] == 4 and r["n_pass"] == 3
        assert r["pass_rate"] == 0.75
        z = 1.96
        phat, n = 0.75, 4
        zz_n = (z * z) / n
        expect = ((phat + zz_n / 2.0)
                  - z * np.sqrt((phat * (1 - phat) + zz_n / 4.0) / n)) \
            / (1.0 + zz_n)
        assert r["wilson_low"] == expect
        assert r["wilson_low"] < r["pass_rate"]

        pd.DataFrame(
            {"doc_id": np.arange(2, dtype=np.int64),
             "text": [repeated, good],
             "lang": ["de"] * 2}
        ).to_parquet(tmp_path / "documents.parquet")
        got2 = quality_pass_wilson(str(tmp_path))
        assert got2.iloc[0]["n_pass"] == 1  # repeated doc fails on rep>=50

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            QUALITY_PASS_WILSON_ORACLE,
            quality_pass_wilson,
        )

        got = quality_pass_wilson(SF).sort_values("lang").reset_index(drop=True)
        exp = (
            _connect().execute(QUALITY_PASS_WILSON_ORACLE).df()
            .sort_values("lang").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["wilson_low"].to_numpy() == exp["wilson_low"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
