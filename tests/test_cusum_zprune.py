"""Fourteenth-session batch, part 8: CUSUM-style mean-shift change
points and Z-order zone-map pruning effectiveness."""

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


class TestEventsCusumChangepoint:
    def test_planted_level_shift(self, ray_session, tmp_path):
        """Values 1.0 for hours 0-3 then 9.0 for hours 4-7: the best
        split is after hour 3 with shift exactly 8000 milli."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_cusum_changepoint,
        )

        hours = np.arange(8, dtype=np.int64)
        pd.DataFrame(
            {"event_type": ["a"] * 8,
             "ts": pd.to_datetime(hours * 3_600_000_000, unit="us"),
             "value": [1.0] * 4 + [9.0] * 4}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_cusum_changepoint(str(tmp_path))
        r = got.iloc[0]
        assert r["split_hour"] == 3
        assert r["n_before"] == 4 and r["n_after"] == 4
        assert r["mean_shift"] == 8000.0

    def test_flat_series_picks_first_tie(self, ray_session, tmp_path):
        """Constant values: every split has shift 0 -> the (shift desc,
        hour asc) tie-break picks the earliest split hour."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_cusum_changepoint,
        )

        hours = np.arange(5, dtype=np.int64)
        pd.DataFrame(
            {"event_type": ["a"] * 5,
             "ts": pd.to_datetime(hours * 3_600_000_000, unit="us"),
             "value": [2.0] * 5}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_cusum_changepoint(str(tmp_path))
        assert got.iloc[0]["split_hour"] == 0
        assert got.iloc[0]["mean_shift"] == 0.0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_CUSUM_CHANGEPOINT_ORACLE,
            events_cusum_changepoint,
        )

        got = (
            events_cusum_changepoint(SF)
            .sort_values("event_type").reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_CUSUM_CHANGEPOINT_ORACLE).df()
            .sort_values("event_type").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["mean_shift"].to_numpy() == exp["mean_shift"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestZorderPruneStats:
    def test_planted_grid_pruning(self, ray_session, tmp_path):
        """A full 16x16 key grid: the partkey-sorted layout touches
        EVERY zone for a suppkey box but only the box fraction for a
        partkey box; Z-order touches ~the box fraction for BOTH."""
        from entity_extractor_linker_ray.pipelines.relational import (
            zorder_prune_stats,
        )

        p, s = np.meshgrid(np.arange(16), np.arange(16))
        pd.DataFrame(
            {"l_partkey": p.ravel().astype(np.int64),
             "l_suppkey": s.ravel().astype(np.int64)}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = zorder_prune_stats(str(tmp_path)).set_index(
            ["scenario", "layout"]
        )
        pk = got.loc[("suppkey_box", "partkey_sorted")]
        assert pk["touch_share"] == 1.0  # single-key layout: no pruning
        z = got.loc[("suppkey_box", "zorder")]
        assert z["touch_share"] < 0.5   # z-order prunes the off-key box
        z2 = got.loc[("partkey_box", "zorder")]
        assert z2["touch_share"] < 0.5
        # both scenarios match the same number of rows (symmetric grid)
        assert (
            got.loc[("partkey_box", "zorder"), "n_match"]
            == got.loc[("suppkey_box", "zorder"), "n_match"]
        )

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ZORDER_PRUNE_STATS_ORACLE,
            zorder_prune_stats,
        )

        key = ["scenario", "layout"]
        got = zorder_prune_stats(SF).sort_values(key).reset_index(drop=True)
        exp = (
            _connect().execute(ZORDER_PRUNE_STATS_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) == 4
        assert (
            got["touch_share"].to_numpy() == exp["touch_share"].to_numpy()
        ).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
