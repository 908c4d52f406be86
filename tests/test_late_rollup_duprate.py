"""Fourteenth-session batch, part 4: watermark late-arrival accounting,
ROLLUP grouping sets, near-dup contamination rate per source."""

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


def _ts(seconds):
    return pd.to_datetime(np.asarray(seconds, dtype="int64") * 1_000_000,
                          unit="us")


class TestEventsLateArrivals:
    def test_planted_out_of_order_arrivals(self, ray_session, tmp_path):
        """Arrival order (event_id) deliberately disagrees with event
        time: an event 900 s behind the watermark is late; one only
        10 s behind stays within the 60 s lateness allowance; the
        global first event is never late (no watermark yet)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_late_arrivals,
        )

        pd.DataFrame(
            {"event_id": np.array([1, 2, 3, 4], dtype=np.int64),
             "ts": _ts([1000, 100, 990, 2000])}
        ).to_parquet(tmp_path / "events.parquet")
        got = (
            events_late_arrivals(str(tmp_path)).to_pandas()
            .sort_values("win").reset_index(drop=True)
        )
        # windows of 300 s: 100->0, 990/1000->3, 2000->6
        assert got["win"].tolist() == [0, 3, 6]
        assert got["n_on_time"].tolist() == [0, 2, 1]
        assert got["n_late"].tolist() == [1, 0, 0]

    def test_late_across_block_boundary(self, ray_session, tmp_path):
        """The watermark must propagate across the 2^14-wide arrival
        blocks via the driver prefix: a far-later event_id with an
        old timestamp is late against block 0's maximum."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_late_arrivals,
        )

        pd.DataFrame(
            {"event_id": np.array([1, 50_000], dtype=np.int64),
             "ts": _ts([5000, 100])}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_late_arrivals(str(tmp_path)).to_pandas()
        by_win = got.set_index("win")
        assert by_win.loc[0, "n_late"] == 1  # ts=100 is 4900 s behind
        assert by_win.loc[16, "n_on_time"] == 1

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_LATE_ARRIVALS_ORACLE,
            events_late_arrivals,
        )

        got = (
            events_late_arrivals(SF).to_pandas()
            .sort_values("win").reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_LATE_ARRIVALS_ORACLE).df()
            .sort_values("win").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestRevenueRollup:
    def test_planted_grouping_sets(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            revenue_rollup,
        )

        pd.DataFrame(
            {"r_regionkey": np.array([0, 1], dtype=np.int64),
             "r_name": ["EAST", "WEST"]}
        ).to_parquet(tmp_path / "region.parquet")
        pd.DataFrame(
            {"n_nationkey": np.array([0, 1, 2], dtype=np.int64),
             "n_name": ["A", "B", "C"],
             "n_regionkey": np.array([0, 0, 1], dtype=np.int64)}
        ).to_parquet(tmp_path / "nation.parquet")
        pd.DataFrame(
            {"c_custkey": np.array([1, 2, 3], dtype=np.int64),
             "c_nationkey": np.array([0, 1, 2], dtype=np.int64)}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"o_custkey": np.array([1, 1, 2, 3], dtype=np.int64),
             "o_totalprice": [1.0, 2.0, 4.0, 8.0]}
        ).to_parquet(tmp_path / "orders.parquet")
        got = revenue_rollup(str(tmp_path))
        rows = {(r.region, r.nation): r.revenue_centi
                for r in got.itertuples()}
        assert rows[("EAST", "A")] == 300
        assert rows[("EAST", "B")] == 400
        assert rows[("WEST", "C")] == 800
        assert rows[("EAST", "ALL")] == 700
        assert rows[("WEST", "ALL")] == 800
        assert rows[("ALL", "ALL")] == 1500
        assert len(got) == 6

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            REVENUE_ROLLUP_ORACLE,
            revenue_rollup,
        )

        key = ["region", "nation"]
        got = revenue_rollup(SF).sort_values(key).reset_index(drop=True)
        exp = (
            _connect().execute(REVENUE_ROLLUP_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestDupRateBySource:
    def test_planted_contaminated_source(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.dedupe import dup_rate_by_source

        dup_text = ("the quick brown fox jumps over the lazy dog near "
                    "the riverbank every single morning")
        pd.DataFrame(
            {"doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
             "text": [dup_text, dup_text,
                      "entirely different words about arrow batches "
                      "streaming through object stores",
                      "yet another unique document mentioning shuffles "
                      "and actors and backpressure"],
             "source": ["feedA", "feedA", "feedB", "feedB"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            dup_rate_by_source(str(tmp_path))
            .sort_values("source").reset_index(drop=True)
        )
        assert got["source"].tolist() == ["feedA", "feedB"]
        assert got["n_docs"].tolist() == [2, 2]
        assert got["n_dup_docs"].tolist() == [2, 0]
        assert got["dup_share"].tolist() == [1.0, 0.0]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.dedupe import (
            dup_rate_by_source,
            dup_rate_by_source_oracle,
        )

        got = (
            dup_rate_by_source(SF)
            .sort_values("source").reset_index(drop=True)
        )
        exp = (
            _connect().execute(dup_rate_by_source_oracle()).df()
            .sort_values("source").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["dup_share"].to_numpy() == exp["dup_share"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
