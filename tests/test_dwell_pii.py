"""Fourteenth-session batch, part 10: dwell-time Markov transitions and
the per-source PII/leakage scan."""

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


class TestEventsTransitionDwell:
    def test_planted_gaps(self, ray_session, tmp_path):
        """user 1: a@0s -> b@10s -> a@40s; user 2: a@0s -> b@20s.
        (a,b): n=2, mean 15s; (b,a): n=1, mean 30s; no cross-user pair."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_transition_dwell,
        )

        def ts(sec):
            return pd.to_datetime(np.int64(sec) * 1_000_000, unit="us")

        pd.DataFrame(
            {"event_id": np.arange(5, dtype=np.int64),
             "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
             "ts": [ts(0), ts(10), ts(40), ts(0), ts(20)],
             "event_type": ["a", "b", "a", "a", "b"]}
        ).to_parquet(tmp_path / "events.parquet")
        got = (
            events_transition_dwell(str(tmp_path))
            .sort_values(["event_type", "next_type"]).reset_index(drop=True)
        )
        assert got[["event_type", "next_type"]].values.tolist() == [
            ["a", "b"], ["b", "a"]]
        assert got["n_pairs"].tolist() == [2, 1]
        assert got["gap_us_sum"].tolist() == [30_000_000, 30_000_000]
        assert got["mean_gap_us"].tolist() == [15_000_000.0, 30_000_000.0]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_TRANSITION_DWELL_ORACLE,
            events_transition_dwell,
        )

        key = ["event_type", "next_type"]
        got = (
            events_transition_dwell(SF)
            .sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_TRANSITION_DWELL_ORACLE).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["mean_gap_us"].to_numpy() == exp["mean_gap_us"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestDocsPiiScan:
    def test_planted_flags(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import docs_pii_scan

        pd.DataFrame(
            {"doc_id": np.arange(4, dtype=np.int64),
             "text": ["contact me at Alice.Smith@Example.COM today",
                      "see https://example.org/path?q=1 for details",
                      "nothing sensitive here at all",
                      "both a@b.io and http://x.y here"],
             "source": ["feedA", "feedA", "feedA", "feedB"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            docs_pii_scan(str(tmp_path))
            .sort_values("source").reset_index(drop=True)
        )
        a, b = got.iloc[0], got.iloc[1]
        assert a["source"] == "feedA"
        assert a["n_docs"] == 3 and a["n_email"] == 1 and a["n_url"] == 1
        assert b["n_docs"] == 1 and b["n_email"] == 1 and b["n_url"] == 1
        assert a["email_share"] == 1 / 3 and b["url_share"] == 1.0

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            DOCS_PII_SCAN_ORACLE,
            docs_pii_scan,
        )

        got = docs_pii_scan(SF).sort_values("source").reset_index(drop=True)
        exp = (
            _connect().execute(DOCS_PII_SCAN_ORACLE).df()
            .sort_values("source").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
