"""Mergeable incremental sessionization: batch-split session summaries
fuse to the EXACT batch sessionize result — cross-chunk stitching
(a later batch's event inside an earlier batch's gap must FUSE
sessions) pinned on a hand fixture, equivalence + oracle parity on the
corpus."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
KEY = ["user_id", "session_idx"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(KEY).reset_index(drop=True).astype(
        {c: np.int64 for c in df.columns}
    )


class TestSessionsIncremental:
    def test_equals_batch_and_oracle(self, ray_session):
        from entity_extractor_linker_ray.pipelines.incremental import (
            events_sessions_incremental,
        )
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_SESSIONIZE_ORACLE,
            events_sessionize,
        )

        inc = _canon(events_sessions_incremental(SF, chunks=3).to_pandas())
        batch = _canon(events_sessionize(SF).to_pandas())
        pd.testing.assert_frame_equal(inc, batch)

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        oracle = _canon(con.execute(EVENTS_SESSIONIZE_ORACLE).fetchdf())
        pd.testing.assert_frame_equal(inc, oracle)

    def test_cross_chunk_stitching(self, ray_session, tmp_path):
        """Day-parity chunking puts t=0h (day 0) and t=47h59m (day 1)
        in different ingest batches with a bridging event at 24h (day
        1): within chunk 0 the two far events are... constructed so
        chunk 0 = {0h, 48h+10m}, chunk 1 = {24h}. Chunk 0 alone sees a
        2-day gap (2 sessions); the bridge does NOT link them (gaps
        24h > 30min) so the merged result must KEEP them split — and a
        tight trio (events 10 min apart across chunks) must fuse to
        ONE session."""
        from entity_extractor_linker_ray.pipelines.incremental import (
            events_sessions_incremental,
        )

        h = 3_600
        rows = [
            # user 1: three events 10 min apart straddling a day
            # boundary (23h55m = day 0, 24h05m/24h15m = day 1) ->
            # chunks split them; merged must be ONE session of 3
            (1, 1, 23 * h + 55 * 60),
            (2, 1, 24 * h + 5 * 60),
            (3, 1, 24 * h + 15 * 60),
            # user 2: two events 40 min apart (> 30 min gap) across the
            # same boundary -> must stay TWO sessions after merge
            (10, 2, 23 * h + 50 * 60),
            (11, 2, 24 * h + 30 * 60),
        ]
        pd.DataFrame(
            {"event_id": [r[0] for r in rows],
             "user_id": [r[1] for r in rows],
             "ts": pd.to_datetime([r[2] for r in rows], unit="s")}
        ).to_parquet(tmp_path / "events.parquet")
        out = _canon(
            events_sessions_incremental(str(tmp_path), chunks=2).to_pandas()
        )
        u1 = out[out["user_id"] == 1]
        assert len(u1) == 1 and u1.iloc[0]["n_events"] == 3
        assert u1.iloc[0]["first_event"] == 1
        u2 = out[out["user_id"] == 2]
        assert len(u2) == 2
        assert u2["n_events"].tolist() == [1, 1]
