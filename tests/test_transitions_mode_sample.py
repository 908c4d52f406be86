"""Transition matrix, grouped mode, and per-group hash sample: oracle
parity at sf0.001 plus the semantics a random corpus can't pin down
(user-boundary masking and ts/event_id ordering in transitions;
deterministic tie-breaks in the mode; exactly-k-per-stratum in the
sample)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _oracle(view_sql: dict[str, str], query: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, path in view_sql.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(query).df()


class TestEventsTransitions:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_TRANSITIONS_ORACLE,
            events_transitions,
        )

        key = ["event_type", "next_type"]
        exp = (
            _oracle({"events": f"{SF}/events.parquet"}, EVENTS_TRANSITIONS_ORACLE)
            .sort_values(key)
            .reset_index(drop=True)
        )
        got = (
            events_transitions(SF)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_user_boundaries_and_ordering(self, ray_session, tmp_path):
        """Pairs never cross users, and ordering is (ts, event_id) —
        the two same-ts rows of user 2 pair in event_id order."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_transitions,
        )

        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 10, 11],
                "user_id": [7, 7, 7, 2, 2],
                "ts": pd.to_datetime([0, 5, 9, 3, 3], unit="s"),
                "event_type": ["view", "click", "purchase", "click", "view"],
            }
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            events_transitions(str(tmp_path))
            .to_pandas()
            .set_index(["event_type", "next_type"])["n_pairs"]
            .to_dict()
        )
        # user 7: view->click, click->purchase; user 2: click->view
        # (event_id 10 before 11 at equal ts). NO purchase->click pair
        # across the user boundary.
        assert out == {
            ("view", "click"): 1,
            ("click", "purchase"): 1,
            ("click", "view"): 1,
        }


class TestUserEventMode:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_EVENT_MODE_ORACLE,
            user_event_mode,
        )

        exp = (
            _oracle({"events": f"{SF}/events.parquet"}, USER_EVENT_MODE_ORACLE)
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        got = (
            user_event_mode(SF)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_tie_breaks_alphabetical(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            user_event_mode,
        )

        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2, 2, 2],
                "event_type": ["view", "view", "click", "click",
                               "error", "signup", "error"],
            }
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            user_event_mode(str(tmp_path))
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        # user 1: 2-2 tie -> "click" (alphabetically first); user 2:
        # clear winner "error" with count 2.
        assert out.loc[1].tolist() == ["click", 2]
        assert out.loc[2].tolist() == ["error", 2]


class TestHashSamplePerGroup:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.ops.sampling import (
            HASH_SAMPLE_PER_GROUP_ORACLE,
            hash_sample_per_group,
        )

        key = ["lang", "sample_rank"]
        exp = (
            _oracle(
                {"documents": f"{SF}/documents.parquet"},
                HASH_SAMPLE_PER_GROUP_ORACLE.format(k=3),
            )
            .sort_values(key)
            .reset_index(drop=True)
        )
        got = (
            hash_sample_per_group(SF)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)[exp.columns]
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_exactly_k_per_group_and_deterministic(self, ray_session):
        from entity_extractor_linker_ray.ops.sampling import hash_sample_per_group

        a = hash_sample_per_group(SF, k=2).to_pandas()
        b = hash_sample_per_group(SF, k=2).to_pandas()
        sizes = a.groupby("lang").size()
        assert (sizes == 2).all()
        key = ["lang", "sample_rank"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )


class TestEventsRunningTotal:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_RUNNING_TOTAL_ORACLE,
            events_running_total,
        )

        exp = (
            _oracle({"events": f"{SF}/events.parquet"},
                    EVENTS_RUNNING_TOTAL_ORACLE)
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        got = (
            events_running_total(SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_crosses_hour_boundaries(self, ray_session, tmp_path):
        """The scan is GLOBAL: the first event of hour 2 carries hour
        0+1's full total as its offset, and ts ties order by event_id."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_running_total,
        )

        pd.DataFrame(
            {
                "event_id": [2, 1, 3, 4],
                "ts": pd.to_datetime([30, 30, 3700, 7300], unit="s"),
                "value": [1.0, 10.0, 100.0, 0.5],
            }
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            events_running_total(str(tmp_path))
            .to_pandas()
            .set_index("event_id")["running_milli"]
        )
        # order: id1 (10.0), id2 (1.0) [ts tie], id3 (100.0), id4 (0.5)
        assert out.loc[1] == 10_000
        assert out.loc[2] == 11_000
        assert out.loc[3] == 111_000
        assert out.loc[4] == 111_500


class TestBlockCountInvariance:
    """Batch boundaries are an execution detail: splitting the input
    into 7 unequal files (different partial/combine boundaries inside
    every bucketed shuffle) must not change one output row of the new
    operators."""

    def _split_events(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/events.parquet")
        os.mkdir(tmp_path / "events.parquet")
        bounds = [len(t) * i // 7 for i in range(8)]
        for i in range(7):
            pq.write_table(
                t.slice(bounds[i], bounds[i + 1] - bounds[i]),
                tmp_path / "events.parquet" / f"part_{i}.parquet",
            )
        return str(tmp_path)

    def test_transitions_mode_scan_invariant(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            events_running_total,
            events_transitions,
            user_event_mode,
        )

        split = self._split_events(tmp_path)
        for fn, key in [
            (events_transitions, ["event_type", "next_type"]),
            (user_event_mode, ["user_id"]),
            (events_running_total, ["event_id"]),
        ]:
            base = fn(SF).to_pandas().sort_values(key).reset_index(drop=True)
            got = fn(split).to_pandas().sort_values(key).reset_index(drop=True)
            pd.testing.assert_frame_equal(base, got)


class TestUserActiveSpan:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_ACTIVE_SPAN_ORACLE,
            user_active_span,
        )

        exp = (
            _oracle({"events": f"{SF}/events.parquet"}, USER_ACTIVE_SPAN_ORACLE)
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        got = (
            user_active_span(SF)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_merge_semantics(self, ray_session, tmp_path):
        """Overlapping and back-to-back intervals merge; a gap >= the
        5-min window starts a new island; users never merge."""
        from entity_extractor_linker_ray.pipelines.relational import (
            user_active_span,
        )

        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "user_id": [1, 1, 1, 2, 2],
                # user 1: events at 0 s and 100 s overlap (one island
                # of 400 s); event at 1000 s is a second island (300 s)
                # user 2: 0 s and exactly 300 s touch end-to-start ->
                # merged single island of 600 s (start > prev_end is
                # strict: 300_000_000 > 300_000_000 is false)
                "ts": pd.to_datetime([0, 100, 1000, 0, 300], unit="s"),
            }
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            user_active_span(str(tmp_path))
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        assert out.loc[1].tolist() == [700_000_000, 2]
        assert out.loc[2].tolist() == [600_000_000, 1]
