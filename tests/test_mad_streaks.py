"""Batch-4 additions: exact MAD, engaged-user nested distinct,
gaps-and-islands streaks, and zero-copy vector norms — each
value-exact against its DuckDB oracle plus the semantics SQL can't
isolate (outlier resistance, same-day collapse, gap splitting,
empty-vector reduceat masking)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

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


class TestEventsMad:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_MAD_ORACLE,
            events_mad,
        )

        got = _canon(events_mad(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_MAD_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_outlier_resistance(self, ray_session, tmp_path):
        """[1,2,3,4,100]: discrete median (k=ceil(5/2)=3) is 3;
        deviations [2,1,0,1,97] have median 1 — the 100 moves MAD not
        at all, which is the whole point of the statistic."""
        from entity_extractor_linker_ray.pipelines.relational import events_mad

        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, 6, dtype=np.int64),
                "user_id": np.ones(5, dtype=np.int64),
                "ts": pd.to_datetime(["2024-01-01"] * 5),
                "event_type": ["x"] * 5,
                "value": [1.0, 2.0, 3.0, 4.0, 100.0],
                "props": ["{}"] * 5,
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = events_mad(str(tmp_path)).to_pandas().set_index("event_type")
        assert got.loc["x", "median_milli"] == 3000
        assert got.loc["x", "mad_milli"] == 1000


class TestEngagedUsers:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ENGAGED_USERS_ORACLE,
            engaged_users,
        )

        got = _canon(engaged_users(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             ENGAGED_USERS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_same_day_events_do_not_engage(self, ray_session, tmp_path):
        """Five events on ONE day are one distinct day (not engaged);
        two events on two days engage; engagement is per type — the
        same user can be engaged for one type and not another."""
        from entity_extractor_linker_ray.pipelines.relational import engaged_users

        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, 9, dtype=np.int64),
                "user_id": np.array([1, 1, 1, 1, 1, 2, 2, 2], dtype=np.int64),
                "ts": pd.to_datetime(
                    ["2024-01-01 01:00", "2024-01-01 02:00", "2024-01-01 03:00",
                     "2024-01-01 04:00", "2024-01-01 05:00",   # u1 click: 1 day
                     "2024-01-01 01:00", "2024-01-02 01:00",   # u2 click: 2 days
                     "2024-01-05 01:00"]                        # u2 view: 1 day
                ),
                "event_type": ["click"] * 5 + ["click", "click", "view"],
                "value": np.zeros(8),
                "props": ["{}"] * 8,
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = engaged_users(str(tmp_path)).to_pandas().set_index("event_type")
        assert got.loc["click", "n_engaged"] == 1  # only u2
        assert "view" not in got.index  # nobody engaged for view


class TestLongestStreak:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_LONGEST_STREAK_ORACLE,
            user_longest_streak,
        )

        got = _canon(user_longest_streak(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             USER_LONGEST_STREAK_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_gap_splits_and_duplicates_collapse(self, ray_session, tmp_path):
        """Days {1,2,3,5,6} → longest streak 3 (the gap at 4 splits);
        three events on one day are a streak of 1, not 3."""
        from entity_extractor_linker_ray.pipelines.relational import (
            user_longest_streak,
        )

        days_u1 = ["2024-01-01 00:00", "2024-01-02 00:00", "2024-01-03 00:00",
                   "2024-01-05 00:00", "2024-01-06 00:00"]
        days_u2 = ["2024-02-01 01:00", "2024-02-01 12:00", "2024-02-01 23:00"]
        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, 9, dtype=np.int64),
                "user_id": np.array([1] * 5 + [2] * 3, dtype=np.int64),
                "ts": pd.to_datetime(days_u1 + days_u2),
                "event_type": ["x"] * 8,
                "value": np.zeros(8),
                "props": ["{}"] * 8,
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = user_longest_streak(str(tmp_path)).to_pandas().set_index("user_id")
        assert got.loc[1, "longest_streak"] == 3
        assert got.loc[2, "longest_streak"] == 1


class TestEmbeddingNorms:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.ann import (
            EMBEDDING_NORMS_ORACLE,
            embedding_norms,
        )

        got = _canon(embedding_norms(SF).to_pandas())
        exp = _canon(_oracle({"embeddings": f"{SF}/embeddings.parquet"},
                             EMBEDDING_NORMS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_exact_values_and_empty_vector(self, ray_session, tmp_path):
        """[0, 1, 2] → milli [0, 1000, 2000] → norm² = 5,000,000; an
        EMPTY vector must come out 0 (reduceat repeats the previous
        segment for zero-length rows — the mask is load-bearing)."""
        from entity_extractor_linker_ray.ops.ann import embedding_norms

        table = pa.table(
            {
                "vec_id": pa.array([1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[0.0, 1.0, 2.0], [], [3.0]], pa.list_(pa.float32())
                ),
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        )
        pq.write_table(table, tmp_path / "embeddings.parquet")

        got = embedding_norms(str(tmp_path)).to_pandas().set_index("vec_id")
        assert got.loc[1, "norm2_milli2"] == 5_000_000 and got.loc[1, "dim"] == 3
        assert got.loc[2, "norm2_milli2"] == 0 and got.loc[2, "dim"] == 0
        assert got.loc[3, "norm2_milli2"] == 9_000_000 and got.loc[3, "dim"] == 1
