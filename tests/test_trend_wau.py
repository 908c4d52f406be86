"""Batch-5 additions: least-squares value trends, rolling 7-day
distinct actives, within-session conversion, and the day-of-week ×
hour heatmap — each value-exact against its DuckDB oracle plus the
semantics SQL can't isolate (exact slope recovery, window edges,
session-boundary conversion, calendar arithmetic parity)."""

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


class TestValueTrend:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_VALUE_TREND_ORACLE,
            events_value_trend,
        )

        got = events_value_trend(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
        exp = (
            _oracle({"events": f"{SF}/events.parquet"}, EVENTS_VALUE_TREND_ORACLE)
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert len(got) > 0
        assert list(got["event_type"]) == list(exp["event_type"])
        # bit-exact float parity: closed form over identical int sums
        assert (got["slope_centi_per_hour"].to_numpy()
                == exp["slope_centi_per_hour"].to_numpy()).all()
        assert (got["intercept_centi"].to_numpy()
                == exp["intercept_centi"].to_numpy()).all()

    def test_exact_slope_recovery(self, ray_session, tmp_path):
        """value = 2·hour + 5 over hours 0..3 of 2024-01-01 → slope
        exactly 200 centi/hour, intercept exactly 500 centi (the
        rebased x makes 2024-01-01T00:00 hour zero)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_value_trend,
        )

        rows = _events(
            [1, 2, 3, 4], [1, 1, 1, 1],
            ["2024-01-01 00:30", "2024-01-01 01:30",
             "2024-01-01 02:30", "2024-01-01 03:30"],
            ["x"] * 4,
            [5.0, 7.0, 9.0, 11.0],
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = events_value_trend(str(tmp_path)).to_pandas().iloc[0]
        assert got["slope_centi_per_hour"] == 200.0
        assert got["intercept_centi"] == 500.0


class TestDailyActive7d:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            DAILY_ACTIVE_7D_ORACLE,
            daily_active_7d,
        )

        got = _canon(daily_active_7d(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             DAILY_ACTIVE_7D_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_window_edges(self, ray_session, tmp_path):
        """u1 active on day 0 only: day 6 still counts it (d-6 edge is
        inclusive), day 7 does not; a user active twice in the window
        counts ONCE; only days that occur in the data are reported."""
        from entity_extractor_linker_ray.pipelines.relational import (
            daily_active_7d,
        )

        rows = _events(
            [1, 2, 3, 4, 5],
            [1, 2, 2, 2, 2],
            ["2024-01-01 12:00",   # u1: day 0 only
             "2024-01-01 01:00",   # u2 day 0
             "2024-01-03 01:00",   # u2 day 2 (twice in any window: counts once)
             "2024-01-07 01:00",   # day 6 — u1 still inside [0..6]
             "2024-01-08 01:00"],  # day 7 — u1 aged out
            ["x"] * 5,
            [0.0] * 5,
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = daily_active_7d(str(tmp_path)).to_pandas().set_index("target_day")
        day0 = int(pd.Timestamp("2024-01-01").value // 86_400_000_000_000)
        assert got.loc[day0, "active_users_7d"] == 2
        assert got.loc[day0 + 6, "active_users_7d"] == 2  # u1 at the edge
        assert got.loc[day0 + 7, "active_users_7d"] == 1  # u1 aged out
        # only days present in the data appear
        assert sorted(got.index - day0) == [0, 2, 6, 7]


class TestSessionConversions:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            SESSION_CONVERSIONS_ORACLE,
            session_conversions,
        )

        got = _canon(session_conversions(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             SESSION_CONVERSIONS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_conversion_requires_same_session(self, ray_session, tmp_path):
        """click … >30min gap … purchase = TWO sessions, neither
        converted; click+purchase within the gap = one converted
        session."""
        from entity_extractor_linker_ray.pipelines.relational import (
            session_conversions,
        )

        rows = _events(
            [1, 2, 3, 4],
            [1, 1, 2, 2],
            ["2024-01-01 10:00", "2024-01-01 11:00",   # u1: 60min gap → split
             "2024-01-01 10:00", "2024-01-01 10:10"],  # u2: same session
            ["click", "purchase", "click", "purchase"],
            [0.0] * 4,
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = session_conversions(str(tmp_path)).to_pandas()
        u1 = got[got["user_id"] == 1]
        assert len(u1) == 2 and u1["converted"].sum() == 0
        u2 = got[got["user_id"] == 2]
        assert len(u2) == 1 and int(u2["converted"].iloc[0]) == 1


class TestDowHourHeatmap:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_DOW_HOUR_ORACLE,
            events_dow_hour_heatmap,
        )

        got = _canon(events_dow_hour_heatmap(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_DOW_HOUR_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_calendar_arithmetic(self, ray_session, tmp_path):
        """2024-01-01 was a Monday: Sunday-based dow must be 1 (the
        (epoch_days + 4) % 7 rebase), and 23:59 lands in hour 23."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_dow_hour_heatmap,
        )

        rows = _events(
            [1, 2],
            [1, 1],
            ["2024-01-01 00:10", "2024-01-07 23:59"],  # Mon, Sun
            ["x", "x"],
            [0.0, 0.0],
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = events_dow_hour_heatmap(str(tmp_path)).to_pandas()
        got = got.set_index(["dow", "hour_of_day"])
        assert got.loc[(1, 0), "n_events"] == 1   # Monday 00h
        assert got.loc[(0, 23), "n_events"] == 1  # Sunday 23h
