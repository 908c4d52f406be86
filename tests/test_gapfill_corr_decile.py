"""Sixth-session additions: consecutive-duplicate compaction,
time-series gap fill, exact grouped Pearson correlation, and the
global-percentile threshold filter — each value-exact against its
DuckDB oracle plus the edge cases SQL can't isolate (run collapse at
user boundaries, zero-variance guard, half-cent floor semantics, the
exact discrete-quantile boundary)."""

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


class TestDedupConsecutive:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_DEDUP_CONSECUTIVE_ORACLE,
            events_dedup_consecutive,
        )

        got = _canon(events_dedup_consecutive(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_DEDUP_CONSECUTIVE_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_runs_collapse_boundaries_do_not(self, ray_session, tmp_path):
        """A 3-run collapses to its first event; an identical type
        across a USER boundary is kept (the LAG partition resets); an
        alternation keeps every event."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_dedup_consecutive,
        )

        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, 8, dtype=np.int64),
                "user_id": np.array([1, 1, 1, 1, 1, 2, 2], dtype=np.int64),
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00:00",  # 1: click (kept — first)
                        "2024-01-01 00:01:00",  # 2: click (dropped — run)
                        "2024-01-01 00:02:00",  # 3: click (dropped — run)
                        "2024-01-01 00:03:00",  # 4: view  (kept — change)
                        "2024-01-01 00:04:00",  # 5: click (kept — alternation)
                        "2024-01-01 00:05:00",  # 6: click (kept — new user)
                        "2024-01-01 00:06:00",  # 7: click (dropped — run)
                    ]
                ),
                "event_type": ["click", "click", "click", "view", "click",
                               "click", "click"],
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = events_dedup_consecutive(str(tmp_path)).to_pandas()
        assert sorted(got["event_id"]) == [1, 4, 5, 6]


class TestGapFill:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_GAP_FILL_ORACLE,
            events_gap_fill,
        )

        got = _canon(events_gap_fill(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_GAP_FILL_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_zeros_inside_span_only(self, ray_session, tmp_path):
        """Missing interior hours appear as real zero rows; hours
        outside a type's own [min, max] span do not appear, and one
        type's span never bleeds into another's."""
        from entity_extractor_linker_ray.pipelines.relational import events_gap_fill

        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, 5, dtype=np.int64),
                "user_id": np.ones(4, dtype=np.int64),
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:30:00",  # click hour 0
                        "2024-01-01 03:30:00",  # click hour 3 (1,2 are gaps)
                        "2024-01-01 05:15:00",  # view hour 5
                        "2024-01-01 05:45:00",  # view hour 5 again
                    ]
                ),
                "event_type": ["click", "click", "view", "view"],
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = events_gap_fill(str(tmp_path)).to_pandas()
        click = got[got["event_type"] == "click"].sort_values("hour_bucket")
        view = got[got["event_type"] == "view"]
        base = int(pd.Timestamp("2024-01-01").value // 3_600_000_000_000)
        assert list(click["hour_bucket"] - base) == [0, 1, 2, 3]
        assert list(click["n_events"]) == [1, 0, 0, 1]
        # view: single hour, count 2, no bleed into click's span
        assert list(view["hour_bucket"] - base) == [5]
        assert list(view["n_events"]) == [2]


class TestLineitemCorr:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LINEITEM_CORR_ORACLE,
            lineitem_corr,
        )

        got = lineitem_corr(SF).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
        exp = (
            _oracle({"lineitem": f"{SF}/lineitem.parquet"}, LINEITEM_CORR_ORACLE)
            .sort_values("l_returnflag")
            .reset_index(drop=True)
        )
        assert len(got) > 0
        # bit-exact float parity, not rounded: the closed form runs the
        # same IEEE ops on the same integer sufficient statistics
        assert list(got["l_returnflag"]) == list(exp["l_returnflag"])
        assert (got["n_rows"].to_numpy() == exp["n_rows"].to_numpy()).all()
        assert (
            got["corr_qty_price"].to_numpy() == exp["corr_qty_price"].to_numpy()
        ).all()

    def test_perfect_and_degenerate(self, ray_session, tmp_path):
        """y = 2x gives corr exactly 1.0; a constant column has zero
        variance and must hit the den=0 guard (0.0, not NaN); floor
        semantics make x.99 and x.01 the same whole unit."""
        from entity_extractor_linker_ray.pipelines.relational import lineitem_corr

        rows = pd.DataFrame(
            {
                "l_orderkey": np.arange(1, 9, dtype=np.int64),
                "l_returnflag": ["P"] * 4 + ["C"] * 4,
                # P: quantity 1..4, price exactly 2x -> corr 1.0
                # C: constant quantity -> zero variance -> 0.0
                "l_quantity": [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0, 5.0],
                "l_extendedprice": [2.0, 4.0, 6.0, 8.0, 10.99, 10.01, 10.5, 10.0],
            }
        )
        rows.to_parquet(tmp_path / "lineitem.parquet")

        got = (
            lineitem_corr(str(tmp_path))
            .to_pandas()
            .set_index("l_returnflag")["corr_qty_price"]
        )
        assert got["P"] == 1.0
        assert got["C"] == 0.0  # guard, not NaN — all prices floor to 10


class TestDocsTopDecile:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            DOCS_TOP_DECILE_ORACLE,
            docs_top_decile,
        )

        got = _canon(docs_top_decile(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             DOCS_TOP_DECILE_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_exact_discrete_boundary(self, ray_session, tmp_path):
        """N=10 distinct lengths 1..10: k = ceil(0.9*10) = 9, so the
        threshold is the 9th smallest (9) and exactly {9, 10} survive —
        including ties AT the threshold."""
        from entity_extractor_linker_ray.ops.textstats import docs_top_decile

        rows = pd.DataFrame(
            {
                "doc_id": np.arange(1, 12, dtype=np.int64),
                "n_chars": np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 9],
                                    dtype=np.int64),
                "text": ["x"] * 11,
                "lang": ["en"] * 11,
                "source": ["s"] * 11,
            }
        )
        rows.to_parquet(tmp_path / "documents.parquet")

        got = docs_top_decile(str(tmp_path)).to_pandas()
        # N=11 -> k = ceil(9.9) = 10 -> threshold = 10th smallest = 9
        assert sorted(got["doc_id"]) == [9, 10, 11]
        assert set(got["n_chars"]) == {9, 10}
