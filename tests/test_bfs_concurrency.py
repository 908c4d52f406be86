"""Batch-8 additions: single-source BFS depths, peak session
concurrency (occupancy sweep), and hierarchical revenue share — each
value-exact against its DuckDB oracle plus the semantics SQL can't
isolate (first-reach wins, the closed-interval tie rule, per-region
share normalization)."""

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


class TestBfsDepths:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_bfs_depths,
            kg_bfs_oracle,
        )

        got = _canon(kg_bfs_depths(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             kg_bfs_oracle()))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_path_graph_depths(self, ray_session, tmp_path):
        """A 3-node path built from KB vocab co-occurrences: edges
        spark—hash and hash—vector; BFS starts at the lexicographic
        minimum ('Hash'), so both neighbors are depth 1 and the source
        is 0 — first-reach, not last."""
        from entity_extractor_linker_ray.ops.graph_algos import (
            _KG_EDGES_CACHE,
            kg_bfs_depths,
        )

        docs = pd.DataFrame(
            {
                "doc_id": np.array([1, 2], dtype=np.int64),
                "text": ["spark zzz hash", "hash zzz vector"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": np.zeros(2, dtype=np.int64),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        _KG_EDGES_CACHE.pop(str(tmp_path), None)

        got = (
            kg_bfs_depths(str(tmp_path))
            .to_pandas()
            .set_index("node")["depth"]
            .to_dict()
        )
        assert got == {"Hash": 0, "Spark": 1, "Vector": 1}


class TestPeakConcurrency:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            PEAK_CONCURRENCY_ORACLE,
            peak_concurrency,
        )

        got = peak_concurrency(SF).to_pandas()
        exp = _oracle({"events": f"{SF}/events.parquet"},
                      PEAK_CONCURRENCY_ORACLE)
        assert int(got["peak"].iloc[0]) == int(exp["peak"].iloc[0])
        assert int(got["first_ts_us"].iloc[0]) == int(exp["first_ts_us"].iloc[0])

    def test_closed_interval_tie(self, ray_session, tmp_path):
        """u1 [10:00,10:10], u2 [10:05,10:15], u3 opens a session at
        EXACTLY u1's end instant: the +1-before-−1 tie rule counts all
        three as overlapping — peak 3 at 10:10:00."""
        from entity_extractor_linker_ray.pipelines.relational import (
            peak_concurrency,
        )

        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, 6, dtype=np.int64),
                "user_id": np.array([1, 1, 2, 2, 3], dtype=np.int64),
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 10:10",
                     "2024-01-01 10:05", "2024-01-01 10:15",
                     "2024-01-01 10:10"]
                ),
                "event_type": ["x"] * 5,
                "value": np.zeros(5),
                "props": ["{}"] * 5,
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = peak_concurrency(str(tmp_path)).to_pandas().iloc[0]
        assert got["peak"] == 3
        assert got["first_ts_us"] == int(
            pd.Timestamp("2024-01-01 10:10").value // 1000
        )


class TestNationRevenueShare:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            NATION_REVENUE_SHARE_ORACLE,
            nation_revenue_share,
        )

        got = _canon(nation_revenue_share(SF).to_pandas())
        exp = _canon(_oracle(
            {"orders": f"{SF}/orders.parquet",
             "customer": f"{SF}/customer.parquet",
             "nation": f"{SF}/nation.parquet",
             "region": f"{SF}/region.parquet"},
            NATION_REVENUE_SHARE_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_shares_sum_to_one_per_region(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            nation_revenue_share,
        )

        got = nation_revenue_share(SF).to_pandas()
        sums = got.groupby("region")["region_share"].sum()
        assert np.allclose(sums.to_numpy(), 1.0, atol=1e-12)
