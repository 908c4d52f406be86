"""k-core decomposition + retention cohorts: planted-graph semantics
(clique survives, pendants cascade away, fixpoint early-exit) with
distributed == local-replica equality, plus oracle parity and
windowing edge cases for the retention matrix."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _edges_ds(pairs: list[tuple[str, str]]):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"x": [p[0] for p in pairs], "y": [p[1] for p in pairs]})
    )


class TestKcore:
    def test_clique_plus_pendant_chain(self, ray_session):
        """K5 clique + a chain hanging off it: the 3-core is exactly
        the clique (degree 4 each); the chain cascades away over
        successive rounds, which exercises multi-round pruning."""
        from entity_extractor_linker_ray.ops.graph_algos import kcore

        clique = [
            (f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)
        ]
        chain = [("c0", "p1"), ("p1", "p2"), ("p2", "p3")]
        out = (
            kcore(_edges_ds(clique + chain), k=3, rounds=6)
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        assert out["entity"].tolist() == [f"c{i}" for i in range(5)]
        assert out["degree"].tolist() == [4, 4, 4, 4, 4]

    def test_matches_local_replica(self, ray_session):
        """Random graph: distributed == single-machine replica, for
        several k, including a k that empties the core."""
        from entity_extractor_linker_ray.ops.graph_algos import (
            kcore,
            kcore_reference,
        )

        rng = np.random.default_rng(3)
        pairs = sorted(
            {
                tuple(sorted((f"n{a}", f"n{b}")))
                for a, b in rng.integers(0, 14, size=(60, 2))
                if a != b
            }
        )
        edges = pd.DataFrame({"x": [p[0] for p in pairs], "y": [p[1] for p in pairs]})
        for k in (2, 4, 9):
            ds = kcore(_edges_ds(pairs), k=k, rounds=8)
            assert ds.schema().names == ["entity", "degree"]
            exp = kcore_reference(edges, k=k, rounds=8)
            got = ds.to_pandas()
            if len(exp) == 0:
                # Ray 2.49 to_pandas drops columns on fully-empty
                # datasets; the schema assertion above covers shape
                assert len(got) == 0
                continue
            got = got.sort_values("entity").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got.astype({"degree": np.int64}), exp, check_dtype=False
            )

    def test_empty_core_keeps_schema(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import kcore

        ds = kcore(_edges_ds([("a", "b"), ("b", "c")]), k=3, rounds=4)
        assert ds.schema().names == ["entity", "degree"]
        assert ds.count() == 0

    def test_kg_kcore_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_kcore,
            kg_kcore_oracle,
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.execute(kg_kcore_oracle())
            .df()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        got = (
            kg_kcore(SF)
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
            .astype({"degree": np.int64})
        )
        pd.testing.assert_frame_equal(got, exp.astype({"degree": np.int64}))
        # the sf0.001 strong graph genuinely prunes: 1281 mention
        # nodes -> 215 core survivors under the round-4 grown KB
        assert 0 < len(got) < 1281
        assert len(got) == 215


class TestRetentionCohorts:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_RETENTION_ORACLE,
            user_retention_cohorts,
        )

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        exp = (
            con.execute(USER_RETENTION_ORACLE)
            .df()
            .sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True)
        )
        got = (
            user_retention_cohorts(SF)
            .to_pandas()
            .sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True)
            .astype(
                {"cohort_day": np.int64, "day_offset": np.int64, "n_users": np.int64}
            )
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_window_semantics(self, ray_session, tmp_path):
        """A user active on days 0,1,9 counts at offsets 0 and 1 only
        (9 > max_offset); multiple events on one day count once; two
        users sharing a cohort day aggregate."""
        from entity_extractor_linker_ray.pipelines.relational import (
            user_retention_cohorts,
        )

        day = 86_400_000_000  # µs per day
        events = pd.DataFrame(
            {
                "event_id": range(6),
                "user_id": [1, 1, 1, 1, 2, 2],
                "ts": pd.to_datetime(
                    np.array([0, 500, day, 9 * day, 100, day + 7], dtype=np.int64),
                    unit="us",
                ),
                "event_type": ["click"] * 6,
                "value": [0.0] * 6,
                "props": ["{}"] * 6,
            }
        )
        events.to_parquet(tmp_path / "events.parquet")
        out = (
            user_retention_cohorts(str(tmp_path))
            .to_pandas()
            .set_index(["cohort_day", "day_offset"])["n_users"]
            .sort_index()
        )
        # both users cohort at epoch day 20454? no — epoch day 0 here
        assert out[(0, 0)] == 2   # user 1 (two events) + user 2
        assert out[(0, 1)] == 2   # both active on day 1
        assert (0, 9) not in out.index and len(out) == 2
