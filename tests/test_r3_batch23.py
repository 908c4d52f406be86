"""Round-3 batch 23: farthest-point sampling (greedy k-center coreset)
— DuckDB parity against the unrolled greedy-argmax CTE, the covering-
radius monotonicity property, and a planted-outlier fixture (the
farthest cluster is picked first)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _as_df(result) -> pd.DataFrame:
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


class TestCoresetFps:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            coreset_fps,
            coreset_fps_oracle,
        )

        got = _as_df(coreset_fps(SF)).sort_values("pick_order").reset_index(
            drop=True
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
        )
        exp = (
            con.execute(coreset_fps_oracle())
            .df()
            .astype({c: np.int64 for c in ("pick_order", "vec_id", "radius2")})
            .sort_values("pick_order")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)
        # greedy k-center: the covering radius is non-increasing and
        # the picks are distinct
        r = got["radius2"].to_numpy(np.int64)[1:]
        assert (np.diff(r) <= 0).all()
        assert got["vec_id"].nunique() == len(got)

    def test_outlier_picked_first(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.cluster import coreset_fps

        # tight ball around the origin + one far outlier (vec 42 at
        # distance 100): the first farthest pick MUST be the outlier.
        rng = np.random.default_rng(17)
        d = 16
        rows = [0.01 * rng.standard_normal(d) for _ in range(10)]
        ids = list(range(10))
        far = np.zeros(d)
        far[0] = 100.0
        rows.append(far)
        ids.append(42)
        pd.DataFrame(
            {"vec_id": np.array(ids, dtype=np.int64),
             "embedding": [r.astype(np.float32).tolist() for r in rows],
             "label": np.zeros(len(ids), dtype=np.int32)}
        ).to_parquet(tmp_path / "embeddings.parquet")
        got = _as_df(coreset_fps(str(tmp_path), n_picks=3))
        assert got.loc[got["pick_order"] == 1, "vec_id"].iloc[0] == 42
        # after taking the outlier the radius collapses to ball scale
        r1 = int(got.loc[got["pick_order"] == 1, "radius2"].iloc[0])
        r2 = int(got.loc[got["pick_order"] == 2, "radius2"].iloc[0])
        assert r1 > 100 * r2
