"""Round-3 batch 21: embedding-space duplicate FAMILIES (connected
components over the SQL-replayable semantic pairs) and the cell-bounded
exact kNN join — DuckDB value parity for both, plus planted-geometry
semantics (a near-identical triple chains into one family; a planted
twin is every vector's rank-1 neighbor both ways)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _as_df(result) -> pd.DataFrame:
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        df[col] = df[col].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _emb_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    return con.execute(sql).df()


class TestSemanticDupClusters:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            semantic_dup_clusters,
            semantic_dup_clusters_oracle,
        )

        got = _canon(_as_df(semantic_dup_clusters(SF)))
        exp = _canon(_emb_oracle(semantic_dup_clusters_oracle()))
        assert len(got) > 10
        pd.testing.assert_frame_equal(got, exp)
        # families are transitive closures: every cluster_id is the
        # minimum member id of its own cluster
        mins = got.groupby("cluster_id")["vec_id"].min()
        assert (mins.index.to_numpy() == mins.to_numpy()).all()

    def test_near_identical_triple_chains(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.cluster import (
            semantic_dup_clusters,
        )

        # vec_ids 0..7 seed the 8 centroids; 20..22 are a planted
        # near-identical triple close to seed 0 — same cell, pairwise
        # within threshold, so they and seed 0 chain into one family.
        rng = np.random.default_rng(5)
        d = 64
        base = rng.standard_normal((8, d)) * 2.0
        rows = [base[i] for i in range(8)]
        ids = list(range(8))
        for j, eps in enumerate((0.001, 0.002, 0.003)):
            rows.append(base[0] + eps)
            ids.append(20 + j)
        pd.DataFrame(
            {"vec_id": np.array(ids, dtype=np.int64),
             "embedding": [r.astype(np.float32).tolist() for r in rows],
             "label": np.zeros(len(ids), dtype=np.int32)}
        ).to_parquet(tmp_path / "embeddings.parquet")
        got = _as_df(semantic_dup_clusters(str(tmp_path)))
        fam = got.set_index("vec_id")["cluster_id"]
        assert fam[20] == fam[21] == fam[22] == fam[0] == 0


class TestKnnJoin:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            knn_join_within_cells,
            knn_join_within_cells_oracle,
        )

        got = _canon(_as_df(knn_join_within_cells(SF)))
        exp = _canon(_emb_oracle(knn_join_within_cells_oracle()))
        assert len(got) > 1000
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_twin_is_mutual_rank1(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.cluster import (
            knn_join_within_cells,
        )

        rng = np.random.default_rng(9)
        d = 64
        base = rng.standard_normal((8, d)) * 2.0
        rows = [base[i] for i in range(8)]
        ids = list(range(8))
        rows.append(base[3] + 0.001)  # vec 30: twin of seed 3
        ids.append(30)
        # filler members so cells have company
        for j in range(6):
            rows.append(base[j % 8] + 0.5 + 0.01 * j)
            ids.append(40 + j)
        pd.DataFrame(
            {"vec_id": np.array(ids, dtype=np.int64),
             "embedding": [r.astype(np.float32).tolist() for r in rows],
             "label": np.zeros(len(ids), dtype=np.int32)}
        ).to_parquet(tmp_path / "embeddings.parquet")
        got = _as_df(knn_join_within_cells(str(tmp_path)))
        r1 = got[got["nn_rank"] == 1].set_index("vec_id")["neighbor_id"]
        assert r1[3] == 30
        assert r1[30] == 3

    def test_neighbors_are_exact_within_cell(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            kmeans_clusters,
            knn_join_within_cells,
        )
        import pyarrow.parquet as pq

        got = _as_df(knn_join_within_cells(SF))
        cells = _as_df(kmeans_clusters(SF)).set_index("vec_id")["cluster"]
        table = pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).to_pandas().set_index("vec_id")
        # spot-check 5 vectors: reported neighbors == brute force over
        # the SAME cell (exact within the stated cell bound)
        from entity_extractor_linker_ray.ops.cluster import milli_round

        for vid in sorted(cells.index)[:5]:
            members = cells[cells == cells[vid]].index.to_numpy()
            others = members[members != vid]
            x = milli_round(
                np.asarray(table.loc[vid, "embedding"], dtype=np.float64)
            )
            d2 = np.array(
                [int(((x - milli_round(np.asarray(table.loc[o, "embedding"],
                                                  dtype=np.float64))) ** 2
                      ).sum()) for o in others],
                dtype=np.int64,
            )
            order = np.lexsort((others, d2))[:3]
            exp = others[order]
            mine = got[got["vec_id"] == vid].sort_values("nn_rank")[
                "neighbor_id"
            ].to_numpy()
            np.testing.assert_array_equal(mine, exp[: len(mine)])
