"""Fourteenth-session batch, part 5: binary-payload exact dedup,
range similarity search, max-inner-product top-k."""

from __future__ import annotations

import hashlib

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


class TestMediaExactDedup:
    def test_planted_duplicate_payloads(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.multimodal import media_exact_dedup

        pd.DataFrame(
            {"doc_id": np.array([7, 3, 9], dtype=np.int64),
             "text": ["same bytes", "same bytes", "different bytes"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = media_exact_dedup(str(tmp_path)).to_pandas()
        by_sha = got.set_index("sha256")
        dup_sha = hashlib.sha256(b"same bytes").hexdigest()
        uniq_sha = hashlib.sha256(b"different bytes").hexdigest()
        assert by_sha.loc[dup_sha, "survivor_doc_id"] == 3  # min id wins
        assert by_sha.loc[dup_sha, "n_copies"] == 2
        assert by_sha.loc[uniq_sha, "n_copies"] == 1

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.multimodal import (
            MEDIA_EXACT_DEDUP_ORACLE,
            media_exact_dedup,
        )

        got = (
            media_exact_dedup(SF).to_pandas()
            .sort_values("sha256").reset_index(drop=True)
        )
        exp = (
            _connect().execute(MEDIA_EXACT_DEDUP_ORACLE).df()
            .sort_values("sha256").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


def _write_embeddings(tmp_path, vecs):
    pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64),
         "embedding": [list(map(float, v)) for v in vecs],
         "label": np.zeros(len(vecs), dtype=np.int64)}
    ).to_parquet(tmp_path / "embeddings.parquet")


class TestRangeSearch:
    def test_planted_threshold_and_rank(self, ray_session, tmp_path):
        """query = [1,0]; sims: v1=1.0, v2=0.0, v3=0.707 -> tau 0.25
        keeps v1 (rank 1) and v3 (rank 2), drops v2."""
        from entity_extractor_linker_ray.ops.ann import range_search

        _write_embeddings(tmp_path, [[1, 0], [1, 0], [0, 1], [1, 1]])
        got = (
            range_search(str(tmp_path), n_queries=1).to_pandas()
            .sort_values("rank").reset_index(drop=True)
        )
        assert got["neighbor_id"].tolist() == [1, 3]
        assert got["rank"].tolist() == [1, 2]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.ann import (
            range_search,
            range_search_oracle,
        )

        key = ["query_id", "rank"]
        got = range_search(SF).to_pandas().sort_values(key).reset_index(drop=True)
        exp = (
            _connect().execute(range_search_oracle()).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestKnnMips:
    def test_magnitude_changes_ranking(self, ray_session, tmp_path):
        """Raw inner products rank [3,0] above [0.5,0] (cosine would
        tie them); the orthogonal vector ranks last."""
        from entity_extractor_linker_ray.ops.ann import knn_mips

        _write_embeddings(tmp_path, [[1, 0], [0.5, 0], [3, 0], [0, 10]])
        got = (
            knn_mips(str(tmp_path), n_queries=1, k=3).to_pandas()
            .sort_values("rank").reset_index(drop=True)
        )
        assert got["neighbor_id"].tolist() == [2, 1, 3]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.ann import knn_mips, knn_mips_oracle

        key = ["query_id", "rank"]
        got = knn_mips(SF).to_pandas().sort_values(key).reset_index(drop=True)
        exp = (
            _connect().execute(knn_mips_oracle()).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
