"""Fourteenth-session batch, part 9: distributed embedding covariance
and corpus-half term drift."""

from __future__ import annotations

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


class TestEmbeddingCovariance:
    def test_planted_2d_closed_form(self, ray_session, tmp_path):
        """Three 2-d vectors with integer milli values: covariance
        matches the population formula exactly."""
        from entity_extractor_linker_ray.ops.ann import embedding_covariance

        vecs = [[0.001, 0.002], [0.003, 0.006], [0.005, 0.004]]
        pd.DataFrame(
            {"vec_id": np.arange(3, dtype=np.int64),
             "embedding": vecs,
             "label": np.zeros(3, dtype=np.int64)}
        ).to_parquet(tmp_path / "embeddings.parquet")
        got = embedding_covariance(str(tmp_path), d=2)
        assert got[["i", "j"]].values.tolist() == [[1, 1], [1, 2], [2, 2]]
        X = np.array([[1, 2], [3, 6], [5, 4]], dtype=np.int64)  # milli
        n = 3
        for _, r in got.iterrows():
            a, b = int(r["i"]) - 1, int(r["j"]) - 1
            sxy = int((X[:, a] * X[:, b]).sum())
            si, sj = int(X[:, a].sum()), int(X[:, b].sum())
            assert r["sxy"] == sxy and r["si"] == si and r["sj"] == sj
            expect = (np.float64(sxy) - np.float64(si) * sj / n) / n
            assert r["cov_milli2"] == expect
        # sanity vs numpy population covariance (same milli units)
        cov_np = np.cov(X.T.astype(np.float64), bias=True)
        assert np.allclose(
            [got.iloc[0]["cov_milli2"], got.iloc[1]["cov_milli2"],
             got.iloc[2]["cov_milli2"]],
            [cov_np[0, 0], cov_np[0, 1], cov_np[1, 1]],
        )

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.ops.ann import (
            embedding_covariance,
            embedding_covariance_oracle,
        )

        key = ["i", "j"]
        got = embedding_covariance(SF).sort_values(key).reset_index(drop=True)
        exp = (
            _connect().execute(embedding_covariance_oracle()).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) == 64 * 65 // 2
        assert (got["cov_milli2"].to_numpy() == exp["cov_milli2"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestTermDrift:
    def test_planted_halves(self, ray_session, tmp_path):
        """side 0: 'x x x y' (na=4), side 1: 'x z' (nb=2):
        drift(z)=0.5, drift(x)=drift(y)=0.25, tie broken by term."""
        from entity_extractor_linker_ray.ops.textstats import term_drift

        pd.DataFrame(
            {"doc_id": np.array([0, 1], dtype=np.int64),
             "text": ["x x x y", "x z"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = term_drift(str(tmp_path))
        assert got["term"].tolist() == ["z", "x", "y"]
        assert got["drift"].tolist() == [0.5, 0.25, 0.25]
        assert got["ca"].tolist() == [0, 3, 1]
        assert got["cb"].tolist() == [1, 1, 0]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            term_drift,
            term_drift_oracle,
        )

        key = ["drift", "term"]
        got = (
            term_drift(SF)
            .sort_values(key, ascending=[False, True]).reset_index(drop=True)
        )
        exp = (
            _connect().execute(term_drift_oracle()).df()
            .sort_values(key, ascending=[False, True]).reset_index(drop=True)
        )
        assert len(got) == len(exp) == 20
        assert (got["drift"].to_numpy() == exp["drift"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
