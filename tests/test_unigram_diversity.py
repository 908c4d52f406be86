"""Round-3 batch 3: unigram commonness scoring (CCNet-style corpus-LM
quality signal, integer-exact) and per-source token diversity
(type-token ratio + Gini-Simpson)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _connect(sf=SF):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    return con


def _to_pd(result):
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


class TestUnigramCommonness:
    def test_planted_scores(self, ray_session, tmp_path):
        """Corpus 'a a a b' (N=4): cpm(a)=750000, cpm(b)=250000.
        Doc 1 = 'a a a' → sum 2250000, mean 750000; doc 2 = 'b' →
        sum 250000, mean 250000. The rare-token doc scores lower."""
        from entity_extractor_linker_ray.ops.textstats import (
            unigram_commonness,
        )

        pd.DataFrame(
            {"doc_id": np.array([1, 2], dtype=np.int64),
             "text": ["a a a", "b"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _to_pd(unigram_commonness(str(tmp_path))).sort_values("doc_id")
        assert got["n_tokens"].tolist() == [3, 1]
        assert got["sum_cpm"].tolist() == [2250000, 250000]
        np.testing.assert_allclose(got["mean_cpm"], [750000.0, 250000.0])

    def test_empty_and_punct_docs_dropped(self, ray_session, tmp_path):
        """Docs with no alphanumeric tokens emit no row (matching the
        oracle, where unnest of an empty list yields nothing)."""
        from entity_extractor_linker_ray.ops.textstats import (
            unigram_commonness,
        )

        pd.DataFrame(
            {"doc_id": np.array([1, 2, 3], dtype=np.int64),
             "text": ["hello", "!!! ...", None]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _to_pd(unigram_commonness(str(tmp_path)))
        assert got["doc_id"].tolist() == [1]
        assert got["sum_cpm"].tolist() == [1000000]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            UNIGRAM_COMMONNESS_ORACLE,
            unigram_commonness,
        )

        got = _to_pd(unigram_commonness(SF)).sort_values("doc_id")
        exp = (
            _connect().execute(UNIGRAM_COMMONNESS_ORACLE).df()
            .sort_values("doc_id")
        )
        assert len(got) == len(exp) > 0
        for col in ("doc_id", "n_tokens", "sum_cpm"):
            assert got[col].astype(np.int64).tolist() == \
                exp[col].astype(np.int64).tolist(), col
        np.testing.assert_allclose(
            got["mean_cpm"].to_numpy(), exp["mean_cpm"].to_numpy(),
            rtol=0, atol=0,
        )


class TestSourceTokenDiversity:
    def test_planted_diversity(self, ray_session, tmp_path):
        """Source X: 'a a b' twice → N=6, V=2, counts {a:4, b:2} →
        sum_c2 = 20, gini = 1 - 20/36. Source Y: all-same 'z z z' →
        gini 0 (pure repetition), ttr = 1/3."""
        from entity_extractor_linker_ray.ops.textstats import (
            source_token_diversity,
        )

        pd.DataFrame(
            {"doc_id": np.array([1, 2, 3], dtype=np.int64),
             "source": ["X", "X", "Y"],
             "text": ["a a b", "a a b", "z z z"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _to_pd(source_token_diversity(str(tmp_path)))
        assert got["source"].tolist() == ["X", "Y"]
        assert got["n_tokens"].tolist() == [6, 3]
        assert got["vocab"].tolist() == [2, 1]
        assert got["sum_c2"].tolist() == [20, 9]
        np.testing.assert_allclose(
            got["gini_simpson"], [1.0 - 20.0 / 36.0, 0.0]
        )
        np.testing.assert_allclose(got["ttr"], [2.0 / 6.0, 1.0 / 3.0])

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            SOURCE_TOKEN_DIVERSITY_ORACLE,
            source_token_diversity,
        )

        got = _to_pd(source_token_diversity(SF)).sort_values("source")
        exp = (
            _connect().execute(SOURCE_TOKEN_DIVERSITY_ORACLE).df()
            .sort_values("source").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        for col in ("source", "n_tokens", "vocab", "sum_c2"):
            assert got[col].tolist() == exp[col].tolist(), col
        for col in ("ttr", "gini_simpson"):
            np.testing.assert_allclose(
                got[col].to_numpy(), exp[col].to_numpy(), rtol=0, atol=0
            )
