"""Round-3 batch 24: incremental exact-dedup state maintenance and the
training-mix weight recipe — DuckDB parity, merge ≡ from-scratch
equality at several partition counts, and planted-recipe semantics
(a failing source gets weight 0; weights sum to ~10⁶)."""

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
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _doc_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.execute(sql).df()


class TestDedupExactIncremental:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.dedupe import EXACT_DEDUP_ORACLE
        from entity_extractor_linker_ray.pipelines.incremental import (
            dedup_exact_incremental,
        )

        got = _canon(_as_df(dedup_exact_incremental(SF)))
        exp = _canon(_doc_oracle(EXACT_DEDUP_ORACLE))
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_merge_equals_from_scratch(self, ray_session):
        from entity_extractor_linker_ray.ops.dedupe import exact_dedup
        from entity_extractor_linker_ray.pipelines.incremental import (
            dedup_exact_incremental,
        )

        scratch = _canon(_as_df(exact_dedup(SF)))
        for partitions in (2, 5):
            inc = _canon(_as_df(dedup_exact_incremental(SF, partitions)))
            pd.testing.assert_frame_equal(inc, scratch)


class TestMixtureWeights:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            MIXTURE_WEIGHTS_ORACLE,
            mixture_weights,
        )

        got = _canon(_as_df(mixture_weights(SF)))
        exp = _canon(_doc_oracle(MIXTURE_WEIGHTS_ORACLE))
        assert len(got) > 10
        pd.testing.assert_frame_equal(got, exp)
        # weights are a normalized mix: sum within floor-division slack
        w = _as_df(mixture_weights(SF))["weight_ppm"].sum()
        assert 1_000_000 - len(got) <= w <= 1_000_000

    def test_failing_source_gets_zero_weight(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.pretrain import mixture_weights

        good = " ".join(["the data table is in the row and it was here"] * 6)
        bad = "zz " * 60  # no stopwords, no real alpha mix -> fails rules
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": [good, good, bad.strip()],
             "lang": ["en", "en", "en"],
             "source": ["feedA", "feedA", "feedB"],
             "n_chars": [len(good), len(good), len(bad.strip())]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _as_df(mixture_weights(str(tmp_path))).set_index("source")
        assert got.loc["feedA", "weight_ppm"] == 1_000_000
        assert got.loc["feedB", "weight_ppm"] == 0
        assert got.loc["feedB", "n_docs"] == 1
