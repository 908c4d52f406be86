"""The composed pretraining recipe (split → decontaminate →
repetition-filter → rebalance → pack) — value-hash-gated end to end
against one chained-CTE oracle, plus a planted fixture exercising
every stage's decision on known documents."""

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
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestPretrainCorpus:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            pretrain_corpus,
            pretrain_corpus_oracle,
        )

        got = _canon(pretrain_corpus(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             pretrain_corpus_oracle()))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_every_stage_decides(self, ray_session, tmp_path):
        """Planted corpus: doc 7 is eval (excluded by split), doc 1
        shares a 5-gram with it (decontaminated), doc 2 is 80%
        duplicate bigrams (repetition-dropped), docs 3/4/5 survive to
        rebalancing where lang 'de' (1 doc) is the minority — 'en'
        keeps a hash-selected subset — and the packed layout lays the
        kept docs end-to-end in doc_id order."""
        from entity_extractor_linker_ray.ops.pretrain import (
            _KNUTH,
            _MOD,
            pretrain_corpus,
        )

        leak = "alpha beta gamma delta epsilon"
        docs = pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3, 4, 5, 7], dtype=np.int64),
                "text": [
                    f"intro {leak} outro",          # 1: contaminated
                    "spam ham " * 20 + "spam ham",  # 2: all-duplicate bigrams
                    "one two three four",           # 3: clean en
                    "five six seven eight nine",    # 4: clean en
                    "eins zwei drei",               # 5: clean de (minority)
                    f"eval doc with {leak} inside", # 7: the eval split
                ],
                "lang": ["en", "en", "en", "en", "de", "en"],
                "source": ["s"] * 6,
                "n_chars": np.zeros(6, dtype=np.int64),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = pretrain_corpus(str(tmp_path)).to_pandas().sort_values("doc_id")
        kept = set(got["doc_id"])
        assert 7 not in kept  # eval split never trains
        assert 1 not in kept  # 5-gram overlap with eval
        assert 2 not in kept  # repetition filter

        # rebalance: de has 1 survivor -> mc=1; de keeps its doc iff
        # hash passes threshold 1.0 (it does: thr = 2^32), en keeps the
        # hash-selected subset of {3, 4}
        assert 5 in kept
        en_kept = sorted(kept & {3, 4})
        thr_en = (1 << 32) // 2
        expect_en = [d for d in (3, 4) if int(np.int64(d) * _KNUTH) % int(_MOD) < thr_en]
        assert en_kept == expect_en

        # pack layout: end-to-end in doc_id order, bin arithmetic exact
        got = got.reset_index(drop=True)
        cum = 0
        for _, row in got.iterrows():
            assert row["cum_before"] == cum
            assert row["bin_id"] == cum // 256
            assert row["bin_offset"] == cum % 256
            cum += row["n_tokens"]
