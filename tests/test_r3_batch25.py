"""Round-3 batch 25: the language-ID heuristic is now VALUE-gated (its
marker rule replays exactly in SQL — `lang_id` leaves the rows-only
list) and the confusion matrix over it — DuckDB parity plus planted
fixtures for the tiebreak and the 'und' zero-score path."""

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


def _doc_oracle(sql: str, path: str = f"{SF}/documents.parquet") -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


class TestLangIdOracle:
    def test_lang_id_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            LANG_ID_ORACLE,
            lang_id,
        )

        got = _canon(_as_df(lang_id(SF)))
        exp = _canon(_doc_oracle(LANG_ID_ORACLE))
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_tiebreak_and_und(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import lang_id

        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             # doc 1: 'la' scores 1 for BOTH es and fr -> alphabetical
             # tiebreak picks 'es'; doc 2: zero marker hits -> 'und';
             # doc 3: clear German.
             "text": ["la maison grande",
                      "qqq www zzz",
                      "der hund und die katze ist"],
             "lang": ["fr", "en", "de"],
             "source": ["s"] * 3,
             "n_chars": [16, 11, 26]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _as_df(lang_id(str(tmp_path))).set_index("doc_id")
        assert got.loc[1, "predicted_lang"] == "es"
        assert got.loc[2, "predicted_lang"] == "und"
        assert got.loc[3, "predicted_lang"] == "de"


class TestLangConfusionMatrix:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            LANG_CONFUSION_ORACLE,
            lang_confusion_matrix,
        )

        got = _canon(_as_df(lang_confusion_matrix(SF)))
        exp = _canon(_doc_oracle(LANG_CONFUSION_ORACLE))
        assert len(got) >= 4
        pd.testing.assert_frame_equal(got, exp)

    def test_row_shares_normalize(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            lang_confusion_matrix,
        )

        got = _as_df(lang_confusion_matrix(SF))
        for _, g in got.groupby("true_lang"):
            s = int(g["row_share_ppm"].sum())
            assert 1_000_000 - len(g) <= s <= 1_000_000
