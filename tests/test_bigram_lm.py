"""bigram_commonness: DuckDB value parity plus a hand-computed
conditional-probability fixture (the floor-division ppm values and the
no-bigram exclusion are exact, so any drift in pair building, prefix
counting, or integer scaling fails loudly)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


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


class TestBigramCommonness:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            BIGRAM_COMMONNESS_ORACLE,
            bigram_commonness,
        )

        got = _canon(bigram_commonness(SF).to_pandas())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = _canon(con.execute(BIGRAM_COMMONNESS_ORACLE).df())
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_hand_computed_conditionals(self, ray_session, tmp_path):
        """Corpus 'a b a b' + 'a c' + 'x': c_first(a)=3 so
        ppm(a→b)=⌊2·10⁶/3⌋=666666, ppm(a→c)=333333, ppm(b→a)=10⁶;
        the single-token doc emits no row."""
        from entity_extractor_linker_ray.ops.textstats import (
            bigram_commonness,
        )

        pd.DataFrame(
            {"doc_id": np.array([0, 1, 2], dtype=np.int64),
             "text": ["a b a b", "a c", "x"],
             "lang": ["en"] * 3, "source": ["s"] * 3,
             "n_chars": np.zeros(3, dtype=np.int64)}
        ).to_parquet(tmp_path / "documents.parquet")

        got = bigram_commonness(str(tmp_path)).to_pandas().set_index("doc_id")
        assert 2 not in got.index
        d0 = got.loc[0]
        assert d0["n_bigrams"] == 3
        assert d0["sum_ppm"] == 2 * 666666 + 1_000_000
        d1 = got.loc[1]
        assert d1["n_bigrams"] == 1 and d1["sum_ppm"] == 333333
