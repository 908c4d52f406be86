"""gopher_quality_flags + events_cume_dist: DuckDB value parity plus
rule-attribution and tie semantics fixtures."""

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
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(np.float64).round(9)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestGopherFlags:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            GOPHER_QUALITY_FLAGS_ORACLE,
            gopher_quality_flags,
        )

        got = _canon(gopher_quality_flags(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             GOPHER_QUALITY_FLAGS_ORACLE))
        pd.testing.assert_frame_equal(got, exp)
        # the gate is non-vacuous on the corpus: both outcomes occur
        assert set(got["pass_all"].unique()) == {0, 1}

    def test_rule_attribution(self, ray_session, tmp_path):
        """Each fixture doc fails exactly ONE rule: too short (10
        words), mean word length 2 (<3), 50% alpha words, and only one
        stopword — and a fifth doc passes everything."""
        from entity_extractor_linker_ray.ops.textstats import (
            gopher_quality_flags,
        )

        passing = "the quick brown fox " * 15  # 60 words, 2 stopwords? no: 15 'the'
        docs = pd.DataFrame(
            {"doc_id": np.arange(5, dtype=np.int64),
             "text": [
                 "the of " + " ".join(["word"] * 8),           # 10 words
                 "the of " + " ".join(["ab"] * 58),            # mean len 2
                 "the of " + " ".join(
                     ["word7"] * 24 + ["123"] * 34),           # 43% alpha
                 "the " + " ".join(["word"] * 59),             # 1 stopword
                 passing.strip(),
             ],
             "lang": ["en"] * 5, "source": ["s"] * 5,
             "n_chars": np.zeros(5, dtype=np.int64)}
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = gopher_quality_flags(str(tmp_path)).to_pandas().set_index("doc_id")
        assert got.loc[0, "r_wordcount"] == 0 and got.loc[0, "pass_all"] == 0
        assert (got.loc[0, ["r_meanlen", "r_alpha", "r_stopwords"]] == 1).all()
        assert got.loc[1, "r_meanlen"] == 0
        assert (got.loc[1, ["r_wordcount", "r_alpha", "r_stopwords"]] == 1).all()
        assert got.loc[2, "r_alpha"] == 0
        assert (got.loc[2, ["r_wordcount", "r_meanlen", "r_stopwords"]] == 1).all()
        assert got.loc[3, "r_stopwords"] == 0
        assert (got.loc[3, ["r_wordcount", "r_meanlen", "r_alpha"]] == 1).all()
        assert got.loc[4, "pass_all"] == 1


class TestCumeDist:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_CUME_DIST_ORACLE,
            events_cume_dist,
        )

        got = _canon(events_cume_dist(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_CUME_DIST_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_tie_semantics_at_or_below(self, ray_session, tmp_path):
        """Values [1, 2, 2, 4]: CUME_DIST counts AT-OR-BELOW, so both
        2s get 3/4 (percent_rank would give them 1/3) and the max gets
        exactly 1.0."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_cume_dist,
        )

        pd.DataFrame(
            {"event_id": np.arange(1, 5, dtype=np.int64),
             "ts": pd.to_datetime(["2024-01-01"] * 4),
             "user_id": np.ones(4, dtype=np.int64),
             "event_type": ["x"] * 4,
             "value": np.array([1.0, 2.0, 2.0, 4.0]),
             "props": ["{}"] * 4}
        ).to_parquet(tmp_path / "events.parquet")

        got = events_cume_dist(str(tmp_path)).to_pandas().set_index("event_id")
        assert got.loc[1, "cume_dist"] == 0.25
        assert got.loc[2, "cume_dist"] == 0.75
        assert got.loc[3, "cume_dist"] == 0.75
        assert got.loc[4, "cume_dist"] == 1.0
