"""Round-3 batch 10: consecutive-turn lexical overlap, context-window
truncation accounting, and the boilerplate-assistant-response inventory
— DuckDB value parity at sf0.001 plus the boundary semantics SQL can't
isolate (distinct-token counting inside a turn, the overflow-turn
keeps-zero rule, occurrence-vs-conversation counting)."""

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


def _docs(tmp_path, texts: list[str]):
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.zeros(len(texts), dtype=np.int64),
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


class TestTurnOverlap:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_TURN_OVERLAP_ORACLE,
            conv_turn_overlap,
        )

        got = _canon(conv_turn_overlap(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_TURN_OVERLAP_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_boundaries(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_turn_overlap,
        )

        # doc0: 13 words -> 2 turns, 1 pair; turn1 = ["m"], turn0 has
        #   "a" twice (distinct-counted once -> 11 distinct) -> inter 0,
        #   union 11+1=12
        # doc1: 12 words -> single turn, no row
        # doc2: 24 words, second dozen repeats the first -> inter 12,
        #   union 12 (identical distinct sets)
        w0 = "a a b c d e f g h i j k m"
        w1 = " ".join(f"t{i}" for i in range(12))
        w2 = " ".join(f"x{i}" for i in range(12)) + " " + " ".join(
            f"x{i}" for i in range(12)
        )
        sf = _docs(tmp_path, [w0, w1, w2])
        got = conv_turn_overlap(sf).to_pandas().set_index("conv_id")
        assert "doc-0000000001" not in got.index
        r0 = got.loc["doc-0000000000"]
        assert (r0["n_pairs"], r0["inter_sum"], r0["union_sum"]) == (1, 0, 12)
        r2 = got.loc["doc-0000000002"]
        assert (r2["n_pairs"], r2["inter_sum"], r2["union_sum"]) == (1, 12, 12)


class TestContextBudget:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_context_budget,
            conv_context_budget_oracle,
        )

        got = _canon(conv_context_budget(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             conv_context_budget_oracle()))
        assert len(got) > 0
        # the default budget must actually split the corpus both ways
        assert (got["dropped_turns"] > 0).any()
        assert (got["dropped_turns"] == 0).any()
        pd.testing.assert_frame_equal(got, exp)

    def test_boundaries(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_context_budget,
        )

        # doc0: 30 words -> turns of 12,12,6; budget 18 keeps the last
        #   TWO turns? 6+12=18 <= 18 keeps both, next would be 30 > 18.
        # doc1: empty -> one 0-word turn, kept (0 <= budget).
        # doc2: 13 words -> last turn 1 word; budget 0 keeps nothing...
        #   use budget 18: turns 12,1 -> 1+12=13 <= 18 keeps both.
        texts = [
            " ".join(f"w{i}" for i in range(30)),
            "",
            " ".join(f"v{i}" for i in range(13)),
        ]
        sf = _docs(tmp_path, texts)
        got = (
            conv_context_budget(sf, budget_words=18)
            .to_pandas()
            .set_index("conv_id")
        )
        r0 = got.loc["doc-0000000000"]
        assert (r0["n_turns"], r0["kept_turns"], r0["kept_words"],
                r0["dropped_turns"]) == (3, 2, 18, 1)
        r1 = got.loc["doc-0000000001"]
        assert (r1["n_turns"], r1["kept_turns"], r1["kept_words"]) == (1, 1, 0)
        r2 = got.loc["doc-0000000002"]
        assert (r2["kept_turns"], r2["kept_words"]) == (2, 13)

    def test_overflow_final_turn_keeps_zero(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_context_budget,
        )

        sf = _docs(tmp_path, [" ".join(f"w{i}" for i in range(12))])
        got = conv_context_budget(sf, budget_words=5).to_pandas()
        assert got.iloc[0]["kept_turns"] == 0
        assert got.iloc[0]["kept_words"] == 0
        assert got.iloc[0]["dropped_turns"] == 1


class TestCommonAssistantTurns:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_common_assistant_turns,
            conv_common_assistant_turns_oracle,
        )

        got = _canon(conv_common_assistant_turns(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             conv_common_assistant_turns_oracle()))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_occurrences_vs_conversations(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_common_assistant_turns,
        )

        # assistant turns are ti=1,4,7,... (ti%3==1). doc0 is built so
        # its assistant turns at ti=1 and ti=4 are the SAME dozen words
        # (two occurrences, ONE conversation); doc1 repeats that dozen
        # at its own ti=1 (third occurrence, second conversation).
        dozen = " ".join(f"r{i}" for i in range(12))
        filler = " ".join(f"f{i}" for i in range(12))
        other = " ".join(f"o{i}" for i in range(12))
        # doc0 turns: [filler, dozen, other, filler, dozen] -> 60 words
        d0 = " ".join([filler, dozen, other, filler, dozen])
        # doc1 turns: [other, dozen] -> 24 words
        d1 = " ".join([other, dozen])
        sf = _docs(tmp_path, [d0, d1])
        got = conv_common_assistant_turns(sf).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert row["n_occurrences"] == 3
        assert row["n_convs"] == 2
        assert row["first_conv_id"] == "doc-0000000000"
