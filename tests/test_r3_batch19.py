"""Round-3 batch 19: DSIR-style importance scoring, token-budget
greedy selection, and within-conversation vocabulary attribution —
DuckDB value parity for all three plus planted-corpus semantics (a doc
made of target-domain grams outscores a disjoint one, the budget cut
is a real prefix cut, and echoed vocabulary attributes to the earliest
speaker)."""

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


def _as_df(result) -> pd.DataFrame:
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


class TestDsirImportance:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            dsir_importance,
            dsir_importance_oracle,
        )

        got = _canon(_as_df(dsir_importance(SF)))
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             dsir_importance_oracle()))
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_target_grams_outscore_disjoint(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import dsir_importance

        # target slice (lang=en) repeats one phrase; doc 10 (raw) is
        # made of exactly that phrase, doc 11 (raw) is disjoint junk.
        target = "neural network training data pipeline"
        pd.DataFrame(
            {"doc_id": [0, 1, 2, 10, 11],
             "text": [target, target, target,
                      target,
                      "zzq qqz vvw wwv xxu uux"],
             "lang": ["en", "en", "en", "de", "de"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _as_df(dsir_importance(str(tmp_path))).set_index("doc_id")
        assert got.loc[10, "dsir_score"] > got.loc[11, "dsir_score"]
        # the disjoint doc's grams are raw-only: every diff is negative
        assert got.loc[11, "dsir_score"] < 0


class TestTokenBudgetPick:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            TOKEN_BUDGET_PICK_ORACLE,
            token_budget_pick,
        )

        got = _canon(_as_df(token_budget_pick(SF)))
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             TOKEN_BUDGET_PICK_ORACLE))
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_prefix_cut_semantics(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import token_budget_pick

        df = _as_df(token_budget_pick(SF)).sort_values(
            ["alpha_ppm", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        total = int(df["n_words"].sum())
        budget = total // 2
        sel = df["selected"].to_numpy(dtype=np.int64)
        # a genuine prefix: once deselected, never selected again
        first_out = int(np.argmin(sel)) if (sel == 0).any() else len(sel)
        assert (sel[:first_out] == 1).all()
        assert (sel[first_out:] == 0).all()
        # selected mass is within budget; adding the first rejected
        # doc with words would overflow it
        kept = int(df.loc[sel == 1, "n_words"].sum())
        assert kept <= budget
        rejected = df.loc[sel == 0]
        if not rejected.empty:  # the cut doc itself overflows the budget
            assert int(rejected.iloc[0]["cum_words"]) > budget

    def test_running_sum_is_global(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import token_budget_pick

        df = _as_df(token_budget_pick(SF)).sort_values(
            ["alpha_ppm", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        np.testing.assert_array_equal(
            df["cum_words"].to_numpy(dtype=np.int64),
            np.cumsum(df["n_words"].to_numpy(dtype=np.int64)),
        )


class TestConvTurnNovelty:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_TURN_NOVELTY_ORACLE,
            conv_turn_novelty,
        )

        got = _canon(_as_df(conv_turn_novelty(SF)))
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_TURN_NOVELTY_ORACLE))
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_echo_attributes_to_earliest_speaker(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_turn_novelty,
        )

        # turn 0 (user): words u0..u11; turn 1 (assistant): echoes
        # u0..u5 and introduces a0..a5 — echoed words belong to user.
        words = [f"u{i}" for i in range(12)]
        words += [f"u{i}" for i in range(6)] + [f"a{i}" for i in range(6)]
        pd.DataFrame(
            {"doc_id": [7], "text": [" ".join(words)]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _as_df(conv_turn_novelty(str(tmp_path)))
        by_role = got.set_index("role")["n_first_words"]
        assert by_role["user"] == 12
        assert by_role["assistant"] == 6
        assert "tool" not in by_role.index
