"""Round-3 batch 12: preference-pair synthesis from duplicated prompts
and the small-file compaction planner — DuckDB value parity plus the
tie-break and group-boundary semantics the SQL obscures (length-then-
md5 ranking, identical-response groups, the crossing file that lands in
the group its prefix started)."""

from __future__ import annotations

import hashlib

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


def _docs(tmp_path, texts: list[str], n_chars=None, sources=None):
    n = len(texts)
    pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": sources if sources is not None else ["s"] * n,
            "n_chars": (
                np.asarray(n_chars, dtype=np.int64)
                if n_chars is not None
                else np.zeros(n, dtype=np.int64)
            ),
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


class TestPreferencePairs:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_PREFERENCE_PAIRS_ORACLE,
            conv_preference_pairs,
        )

        got = _canon(conv_preference_pairs(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_PREFERENCE_PAIRS_ORACLE))
        # the corpus has real first-turn collisions with differing
        # continuations, so pairs must exist
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_tiebreak_and_exclusions(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_preference_pairs,
        )

        prompt = " ".join(f"p{i}" for i in range(12))
        long_resp = " ".join(f"a{i}" for i in range(12))  # 12 words
        short_resp = "b0 b1 b2"  # 3 words
        # doc0/doc1: same prompt, different-length responses -> pair,
        #   chosen = the 12-word one.
        # doc2/doc3: same prompt, IDENTICAL responses -> no pair.
        # doc4: prompt only (12 words, no response) -> never a candidate.
        other_prompt = " ".join(f"q{i}" for i in range(12))
        sf = _docs(
            tmp_path,
            [
                prompt + " " + long_resp,
                prompt + " " + short_resp,
                other_prompt + " " + long_resp,
                other_prompt + " " + long_resp,
                prompt,
            ],
        )
        got = conv_preference_pairs(sf).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert row["prompt_md5"] == hashlib.md5(prompt.encode()).hexdigest()
        assert row["n_candidates"] == 2
        assert row["chosen_md5"] == hashlib.md5(long_resp.encode()).hexdigest()
        assert row["rejected_md5"] == hashlib.md5(
            short_resp.encode()
        ).hexdigest()
        assert row["chosen_conv_id"] == "doc-0000000000"

    def test_equal_length_md5_tiebreak(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_preference_pairs,
        )

        prompt = " ".join(f"p{i}" for i in range(12))
        r1 = " ".join(f"c{i}" for i in range(12))
        r2 = " ".join(f"d{i}" for i in range(12))
        sf = _docs(tmp_path, [prompt + " " + r1, prompt + " " + r2])
        got = conv_preference_pairs(sf).to_pandas()
        assert len(got) == 1
        h1 = hashlib.md5(r1.encode()).hexdigest()
        h2 = hashlib.md5(r2.encode()).hexdigest()
        row = got.iloc[0]
        assert row["chosen_md5"] == min(h1, h2)
        assert row["rejected_md5"] == max(h1, h2)


class TestCompactionPlan:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            compaction_plan,
            compaction_plan_oracle,
        )

        got = _canon(compaction_plan(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             compaction_plan_oracle()))
        assert len(got) > 0
        # the default target must actually split sources into groups
        assert got.groupby("source").size().max() >= 2
        pd.testing.assert_frame_equal(got, exp)

    def test_group_boundaries(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            compaction_plan,
        )

        # source s: sizes 7,7,7 with target 10 -> before = 0,7,14 ->
        #   groups 0,0,1: the crossing file stays in the group its
        #   prefix started (group 0 totals 14 bytes).
        # source u: one 25-byte file then a 1-byte file -> before =
        #   0,25 -> groups 0,2: ids may skip when one file spans
        #   multiple targets.
        sf = _docs(
            tmp_path,
            ["x"] * 5,
            n_chars=[7, 7, 7, 25, 1],
            sources=["s", "s", "s", "u", "u"],
        )
        got = (
            compaction_plan(sf, target_bytes=10)
            .to_pandas()
            .sort_values(["source", "group_id"])
            .reset_index(drop=True)
        )
        s = got[got["source"] == "s"]
        assert list(s["group_id"]) == [0, 1]
        assert list(s["n_files"]) == [2, 1]
        assert list(s["total_bytes"]) == [14, 7]
        u = got[got["source"] == "u"]
        assert list(u["group_id"]) == [0, 2]
        assert list(u["n_files"]) == [1, 1]


class TestKmeansSeparation:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            kmeans_separation,
            kmeans_separation_oracle,
        )

        got = _canon(kmeans_separation(SF).to_pandas())
        exp = _canon(
            _oracle({"embeddings": f"{SF}/embeddings.parquet"},
                    kmeans_separation_oracle())
        )
        assert len(got) > 1
        pd.testing.assert_frame_equal(got, exp)
        # per point d2_own <= d2_second, so the sums obey it per cluster
        assert (got["intra_d2"] <= got["nearest_other_d2"]).all()
