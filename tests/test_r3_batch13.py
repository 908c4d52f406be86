"""Round-3 batch 13: interval-stabbing order backlog (sweep line) and
rule-set-vs-LLM extraction agreement — DuckDB value parity plus the
sweep-line boundary semantics (exclusive end day, same-day open/close
cancellation) and the agreement triage arithmetic on a planted corpus."""

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


class TestOpenBacklog:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_open_backlog,
            orders_open_backlog_oracle,
        )

        got = _canon(orders_open_backlog(SF).to_pandas())
        exp = _canon(_oracle({"orders": f"{SF}/orders.parquet"},
                             orders_open_backlog_oracle()))
        assert len(got) > 10
        pd.testing.assert_frame_equal(got, exp)

    def test_sweep_semantics(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_open_backlog,
        )

        # two orders on day 0, one on day 2; horizon 3:
        #   day 0: +2 -> 2 open; day 2: +1 -> 3 open;
        #   day 3: -2 (day-0 orders close, exclusive end) -> 1 open;
        #   day 5: -1 -> 0 open.
        days = pd.to_datetime(["1970-01-01", "1970-01-01", "1970-01-03"])
        pd.DataFrame({"o_orderdate": days}).to_parquet(
            tmp_path / "orders.parquet"
        )
        got = (
            orders_open_backlog(str(tmp_path), horizon_days=3)
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        assert list(got["day"]) == [0, 2, 3, 5]
        assert list(got["day_delta"]) == [2, 1, -2, -1]
        assert list(got["open_orders"]) == [2, 3, 1, 0]
        # the backlog always returns to zero: every order closes
        assert got["open_orders"].iloc[-1] == 0


class TestRulesetLlmAgreement:
    def test_matches_golden(self, ray_session):
        import __ray_entry__ as entry

        got = entry.queries()["kg_ruleset_llm_agreement"](SF)
        sql = entry.oracle_sql()["kg_ruleset_llm_agreement"]
        exp = _oracle({"documents": f"{SF}/documents.parquet"}, sql)
        pd.testing.assert_frame_equal(_canon(got), _canon(exp))
        row = got.iloc[0]
        # the rule vocabulary is a subset of what the stub LLM can
        # extract, so overlap must exist
        assert row["n_both"] > 0

    def test_planted_counts(self, ray_session, tmp_path):
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.simple_kg import (
            ruleset_llm_agreement,
        )

        # corpus mentions exactly one rule-vocab term (lowercase
        # "spark" -> mention name "Spark"); the fake LLM side reports
        # Spark plus one extra name
        pd.DataFrame(
            {
                "doc_id": np.array([0], dtype=np.int64),
                "text": ["spark zzz qqq"],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": np.array([0], dtype=np.int64),
            }
        ).to_parquet(tmp_path / "documents.parquet")
        llm = rd.from_pandas(
            pd.DataFrame({"entity": ["Spark", "Quantum Meadow"]})
        )
        got = ruleset_llm_agreement(str(tmp_path), llm)
        row = got.iloc[0]
        assert row["n_both"] == 1
        assert row["n_llm_only"] == 1
        assert row["n_rule_only"] == 0


class TestSftWindows:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_sft_windows,
            conv_sft_windows_oracle,
        )

        got = _canon(conv_sft_windows(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             conv_sft_windows_oracle()))
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_window_boundaries(self, ray_session, tmp_path):
        import hashlib

        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_sft_windows,
        )

        # 61 words -> 6 turns (t0..t5, t5 has 1 word); assistant turns
        # ti=1 (context [t0]) and ti=4 (context [t1,t2,t3] -- capped at
        # k=3, t0 excluded)
        turns = [
            " ".join(f"w{ti}_{i}" for i in range(12)) for ti in range(5)
        ]
        text = " ".join(turns) + " tail"
        pd.DataFrame(
            {
                "doc_id": np.array([0], dtype=np.int64),
                "text": [text],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": np.array([0], dtype=np.int64),
            }
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            conv_sft_windows(str(tmp_path))
            .to_pandas()
            .set_index("turn_idx")
        )
        assert sorted(got.index) == [1, 4]
        assert got.loc[1, "context_turns"] == 1
        assert got.loc[1, "context_words"] == 12
        assert got.loc[1, "context_md5"] == hashlib.md5(
            turns[0].encode()
        ).hexdigest()
        assert got.loc[4, "context_turns"] == 3
        assert got.loc[4, "context_words"] == 36
        assert got.loc[4, "context_md5"] == hashlib.md5(
            "\n".join(turns[1:4]).encode()
        ).hexdigest()


class TestIntraDocRepeats:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            intra_doc_repeats,
            intra_doc_repeats_oracle,
        )

        got = _canon(intra_doc_repeats(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             intra_doc_repeats_oracle()))
        assert len(got) > 10  # 3-gram self-repetition exists here
        pd.testing.assert_frame_equal(got, exp)

    def test_localization_semantics(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import (
            intra_doc_repeats,
        )

        # doc0: "a b c a b c a b c" -> 7 trigram positions; "a b c"
        #   repeats at 3 and 6, "b c a" at 4, "c a b" at 5 -> 4 repeat
        #   positions over 3 distinct grams.
        # doc1: all-unique trigrams -> no row.
        pd.DataFrame(
            {
                "doc_id": np.array([0, 1], dtype=np.int64),
                "text": ["a b c a b c a b c", "x y z w v u"],
                "lang": ["en"] * 2,
                "source": ["s"] * 2,
                "n_chars": np.zeros(2, dtype=np.int64),
            }
        ).to_parquet(tmp_path / "documents.parquet")
        got = intra_doc_repeats(str(tmp_path)).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert row["doc_id"] == 0
        assert row["n_positions"] == 7
        assert row["n_repeat_positions"] == 4
        assert row["n_repeated_grams"] == 3


class TestFuzzyDupClusters:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.fuzzy import (
            fuzzy_dup_clusters,
            fuzzy_dup_clusters_oracle,
        )

        got = _canon(fuzzy_dup_clusters(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             fuzzy_dup_clusters_oracle()))
        assert len(got) >= 2  # the corpus has fuzzy-duplicate prefixes
        pd.testing.assert_frame_equal(got, exp)

    def test_transitive_chain(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.fuzzy import fuzzy_dup_clusters

        # A~B (dist 1), B~C (dist 1), but A~C dist 2 > threshold 1:
        # the chain still lands all three in one family; D is far from
        # everything and emits no row.
        pd.DataFrame(
            {
                "doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
                "text": ["abcdefgh", "abcdefgx", "abcdefyx",
                         "zzzzzzzzzzzzzzzz"],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": np.zeros(4, dtype=np.int64),
            }
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            fuzzy_dup_clusters(str(tmp_path), max_dist=1)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [0, 1, 2]
        assert list(got["cluster_id"]) == [0, 0, 0]


class TestWinsorizedMean:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_WINSORIZED_MEAN_ORACLE,
            events_winsorized_mean,
        )

        got = _canon(events_winsorized_mean(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_WINSORIZED_MEAN_ORACLE))
        assert len(got) == 5
        pd.testing.assert_frame_equal(got, exp)
        # capping can only pull the sum inward: lo <= mean <= hi
        assert (got["lo_milli"] <= got["winsorized_mean_milli"]).all()
        assert (got["winsorized_mean_milli"] <= got["hi_milli"]).all()

    def test_cap_arithmetic(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            events_winsorized_mean,
        )

        # 10 values 1..10 (milli 1000..10000): ceil(0.1*10)=1st -> lo
        # 1000; ceil(0.9*10)=9th -> hi 9000; winsorized values are
        # 1..9 with 10 capped to 9 -> sum 54000
        pd.DataFrame(
            {
                "event_id": np.arange(10, dtype=np.int64),
                "user_id": np.zeros(10, dtype=np.int64),
                "event_type": ["t"] * 10,
                "ts": pd.to_datetime(["2024-01-01"] * 10),
                "value": np.arange(1.0, 11.0),
                "props": ["{}"] * 10,
            }
        ).to_parquet(tmp_path / "events.parquet")
        got = events_winsorized_mean(str(tmp_path)).to_pandas()
        row = got.iloc[0]
        assert (row["lo_milli"], row["hi_milli"]) == (1000, 9000)
        assert row["winsorized_sum_milli"] == 54000
        assert row["winsorized_mean_milli"] == 5400.0


class TestVideoSceneCuts:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.multimodal import (
            video_scene_cuts,
            video_scene_cuts_oracle,
        )

        got = _canon(video_scene_cuts(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             video_scene_cuts_oracle()))
        assert len(got) > 1000
        # the threshold must fire both ways on this corpus
        assert set(got["is_cut"].unique()) == {0, 1}
        pd.testing.assert_frame_equal(got, exp)

    def test_real_bytes_drive_the_kernel(self, ray_session):
        """The Ray side decodes genuine PPM bytes: corrupting one frame
        header must crash the decode, proving the kernel is not a
        generator replay."""
        import pytest

        from entity_extractor_linker_ray.functions.imaging import (
            decode_ppm_stream,
        )
        from entity_extractor_linker_ray.ops.multimodal import (
            attach_video_payload,
        )

        payload = (
            attach_video_payload(SF).take(1)[0]["payload"]
        )
        frames = decode_ppm_stream(payload)
        assert len(frames) >= 3
        with pytest.raises(Exception):
            decode_ppm_stream(b"XX" + payload[2:])
