"""Batch-3 additions: conversation-level transcript analytics, top-k
WITH TIES, percentile-band enrichment, and normalization fingerprints
— each value-exact against its DuckDB oracle plus the semantics SQL
can't isolate (turn-split arithmetic, tie expansion at the k
boundary, band-edge inclusivity, Unicode NFC folding)."""

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


class TestConvStats:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_STATS_ORACLE,
            conv_stats,
        )

        got = _canon(conv_stats(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_STATS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_turn_split_arithmetic(self, ray_session, tmp_path):
        """13 words → 2 turns (12+1); roles cycle so turn 0 is the only
        user turn of a 2-turn conversation; no tool turns before
        ti=2; an empty doc still yields exactly one (empty) turn."""
        from entity_extractor_linker_ray.pipelines.conversations import conv_stats

        docs = pd.DataFrame(
            {
                "doc_id": np.array([3, 4], dtype=np.int64),
                "text": [" ".join(f"w{i}" for i in range(13)), ""],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": np.array([0, 0], dtype=np.int64),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = conv_stats(str(tmp_path)).to_pandas().set_index("conv_id")
        a = got.loc["doc-0000000003"]
        assert a["n_turns"] == 2
        assert a["n_user_turns"] == 1  # ti=0 only
        assert a["n_tool_turns"] == 0  # tools first appear at ti=2
        assert a["total_words"] == 13
        assert a["span_us"] == 1_000_000  # turns are 1s apart
        b = got.loc["doc-0000000004"]
        assert b["n_turns"] == 1 and b["total_words"] == 0 and b["span_us"] == 0


class TestTopPartsWithTies:
    def test_matches_duckdb_and_expands_ties(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            TOP_PARTS_WITH_TIES_ORACLE,
            top_parts_with_ties,
        )

        got = _canon(top_parts_with_ties(SF).to_pandas())
        exp = _canon(_oracle({"part": f"{SF}/part.parquet"},
                             TOP_PARTS_WITH_TIES_ORACLE.format(k=10)))
        pd.testing.assert_frame_equal(got, exp)
        # the whole point: RANK <= 10 keeps MORE than 10 rows when tied
        assert len(got) >= 10

    def test_boundary_tie_kept_block_invariant(self, ray_session, tmp_path):
        """RANK semantics at the boundary, both directions: with k=2,
        three rows tied at rank 2 are ALL kept (4 rows out), while two
        rows tied at rank 1 push the next size to rank 3 so k=2 keeps
        exactly the tied pair."""
        from entity_extractor_linker_ray.pipelines.relational import (
            top_parts_with_ties,
        )

        parts = pd.DataFrame(
            {
                "p_partkey": np.arange(1, 8, dtype=np.int64),
                "p_name": [f"part{i}" for i in range(1, 8)],
                "p_size": np.array([50, 40, 40, 40, 30, 20, 10], dtype=np.int64),
            }
        )
        parts.to_parquet(tmp_path / "part.parquet")
        # rank: 50→1, 40s→2,2,2, 30→5 ⇒ rank ≤ 2 keeps four rows
        got = top_parts_with_ties(str(tmp_path), k=2).to_pandas()
        assert sorted(got["p_partkey"]) == [1, 2, 3, 4]

        parts2 = parts.assign(
            p_size=np.array([50, 50, 40, 40, 40, 30, 20], dtype=np.int64)
        )
        d2 = tmp_path / "two"
        d2.mkdir()
        parts2.to_parquet(d2 / "part.parquet")
        # rank: 50s→1,1, 40s→3 ⇒ rank ≤ 2 keeps exactly the tied pair
        got2 = top_parts_with_ties(str(d2), k=2).to_pandas()
        assert sorted(got2["p_partkey"]) == [1, 2]


class TestValueBands:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_VALUE_BANDS_ORACLE,
            events_value_bands,
        )

        got = _canon(events_value_bands(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_VALUE_BANDS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_band_edges_inclusive(self, ray_session, tmp_path):
        """Nine values 1..9 of one type: p33 = 3rd smallest = 3,
        p66 = 6th smallest = 6; values AT a cutoff fall in the lower
        band (<=), so bands are {1,2,3}, {4,5,6}, {7,8,9}."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_value_bands,
        )

        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, 10, dtype=np.int64),
                "user_id": np.ones(9, dtype=np.int64),
                "ts": pd.to_datetime(["2024-01-01"] * 9),
                "event_type": ["x"] * 9,
                "value": np.arange(1.0, 10.0),
                "props": ["{}"] * 9,
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = events_value_bands(str(tmp_path)).to_pandas().set_index("event_id")
        assert list(got.loc[[1, 2, 3], "band"]) == ["low"] * 3
        assert list(got.loc[[4, 5, 6], "band"]) == ["mid"] * 3
        assert list(got.loc[[7, 8, 9], "band"]) == ["high"] * 3


class TestNormalizedFingerprints:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            NORMALIZED_FINGERPRINTS_ORACLE,
            normalized_fingerprints,
        )

        got = _canon(normalized_fingerprints(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             NORMALIZED_FINGERPRINTS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_nfc_case_whitespace_fold(self, ray_session, tmp_path):
        """The three byte-level variants every dedup pipeline must
        fold: decomposed vs precomposed accents (NFC), case, and
        whitespace runs — all four docs land on ONE fingerprint, and
        it matches DuckDB's normalization of the same rows."""
        from entity_extractor_linker_ray.ops.textstats import (
            NORMALIZED_FINGERPRINTS_ORACLE,
            normalized_fingerprints,
        )

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(1, 5, dtype=np.int64),
                "text": [
                    "Café au lait",        # precomposed e-acute
                    "Cafe\u0301 au lait",  # e + combining acute
                    "café AU   lait",        # case + space run
                    "  café au lait  ",      # leading/trailing
                ],
                "lang": ["fr"] * 4,
                "source": ["s"] * 4,
                "n_chars": np.zeros(4, dtype=np.int64),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = normalized_fingerprints(str(tmp_path)).to_pandas()
        assert got["norm_md5"].nunique() == 1
        exp = _oracle({"documents": f"{tmp_path}/documents.parquet"},
                      NORMALIZED_FINGERPRINTS_ORACLE)
        assert set(got["norm_md5"]) == set(exp["norm_md5"])
