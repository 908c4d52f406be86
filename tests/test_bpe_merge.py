"""Round-3: BPE merge-pair statistics (first tokenizer-training round)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _connect(sf=SF):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


class TestBpeMergeCandidates:
    def test_planted_counts(self, ray_session, tmp_path):
        """'abab abb, xx! ab' → pairs from alpha runs only, weighted by
        occurrence: ab(4: 2 in abab + 1 in abb + 1 in ab), ba(1),
        bb(1), xx(1); punctuation/whitespace never pair."""
        from entity_extractor_linker_ray.ops.textstats import (
            bpe_merge_candidates,
        )

        pd.DataFrame(
            {"doc_id": np.array([1, 2], dtype=np.int64),
             "text": ["abab abb,", "xx! ab"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = bpe_merge_candidates(str(tmp_path)).to_pandas()
        assert got["pair"].tolist() == ["ab", "ba", "bb", "xx"]
        assert got["n"].tolist() == [4, 1, 1, 1]
        assert got["rank"].tolist() == [1, 2, 3, 4]

    def test_case_sensitive_and_single_char_words(self, ray_session, tmp_path):
        """Single-letter words contribute no pairs; 'Ab' != 'ab'."""
        from entity_extractor_linker_ray.ops.textstats import (
            bpe_merge_candidates,
        )

        pd.DataFrame(
            {"doc_id": np.array([1], dtype=np.int64),
             "text": ["a b c Ab ab"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = bpe_merge_candidates(str(tmp_path)).to_pandas()
        assert sorted(got["pair"]) == ["Ab", "ab"]
        assert got["n"].tolist() == [1, 1]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            BPE_MERGE_CANDIDATES_ORACLE,
            bpe_merge_candidates,
        )

        got = (
            bpe_merge_candidates(SF).to_pandas()
            .sort_values("rank").reset_index(drop=True)
        )
        exp = _connect().execute(BPE_MERGE_CANDIDATES_ORACLE).fetchdf()
        pd.testing.assert_frame_equal(
            got[["pair", "n", "rank"]], exp[["pair", "n", "rank"]],
            check_dtype=False,
        )


class TestWinnowFingerprints:
    def test_shared_substring_guarantee(self, ray_session, tmp_path):
        """Winnowing's core property: two docs sharing a substring of
        length >= k + w - 1 share at least one selected fingerprint;
        and a doc shorter than k + w - 1 chars emits nothing."""
        import numpy as np
        import pandas as pd

        from entity_extractor_linker_ray.ops.textstats import (
            WINNOW_K,
            WINNOW_M,
            WINNOW_W,
            winnow_fingerprints,
        )

        shared = "the quick brown fox jumps"
        assert len(shared) >= WINNOW_K + WINNOW_W - 1
        pd.DataFrame(
            {"doc_id": np.array([1, 2, 3], dtype=np.int64),
             "text": [f"AAAA {shared} BBBB", f"zz {shared} qq", "tiny"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = winnow_fingerprints(str(tmp_path)).to_pandas()
        assert sorted(got["doc_id"]) == [1, 2]  # doc 3 below min length

        # recompute the full selected sets locally and intersect
        def selected(text):
            cp = np.frombuffer(
                text.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            weights = np.array(
                [pow(257, WINNOW_K - 1 - j, WINNOW_M)
                 for j in range(WINNOW_K)], dtype=np.int64)
            grams = np.lib.stride_tricks.sliding_window_view(cp, WINNOW_K)
            fps = (grams @ weights) % WINNOW_M
            wins = np.lib.stride_tricks.sliding_window_view(
                fps, WINNOW_W).min(axis=1)
            return set(wins.tolist())

        s1 = selected(f"AAAA {shared} BBBB")
        s2 = selected(f"zz {shared} qq")
        assert s1 & s2, "shared >=k+w-1 substring must share a fingerprint"
        row1 = got[got.doc_id == 1].iloc[0]
        assert row1["n_fps"] == len(s1)
        assert row1["fp_min"] == min(s1) and row1["fp_max"] == max(s1)

    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pandas as pd

        from entity_extractor_linker_ray.ops.textstats import (
            WINNOW_FINGERPRINTS_ORACLE,
            winnow_fingerprints,
        )

        got = (
            winnow_fingerprints(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        exp = (
            _connect().execute(WINNOW_FINGERPRINTS_ORACLE).fetchdf()
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
