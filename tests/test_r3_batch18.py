"""Round-3 batch 18: per-doc n-gram novelty, pairwise source gram
overlap, Theil-Sen robust daily trend, and the iterative BPE merge
trainer — DuckDB value parity for the three SQL-expressible ops plus
planted-corpus semantics (copy scores zero novelty, mirrored sources
score Jaccard 100, the Theil-Sen median ignores an outlier day, BPE
merges match hand-computed order) and the distributed == local-replica
gate for the trainer."""

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


class TestGramNovelty:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            gram_novelty,
            gram_novelty_oracle,
        )

        got = _canon(_as_df(gram_novelty(SF)))
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             gram_novelty_oracle()))
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_copy_scores_zero(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import gram_novelty

        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["alpha beta gamma delta epsilon",
                      "alpha beta gamma delta epsilon",   # exact copy of 1
                      "zeta eta theta iota kappa"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _as_df(gram_novelty(str(tmp_path))).set_index("doc_id")
        # doc 1 owns all its grams; doc 2 (the copy) owns none; doc 3
        # is disjoint so owns all of its own.
        assert got.loc[1, "novelty_pct"] == 100
        assert got.loc[2, "novelty_pct"] == 0
        assert got.loc[2, "n_novel"] == 0
        assert got.loc[3, "novelty_pct"] == 100
        assert got.loc[1, "n_grams"] == 3  # 5 words -> 3 trigrams


class TestSourceGramOverlap:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            source_gram_overlap,
            source_gram_overlap_oracle,
        )

        got = _canon(_as_df(source_gram_overlap(SF)))
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             source_gram_overlap_oracle()))
        assert len(got) > 5
        pd.testing.assert_frame_equal(got, exp)

    def test_mirrored_sources(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import (
            source_gram_overlap,
        )

        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "source": ["feed_a", "feed_b", "feed_c"],
             "text": ["one two three four",
                      "one two three four",          # mirror of feed_a
                      "five six seven eight"]}       # disjoint
        ).to_parquet(tmp_path / "documents.parquet")
        got = _as_df(source_gram_overlap(str(tmp_path)))
        pairs = {(r.source_a, r.source_b): r for r in got.itertuples()}
        assert ("feed_a", "feed_b") in pairs
        assert pairs[("feed_a", "feed_b")].jaccard_pct == 100
        # disjoint pairs are omitted in both engines
        assert ("feed_a", "feed_c") not in pairs


class TestTheilSenTrend:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_THEILSEN_ORACLE,
            events_theilsen_trend,
        )

        got = _as_df(events_theilsen_trend(SF))
        exp = _oracle({"events": f"{SF}/events.parquet"},
                      EVENTS_THEILSEN_ORACLE)
        got_c, exp_c = _canon(got), _canon(exp)
        assert len(got_c) >= 3
        pd.testing.assert_frame_equal(got_c, exp_c)
        # doubles must be bit-exact, not merely round-9-equal
        g = got.sort_values("event_type")["slope_per_day"].to_numpy()
        e = exp.sort_values("event_type")["slope_per_day"].to_numpy()
        assert (g == e).all()

    def test_outlier_robust(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            events_theilsen_trend,
        )

        # daily counts 2,4,6,8 on days 0..3 (slope exactly 2), plus an
        # outlier day 4 with 100 events: the pairwise-slope MEDIAN
        # stays 2.0 while an OLS fit would be dragged far above it.
        rows = []
        counts = {0: 2, 1: 4, 2: 6, 3: 8, 4: 100}
        eid = 0
        for day, n in counts.items():
            for _ in range(n):
                rows.append((eid, pd.Timestamp("1970-01-01")
                             + pd.Timedelta(days=day), "u", "click", 1.0))
                eid += 1
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                    "event_type", "value"]).to_parquet(
            tmp_path / "events.parquet")
        got = _as_df(events_theilsen_trend(str(tmp_path)))
        assert len(got) == 1
        assert got.iloc[0]["n_days"] == 5
        assert got.iloc[0]["n_pairs"] == 10
        assert got.iloc[0]["slope_per_day"] == 2.0


class TestBpeTrainMerges:
    def test_distributed_equals_replica(self, ray_session):
        import re

        from entity_extractor_linker_ray.ops.textstats import (
            bpe_local_replica,
            bpe_train_merges,
        )

        got = _as_df(bpe_train_merges(SF, n_merges=5))
        word_re = re.compile(r"[a-z]+")
        docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        wc: dict = {}
        for t in docs["text"]:
            for w in word_re.findall((t or "").lower()):
                wc[w] = wc.get(w, 0) + 1
        exp = bpe_local_replica(wc, 5)
        assert len(got) == len(exp) == 5
        for row, (rank, left, right, cnt) in zip(got.itertuples(), exp):
            assert (row.rank, row.left, row.right, row.pair_count) == (
                rank, left, right, cnt)
            assert row.merged == left + right

    def test_planted_merges(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import bpe_train_merges

        # "aaab" x3 + "ab" x2: round 1 pairs: (a,a): 2 per aaab -> 6;
        # (a,b): 1 per aaab + 1 per ab -> 5. Merge 1 = (a,a) count 6.
        # Round 2 re-tokenizes aaab -> [aa, a, b] (leftmost-first
        # greedy): pairs (aa,a) 3, (a,b) 3+2=5 -> merge 2 = (a,b) 5.
        pd.DataFrame(
            {"doc_id": [1], "text": ["aaab aaab aaab ab ab"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = _as_df(bpe_train_merges(str(tmp_path), n_merges=2))
        assert [(r.left, r.right, r.pair_count) for r in got.itertuples()] == [
            ("a", "a", 6), ("a", "b", 5)]

    def test_early_stop_on_exhausted_vocab(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import bpe_train_merges

        # single 2-char word: after the one possible merge the symbol
        # stream has no adjacent pairs left -> trainer stops early.
        pd.DataFrame({"doc_id": [1], "text": ["ab ab"]}).to_parquet(
            tmp_path / "documents.parquet")
        got = _as_df(bpe_train_merges(str(tmp_path), n_merges=5))
        assert len(got) == 1
        assert (got.iloc[0]["left"], got.iloc[0]["right"]) == ("a", "b")
