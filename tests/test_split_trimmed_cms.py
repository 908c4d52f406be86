"""Fourteenth-session batch, part 2: leakage-safe cluster-aware
train/val split, exact trimmed means, count-min-sketch heavy hitters."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _connect(sf=SF):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _hash_split(doc_id: int, val_pct: int = 10) -> str:
    return "val" if ((doc_id * 2654435761) % (1 << 32)) % 100 < val_pct \
        else "train"


class TestLeakageSafeSplit:
    def test_planted_dup_family_moves_together(self, ray_session, tmp_path):
        """Two identical documents whose OWN hashes disagree get the
        cluster representative's split; an unrelated singleton keeps
        the per-doc rule."""
        from entity_extractor_linker_ray.ops.pretrain import leakage_safe_split

        # find a (val, train) id pair under the per-doc rule
        ids = list(range(1, 200))
        val_ids = [i for i in ids if _hash_split(i) == "val"]
        train_ids = [i for i in ids if _hash_split(i) == "train"]
        a, b = val_ids[0], train_ids[0]
        singleton = train_ids[1]
        dup_text = ("the quick brown fox jumps over the lazy dog near "
                    "the riverbank every single morning")
        pd.DataFrame(
            {"doc_id": np.array([a, b, singleton], dtype=np.int64),
             "text": [dup_text, dup_text, "completely different words "
                      "about graph engines and arrow batches flying"],
             "lang": ["en", "en", "en"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = leakage_safe_split(str(tmp_path)).to_pandas()
        got = got.set_index("doc_id")
        rep = min(a, b)
        assert got.loc[a, "group_id"] == rep
        assert got.loc[b, "group_id"] == rep
        assert got.loc[a, "split"] == _hash_split(rep)
        assert got.loc[b, "split"] == _hash_split(rep)
        assert got.loc[singleton, "group_id"] == singleton
        assert got.loc[singleton, "split"] == _hash_split(singleton)

    def test_no_pair_straddles_split(self, ray_session):
        """The defining invariant: no verified near-dup pair has its
        two docs on opposite sides."""
        from entity_extractor_linker_ray.ops.dedupe import ngram_jaccard_pairs
        from entity_extractor_linker_ray.ops.pretrain import leakage_safe_split

        split = leakage_safe_split(SF).to_pandas().set_index("doc_id")["split"]
        pairs = ngram_jaccard_pairs(SF).to_pandas()
        assert len(pairs) > 0, "fixture corpus must contain near-dups"
        for _, p in pairs.iterrows():
            assert split[p["doc_a"]] == split[p["doc_b"]]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            leakage_safe_split,
            leakage_safe_split_oracle,
        )

        key = ["doc_id"]
        got = (
            leakage_safe_split(SF).to_pandas()
            .sort_values(key).reset_index(drop=True)
        )
        exp = (
            _connect().execute(leakage_safe_split_oracle()).df()
            .sort_values(key).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestTrimmedMeanByType:
    def test_planted_simple_trim(self, ray_session, tmp_path):
        """values 0.01..0.10 -> n=10, trim 1 each end, mean of 2..9
        cents = 44/8 = 5.5."""
        from entity_extractor_linker_ray.pipelines.relational import (
            trimmed_mean_by_type,
        )

        pd.DataFrame(
            {"event_type": ["a"] * 10,
             "value": [i / 100 for i in range(1, 11)]}
        ).to_parquet(tmp_path / "events.parquet")
        got = trimmed_mean_by_type(str(tmp_path))
        assert len(got) == 1
        r = got.iloc[0]
        assert r["n_events"] == 10 and r["trimmed_each"] == 1
        assert r["trimmed_sum_centi"] == 44
        assert r["trimmed_mean_centi"] == 5.5

    def test_straddling_cell_partial_trim(self, ray_session, tmp_path):
        """Nine 0.01s and one 1.00: the vc=1 cell straddles the bottom
        cut — exactly one of its nine items is trimmed."""
        from entity_extractor_linker_ray.pipelines.relational import (
            trimmed_mean_by_type,
        )

        pd.DataFrame(
            {"event_type": ["a"] * 10,
             "value": [0.01] * 9 + [1.00]}
        ).to_parquet(tmp_path / "events.parquet")
        got = trimmed_mean_by_type(str(tmp_path))
        r = got.iloc[0]
        assert r["trimmed_sum_centi"] == 8  # eight surviving 1-cent items
        assert r["trimmed_mean_centi"] == 1.0

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            TRIMMED_MEAN_BY_TYPE_ORACLE,
            trimmed_mean_by_type,
        )

        got = (
            trimmed_mean_by_type(SF)
            .sort_values("event_type").reset_index(drop=True)
        )
        exp = (
            _connect().execute(TRIMMED_MEAN_BY_TYPE_ORACLE).df()
            .sort_values("event_type").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (
            got["trimmed_mean_centi"].to_numpy()
            == exp["trimmed_mean_centi"].to_numpy()
        ).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestCmsHeavyHitters:
    def test_planted_exact_small_vocab(self, ray_session, tmp_path):
        """Tiny vocabulary, 2048-wide sketch: no collisions, estimates
        equal exact counts and rank correctly."""
        from entity_extractor_linker_ray.ops.textstats import cms_heavy_hitters

        pd.DataFrame(
            {"doc_id": np.array([1, 2], dtype=np.int64),
             "text": ["apple apple apple banana cherry",
                      "apple banana banana date"]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = cms_heavy_hitters(str(tmp_path), k=10)
        counts = dict(zip(got["term"], got["est_count"]))
        assert counts == {"apple": 4, "banana": 3, "cherry": 1, "date": 1}
        assert got["term"].tolist()[:2] == ["apple", "banana"]

    def test_upper_bound_guarantee_on_corpus(self, ray_session):
        """CMS hard guarantee: est >= exact for every returned term;
        and the top term agrees with the exact count."""
        from entity_extractor_linker_ray.ops.textstats import cms_heavy_hitters

        got = cms_heavy_hitters(SF, k=20)
        assert len(got) == 20
        split = re.compile(r"[^a-z0-9]+")
        exact: Counter = Counter()
        texts = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
        for (text,) in texts:
            exact.update(t for t in split.split((text or "").lower()) if t)
        total = sum(exact.values())
        for _, row in got.iterrows():
            true = exact[row["term"]]
            assert row["est_count"] >= true
            # depth-4 min over 2048 columns: allow a loose slack bound
            assert row["est_count"] - true <= max(5, 8 * total // 2048)
        top_exact = max(exact.items(), key=lambda kv: (kv[1], kv[0]))
        assert got.iloc[0]["est_count"] >= top_exact[1]
