"""Pretraining-corpus operators: decontamination, repetition signals,
sequence packing, language rebalancing — each oracle-parity-checked at
sf0.001 plus targeted edge cases (planted contamination, short docs,
tie-breaking, range-width invariance, exact-threshold semantics)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str, sf_dir: str = SF) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_float_dtype(df[col]):
            df[col] = np.round(df[col].astype(float), 9)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _write_docs(tmp_path, rows: list[tuple[int, str, str]]) -> str:
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["src0"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


class TestDecontaminate:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            DECONTAMINATE_ORACLE,
            decontaminate,
        )

        got = _canon(decontaminate(SF).to_pandas())
        exp = _canon(_oracle(DECONTAMINATE_ORACLE))
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_overlap(self, ray_session, tmp_path):
        """doc 17 is eval (17 % 10 == 7); doc 1 shares a 5-gram with
        it, doc 2 shares none, doc 3 is too short for any 5-gram."""
        from entity_extractor_linker_ray.ops.pretrain import decontaminate

        sf = _write_docs(
            tmp_path,
            [
                (17, "q w e r t y u", "en"),   # eval: grams qwert werty ertyu
                (1, "z z w e r t y z z", "en"),  # contains "w e r t y"
                (2, "a b c d e f g", "en"),
                (3, "x y", "en"),
            ],
        )
        out = (
            decontaminate(sf)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out.index) == [1, 2, 3]
        assert out.loc[1, "n_hit"] == 1 and out.loc[1, "contaminated"] == 1
        assert out.loc[2, "n_hit"] == 0 and out.loc[2, "contaminated"] == 0
        assert out.loc[3, "n_grams"] == 0 and out.loc[3, "contaminated"] == 0
        # doc 1: 9 words -> 5 grams, all distinct
        assert out.loc[1, "n_grams"] == 5

    def test_duplicate_grams_counted_once(self, ray_session, tmp_path):
        """Repeated identical grams in one training doc count once
        (distinct semantics on both sides of the join)."""
        from entity_extractor_linker_ray.ops.pretrain import decontaminate

        sf = _write_docs(
            tmp_path,
            [
                (7, "a b c d e", "en"),
                (1, "a b c d e a b c d e", "en"),  # gram "a b c d e" twice
            ],
        )
        out = decontaminate(sf).to_pandas().set_index("doc_id")
        # 10 words -> 6 gram positions, distinct grams: the 6 windows
        # include the duplicate "a b c d e" (positions 1 and 6) -> 5
        assert out.loc[1, "n_grams"] == 5
        assert out.loc[1, "n_hit"] == 1


class TestRepetitionSignals:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            REPETITION_ORACLE,
            repetition_signals,
        )

        got = _canon(repetition_signals(SF).to_pandas())
        exp = _canon(_oracle(REPETITION_ORACLE))
        pd.testing.assert_frame_equal(got, exp)

    def test_known_ratios_and_tiebreak(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.pretrain import repetition_signals

        sf = _write_docs(
            tmp_path,
            [
                (0, "a a a b", "en"),   # bigrams: aa aa ab -> dup 1/3
                (1, "x y", "en"),       # tie: both count 1 -> 'x' wins
                (2, "w", "en"),          # no bigrams -> ratio 0
            ],
        )
        out = repetition_signals(sf).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "top_word"] == "a"
        assert out.loc[0, "top_word_cnt"] == 3
        assert out.loc[0, "top_word_ratio"] == pytest.approx(0.75)
        assert out.loc[0, "n_bigrams"] == 3
        assert out.loc[0, "dup_bigram_ratio"] == pytest.approx(1.0 / 3.0)
        assert out.loc[1, "top_word"] == "x"  # lexicographic tie-break
        assert out.loc[2, "n_bigrams"] == 0
        assert out.loc[2, "dup_bigram_ratio"] == 0.0


class TestPackSequences:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            pack_sequences,
            pack_sequences_oracle,
        )

        got = _canon(pack_sequences(SF).to_pandas())
        exp = _canon(_oracle(pack_sequences_oracle()))
        pd.testing.assert_frame_equal(got, exp)

    def test_layout_and_range_width_invariance(self, ray_session, tmp_path):
        """Bin layout is exact concat-and-chunk, and the coarse-range
        width (the distribution knob) cannot change the answer."""
        from entity_extractor_linker_ray.ops.pretrain import pack_sequences

        sf = _write_docs(
            tmp_path,
            [
                (0, " ".join(["w"] * 7), "en"),   # tokens 7, cum 0
                (1, " ".join(["w"] * 4), "en"),   # cum 7
                (2, " ".join(["w"] * 9), "en"),   # cum 11 -> bin 1 offset 1
                (5, " ".join(["w"] * 2), "en"),   # cum 20 -> bin 2 offset 0
            ],
        )
        out = (
            pack_sequences(sf, capacity=10, range_width=4096)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out["cum_before"]) == [0, 7, 11, 20]
        assert list(out["bin_id"]) == [0, 0, 1, 2]
        assert list(out["bin_offset"]) == [0, 7, 1, 0]

        narrow = (
            pack_sequences(sf, capacity=10, range_width=2)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        pd.testing.assert_frame_equal(out, narrow)


class TestLangRebalance:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            LANG_REBALANCE_ORACLE,
            lang_rebalance,
        )

        got = _canon(lang_rebalance(SF).to_pandas())
        exp = _canon(_oracle(LANG_REBALANCE_ORACLE))
        pd.testing.assert_frame_equal(got, exp)

    def test_min_lang_keeps_everything(self, ray_session, tmp_path):
        """The smallest language's threshold is exactly 2^32, so every
        one of its documents survives; larger languages shrink."""
        from entity_extractor_linker_ray.ops.pretrain import lang_rebalance

        rows = [(i, f"doc {i}", "en") for i in range(40)]
        rows += [(100 + i, f"klein {i}", "de") for i in range(5)]
        sf = _write_docs(tmp_path, rows)
        out = lang_rebalance(sf).to_pandas()
        by_lang = out.groupby("lang").size()
        assert by_lang["de"] == 5          # min lang: all kept
        assert 0 < by_lang.get("en", 0) < 40
        # deterministic: a second run is identical
        again = lang_rebalance(sf).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("doc_id").reset_index(drop=True),
            again.sort_values("doc_id").reset_index(drop=True),
        )


class TestTrainValSplit:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.pretrain import (
            train_val_split,
            train_val_split_oracle,
        )

        got = (
            train_val_split(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        exp = (
            _oracle(train_val_split_oracle())
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    def test_deterministic_and_roughly_sized(self, ray_session):
        """Same assignment on a re-run (hash, not RNG), every doc
        assigned exactly once, val fraction near the target."""
        from entity_extractor_linker_ray.ops.pretrain import train_val_split

        a = train_val_split(SF).to_pandas().sort_values("doc_id")
        b = train_val_split(SF).to_pandas().sort_values("doc_id")
        assert (a["split"].to_numpy() == b["split"].to_numpy()).all()
        assert a["doc_id"].is_unique
        frac = (a["split"] == "val").mean()
        assert 0.03 <= frac <= 0.20  # 10% target, small-corpus noise

    def test_exact_hash_rule_planted(self, ray_session, tmp_path):
        """Pin the arithmetic: doc_id 0 hashes to 0 -> val; a doc_id
        chosen so hash%100 == val_pct lands in train (strict <)."""
        from entity_extractor_linker_ray.ops.pretrain import train_val_split

        ids = np.arange(200, dtype=np.int64)
        pd.DataFrame({"doc_id": ids, "lang": "en"}).to_parquet(
            tmp_path / "documents.parquet"
        )
        got = train_val_split(str(tmp_path)).to_pandas().set_index("doc_id")
        h = (ids * np.int64(2654435761)) % (np.int64(1) << np.int64(32))
        expect = np.where(h % 100 < 10, "val", "train")
        assert (got.loc[ids, "split"].to_numpy() == expect).all()
        assert got.loc[0, "split"] == "val"  # hash(0) == 0 < 10
