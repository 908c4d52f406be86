"""Fourteenth-session batch, part 15: type-trigram sequence mining and
heavy-tail value accounting."""

from __future__ import annotations

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


def _ts(seconds):
    return pd.to_datetime(np.asarray(seconds, dtype="int64") * 1_000_000,
                          unit="us")


class TestEventsTypeTrigrams:
    def test_planted_motifs(self, ray_session, tmp_path):
        """user 1: a b c a b c -> (a,b,c) x2, (b,c,a) x1, (c,a,b) x1;
        user 2's two events form no trigram; no cross-user trigrams."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_type_trigrams,
        )

        pd.DataFrame(
            {"event_id": np.arange(8, dtype=np.int64),
             "user_id": np.array([1] * 6 + [2] * 2, dtype=np.int64),
             "ts": _ts(range(8)),
             "event_type": ["a", "b", "c", "a", "b", "c", "x", "y"]}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_type_trigrams(str(tmp_path))
        assert got.iloc[0][["t1", "t2", "t3"]].tolist() == ["a", "b", "c"]
        assert got.iloc[0]["n"] == 2 and got.iloc[0]["rank"] == 1
        assert len(got) == 3
        assert got["n"].tolist() == [2, 1, 1]

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_TYPE_TRIGRAMS_ORACLE,
            events_type_trigrams,
        )

        got = events_type_trigrams(SF).reset_index(drop=True)
        exp = (
            _connect().execute(EVENTS_TYPE_TRIGRAMS_ORACLE).df()
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) == 25
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestTailValueShare:
    def test_planted_tail(self, ray_session, tmp_path):
        """100 events of value 1.00 and one of 100.00: p99 cutoff over
        101 values lands on the whale (ceil(0.99*101)=100 -> the
        100th smallest is 1.00... so cutoff 100 centi: tail = all).
        Use 200 small + 2 big for a cleaner cut."""
        from entity_extractor_linker_ray.pipelines.relational import (
            tail_value_share,
        )

        values = [1.0] * 200 + [100.0] * 2
        pd.DataFrame(
            {"event_type": ["a"] * len(values), "value": values}
        ).to_parquet(tmp_path / "events.parquet")
        got = tail_value_share(str(tmp_path))
        r = got.iloc[0]
        # n=202, ceil(0.99*202)=200 -> 200th smallest = 1.00 (100 centi)
        assert r["cutoff_centi"] == 100
        assert r["n_tail"] == 202  # every value >= the cutoff here
        assert r["tail_share"] == 1.0

        values2 = [1.0] * 990 + [100.0] * 10
        pd.DataFrame(
            {"event_type": ["a"] * 1000, "value": values2}
        ).to_parquet(tmp_path / "events.parquet")
        got2 = tail_value_share(str(tmp_path))
        r2 = got2.iloc[0]
        # ceil(0.99*1000)=990 -> cutoff = 990th smallest = 1.00? the
        # 990 small values occupy ranks 1..990, so cutoff 100 centi;
        # tail = all events again — shift to 989 small + 11 big:
        values3 = [1.0] * 989 + [100.0] * 11
        pd.DataFrame(
            {"event_type": ["a"] * 1000, "value": values3}
        ).to_parquet(tmp_path / "events.parquet")
        got3 = tail_value_share(str(tmp_path))
        r3 = got3.iloc[0]
        assert r3["cutoff_centi"] == 10000  # rank 990 is a 100.00 event
        assert r3["n_tail"] == 11
        expect = np.float64(11 * 10000) / (989 * 100 + 11 * 10000)
        assert r3["tail_share"] == expect

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            TAIL_VALUE_SHARE_ORACLE,
            tail_value_share,
        )

        got = (
            tail_value_share(SF)
            .sort_values("event_type").reset_index(drop=True)
        )
        exp = (
            _connect().execute(TAIL_VALUE_SHARE_ORACLE).df()
            .sort_values("event_type").reset_index(drop=True)
        )
        assert len(got) == len(exp) == 5
        assert (got["tail_share"].to_numpy() == exp["tail_share"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
