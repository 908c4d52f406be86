"""Round-3 batch 22: KG→QA-pair sink (golden-gated string construction
with support counts) and integer recursive daily EWMA (the first
data-driven-depth WITH RECURSIVE oracle) — DuckDB parity plus planted
semantics (duplicate triples pool their support; a spike decays
geometrically and gap days pull the smoother down)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _as_df(result) -> pd.DataFrame:
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestKgQaPairs:
    def test_matches_golden_oracle(self, ray_session):
        import __ray_entry__ as entrymod

        q = entrymod.queries()
        sql = entrymod.oracle_sql()["kg_qa_pairs"]
        got = _canon(_as_df(q["kg_qa_pairs"](SF)))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = _canon(con.execute(sql).df())
        assert len(got) > 100
        pd.testing.assert_frame_equal(got, exp)

    def test_duplicate_triples_pool_support(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.stages.graph import qa_pairs

        triples = pd.DataFrame(
            {"subject": ["Spark", "Spark", "Hash"],
             "predicate": ["uses", "uses", "stores"],
             "object": ["Hash", "Hash", "Row"]}
        )
        got = _as_df(qa_pairs(rd.from_pandas(triples)))
        fwd = got[got["direction"] == "forward"].set_index("question")
        assert fwd.loc['What does "Spark" uses?', "n_support"] == 2
        assert fwd.loc['What does "Spark" uses?', "answer"] == "Hash"
        inv = got[got["direction"] == "inverse"].set_index("question")
        assert inv.loc['Which entity stores "Row"?', "answer"] == "Hash"
        # 2 distinct triples x 2 directions
        assert len(got) == 4


class TestEventsDailyEwma:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_DAILY_EWMA_ORACLE,
            events_daily_ewma,
        )

        got = _canon(_as_df(events_daily_ewma(SF)))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
        )
        exp = _canon(con.execute(EVENTS_DAILY_EWMA_ORACLE).df())
        assert len(got) > 50
        pd.testing.assert_frame_equal(got, exp)

    def test_spike_decays_and_gaps_fill(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            events_daily_ewma,
        )

        # one type: 256 events on day 0, NOTHING on days 1-3 (a ts gap),
        # 8 on day 4 — the smoother must decay 256 -> 192 -> 144 -> 108
        # through the zero-filled gap, then absorb the day-4 count.
        day = 86_400_000_000
        ts = [np.datetime64(0, "us")] * 256 + [np.datetime64(4 * day, "us")] * 8
        pd.DataFrame(
            {"event_id": np.arange(264, dtype=np.int64),
             "user_id": np.zeros(264, dtype=np.int64),
             "event_type": "click",
             "ts": ts,
             "value": np.ones(264)}
        ).to_parquet(tmp_path / "events.parquet")
        got = _as_df(events_daily_ewma(str(tmp_path))).sort_values("d")
        np.testing.assert_array_equal(
            got["c"].to_numpy(np.int64), [256, 0, 0, 0, 8]
        )
        np.testing.assert_array_equal(
            got["ewma"].to_numpy(np.int64),
            [256, 192, 144, 108, (8 + 3 * 108) // 4],
        )
