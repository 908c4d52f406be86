"""Batch-11 additions: per-role conversation rollups and the
events-per-user frequency-of-frequencies — both value-exact against
their DuckDB oracles plus the arithmetic SQL can't isolate (last-turn
word remainders, zero-word turns, exact histogram masses)."""

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
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestConvRoleWords:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_ROLE_WORDS_ORACLE,
            conv_role_words,
        )

        got = _canon(conv_role_words(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_ROLE_WORDS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_last_turn_remainder(self, ray_session, tmp_path):
        """25 words → turns of 12/12/1 with roles user/assistant/tool:
        the tool turn carries exactly the 1-word remainder; totals per
        role reconcile with conv_stats' total."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_role_words,
        )

        docs = pd.DataFrame(
            {
                "doc_id": np.array([9], dtype=np.int64),
                "text": [" ".join(f"w{i}" for i in range(25))],
                "lang": ["en"], "source": ["s"],
                "n_chars": np.zeros(1, dtype=np.int64),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = (
            conv_role_words(str(tmp_path))
            .to_pandas()
            .set_index("role")
        )
        assert got.loc["user", "n_words"] == 12
        assert got.loc["assistant", "n_words"] == 12
        assert got.loc["tool", "n_words"] == 1
        assert got["n_turns"].sum() == 3 and got["n_words"].sum() == 25


class TestEventsPerUserDistribution:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_PER_USER_DISTRIBUTION_ORACLE,
            events_per_user_distribution,
        )

        got = _canon(events_per_user_distribution(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_PER_USER_DISTRIBUTION_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_histogram_mass(self, ray_session):
        """The histogram re-aggregates to the raw totals: Σ(k·users_k)
        = total events, Σusers_k = distinct users."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_per_user_distribution,
        )

        got = events_per_user_distribution(SF).to_pandas()
        con = duckdb.connect()
        total, users = con.execute(
            f"SELECT count(*), count(DISTINCT user_id) "
            f"FROM '{SF}/events.parquet'"
        ).fetchone()
        assert int((got["n_events"] * got["n_users"]).sum()) == total
        assert int(got["n_users"].sum()) == users


class TestBpeTokenCounts:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            BPE_TOKEN_COUNTS_ORACLE,
            bpe_token_counts,
        )

        got = _canon(bpe_token_counts(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             BPE_TOKEN_COUNTS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_class_splits(self, ray_session, tmp_path):
        """Where BPE cost diverges from word count: \"don't count 123
        tokens!! x9y\" is 3 whitespace-words more than its 10 pretokens
        (contraction apostrophe, digit runs, punctuation runs, and the
        letter-digit-letter sandwich all split)."""
        from entity_extractor_linker_ray.ops.textstats import bpe_token_counts

        docs = pd.DataFrame(
            {"doc_id": np.array([1], dtype=np.int64),
             "text": ["don't count 123 tokens!! x9y"],
             "lang": ["en"], "source": ["s"],
             "n_chars": np.zeros(1, dtype=np.int64)}
        )
        docs.to_parquet(tmp_path / "documents.parquet")

        got = bpe_token_counts(str(tmp_path)).to_pandas().iloc[0]
        # don | ' | t | count | 123 | tokens | !! | x | 9 | y
        assert got["n_pretokens"] == 10
        assert got["n_alpha"] == 6
        assert got["n_num"] == 2
        assert got["n_punct"] == 2


class TestEngagementProfile:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_ENGAGEMENT_PROFILE_ORACLE,
            user_engagement_profile,
        )

        got = user_engagement_profile(SF).to_pandas().sort_values(
            "user_id").reset_index(drop=True)
        exp = _oracle({"events": f"{SF}/events.parquet"},
                      USER_ENGAGEMENT_PROFILE_ORACLE).sort_values(
            "user_id").reset_index(drop=True)
        assert len(got) > 0
        for col in ("user_id", "n_sessions", "n_converted", "n_events",
                    "total_session_us"):
            assert (got[col].to_numpy(dtype=np.int64)
                    == exp[col].to_numpy(dtype=np.int64)).all()
        # single IEEE division of identical ints -> bit-exact
        assert (got["conversion_rate"].to_numpy()
                == exp["conversion_rate"].to_numpy()).all()

    def test_composed_semantics(self, ray_session, tmp_path):
        """u1: one converted session + one idle-view session 2h later
        -> 2 sessions, rate 0.5; durations sum exactly."""
        from entity_extractor_linker_ray.pipelines.relational import (
            user_engagement_profile,
        )

        rows = pd.DataFrame(
            {"event_id": np.arange(1, 6, dtype=np.int64),
             "user_id": np.ones(5, dtype=np.int64),
             "ts": pd.to_datetime(
                 ["2024-01-01 10:00", "2024-01-01 10:05",  # session 1
                  "2024-01-01 10:10",
                  "2024-01-01 13:00", "2024-01-01 13:01"]  # session 2
             ),
             "event_type": ["click", "view", "purchase", "view", "view"],
             "value": np.zeros(5), "props": ["{}"] * 5}
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = user_engagement_profile(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_sessions"] == 2
        assert got["n_converted"] == 1
        assert got["conversion_rate"] == 0.5
        assert got["n_events"] == 5
        assert got["total_session_us"] == (10 * 60 + 1 * 60) * 1_000_000


class TestOrdersAging:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDERS_STATUS_AGING_ORACLE,
            orders_status_aging,
        )

        got = _canon(orders_status_aging(SF).to_pandas())
        exp = _canon(_oracle({"orders": f"{SF}/orders.parquet"},
                             ORDERS_STATUS_AGING_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_band_edges_and_status_filter(self, ray_session, tmp_path):
        """Only status 'O' rows count; an order exactly 30 days old is
        in 0-30 (closed upper edge), 31 days lands in 31-60; the newest
        order defines day zero."""
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_status_aging,
        )

        orders = pd.DataFrame(
            {"o_orderkey": np.arange(1, 6, dtype=np.int64),
             "o_custkey": np.zeros(5, dtype=np.int64),
             "o_orderstatus": ["O", "O", "O", "F", "O"],
             "o_totalprice": np.zeros(5),
             "o_orderdate": pd.to_datetime(
                 ["2024-06-01",   # 0 days -> 0-30 (also the ref max)
                  "2024-05-02",   # 30 days -> 0-30
                  "2024-05-01",   # 31 days -> 31-60
                  "2024-01-01",   # F: ignored entirely
                  "2023-01-01"]), # 517 days -> 180+
             "o_orderpriority": ["1-URGENT"] * 5}
        )
        orders.to_parquet(tmp_path / "orders.parquet")

        got = (
            orders_status_aging(str(tmp_path))
            .to_pandas().set_index("age_band")["n_orders"]
        )
        assert got.get("0-30") == 2
        assert got.get("31-60") == 1
        assert got.get("180+") == 1
        assert "61-90" not in got.index and "91-180" not in got.index
