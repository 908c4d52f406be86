"""Round-3 batch 9: shared-opening-prompt groups, cross-conversation
stale-turn attribution, the TPC-H Q4 EXISTS shape, the hopping-window
streaming aggregate, and SQ8 scalar-quantized ANN — DuckDB value parity
plus the boundary semantics SQL can't isolate (role-sensitive
staleness, the strict late cutoff, the exact two-window membership)."""

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


def _docs(tmp_path, texts: list[str]):
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.zeros(len(texts), dtype=np.int64),
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


class TestFirstTurnDupes:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_FIRST_TURN_DUPES_ORACLE,
            conv_first_turn_dupes,
        )

        got = _canon(conv_first_turn_dupes(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_FIRST_TURN_DUPES_ORACLE))
        # the synthetic corpus has REAL first-turn collisions
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_shared_prefix(self, ray_session, tmp_path):
        """Two docs sharing their first 12 words (different tails) form
        one group attributed to the smaller conv_id; a unique opener
        emits no row."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_first_turn_dupes,
        )

        prefix = " ".join(f"p{i}" for i in range(12))
        sf = _docs(tmp_path, [prefix + " tail0",
                              prefix + " tail1 tail2",
                              "totally different opener"])
        got = conv_first_turn_dupes(sf).to_pandas()
        assert len(got) == 1
        assert int(got["n_convs"].iloc[0]) == 2
        assert got["first_conv_id"].iloc[0] == "doc-0000000000"


class TestStaleTurns:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_STALE_TURNS_ORACLE,
            conv_stale_turns,
        )

        got = _canon(conv_stale_turns(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             CONV_STALE_TURNS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_role_sensitive_staleness(self, ray_session, tmp_path):
        """doc-1 repeats doc-0's user turn verbatim → stale; doc-2
        carries the same text in an ASSISTANT turn (position 1), which
        is a different (role, text) group → novel. Only doc-1 reports."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_stale_turns,
        )

        filler = " ".join(f"w{i}" for i in range(12))
        sf = _docs(tmp_path, ["alpha beta",
                              "alpha beta",
                              filler + " alpha beta"])
        got = conv_stale_turns(sf).to_pandas()
        assert len(got) == 1
        assert got["conv_id"].iloc[0] == "doc-0000000001"
        assert int(got["n_stale_turns"].iloc[0]) == 1


class TestQ4OrderPriorityCheck:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            q4_order_priority_check,
            q4_order_priority_check_oracle,
        )

        got = _canon(q4_order_priority_check(SF).to_pandas())
        exp = _canon(_oracle(
            {"orders": f"{SF}/orders.parquet",
             "lineitem": f"{SF}/lineitem.parquet"},
            q4_order_priority_check_oracle(),
        ))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_strict_late_cutoff_and_quarter_filter(self, ray_session, tmp_path):
        """Order 1 ships exactly +30d → NOT late (strict >); order 2
        ships +31d → late; order 3 has one early and one late line →
        counted once; order 4 is late but outside the quarter →
        excluded."""
        from entity_extractor_linker_ray.pipelines.relational import (
            q4_order_priority_check,
        )

        base = pd.Timestamp("1996-02-01")
        pd.DataFrame(
            {"o_orderkey": np.array([1, 2, 3, 4], dtype=np.int64),
             "o_orderdate": [base, base, base, pd.Timestamp("1995-06-01")],
             "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT", "5-LOW"]}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {"l_orderkey": np.array([1, 2, 3, 3, 4], dtype=np.int64),
             "l_shipdate": [base + pd.Timedelta(days=30),
                            base + pd.Timedelta(days=31),
                            base + pd.Timedelta(days=1),
                            base + pd.Timedelta(days=90),
                            pd.Timestamp("1995-06-01")
                            + pd.Timedelta(days=90)]}
        ).to_parquet(tmp_path / "lineitem.parquet")
        got = q4_order_priority_check(str(tmp_path)).to_pandas()
        got = got.set_index("o_orderpriority")["order_count"].to_dict()
        assert got == {"2-HIGH": 1, "1-URGENT": 1}


class TestHoppingWindow:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_HOPPING_WINDOW_ORACLE,
            events_hopping_window,
        )

        got = _canon(events_hopping_window(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_HOPPING_WINDOW_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_exact_two_window_membership(self, ray_session, tmp_path):
        """Event A at the epoch boundary and event B one hop later:
        the shared window (A's anchor = B's anchor − hop) holds both;
        each event's other window holds it alone."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_hopping_window,
        )

        t0 = pd.Timestamp("2024-01-01")
        hop = pd.Timedelta(minutes=30)
        pd.DataFrame(
            {"event_id": np.array([1, 2], dtype=np.int64),
             "ts": [t0, t0 + hop],
             "user_id": np.array([7, 7], dtype=np.int64),
             "event_type": ["click", "click"],
             "value": [1.0, 2.0],
             "props": ["{}", "{}"]}
        ).to_parquet(tmp_path / "events.parquet")
        got = events_hopping_window(str(tmp_path)).to_pandas()
        t0_us = t0.value // 1000
        hop_us = 1_800_000_000
        by_win = got.set_index("win_start_us")
        assert int(by_win.loc[t0_us, "n_events"]) == 2
        assert int(by_win.loc[t0_us, "sum_value_centi"]) == 300
        assert int(by_win.loc[t0_us - hop_us, "n_events"]) == 1
        assert int(by_win.loc[t0_us - hop_us, "sum_value_centi"]) == 100
        assert int(by_win.loc[t0_us + hop_us, "n_events"]) == 1
        assert int(by_win.loc[t0_us + hop_us, "sum_value_centi"]) == 200
        assert len(got) == 3


class TestKnnSq8:
    def test_recall_vs_brute(self, ray_session, tmp_path):
        """SQ8 + exact re-rank recovers ≥0.8 of brute-force top-k on
        clustered embeddings (the regime ANN serves); rank columns are
        dense and self-free."""
        rng = np.random.default_rng(17)
        dim, n_clusters, per_cluster = 32, 4, 30
        centers = rng.standard_normal((n_clusters, dim)) * 4
        vecs = []
        for c in range(n_clusters):
            vecs.extend(centers[c] + 0.3 * rng.standard_normal((per_cluster, dim)))
        order = [c * per_cluster for c in range(n_clusters)] + [
            i for i in range(n_clusters * per_cluster) if i % per_cluster != 0
        ]
        vecs = np.stack(vecs)[order]
        pd.DataFrame(
            {"vec_id": np.arange(len(vecs), dtype=np.int64),
             "embedding": list(vecs)}
        ).to_parquet(tmp_path / "embeddings.parquet")

        from entity_extractor_linker_ray.ops.ann import knn_brute, knn_sq8

        brute = knn_brute(str(tmp_path)).to_pandas()
        sq8 = knn_sq8(str(tmp_path)).to_pandas()
        bp = set(zip(brute["query_id"], brute["neighbor_id"]))
        sp = set(zip(sq8["query_id"], sq8["neighbor_id"]))
        assert bp
        assert len(sp & bp) / len(bp) >= 0.8
        for _, group in sq8.groupby("query_id"):
            assert list(group.sort_values("rank")["rank"]) == list(
                range(1, len(group) + 1)
            )
        assert (sq8["query_id"] != sq8["neighbor_id"]).all()
