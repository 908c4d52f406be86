"""Transcript x KG cross operators: which conversation role utters each
rule-based mention (offset -> word index -> 12-word turn -> role cycle),
and where in the conversation mentions land. DuckDB value parity at
sf0.001 plus a planted corpus whose turn/role assignments are
hand-computed."""

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


class TestMentionRoleProfile:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines import simple_kg

        got = _canon(simple_kg.kg_mention_role_profile(SF).to_pandas())
        exp = _canon(
            _oracle({"documents": f"{SF}/documents.parquet"},
                    simple_kg.oracle_sql()["kg_mention_role_profile"])
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)
        # every role the cycle can produce appears on a 500-doc corpus
        assert set(got["role"]) == {"user", "assistant", "tool"}

    def test_planted_roles(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.simple_kg import (
            kg_mention_role_profile,
        )

        # one 30-word doc: 3 turns (words 0-11 user, 12-23 assistant,
        # 24-29 tool). Mentions planted at word 0 (spark -> user),
        # word 13 (window -> assistant), word 25 (table -> tool).
        words = ["pad"] * 30
        words[0] = "spark"
        words[13] = "window"
        words[25] = "table"
        pd.DataFrame({"doc_id": [7], "text": [" ".join(words)]}).to_parquet(
            tmp_path / "documents.parquet"
        )
        got = (
            kg_mention_role_profile(str(tmp_path))
            .to_pandas()
            .sort_values("role")
            .reset_index(drop=True)
        )
        by_role = dict(zip(got["role"], got["type"]))
        assert by_role == {
            "user": "Organization",       # Spark
            "assistant": "Method",        # Window
            "tool": "Resource",           # Table
        }
        assert (got["n_mentions"] == 1).all()
        assert (got["n_entities"] == 1).all()
        assert (got["n_docs"] == 1).all()


class TestMentionTurnHistogram:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines import simple_kg

        got = _canon(simple_kg.kg_mention_turn_histogram(SF).to_pandas())
        exp = _canon(
            _oracle({"documents": f"{SF}/documents.parquet"},
                    simple_kg.oracle_sql()["kg_mention_turn_histogram"])
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_cap_buckets_tail(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.simple_kg import (
            kg_mention_turn_histogram,
        )

        # mention at word 12*25 = turn 25 -> capped into bucket 19
        words = ["pad"] * (12 * 26)
        words[12 * 25] = "spark"
        words[0] = "merge"  # turn 0
        pd.DataFrame({"doc_id": [1], "text": [" ".join(words)]}).to_parquet(
            tmp_path / "documents.parquet"
        )
        got = (
            kg_mention_turn_histogram(str(tmp_path))
            .to_pandas()
            .sort_values("turn_bucket")
            .reset_index(drop=True)
        )
        assert list(got["turn_bucket"]) == [0, 19]
        assert list(got["n_mentions"]) == [1, 1]


class TestEdgeTimespan:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines import simple_kg

        got = _canon(simple_kg.kg_edge_timespan(SF).to_pandas())
        exp = _canon(
            _oracle({"documents": f"{SF}/documents.parquet"},
                    simple_kg.oracle_sql()["kg_edge_timespan"])
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_window(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.simple_kg import kg_edge_timespan
        from entity_extractor_linker_ray.synthetic import EPOCH_US

        # same spark->window edge asserted in docs 2 and 5; subject
        # mention at word 0 (turn 0) in doc 2, word 13 (turn 1) in doc 5
        w2 = ["pad"] * 24
        w2[0], w2[3] = "spark", "window"
        w5 = ["pad"] * 30
        w5[13], w5[20] = "spark", "window"
        pd.DataFrame(
            {"doc_id": [2, 5], "text": [" ".join(w2), " ".join(w5)]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = kg_edge_timespan(str(tmp_path)).to_pandas()
        row = got[(got.subject == "Spark") & (got.object == "Window")]
        assert len(row) == 1
        assert int(row.n_docs.iloc[0]) == 2
        assert int(row.n_assertions.iloc[0]) == 2
        assert int(row.first_seen_ts.iloc[0]) == EPOCH_US + 2 * 3_600_000_000
        assert (
            int(row.last_seen_ts.iloc[0])
            == EPOCH_US + 5 * 3_600_000_000 + 1_000_000
        )

    def test_consistent_with_kg_edges(self, ray_session):
        """Independent path cross-check: the timespan table covers
        exactly the edge set of kg_edges, and n_assertions equals the
        edge weight."""
        from entity_extractor_linker_ray.pipelines import simple_kg

        span = simple_kg.kg_edge_timespan(SF).to_pandas()
        edges = simple_kg.kg_edges(SF).to_pandas()
        key = ["subject", "predicate", "object"]
        merged = span.merge(edges, on=key, how="outer", indicator=True)
        assert (merged["_merge"] == "both").all()
        assert (merged["n_assertions"] == merged["weight"]).all()
        assert (span["first_seen_ts"] <= span["last_seen_ts"]).all()


class TestEdgeDiff:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines import simple_kg

        got = _canon(simple_kg.kg_edge_diff(SF).to_pandas())
        exp = _canon(
            _oracle({"documents": f"{SF}/documents.parquet"},
                    simple_kg.oracle_sql()["kg_edge_diff"])
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_statuses(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.simple_kg import kg_edge_diff

        # doc 2 (base side): spark->window only; doc 3 (new side):
        # table->merge only; docs 4 and 5: hash->batch on both sides
        def doc(*terms):
            words = ["pad"] * 8
            for i, t in enumerate(terms):
                words[i * 3] = t
            return " ".join(words)

        pd.DataFrame(
            {
                "doc_id": [2, 3, 4, 5],
                "text": [doc("spark", "window"), doc("table", "merge"),
                         doc("hash", "batch"), doc("hash", "batch")],
            }
        ).to_parquet(tmp_path / "documents.parquet")
        got = kg_edge_diff(str(tmp_path)).to_pandas()
        by_edge = {
            (r.subject, r.object): (r.status, r.weight_base, r.weight_new)
            for r in got.itertuples()
        }
        assert by_edge[("Spark", "Window")] == ("removed", 1, 0)
        assert by_edge[("Table", "Merge")] == ("added", 0, 1)
        assert by_edge[("Hash", "Batch")] == ("common", 1, 1)


class TestEntityTimespan:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines import simple_kg

        got = _canon(simple_kg.kg_entity_timespan(SF).to_pandas())
        exp = _canon(
            _oracle({"documents": f"{SF}/documents.parquet"},
                    simple_kg.oracle_sql()["kg_entity_timespan"])
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_consistent_with_kg_nodes(self, ray_session):
        from entity_extractor_linker_ray.pipelines import simple_kg

        span = simple_kg.kg_entity_timespan(SF).to_pandas()
        nodes = simple_kg.kg_nodes(SF).to_pandas()
        merged = span.merge(nodes, on=["name", "type"], how="outer", indicator=True)
        assert (merged["_merge"] == "both").all()
        assert (merged["n_docs_x"] == merged["n_docs_y"]).all()
        assert (span["first_seen_ts"] <= span["last_seen_ts"]).all()
        assert (span["n_mentions"] >= span["n_docs"]).all()
