"""Hot-key skew stress (canonicalization groupby with a dominant
entity) and the sliding-window operator vs its DuckDB oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


class TestHotKeySkew:
    @pytest.fixture(scope="class")
    def hot_corpus(self, ray_session):
        """90% of conversations mention the hot entity ("Spark") — the
        skewed canonicalization regime the north rule calls out."""
        from entity_extractor_linker_ray.synthetic import generate_transcripts

        return generate_transcripts(48, seed=3, hot_fraction=0.90)

    def test_nodes_under_skew_match_per_doc_reference(self, hot_corpus):
        import ray.data as rd

        from entity_extractor_linker_ray.config import get_config
        from entity_extractor_linker_ray.core_doc import process_document
        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets
        from entity_extractor_linker_ray.stages.graph import build_nodes
        from entity_extractor_linker_ray.state.kb import KBSnapshot, build_kb
        from entity_extractor_linker_ray.state.llm import StubLLMClient
        from tests.reference_harness import assemble_docs_python, engine_config

        cfg = engine_config({"RAY_KG_CONCURRENCY": 2, "RAY_DOC_BLOCKS": 4})
        out = build_kg_datasets(rd.from_arrow(hot_corpus), cfg)
        nodes = build_nodes(out["entities"]).to_pandas()

        # independent reference: per-document core over the same docs
        kb = KBSnapshot(build_kb())
        llm = StubLLMClient(kb)
        core_cfg = get_config(cfg)
        expected: dict[str, set] = {}
        for conv, text in assemble_docs_python(hot_corpus).items():
            ents, _ = process_document(text, core_cfg, llm, kb)
            for e in ents:
                expected.setdefault(e["canonical_id"], set()).add(conv)

        got = nodes.set_index("canonical_id")["n_convs"].to_dict()
        assert got == {k: len(v) for k, v in expected.items()}

        # the hot key really is hot (skew exercised, not accidental)
        hot_row = nodes.loc[nodes["label"] == "Spark"]
        assert len(hot_row) == 1
        assert int(hot_row["n_convs"].iloc[0]) >= 0.7 * 48

    def test_edge_weights_under_skew_are_exact(self, hot_corpus):
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets
        from entity_extractor_linker_ray.stages.graph import build_edges
        from tests.reference_harness import engine_config

        cfg = engine_config({"RAY_KG_CONCURRENCY": 2, "RAY_DOC_BLOCKS": 4})
        out = build_kg_datasets(rd.from_arrow(hot_corpus), cfg)
        triples = out["triples"].to_pandas()
        edges = build_edges(out["triples"]).to_pandas()
        expected = (
            triples.groupby(["subject_id", "predicate", "object_id", "inferred"])
            .size()
            .rename("weight")
            .reset_index()
        )
        merged = edges.merge(
            expected,
            on=["subject_id", "predicate", "object_id", "inferred"],
            suffixes=("_ray", "_exp"),
        )
        assert len(merged) == len(edges) == len(expected)
        assert (merged["weight_ray"] == merged["weight_exp"]).all()


class TestSlidingWindow:
    def test_matches_duckdb_range_frame(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_SLIDING_ORACLE,
            events_sliding,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            events_sliding(sf)
            .to_pandas()
            .sort_values(["user_id", "event_id"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
        )
        exp = (
            con.execute(EVENTS_SLIDING_ORACLE)
            .df()
            .sort_values(["user_id", "event_id"])
            .reset_index(drop=True)
        )
        exp["n_in_window"] = exp["n_in_window"].astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestRunningCount:
    def test_matches_duckdb_cumulative_window(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_RUNNING_COUNT_ORACLE,
            events_running_count,
        )

        sf = "/root/testdata/sf0.001"
        got = events_running_count(sf).to_pandas()
        got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        want = con.execute(EVENTS_RUNNING_COUNT_ORACLE).df().astype("int64")
        want = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype("int64"), want)


class TestGlobalSortLimit:
    def test_matches_duckdb_order_by_limit(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.pipelines.relational import (
            FIRST_EVENTS_ORACLE,
            first_events_global,
        )

        sf = "/root/testdata/sf0.001"
        got = first_events_global(sf).to_pandas().astype("int64")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        want = con.execute(FIRST_EVENTS_ORACLE).df().astype("int64")
        pd.testing.assert_frame_equal(
            got.sort_values("rank").reset_index(drop=True),
            want.sort_values("rank").reset_index(drop=True),
        )
