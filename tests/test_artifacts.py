"""Compendium (A14), training-data sinks (S4/S5), graph viz (S7/S8),
and the generate/chunked pipeline variants."""

from __future__ import annotations

import json

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tiny_docs(ray_session, tiny_transcripts):
    import ray.data as rd

    from entity_extractor_linker_ray.stages.assemble import assemble_documents

    return assemble_documents(rd.from_arrow(tiny_transcripts), 4).materialize()


class TestCompendium:
    def test_records_shape_and_determinism(self, tiny_docs):
        from entity_extractor_linker_ray.stages.artifacts import compendium_records

        cfg = {"RAY_KG_CONCURRENCY": 2}
        a = compendium_records(tiny_docs, cfg).to_pandas().sort_values("conv_id")
        b = compendium_records(tiny_docs, cfg).to_pandas().sort_values("conv_id")
        assert list(a.columns) == ["conv_id", "compendium", "references", "n_references"]
        assert len(a) == tiny_docs.count()
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))

    def test_references_are_ordered_distinct_urls(self, tiny_docs):
        from entity_extractor_linker_ray.stages.artifacts import compendium_records

        df = compendium_records(tiny_docs, {"RAY_KG_CONCURRENCY": 2}).to_pandas()
        with_ents = df[df["n_references"] > 0]
        assert len(with_ents) > 0
        for refs in with_ents["references"]:
            refs = list(refs)
            assert len(refs) == len(set(refs))  # distinct
            assert all(r.startswith("http") for r in refs)

    def test_core_reference_order(self, stub_llm, kb):
        from entity_extractor_linker_ray.core_doc import collect_references

        ents = [
            {"wikipedia_url": "https://en.wikipedia.org/wiki/A",
             "wikidata_url": "https://www.wikidata.org/wiki/Q1"},
            {"wikipedia_url": "https://en.wikipedia.org/wiki/B",
             "dbpedia_info": {"resource_uri": "http://dbpedia.org/resource/B"}},
            {"wikipedia_url": "https://en.wikipedia.org/wiki/A"},  # dup dropped
        ]
        # ENTITY-major (compendium_service.py:46-63): per entity
        # wp → wd → db, first occurrence wins
        assert collect_references(ents) == [
            "https://en.wikipedia.org/wiki/A",
            "https://www.wikidata.org/wiki/Q1",
            "https://en.wikipedia.org/wiki/B",
            "http://dbpedia.org/resource/B",
        ]


class TestTrainingData:
    def test_examples_parse_and_kinds(self, tiny_docs):
        from entity_extractor_linker_ray.stages.artifacts import training_records

        cfg = {"RAY_KG_CONCURRENCY": 2, "RELATION_EXTRACTION": True}
        df = training_records(tiny_docs, cfg).to_pandas()
        assert set(df["kind"]) <= {"entity_extraction", "relationship_extraction"}
        assert (df["kind"] == "entity_extraction").sum() == tiny_docs.count()
        for payload in df["messages_json"]:
            obj = json.loads(payload)
            roles = [m["role"] for m in obj["messages"]]
            assert roles == ["system", "user", "assistant"]

    def test_jsonl_sink(self, tiny_docs, tmp_path):
        from entity_extractor_linker_ray.stages.artifacts import (
            training_records,
            write_training_jsonl,
        )

        ds = training_records(tiny_docs, {"RAY_KG_CONCURRENCY": 2})
        out = tmp_path / "train"
        write_training_jsonl(ds, str(out))
        lines = [
            json.loads(line)
            for f in sorted(out.glob("*.json"))
            for line in f.read_text().splitlines()
            if line.strip()
        ]
        assert len(lines) == ds.count()


class TestGraphViz:
    @pytest.fixture(scope="class")
    def graph_frames(self):
        nodes = pd.DataFrame(
            [
                {"canonical_id": "u/A", "label": "A", "type": "T", "n_mentions": 3,
                 "n_convs": 2},
                {"canonical_id": "u/B", "label": 'B "q"', "type": "T", "n_mentions": 1,
                 "n_convs": 1},
            ]
        )
        edges = pd.DataFrame(
            [
                {"subject_id": "u/A", "predicate": "uses", "object_id": "u/B",
                 "inferred": "explicit", "weight": 2},
                {"subject_id": "u/B", "predicate": "part of", "object_id": "u/A",
                 "inferred": "implicit", "weight": 1},
            ]
        )
        return nodes, edges

    def test_dot(self, graph_frames):
        from entity_extractor_linker_ray.stages.artifacts import render_graph_dot

        dot = render_graph_dot(*graph_frames)
        assert dot.startswith("digraph")
        assert '"u/A" -> "u/B" [label="uses" style=solid' in dot
        assert "style=dashed" in dot
        assert r"\"q\"" in dot  # quote escaping

    def test_html_embeds_graph_json(self, graph_frames):
        from entity_extractor_linker_ray.stages.artifacts import render_graph_html

        html = render_graph_html(*graph_frames)
        start = html.index(">", html.index("graph-data")) + 1
        payload = json.loads(html[start : html.index("</script>")])
        assert {n["id"] for n in payload["nodes"]} == {"u/A", "u/B"}
        assert payload["edges"][1]["dashes"] is True

    def test_png_renders_real_raster(self, graph_frames, tmp_path):
        """Without matplotlib the sink produces a REAL baseline RGB
        PNG via the stdlib encoder: valid signature, chunk CRCs,
        declared dimensions, and actually-drawn content (node discs +
        edge lines darken the white canvas)."""
        from entity_extractor_linker_ray.functions.imaging import decode_png
        from entity_extractor_linker_ray.stages.artifacts import render_graph_png

        path = tmp_path / "graph.png"
        render_graph_png(*graph_frames, path=str(path), width=320, height=240)
        data = path.read_bytes()
        w, h, pixels = decode_png(data)  # verifies signature + CRCs
        assert (w, h) == (320, 240)
        # the canvas is white; nodes/edges must have painted non-white
        assert (pixels != 255).any()
        # both palette node discs present (blue + orange)
        flat = set(map(tuple, pixels.reshape(-1, 3).tolist()))
        assert (31, 119, 180) in flat and (255, 127, 14) in flat


class TestPipelineVariants:
    def _triples(self, transcripts, extra):
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        cfg = {"RAY_KG_CONCURRENCY": 2, "RAY_DOC_BLOCKS": 4,
               "RELATION_EXTRACTION": True, **extra}
        return build_kg_datasets(rd.from_arrow(transcripts), cfg)["triples"].to_pandas()

    def test_generate_mode_marks_implicit(self, ray_session, tiny_transcripts):
        df = self._triples(tiny_transcripts, {"MODE": "generate"})
        assert len(df) > 0
        assert set(df["inferred"]) == {"implicit"}

    def test_chunked_mode_produces_triples(self, ray_session, tiny_transcripts):
        df = self._triples(
            tiny_transcripts,
            {"TEXT_CHUNKING": True, "TEXT_CHUNK_SIZE": 120, "TEXT_CHUNK_OVERLAP": 30},
        )
        assert len(df) > 0
        assert set(df["inferred"]) <= {"explicit", "implicit"}


class TestSinglePassArtifacts:
    def test_artifacts_from_single_pass(self, ray_session, tiny_transcripts):
        """ENABLE_COMPENDIUM / COLLECT_TRAINING_DATA on build_kg_datasets
        emit artifact rows from the SAME actor pass as entities/triples
        (no per-artifact re-extraction)."""
        import json

        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        out = build_kg_datasets(
            rd.from_arrow(tiny_transcripts),
            {"RAY_KG_CONCURRENCY": 2, "RELATION_EXTRACTION": True,
             "ENABLE_COMPENDIUM": True, "COLLECT_TRAINING_DATA": True},
        )
        n_docs = out["documents"].count()
        comp = out["compendium"].to_pandas()
        train = out["training"].to_pandas()
        assert len(comp) == n_docs
        assert (comp["n_references"] > 0).any()
        assert (train["kind"] == "entity_extraction").sum() == n_docs
        for payload in train["messages_json"].head(3):
            assert json.loads(payload)["messages"]
        # the unified stream still yields entities and triples
        assert out["entities"].count() > 0
        assert out["triples"].count() > 0
