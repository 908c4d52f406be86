"""Pipeline-level tests: parallelism invariance, graph aggregates vs a
single-document reference statistics block, checkpoint/resume."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests import reference_harness as H


def _canon_triples(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["conv_id", "subject", "predicate", "object", "inferred"]
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


class TestParallelismInvariance:
    def test_identical_outputs_across_parallelism(self, ray_session, tiny_transcripts):
        """North rule: canonical (sorted) outputs byte-identical across
        cluster sizes — evidenced as different actor-pool sizes, batch
        sizes and block counts over the same input."""
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        results = []
        for concurrency, batch_size, blocks in [(1, 8, 2), (4, 64, 8)]:
            out = build_kg_datasets(
                rd.from_arrow(tiny_transcripts),
                H.engine_config(
                    {
                        "RAY_KG_CONCURRENCY": concurrency,
                        "RAY_KG_BATCH_SIZE": batch_size,
                        "RAY_DOC_BLOCKS": blocks,
                    }
                ),
            )
            results.append(_canon_triples(out["triples"].to_pandas()))
        pd.testing.assert_frame_equal(results[0], results[1])


class TestGraphAggregates:
    @pytest.fixture(scope="class")
    def single_conv(self, ray_session):
        """One-conversation corpus: corpus-level aggregates must equal
        the reference's per-document statistics block."""
        import pyarrow as pa
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        text = (
            "Spark uses Vector to process the data.\n"
            "The team connected Table with Stream yesterday.\n"
            "Customer reported a problem while scanning Spark.\n"
            "We compared Vector against Table and Query."
        )
        turns = text.split("\n")
        table = pa.table(
            {
                "conv_id": ["c0"] * len(turns),
                "turn_idx": pa.array(range(len(turns)), pa.int32()),
                "role": ["user"] * len(turns),
                "text": turns,
                "tool": [""] * len(turns),
                "ts": pa.array(range(len(turns)), pa.timestamp("us")),
            }
        )
        out = build_kg_datasets(rd.from_arrow(table), H.engine_config())
        golden = H.run_reference(table)["c0"]
        return out, golden["statistics"]

    def test_total_and_types(self, single_conv):
        out, stats = single_conv
        from entity_extractor_linker_ray.stages.graph import linked_counts, type_distribution

        ents = out["entities"]
        linked = linked_counts(ents).iloc[0]
        assert linked["total_entities"] == stats["total_entities"]
        assert linked["wikipedia_count"] == stats["linked"]["wikipedia"]["count"]
        assert linked["wikidata_count"] == stats["linked"]["wikidata"]["count"]
        assert linked["dbpedia_count"] == stats["linked"]["dbpedia"]["count"]
        assert linked["wikipedia_percent"] == pytest.approx(
            stats["linked"]["wikipedia"]["percent"]
        )
        types = type_distribution(ents).to_pandas().set_index("type")["n"].to_dict()
        assert types == stats["types_distribution"]

    def test_top_categories(self, single_conv):
        """The reference's top-10 tie-break is Python dict insertion
        order (stable sort over a dict, orchestrator.py:514) — not
        reproducible distributed; the engine uses a deterministic
        (count desc, name asc) tiebreak instead. Compare modulo tie
        order: the count multiset must match and every uniquely-ranked
        (above-boundary) golden row must appear with the same count."""
        out, stats = single_conv
        from entity_extractor_linker_ray.stages.graph import top_wikipedia_categories

        mine = top_wikipedia_categories(out["entities"]).to_pandas()
        mine_map = dict(zip(mine["category"], mine["n"]))
        gold = {d["category"]: d["count"] for d in stats["top_wikipedia_categories"]}
        assert sorted(mine_map.values()) == sorted(gold.values())
        boundary = min(gold.values())
        for cat, n in gold.items():
            if n > boundary:
                assert mine_map.get(cat) == n

    def test_entity_connections(self, single_conv):
        out, stats = single_conv
        from entity_extractor_linker_ray.stages.graph import entity_connections

        mine = entity_connections(out["triples"]).to_pandas()
        gold = {d["entity"]: d["count"] for d in stats["entity_connections"]}
        assert dict(zip(mine["entity"], mine["n_neighbors"])) == gold

    def test_nodes_and_edges(self, single_conv):
        out, _ = single_conv
        from entity_extractor_linker_ray.stages.graph import build_edges, build_nodes

        nodes = build_nodes(out["entities"]).to_pandas()
        ents = out["entities"].to_pandas()
        assert set(nodes["canonical_id"]) == set(ents["canonical_id"])
        assert (nodes["n_convs"] == 1).all()
        edges = build_edges(out["triples"]).to_pandas()
        tris = out["triples"].to_pandas()
        assert edges["weight"].sum() == len(tris)


class TestCheckpointResume:
    def test_crash_resume_skips_completed_buckets(
        self, ray_session, tiny_transcripts, tmp_path
    ):
        """Partial run (crash emulated via max_passes=1) → resume →
        completed buckets untouched, final output identical to a clean
        run (north rule resumability)."""
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.checkpoint import (
            read_checkpointed,
            run_kg_checkpointed,
        )
        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        cfg = H.engine_config({"RAY_NUM_BUCKETS": 4, "RAY_KG_CONCURRENCY": 2})
        ds = rd.from_arrow(tiny_transcripts)
        out_dir = str(tmp_path / "ckpt")

        partial = run_kg_checkpointed(
            ds, out_dir, cfg, buckets_per_pass=2, max_passes=1
        )
        done_after_crash = {
            b for b, i in partial["buckets"].items() if i["status"] == "done"
        }
        assert len(done_after_crash) == 2  # job "died" with half the work done
        first_times = {
            b: partial["buckets"][b]["completed_at"] for b in done_after_crash
        }

        resumed = run_kg_checkpointed(ds, out_dir, cfg)
        assert len(resumed["buckets"]) == 4
        for b, stamp in first_times.items():
            assert resumed["buckets"][b]["completed_at"] == stamp  # not reprocessed

        clean = build_kg_datasets(ds, cfg)
        pd.testing.assert_frame_equal(
            _canon_triples(read_checkpointed(out_dir, "triple").to_pandas()),
            _canon_triples(clean["triples"].to_pandas()),
        )

        # idempotent third invocation: nothing to do, manifest stable
        again = run_kg_checkpointed(ds, out_dir, cfg)
        assert {
            b: i["completed_at"] for b, i in again["buckets"].items()
        } == {b: i["completed_at"] for b, i in resumed["buckets"].items()}


class TestDirectWrite:
    def test_direct_write_matches_records(self, ray_session, tiny_transcripts, tmp_path):
        """The actor-side direct-write path produces byte-identical
        records (canonically sorted) to the records Dataset + external
        write, plus a consistent manifest."""
        import ray
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets
        from entity_extractor_linker_ray.stages.assemble import assemble_documents
        from entity_extractor_linker_ray.stages.kg_stage import kg_records_direct_write
        from entity_extractor_linker_ray.state.kb import build_kb
        from tests.reference_harness import engine_config

        import pyarrow.parquet as pq

        key = ["record_type", "conv_id", "ord"]
        cfg = engine_config({"RAY_KG_CONCURRENCY": 2})
        out = build_kg_datasets(rd.from_arrow(tiny_transcripts), cfg)
        expected = out["records"].select_columns(key).to_pandas()

        docs = assemble_documents(rd.from_arrow(tiny_transcripts), 4)
        manifest = kg_records_direct_write(
            docs, str(tmp_path / "recs"), cfg, ray.put(build_kb())
        ).to_pandas()
        got_table = pq.read_table(str(tmp_path / "recs"))
        got = got_table.select(key).to_pandas()

        from entity_extractor_linker_ray.schemas import KG_RECORD_SCHEMA

        assert got_table.schema.names == KG_RECORD_SCHEMA.names
        expected = expected.sort_values(key).reset_index(drop=True)
        got = got.sort_values(key).reset_index(drop=True)
        assert got.equals(expected)
        assert int(manifest["n_rows"].sum()) == len(expected)
        assert int(manifest["n_triples"].sum()) == int(
            (expected["record_type"] == "triple").sum()
        )


class TestAutoMaterializeGate:
    def test_large_input_takes_checkpoint_path(
        self, ray_session, tiny_transcripts, tmp_path
    ):
        """materialize=None + input above MATERIALIZE_MAX_INPUT_BYTES
        → the resumable checkpoint path (records read back from
        partitioned Parquet, manifest present, triples identical to the
        pinned path)."""
        import os

        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        ds = rd.from_arrow(tiny_transcripts)
        cfg = H.engine_config(
            {"RAY_NUM_BUCKETS": 4, "MATERIALIZE_MAX_INPUT_BYTES": 1}
        )
        out = build_kg_datasets(
            ds, cfg, checkpoint_dir=str(tmp_path / "auto-ckpt")
        )
        assert out["checkpoint_dir"] == str(tmp_path / "auto-ckpt")
        assert os.path.exists(os.path.join(out["checkpoint_dir"], "manifest.json"))
        done = [
            b
            for b, i in out["manifest"]["buckets"].items()
            if i["status"] == "done"
        ]
        assert len(done) == 4

        pinned = build_kg_datasets(ds, H.engine_config(), materialize=True)
        pd.testing.assert_frame_equal(
            _canon_triples(out["triples"].to_pandas()),
            _canon_triples(pinned["triples"].to_pandas()),
        )

    def test_small_input_pins(self, ray_session, tiny_transcripts):
        """materialize=None + small input → the pinned (materialized)
        path: no checkpoint keys in the output dict."""
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        out = build_kg_datasets(rd.from_arrow(tiny_transcripts), H.engine_config())
        assert "checkpoint_dir" not in out
        assert out["triples"].count() > 0


class TestConfigMigrationWarnings:
    def test_absent_reference_keys_warn_once(self):
        import warnings

        from entity_extractor_linker_ray import config as config_mod

        config_mod._warned_keys.clear()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            cfg = config_mod.get_config(
                {"CACHE_DIR": "/tmp/x", "USER_AGENT": "ua", "MODE": "extract"}
            )
        assert cfg["MODE"] == "extract"
        msgs = [str(w.message) for w in caught if "config keys ignored" in str(w.message)]
        assert len(msgs) == 1
        assert "CACHE_DIR" in msgs[0] and "USER_AGENT" in msgs[0]

        with warnings.catch_warnings(record=True) as caught2:
            warnings.simplefilter("always")
            config_mod.get_config({"CACHE_DIR": "/tmp/x"})
        assert not [
            w for w in caught2 if "config keys ignored" in str(w.message)
        ]  # warned once per process only
