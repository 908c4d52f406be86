"""COMPENDIUM_EDUCATIONAL_MODE wiring.

The reference appends an educational structuring block to four prompt
families when the flag is set (``services/openai_service.py:72-74``,
``core/generator.py:131-133``, ``core/entity_inference.py:76-82``,
``services/compendium_service.py:67``). Round 4's verdict flagged the
engine as accepting the key silently; these tests pin that (a) the four
engine prompt families now consume it, (b) the clause is engine-worded
(not the reference's prose), and (c) under the deterministic stub the
pipeline output is unchanged by the flag — so flag-off goldens stay
valid AND a reference config migrated with the flag on still matches.
"""

from __future__ import annotations

import pandas as pd

from entity_extractor_linker_ray.functions import prompts
from tests import reference_harness as H


def _contents(msgs: list[dict]) -> str:
    return "\n".join(m["content"] for m in msgs)


class TestPromptFamilies:
    def test_flag_appends_block_to_all_four_families(self):
        block = prompts.educational_block("en")
        variants = [
            (prompts.extraction_messages("some text", 15, "en"),
             prompts.extraction_messages("some text", 15, "en", educational=True)),
            (prompts.generation_messages("optics", 10, "en"),
             prompts.generation_messages("optics", 10, "en", educational=True)),
            (prompts.entity_inference_messages("t", [], 5, "en"),
             prompts.entity_inference_messages("t", [], 5, "en", educational=True)),
            (prompts.compendium_messages("optics", ["u1"], 800, "k"),
             prompts.compendium_messages("optics", ["u1"], 800, "k",
                                         educational=True)),
        ]
        for off, on in variants:
            assert block not in _contents(off)
            assert block in _contents(on)
        # default is off
        assert block not in _contents(prompts.extraction_messages("x", 15))

    def test_language_selects_block(self):
        de = prompts.educational_block("de")
        en = prompts.educational_block("en")
        assert de != en
        assert de in _contents(
            prompts.extraction_messages("x", 15, "de", educational=True))
        assert en in _contents(
            prompts.extraction_messages("x", 15, "en", educational=True))

    def test_block_is_engine_worded(self):
        """No-copy rule: the clause must not reproduce the reference's
        sentences (spot-checked against its distinctive openings)."""
        for lang in ("de", "en"):
            block = prompts.educational_block(lang)
            assert "If educational mode is enabled" not in block
            assert "Ergänzen Sie die Entitäten" not in block
            assert "Einführung, Zielsetzung, Grundlegendes" not in block
            assert "Introduction, Objectives, Fundamentals" not in block

    def test_training_examples_stay_unaugmented(self):
        """The reference's training sink saves a FIXED system prompt
        (``openai_service.py:150-157``), never the edu-augmented one —
        the engine's training examples must match."""
        from entity_extractor_linker_ray.core_doc import training_examples

        trace = {"extractions": [{"text": "t", "entities": []}], "relations": []}
        cfg = H.engine_config({"COMPENDIUM_EDUCATIONAL_MODE": True})
        out = training_examples(trace, cfg)
        assert out and prompts.educational_block("en") not in _contents(
            out[0]["messages"])


class TestStubInvariance:
    def test_pipeline_output_unchanged_under_stub(self, ray_session,
                                                  tiny_transcripts):
        """The stub dispatches on substring markers, so the appended
        clause must not change any output — the invariant that keeps
        the flag-off goldens valid for flag-on reference configs."""
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        frames = []
        for flag in (False, True):
            out = build_kg_datasets(
                rd.from_arrow(tiny_transcripts),
                H.engine_config({"COMPENDIUM_EDUCATIONAL_MODE": flag}),
            )
            cols = ["conv_id", "subject", "predicate", "object", "inferred"]
            frames.append(
                out["triples"].to_pandas()[cols]
                .sort_values(cols, kind="stable").reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(frames[0], frames[1])

    def test_reference_parity_with_flag_on(self, ray_session, tiny_transcripts):
        """Engine flag-on triples == reference flag-on triples under the
        shared stub (the same parity gate the goldens use, with the
        educational overrides active on BOTH sides)."""
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

        overrides = {"COMPENDIUM_EDUCATIONAL_MODE": True}
        out = build_kg_datasets(
            rd.from_arrow(tiny_transcripts), H.engine_config(overrides)
        )
        mine = out["triples"].to_pandas()
        golden = H.run_reference(tiny_transcripts, overrides)
        for conv_id, res in golden.items():
            gold = H.triple_set(res["relationships"])
            pred = H.triple_set(
                mine[mine["conv_id"] == conv_id].to_dict("records"))
            assert pred == gold, conv_id
