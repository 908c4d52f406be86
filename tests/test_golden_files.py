"""Golden-parquet pin tests.

The driver oracles for the stub-LLM flagship pipeline read committed
parquet under ``golden/`` (produced by running the REFERENCE code — see
``tools/make_golden.py``). These tests keep that pin honest:

1. re-derive the sf0.001 goldens from the reference on every run and
   assert value-equality with the committed files (the pinned parquet
   cannot silently drift from the reference), and
2. assert the ENGINE's outputs equal the committed goldens exactly —
   full-table equality, strictly stronger than the P/R >= 0.95 bar.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests import reference_harness as H

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden", "sf0.001")
SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def regenerated():
    """Fresh reference-derived goldens for sf0.001 (flagship + variants)."""
    from tools.make_golden import VARIANTS, convert, reference_results

    out = {}
    flagship = reference_results(SF, VARIANTS["kg_pipeline"])
    tri, ent = convert(flagship)
    out["kg_pipeline_triples"] = tri
    out["kg_pipeline_entity_links"] = ent
    from tools.make_golden import convert_entities_full

    out["kg_pipeline_entities_full"] = convert_entities_full(flagship)
    for variant in ("kg_generate", "kg_chunked"):
        vtri, _ = convert(reference_results(SF, VARIANTS[variant]))
        out[f"{variant}_triples"] = vtri
    from tools.make_golden import reference_artifacts

    comp, refs, labs = reference_artifacts(SF)
    out["kg_compendium_flat"] = comp
    out["kg_compendium_refs"] = refs
    out["kg_training_labels"] = labs
    return out


class TestCommittedGoldensMatchReference:
    @pytest.mark.parametrize(
        "name",
        [
            "kg_pipeline_triples",
            "kg_pipeline_entity_links",
            "kg_pipeline_entities_full",
            "kg_generate_triples",
            "kg_chunked_triples",
            "kg_compendium_flat",
            "kg_compendium_refs",
            "kg_training_labels",
        ],
    )
    def test_pinned_file_equals_fresh_reference_run(self, regenerated, name):
        pinned = pq.read_table(os.path.join(GOLDEN, f"{name}.parquet")).to_pandas()
        fresh = regenerated[name]
        assert len(pinned) > 0
        pd.testing.assert_frame_equal(_canon(pinned), _canon(fresh))


class TestEngineMatchesGoldens:
    @pytest.fixture(scope="class")
    def engine_queries(self, ray_session):
        import __ray_entry__ as entrymod

        return entrymod.queries()

    @pytest.mark.parametrize(
        "name",
        [
            "kg_pipeline_triples",
            "kg_pipeline_entity_links",
            "kg_pipeline_entities_full",
            "kg_generate_triples",
            "kg_chunked_triples",
            "kg_compendium_flat",
            "kg_compendium_refs",
            "kg_training_labels",
        ],
    )
    def test_engine_equals_golden(self, engine_queries, name):
        """Full-table equality of the Ray pipeline vs the
        reference-produced golden — entity order (ord), canonical ids,
        flags, citations, everything."""
        pinned = pq.read_table(os.path.join(GOLDEN, f"{name}.parquet")).to_pandas()
        got = engine_queries[name](SF).to_pandas()
        assert len(got) == len(pinned) > 0
        pd.testing.assert_frame_equal(_canon(got), _canon(pinned))
