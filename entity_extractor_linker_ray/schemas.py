"""Explicit Arrow schemas for every logical table.

The reference is schemaless (ad-hoc dicts, SURVEY.md §1); fixed
``pyarrow.Schema`` objects are this engine's core upgrade: every stage
emits blocks with a declared schema so Parquet outputs, shuffles and
the DuckDB oracle all agree on types.
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("doc_text", pa.string()),
        ("n_turns", pa.int32()),
    ]
)

_STR = pa.string()
_LSTR = pa.list_(pa.string())

# Unified per-conversation KG output: entity rows and triple rows share
# one flat nullable schema (record_type discriminates) so the whole
# extract→link→relate stage is ONE streaming pass with no mid-pipeline
# join, and the checkpointed Parquet can be split by a cheap filter.
KG_RECORD_SCHEMA = pa.schema(
    [
        ("record_type", _STR),       # "entity" | "triple"
        ("conv_id", _STR),
        ("ord", pa.int32()),         # stable per-conversation order
        ("inferred", _STR),
        # --- entity columns -------------------------------------------
        ("entity", _STR),
        ("type", _STR),
        ("citation", _STR),
        ("citation_start", pa.int32()),
        ("citation_end", pa.int32()),
        ("wikipedia_label", _STR),
        ("wikipedia_url", _STR),
        ("wikipedia_extract", _STR),
        ("wikipedia_categories", _LSTR),
        ("wikipedia_infobox_json", _STR),  # ADDITIONAL_DETAILS infobox
        ("wikipedia_see_also", _LSTR),
        ("wikipedia_image", _STR),
        ("wikidata_id", _STR),
        ("wikidata_label", _STR),
        ("wikidata_description", _STR),
        ("wikidata_types", _LSTR),
        ("wikidata_part_of", _LSTR),
        ("wikidata_has_parts", _LSTR),
        ("wikidata_url", _STR),
        # ADDITIONAL_DETAILS claim columns (wikidata_service.py:338-676)
        ("wikidata_aliases", _LSTR),
        ("wikidata_instance_of", _LSTR),
        ("wikidata_subclass_of", _LSTR),
        ("wikidata_member_of", _LSTR),
        ("wikidata_citizenships", _LSTR),
        ("wikidata_image_url", _STR),
        ("wikidata_website", _STR),
        ("wikidata_lat", pa.float64()),
        ("wikidata_lon", pa.float64()),
        ("wikidata_foundation_date", _STR),
        ("wikidata_birth_date", _STR),
        ("wikidata_death_date", _STR),
        ("wikidata_birth_place", _STR),
        ("wikidata_death_place", _STR),
        ("wikidata_official_name", _STR),
        ("wikidata_population", _STR),
        ("wikidata_gnd_id", _STR),
        ("wikidata_isni", _STR),
        ("dbpedia_uri", _STR),
        ("dbpedia_label", _STR),
        ("dbpedia_abstract", _STR),
        ("dbpedia_types", _LSTR),
        ("dbpedia_subjects", _LSTR),
        ("dbpedia_language", _STR),
        # DBpedia SPARQL extras (dbpedia_service.py:377-497; packaged
        # per orchestrator.py:398-445 — base relations unconditional,
        # the rest under ADDITIONAL_DETAILS)
        ("dbpedia_part_of", _LSTR),
        ("dbpedia_has_parts", _LSTR),
        ("dbpedia_member_of", _LSTR),
        ("dbpedia_categories", _LSTR),
        ("dbpedia_comment", _STR),
        ("dbpedia_homepage", _STR),
        ("dbpedia_thumbnail", _STR),
        ("dbpedia_depiction", _STR),
        ("dbpedia_birth_date", _STR),
        ("dbpedia_death_date", _STR),
        ("dbpedia_birth_place", _STR),
        ("dbpedia_death_place", _STR),
        ("dbpedia_population", _STR),
        ("dbpedia_area", _STR),
        ("dbpedia_country", _STR),
        ("dbpedia_region", _STR),
        ("dbpedia_founder", _STR),
        ("dbpedia_parent_company", _STR),
        ("dbpedia_current_member", _LSTR),
        ("dbpedia_former_member", _LSTR),
        ("dbpedia_dbp_part_of", _LSTR),
        ("dbpedia_dbp_member_of", _LSTR),
        ("canonical_id", _STR),
        ("link_status", _STR),
        # --- triple columns -------------------------------------------
        ("subject", _STR),
        ("predicate", _STR),
        ("object", _STR),
        ("subject_type", _STR),
        ("object_type", _STR),
        ("subject_inferred", _STR),
        ("object_inferred", _STR),
        ("subject_id", _STR),
        ("object_id", _STR),
        # --- artifact columns (record_type compendium|training) -------
        ("artifact_json", _STR),
    ]
)

TRIPLE_COLUMNS = [
    "conv_id", "ord", "subject", "predicate", "object", "inferred",
    "subject_type", "object_type", "subject_inferred", "object_inferred",
    "subject_id", "object_id",
]

ENTITY_COLUMNS = [
    "conv_id", "ord", "entity", "type", "inferred", "citation",
    "citation_start", "citation_end", "wikipedia_label", "wikipedia_url",
    "wikipedia_extract", "wikipedia_categories",
    "wikipedia_infobox_json", "wikipedia_see_also", "wikipedia_image",
    "wikidata_id",
    "wikidata_label", "wikidata_description", "wikidata_types",
    "wikidata_part_of", "wikidata_has_parts", "wikidata_url",
    "wikidata_aliases", "wikidata_instance_of", "wikidata_subclass_of",
    "wikidata_member_of", "wikidata_citizenships", "wikidata_image_url",
    "wikidata_website", "wikidata_lat", "wikidata_lon",
    "wikidata_foundation_date", "wikidata_birth_date", "wikidata_death_date",
    "wikidata_birth_place", "wikidata_death_place", "wikidata_official_name",
    "wikidata_population", "wikidata_gnd_id", "wikidata_isni",
    "dbpedia_uri", "dbpedia_label", "dbpedia_abstract", "dbpedia_types",
    "dbpedia_subjects", "dbpedia_language",
    "dbpedia_part_of", "dbpedia_has_parts", "dbpedia_member_of",
    "dbpedia_categories", "dbpedia_comment", "dbpedia_homepage",
    "dbpedia_thumbnail", "dbpedia_depiction", "dbpedia_birth_date",
    "dbpedia_death_date", "dbpedia_birth_place", "dbpedia_death_place",
    "dbpedia_population", "dbpedia_area", "dbpedia_country",
    "dbpedia_region", "dbpedia_founder", "dbpedia_parent_company",
    "dbpedia_current_member", "dbpedia_former_member",
    "dbpedia_dbp_part_of", "dbpedia_dbp_member_of",
    "canonical_id", "link_status",
]

NODES_SCHEMA = pa.schema(
    [
        ("canonical_id", _STR),
        ("label", _STR),
        ("type", _STR),
        ("n_mentions", pa.int64()),
        ("n_convs", pa.int64()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("subject_id", _STR),
        ("predicate", _STR),
        ("object_id", _STR),
        ("inferred", _STR),
        ("weight", pa.int64()),
    ]
)


def empty_kg_batch() -> pa.Table:
    return KG_RECORD_SCHEMA.empty_table()
