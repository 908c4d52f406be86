"""Flat config dict with the reference's key names.

Mirrors the semantics of the reference's config surface
(``/root/reference/entityextractor/config/settings.py:12-122``): a flat
dict of ~55 keys merged over defaults; every pipeline stage toggles on
config flags. We keep the reference's key names so a user of the
reference can bring their config dict unchanged, and add a small set of
Ray-specific execution keys (``RAY_*``) controlling actor-pool sizing.
"""

from __future__ import annotations

DEFAULT_CONFIG: dict = {
    # === LLM PROVIDER ===
    # In this engine the LLM is a pluggable client (see state/llm.py);
    # these keys select/parametrize it. "stub" = deterministic rule-based
    # client used for tests/benchmarks (no network in this environment).
    "LLM_BASE_URL": None,
    "MODEL": "stub",
    "OPENAI_API_KEY": None,
    "MAX_TOKENS": 16000,
    "TEMPERATURE": 0.2,

    # === LANGUAGE ===
    "LANGUAGE": "en",  # de or en (settings.py:21)

    # === TEXT PROCESSING ===
    "TEXT_CHUNKING": False,     # settings.py:24
    "TEXT_CHUNK_SIZE": 1000,
    "TEXT_CHUNK_OVERLAP": 50,

    # === ENTITY EXTRACTION ===
    "MODE": "extract",              # extract | generate (settings.py:29)
    "MAX_ENTITIES": 15,
    "ALLOWED_ENTITY_TYPES": "auto",
    "ENABLE_ENTITY_INFERENCE": False,

    # === RELATIONSHIP EXTRACTION / INFERENCE ===
    "RELATION_EXTRACTION": True,    # settings.py:35
    "ENABLE_RELATIONS_INFERENCE": False,
    "MAX_RELATIONS": 15,

    # === DATA SOURCES (KB linking) ===
    "USE_WIKIPEDIA": True,          # settings.py:40
    "USE_WIKIDATA": False,
    "USE_DBPEDIA": False,
    "DBPEDIA_USE_DE": False,
    "ADDITIONAL_DETAILS": False,

    # === COMPENDIUM ===
    "ENABLE_COMPENDIUM": False,
    "COMPENDIUM_LENGTH": 8000,
    # appends the educational structuring clause to four prompt
    # families (functions/prompts.educational_block) like the
    # reference's openai_service/generator/entity_inference/compendium
    "COMPENDIUM_EDUCATIONAL_MODE": False,

    # === GRAPH ===
    "ENABLE_GRAPH_VISUALIZATION": False,
    "ENABLE_KGC": False,            # settings.py:62
    "KGC_ROUNDS": 3,

    # === TRAINING DATA ===
    "COLLECT_TRAINING_DATA": False,
    "OPENAI_TRAINING_DATA_PATH": "entity_extractor_training_openai.jsonl",
    "OPENAI_RELATIONSHIP_TRAINING_DATA_PATH": "entity_relationship_training_openai.jsonl",

    # === RATE LIMITS (per linker actor; global budget = pool x per-actor) ===
    "TIMEOUT_THIRD_PARTY": 15,      # settings.py:83
    "RATE_LIMIT_MAX_CALLS": 0,      # 0 = unlimited (snapshot KB needs no limit)
    "RATE_LIMIT_PERIOD": 1,
    "RATE_LIMIT_BACKOFF_BASE": 1,
    "RATE_LIMIT_BACKOFF_MAX": 60,

    # === CACHING (per-actor in-memory LRU instead of JSON files) ===
    "CACHE_ENABLED": True,
    "CACHE_MAX_ENTRIES": 100_000,

    # === LOGGING ===
    "SHOW_STATUS": False,

    # === RAY EXECUTION (new; no analogue in the reference) ===
    "RAY_KG_CONCURRENCY": 8,        # actor-pool size of the per-document KG stage
    "RAY_KG_BATCH_SIZE": 64,        # conversations per batch handed to a KG actor
    "RAY_NUM_CPUS_PER_ACTOR": 1,
    "RAY_NUM_BUCKETS": 32,          # hash(conv_id) % N output partitioning / checkpoints
    "RAY_DOC_BLOCKS": None,         # repartition documents into N blocks pre-actor (None = keep)
    # build_kg_datasets(materialize=None) pins the record stream only
    # when the estimated input is at most this many bytes; larger (or
    # when explicitly routed) inputs take the resumable checkpoint path.
    "MATERIALIZE_MAX_INPUT_BYTES": 2 << 30,
    "KG_CHECKPOINT_DIR": None,      # spill dir for the auto checkpoint path
}

# Reference config keys that are INTENTIONALLY absent here, with the
# reason / replacement. All are HTTP-stack, JSON-file-cache, or visual
# layout knobs that have no meaning under this engine's design (KB
# lookups hit an immutable broadcast snapshot — there is no HTTP client,
# no on-disk response cache, and graph HTML carries its own physics
# defaults). Reference: ``config/settings.py:12-101``.
#
#   key                         → why absent / what replaces it
#   CACHE_DIR                   → per-actor in-memory LRU (CACHE_MAX_ENTRIES)
#   CACHE_WIKIPEDIA_ENABLED     → snapshot KB; nothing to cache
#   CACHE_WIKIDATA_ENABLED      → snapshot KB
#   CACHE_DBPEDIA_ENABLED       → snapshot KB
#   DBPEDIA_LOOKUP_API          → snapshot resolution chain (state/kb.py)
#   DBPEDIA_SKIP_SPARQL         → no SPARQL endpoint in this engine
#   DBPEDIA_LOOKUP_MAX_HITS     → snapshot chain returns one record
#   DBPEDIA_LOOKUP_CLASS        → same
#   DBPEDIA_LOOKUP_FORMAT       → same
#   USER_AGENT                  → no HTTP client
#   WIKIPEDIA_MAXLAG            → no HTTP client
#   SUPPRESS_TLS_WARNINGS       → no TLS stack
#   COLLECT_API_DATA            → raw KB payloads live in the snapshot itself
#   GRAPH_LAYOUT_METHOD         → HTML sink embeds force layout (stages/artifacts.py)
#   GRAPH_LAYOUT_K              → same
#   GRAPH_LAYOUT_ITERATIONS     → same
#   GRAPH_PHYSICS_PREVENT_OVERLAP          → same
#   GRAPH_PHYSICS_PREVENT_OVERLAP_DISTANCE → same
#   GRAPH_PHYSICS_PREVENT_OVERLAP_ITERATIONS → same
#   GRAPH_HTML_BASE_SIZE        → same
_ABSENT_REFERENCE_KEYS = {
    "CACHE_DIR",
    "CACHE_WIKIPEDIA_ENABLED",
    "CACHE_WIKIDATA_ENABLED",
    "CACHE_DBPEDIA_ENABLED",
    "DBPEDIA_LOOKUP_API",
    "DBPEDIA_SKIP_SPARQL",
    "DBPEDIA_LOOKUP_MAX_HITS",
    "DBPEDIA_LOOKUP_CLASS",
    "DBPEDIA_LOOKUP_FORMAT",
    "USER_AGENT",
    "WIKIPEDIA_MAXLAG",
    "SUPPRESS_TLS_WARNINGS",
    "COLLECT_API_DATA",
    "GRAPH_LAYOUT_METHOD",
    "GRAPH_LAYOUT_K",
    "GRAPH_LAYOUT_ITERATIONS",
    "GRAPH_PHYSICS_PREVENT_OVERLAP",
    "GRAPH_PHYSICS_PREVENT_OVERLAP_DISTANCE",
    "GRAPH_PHYSICS_PREVENT_OVERLAP_ITERATIONS",
    "GRAPH_HTML_BASE_SIZE",
}

_warned_keys: set = set()


def get_config(user_config: dict | None = None) -> dict:
    """Merge ``user_config`` over :data:`DEFAULT_CONFIG`.

    Same contract as the reference's ``get_config``
    (``config/settings.py:103-122``) minus the environment API-key
    lookup (no network LLM in this engine's test environment).

    Keys a reference user might carry over that are intentionally
    absent here (HTTP/cache/layout knobs — see
    :data:`_ABSENT_REFERENCE_KEYS` for the key→replacement table) are
    accepted but warned about ONCE per process, so a migrated config
    dict neither errors nor silently drops behavior the user expected.
    """
    config = dict(DEFAULT_CONFIG)
    if user_config:
        unknown = (
            set(user_config) & _ABSENT_REFERENCE_KEYS
        ) - _warned_keys
        if unknown:
            import warnings

            _warned_keys.update(unknown)
            warnings.warn(
                "config keys ignored by this engine (HTTP/cache/layout "
                "knobs replaced by the snapshot-KB design — see the "
                f"table in config.py): {sorted(unknown)}",
                stacklevel=2,
            )
        config.update(user_config)
    return config
