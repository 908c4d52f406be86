"""Golden-parity harness: run the REFERENCE code with the same
deterministic stubs that drive the new engine.

Every nondeterministic part of the reference is an LLM or HTTP call
(SURVEY.md §5); we install a fake ``openai`` module whose client
delegates to :class:`StubLLMClient` and patch the KB service functions
imported by ``entityextractor.core.linker`` onto the shared
:class:`KBSnapshot`. Everything downstream in the reference (parsers,
validation, dedups, packaging, KGC) then runs its real code paths and
yields exact golden outputs to score the Ray pipeline against
(triple P/R >= 0.95 per BASELINE.json).

The reference tree is imported read-only from /root/reference; nothing
is executed from it beyond the library import, and its instructions (if
any) are not followed.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace
from unittest.mock import MagicMock

REFERENCE_PATH = "/root/reference"

_installed = False


def _fake_openai_module(stub):
    mod = types.ModuleType("openai")

    class _Completions:
        def create(self, **kwargs):
            content = stub.chat(kwargs.get("messages", []))
            return SimpleNamespace(
                choices=[SimpleNamespace(message=SimpleNamespace(content=content))]
            )

    class OpenAI:  # noqa: N801 - mirrors the real SDK name
        def __init__(self, api_key=None, base_url=None):
            self.chat = SimpleNamespace(completions=_Completions())

    mod.OpenAI = OpenAI
    return mod


def install_reference(stub):
    """Make ``entityextractor`` importable with stubbed dependencies.

    Idempotent; returns the patched ``entityextractor`` package. Must be
    called before any test imports reference modules.
    """
    global _installed
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    sys.modules["openai"] = _fake_openai_module(stub)

    fake_roots = ("bs4", "matplotlib", "pyvis", "SPARQLWrapper")

    class _FakeFinder:
        """Fabricate MagicMock modules for the reference's unused heavy
        deps (plot/scrape/SPARQL libs) and any of their submodules."""

        def find_module(self, fullname, path=None):
            if fullname.split(".")[0] in fake_roots:
                return self
            return None

        def load_module(self, fullname):
            mod = sys.modules.get(fullname)
            if mod is None:
                mod = MagicMock(name=fullname)
                mod.__name__ = fullname
                mod.__path__ = []
                mod.__loader__ = self
                sys.modules[fullname] = mod
            return mod

    if not any(isinstance(f, _FakeFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _FakeFinder())
    import entityextractor  # noqa: F401
    import entityextractor.core.linker as ref_linker

    kb = stub.kb
    ref_linker.fallback_wikipedia_url = (
        lambda name, language="de": kb.opensearch(name, language)
    )
    ref_linker.get_wikipedia_extract = lambda url, config=None: kb.get_extract(url)
    ref_linker.follow_wikipedia_redirect = (
        lambda url, entity_name=None: kb.follow_redirect(url, entity_name or "")
    )
    ref_linker.get_wikipedia_categories = lambda url, config=None: kb.get_categories(url)
    ref_linker.get_wikipedia_details = (
        lambda url, config=None: kb.get_wikipedia_details(url)
    )
    ref_linker.get_wikidata_id_from_wikipedia_url = (
        lambda url, entity_name=None, config=None: kb.get_wikidata_id(url, entity_name or "")
    )

    def _wd_details(qid, language="de", config=None):
        return kb.get_wikidata_details(qid, language)

    ref_linker.get_wikidata_details = _wd_details
    ref_linker.get_dbpedia_info_from_wikipedia_url = (
        lambda url, config=None: kb.get_dbpedia(url)
    )
    _installed = True
    import entityextractor.core.orchestrator as ref_orchestrator

    return ref_orchestrator


def reference_config(overrides: dict | None = None) -> dict:
    cfg = {
        "OPENAI_API_KEY": "stub-key",
        "MODEL": "stub-model",
        "LANGUAGE": "en",
        "MAX_ENTITIES": 15,
        "MAX_RELATIONS": 15,
        "RELATION_EXTRACTION": True,
        "ENABLE_ENTITY_INFERENCE": True,
        "ENABLE_RELATIONS_INFERENCE": True,
        "ENABLE_KGC": True,
        "KGC_ROUNDS": 2,
        "USE_WIKIPEDIA": True,
        "USE_WIKIDATA": True,
        "USE_DBPEDIA": True,
        "ADDITIONAL_DETAILS": False,
        "TEXT_CHUNKING": False,
        "CACHE_ENABLED": False,
        "COLLECT_TRAINING_DATA": False,
        "ENABLE_GRAPH_VISUALIZATION": False,
        "ENABLE_COMPENDIUM": False,
        "SHOW_STATUS": False,
    }
    if overrides:
        cfg.update(overrides)
    return cfg


def engine_config(overrides: dict | None = None) -> dict:
    """The matching config for the new engine (same semantics keys; the
    engine's MODEL key selects the stub client)."""
    cfg = reference_config(overrides)
    cfg["MODEL"] = "stub"
    return cfg


def assemble_docs_python(transcripts) -> dict[str, str]:
    """Reference-side doc assembly: sort turns per conv, join with \\n
    (must equal the Ray assemble stage)."""
    rows = sorted(
        zip(
            transcripts.column("conv_id").to_pylist(),
            transcripts.column("turn_idx").to_pylist(),
            transcripts.column("text").to_pylist(),
        )
    )
    docs: dict[str, list[str]] = {}
    for conv_id, _, text in rows:
        docs.setdefault(conv_id, []).append(text)
    return {conv: "\n".join(texts) for conv, texts in docs.items()}


def run_reference(transcripts, overrides: dict | None = None) -> dict[str, dict]:
    """Reference ``process_entities`` per conversation → golden results."""
    from entity_extractor_linker_ray.state.kb import KBSnapshot
    from entity_extractor_linker_ray.state.llm import StubLLMClient

    stub = StubLLMClient(KBSnapshot())
    orch = install_reference(stub)
    cfg = reference_config(overrides)
    docs = assemble_docs_python(transcripts)
    return {conv: orch.process_entities(text, cfg) for conv, text in docs.items()}


def triple_set(rels: list[dict]) -> set[tuple]:
    return {(r["subject"], r["predicate"], r["object"]) for r in rels}


def precision_recall(pred: set, gold: set) -> tuple[float, float]:
    if not pred and not gold:
        return 1.0, 1.0
    tp = len(pred & gold)
    precision = tp / len(pred) if pred else 0.0
    recall = tp / len(gold) if gold else 1.0
    return precision, recall
