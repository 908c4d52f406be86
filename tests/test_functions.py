"""Unit tests for the pure operator functions (SURVEY.md §5.2 /
FIXTURES.md §5 micro-fixtures)."""

from entity_extractor_linker_ray.functions.categories import (
    filter_category_counts,
    is_maintenance_category,
)
from entity_extractor_linker_ray.functions.dedup import (
    dedup_entities_first_wins,
    dedup_triples_explicit_wins,
    fuzzy_dedup_triples,
    merge_entities_explicit_wins,
    predicate_similarity,
)
from entity_extractor_linker_ray.functions.parsing import (
    normalize_inferred,
    parse_entity_lines,
    parse_triples,
)
from entity_extractor_linker_ray.functions.text import (
    chunk_text,
    clean_llm_json,
    num_chunks,
    strip_trailing_ellipsis,
)
from entity_extractor_linker_ray.functions.urls import (
    is_valid_wikipedia_url,
    parse_wiki_url,
    sanitize_wikipedia_url,
)


class TestChunker:
    def test_boundaries(self):
        # reference loop semantics (text_utils.py:89-111): size=10, overlap=3
        text = "abcdefghijklmnopqrst"  # 20 chars
        chunks = chunk_text(text, 10, 3)
        assert chunks == ["abcdefghij", "hijklmnopq", "opqrst"]

    def test_exact_fit_no_overlap(self):
        assert chunk_text("abcdef", 3, 0) == ["abc", "def"]

    def test_short_text(self):
        assert chunk_text("ab", 10, 3) == ["ab"]

    def test_num_chunks_matches_loop(self):
        for n in [0, 1, 5, 10, 11, 20, 37, 100, 1001]:
            for size, overlap in [(10, 3), (10, 0), (7, 2), (100, 50)]:
                expected = len(chunk_text("x" * n, size, overlap)) if n else 0
                assert num_chunks(n, size, overlap) == expected, (n, size, overlap)


class TestParsers:
    def test_entity_lines(self):
        raw = "Spark; Organization; https://en.wikipedia.org/wiki/Spark; the spark\nbadline; x\nA; B; ; c"
        ents = parse_entity_lines(raw)
        assert len(ents) == 2
        assert ents[0]["name"] == "Spark"
        assert ents[0]["inferred"] == "explicit"
        assert ents[1]["wikipedia_url"] == ""

    def test_triples_json(self):
        raw = 'noise [ {"subject": "A", "predicate": "p", "object": "B"} ] trailing'
        assert parse_triples(raw) == [{"subject": "A", "predicate": "p", "object": "B"}]

    def test_triples_lines_with_semicolon_object(self):
        # object may contain ';' (relationship_inference.py:394)
        raw = "A; p; B; extra"
        assert parse_triples(raw) == [{"subject": "A", "predicate": "p", "object": "B;extra"}]

    def test_triples_fenced_json(self):
        raw = '```json\n[{"subject": "A", "predicate": "p", "object": "B"}]\n```'
        assert parse_triples(raw)[0]["object"] == "B"

    def test_normalize_inferred(self):
        assert normalize_inferred("explizit") == "explicit"
        assert normalize_inferred("EXPLICIT") == "explicit"
        assert normalize_inferred("anything") == "implicit"
        assert normalize_inferred(None) == "implicit"

    def test_clean_llm_json_control_chars(self):
        assert clean_llm_json("a\x00b") == "a b"


class TestUrls:
    def test_valid(self):
        assert is_valid_wikipedia_url("https://en.wikipedia.org/wiki/Spark")
        assert not is_valid_wikipedia_url("https://wikipedia.org/wiki/Spark")
        assert not is_valid_wikipedia_url("")
        assert not is_valid_wikipedia_url(None)

    def test_sanitize(self):
        assert (
            sanitize_wikipedia_url("https://de.wikipedia.org/wiki/Große Stadt")
            == "https://de.wikipedia.org/wiki/Gro%C3%9Fe_Stadt"
        )

    def test_parse_roundtrip(self):
        title, lang = parse_wiki_url("https://de.wikipedia.org/wiki/Gro%C3%9Fe_Stadt#x")
        assert (title, lang) == ("Große Stadt", "de")


class TestEllipsis:
    def test_strip(self):
        assert strip_trailing_ellipsis("abc...") == "abc"
        assert strip_trailing_ellipsis("abc…") == "abc"
        assert strip_trailing_ellipsis("abc..") == "abc.."
        assert strip_trailing_ellipsis("") == ""


class TestDedup:
    def test_first_wins_order_sensitivity(self):
        ents = [
            {"name": "A", "wikipedia_url": "u1", "v": 1},
            {"name": "B", "wikipedia_url": "", "v": 2},
            {"name": "A2", "wikipedia_url": "u1", "v": 3},  # same url → dropped
            {"name": "B", "wikipedia_url": "", "v": 4},     # same name key → dropped
            {"name": "", "wikipedia_url": ""},               # empty key → dropped
        ]
        out = dedup_entities_first_wins(ents)
        assert [e["v"] for e in out] == [1, 2]

    def test_explicit_beats_implicit_in_place(self):
        rels = [
            {"subject": "A", "predicate": "p", "object": "B", "inferred": "implicit", "v": 1},
            {"subject": "A", "predicate": "p", "object": "B", "inferred": "explicit", "v": 2},
            {"subject": "A", "predicate": "q", "object": "B", "inferred": "explicit", "v": 3},
            {"subject": "A", "predicate": "q", "object": "B", "inferred": "explicit", "v": 4},
        ]
        out = dedup_triples_explicit_wins(rels)
        assert [(r["predicate"], r["v"]) for r in out] == [("p", 2), ("q", 3)]

    def test_merge_explicit_wins(self):
        implicit = [{"name": "A", "type": "T", "inferred": "implicit"}]
        explicit = [{"name": "A", "type": "T", "inferred": "explicit"}]
        out = merge_entities_explicit_wins(implicit, explicit)
        assert len(out) == 1 and out[0]["inferred"] == "explicit"

    def test_fuzzy_threshold_exact(self):
        # ratio("uses","use") = 6/7 ≈ 0.857 ≥ 0.85 → merged, shortest kept
        assert predicate_similarity("uses", "use") >= 0.85
        rels = [
            {"subject": "A", "predicate": "uses", "object": "B"},
            {"subject": "A", "predicate": "use", "object": "B"},
            {"subject": "B", "predicate": "totally different", "object": "A"},
        ]
        out = fuzzy_dedup_triples(rels, 0.85)
        preds = {r["predicate"] for r in out}
        assert preds == {"use", "totally different"}

    def test_fuzzy_is_undirected(self):
        rels = [
            {"subject": "A", "predicate": "links to", "object": "B"},
            {"subject": "B", "predicate": "link to", "object": "A"},
        ]
        out = fuzzy_dedup_triples(rels, 0.85)
        assert len(out) == 1 and out[0]["predicate"] == "link to"


class TestCategories:
    def test_maintenance_filter(self):
        counts = {
            "Articles with short description": 5,
            "Organization concepts": 3,
            "All articles with unsourced statements": 2,
            "Wikipedia articles needing clarification": 1,
        }
        assert filter_category_counts(counts) == {"Organization concepts": 3}

    def test_plain_category_kept(self):
        assert not is_maintenance_category("German physicists")

    def test_maintenance_superset_of_reference(self):
        """Both directions of the condensed-list claim
        (utils/category_utils.py:3-158):

        1. superset — every phrase on the reference's keyword list (as a
           bare category name and embedded in a longer one) is dropped
           by `is_maintenance_category`;
        2. no over-reach on content — a sample of real-ish legitimate
           categories is kept by BOTH the reference rule and ours.

        The reference list is read via ast.literal_eval (no import of
        the reference package needed)."""
        import ast
        import pathlib

        src = pathlib.Path(
            "/root/reference/entityextractor/utils/category_utils.py"
        ).read_text()
        ref_keywords = None
        for node in ast.parse(src).body:
            if isinstance(node, ast.Assign) and getattr(
                node.targets[0], "id", ""
            ) == "MAINTENANCE_KEYWORDS":
                ref_keywords = ast.literal_eval(node.value)
        assert ref_keywords and len(ref_keywords) > 100

        missed = [
            kw for kw in ref_keywords
            if not (is_maintenance_category(kw)
                    and is_maintenance_category(f"Hidden {kw} tracking"))
        ]
        assert not missed, f"reference-dropped but kept by ours: {missed}"

        legitimate = [
            "German physicists",
            "Machine learning",
            "Rivers of Germany",
            "19th-century mathematicians",
            "Query languages",
            "Distributed computing architecture",
            "Data management",
            "Cities in Bavaria",
            "Nobel laureates in Physics",
            "Programming language topics",
            "Organization concepts",
            "Synthetic processes",
        ]
        for cat in legitimate:
            assert not any(kw in cat for kw in ref_keywords), cat
            assert not is_maintenance_category(cat), cat


class TestFindMentionsSeparators:
    """Multi-word KB forms must match only across EXACTLY one space —
    the literal-form semantics of the pre-tokenizer regex (round-4
    ADVICE: punctuation/hyphen/double-space separated corpus tokens
    must not produce bigram mentions)."""

    def test_single_space_matches(self, stub_llm):
        labels = {f["rec"]["label"] for f in
                  stub_llm.find_mentions("zzz data platform zzz")}
        assert "Data Platform" in labels

    def test_punctuation_and_width_variants_do_not(self, stub_llm):
        for text in ("zzz data. platform zzz",
                     "zzz data-platform zzz",
                     "zzz data  platform zzz",
                     "zzz data\nplatform zzz"):
            labels = {f["rec"]["label"] for f in stub_llm.find_mentions(text)}
            assert "Data Platform" not in labels, text

    def test_single_word_forms_unaffected(self, stub_llm):
        labels = {f["rec"]["label"] for f in
                  stub_llm.find_mentions("zzz data. platform zzz")}
        assert "Data" in labels
