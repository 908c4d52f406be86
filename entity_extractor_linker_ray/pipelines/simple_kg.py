"""Oracle-track KG operators over the driver ``documents`` table.

These are the engine's KG operators (mention detection M2/M5, KB
linking J5, co-occurrence triple extraction A4, graph aggregates
G1-G8, chunk accounting M1, citation offsets M9) instantiated with a
*deterministic, SQL-expressible* rule set so DuckDB can replay every
step as an oracle (driver correctness gate). The full stub-LLM pipeline
(`pipelines/kg.py`) exercises the same Ray operators with the richer
reference semantics and is scored against the reference itself in
``tests/test_golden_parity.py``.

Deterministic rules (identical in the SQL strings below):

* mention: KB surface ``term`` occurs in a document iff
  ``' '||text||' '`` contains ``' '||term||' '``; its position is the
  1-based ``strpos`` of that padded match.
* triple: per document, mentions ordered by ``(pos, name)``;
  consecutive pairs become ``(subject, 'related_to', object)``.
* graph: edges = triple counts; nodes = per-entity document counts;
  connections = distinct undirected neighbors.

Everything here is document-local until the final aggregate, so the
only shuffles are the small groupbys over pre-combined partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Sum

from entity_extractor_linker_ray.functions.categories import is_maintenance_category
from entity_extractor_linker_ray.functions.text import num_chunks
from entity_extractor_linker_ray.state.kb import build_kb

CHUNK_SIZE = 200
CHUNK_OVERLAP = 50
PREDICATE = "related_to"


def vocab() -> list[dict]:
    """Corpus-derived KB entities: every record whose surface form is a
    1–3 token sequence of the documents vocabulary (singles, bigrams,
    core trigrams — 1504 records; the two multi-word 'parent' entities
    cannot occur in the token stream and are excluded)."""
    return [r for r in build_kb() if r.get("corpus_surface")]


# Hoisted per-process vocab state (round-3 advice: vocab() used to be
# rebuilt inside the batch kernel). Built lazily once per worker:
# surface term -> (label, type) keyed by token count, plus the KB link
# frame for the broadcast join.
_VOCAB_STATE: dict | None = None


def _vocab_state() -> dict:
    global _VOCAB_STATE
    if _VOCAB_STATE is None:
        by_len: dict[int, dict[str, tuple[str, str]]] = {}
        for r in vocab():
            term = r["corpus_surface"]
            n = term.count(" ") + 1
            by_len.setdefault(n, {})[term] = (r["label"], r["type"])
        _VOCAB_STATE = {"by_len": by_len, "max_n": max(by_len)}
    return _VOCAB_STATE


def _read_documents(sf_dir: str, columns=("doc_id", "text")):
    from entity_extractor_linker_ray.ops.readers import read_split

    return read_split(f"{sf_dir}/documents.parquet", columns=list(columns))


# ----------------------------------------------------------------------
# mention detection (vectorized per term)
# ----------------------------------------------------------------------

def _mentions_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Tokenization-based mention scan: O(tokens) per document instead
    of O(|vocab| × text) — one pass splits each document, emits every
    1..3-gram surface with its padded-strpos position, and keeps the
    FIRST occurrence per (doc, surface). Identical semantics to the
    oracle's ``strpos(' '||text||' ', ' '||term||' ')`` on the
    single-space corpus: a token starting at 0-based text offset o sits
    at padded position o+1."""
    state = _vocab_state()
    by_len, max_n = state["by_len"], state["max_n"]
    doc_ids: list = []
    names: list[str] = []
    types: list[str] = []
    poss: list[int] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        if not text:
            continue
        toks = text.split(" ")
        starts = np.empty(len(toks), dtype=np.int64)
        off = 0
        for i, t in enumerate(toks):
            starts[i] = off + 1  # 1-based padded strpos
            off += len(t) + 1
        seen: dict[str, int] = {}
        for n in range(1, max_n + 1):
            table = by_len.get(n)
            if not table:
                continue
            for i in range(len(toks) - n + 1):
                term = toks[i] if n == 1 else " ".join(toks[i:i + n])
                if term in table and term not in seen:
                    seen[term] = i
        for term, i in seen.items():
            label, typ = by_len[term.count(" ") + 1][term]
            doc_ids.append(doc_id)
            names.append(label)
            types.append(typ)
            poss.append(int(starts[i]))
    if not doc_ids:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "name": pd.Series([], dtype=str),
                "type": pd.Series([], dtype=str),
                "pos": pd.Series([], dtype=np.int64),
            }
        )
    return pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids, dtype=np.int64),
            "name": names,
            "type": types,
            "pos": np.asarray(poss, dtype=np.int64),
        }
    )


def kg_mentions(sf_dir: str):
    return _read_documents(sf_dir).map_batches(_mentions_batch, batch_format="pandas")


# ----------------------------------------------------------------------
# linking: broadcast KB join (J5 — small side broadcast, no shuffle)
# ----------------------------------------------------------------------

def _kb_frame() -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "name": r["label"],
                "wikipedia_url": r["url_en"],
                "wikidata_id": r["wikidata_id"],
                "dbpedia_uri": r["dbpedia_uri"],
                "canonical_id": r["url_en"],
            }
            for r in vocab()
        ]
    )


def kg_entities(sf_dir: str):
    kb = _kb_frame()

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(kb, on="name", how="left")

    return kg_mentions(sf_dir).map_batches(join, batch_format="pandas")


# ----------------------------------------------------------------------
# triples: consecutive co-occurrence (document-local)
# ----------------------------------------------------------------------

def _triples_from_mentions(batch: pd.DataFrame) -> pd.DataFrame:
    if batch.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "subject": pd.Series([], dtype=str),
                "predicate": pd.Series([], dtype=str),
                "object": pd.Series([], dtype=str),
            }
        )
    b = batch.sort_values(["doc_id", "pos", "name"], kind="stable")
    nxt_name = b["name"].shift(-1)
    nxt_doc = b["doc_id"].shift(-1)
    mask = nxt_doc == b["doc_id"]
    return pd.DataFrame(
        {
            "doc_id": b.loc[mask, "doc_id"].to_numpy(),
            "subject": b.loc[mask, "name"].to_numpy(),
            "predicate": PREDICATE,
            "object": nxt_name[mask].to_numpy(),
        }
    )


def kg_triples(sf_dir: str):
    """Single fused kernel over documents (mention scan + pairing) so
    one document's mentions can never straddle a batch boundary —
    re-batching between two chained ``map_batches`` stages would not
    guarantee that."""
    return _read_documents(sf_dir).map_batches(
        lambda b: _triples_from_mentions(_mentions_batch(b)), batch_format="pandas"
    )


# ----------------------------------------------------------------------
# graph aggregates over the simple triples
# ----------------------------------------------------------------------

def kg_edges(sf_dir: str):
    """Weighted distinct edges. Two-phase hash aggregation
    (`ops/shuffle.grouped_aggregate`) instead of
    ``Dataset.groupby().aggregate(Sum)``: with the round-4 grown KB
    the per-batch partials are ~240k 3-string-key rows at sf0.1 and
    Ray's sort-based Aggregate spent 20.9 s (280 CPU-s) sorting them;
    the bucketed exchange does the same in ~2 s."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    keys = ["subject", "predicate", "object"]
    partials = kg_triples(sf_dir).map_batches(
        lambda b: b.groupby(keys, sort=False)
        .size()
        .reset_index(name="weight")
        .astype({"weight": np.int64}),
        batch_format="pandas",
    )
    return grouped_aggregate(
        partials, keys,
        lambda b: b.groupby(keys, sort=False, as_index=False)["weight"]
        .sum()
        .astype({"weight": np.int64}),
        coalesce=True,  # partials are combiner-bounded per batch
    )


def kg_nodes(sf_dir: str):
    """Per-entity doc counts (same two-phase hash shape as
    :func:`kg_edges`). Partials emit DISTINCT (name, type, doc_id)
    rows and the combine counts distinct doc_ids per key — exact under
    ANY block/batch splitting (round-4 ADVICE: summing per-batch
    nunique partials silently double-counts if Ray's dynamic block
    splitting ever lands one document's mentions in two batches).
    Wire rows stay combiner-bounded: distinct (entity, doc) pairs per
    batch, the same bound the n_docs partial had."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    partials = kg_mentions(sf_dir).map_batches(
        lambda b: b[["name", "type", "doc_id"]].drop_duplicates(),
        batch_format="pandas",
    )
    return grouped_aggregate(
        partials, ["name", "type"],
        lambda b: b.groupby(["name", "type"], sort=False)["doc_id"]
        .nunique()
        .reset_index(name="n_docs")
        .astype({"n_docs": np.int64}),
        coalesce=True,
    )


def kg_entity_connections(sf_dir: str):
    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = batch[["subject", "object"]].rename(
            columns={"subject": "entity", "object": "neighbor"}
        )
        rev = batch[["object", "subject"]].rename(
            columns={"object": "entity", "subject": "neighbor"}
        )
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        # one vectorized nunique over the whole hash bucket (entity
        # cardinality ≈ group cardinality — per-group Python collapses)
        return (
            bucket.groupby("entity", sort=False)["neighbor"]
            .nunique()
            .reset_index(name="n_neighbors")
            .astype({"n_neighbors": np.int64})
        )

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    partials = kg_triples(sf_dir).map_batches(both_dirs, batch_format="pandas")
    return grouped_aggregate(partials, ["entity"], final)


def kg_entity_lift(sf_dir: str):
    """Association score per co-occurring entity pair (a < b):
    document co-occurrence count ``n_ab`` and lift
    ``n_ab·N / (n_a·n_b)`` — the PMI-family normalization a KG builder
    applies before thresholding spurious co-occurrence edges (lift 1 =
    independent, ≫1 = genuinely associated).

    Scale shape: pair partials are generated DOC-LOCALLY inside the
    fused mention kernel (fan-out bounded by |vocab|² per doc, never
    corpus-sized) and summed through one bucketed exchange; the
    per-entity doc counts (≤ |vocab| rows) and the corpus size N are
    tiny driver-collected broadcast sides, exactly the small-side rule
    of the KB join (J5). The lift itself is ONE IEEE-754 division of
    exact int64 products, so the float column hash-matches the SQL
    oracle bit-for-bit."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def pair_partials(batch: pd.DataFrame) -> pd.DataFrame:
        m = _mentions_batch(batch)[["doc_id", "name"]]
        if m.empty:
            return pd.DataFrame(
                {"entity_a": pd.Series([], dtype=str),
                 "entity_b": pd.Series([], dtype=str),
                 "n_ab": pd.Series([], dtype=np.int64)}
            )
        pairs = m.merge(m, on="doc_id")
        pairs = pairs[pairs["name_x"] < pairs["name_y"]]
        return (
            pairs.groupby(["name_x", "name_y"], sort=False)
            .size()
            .reset_index(name="n_ab")
            .rename(columns={"name_x": "entity_a", "name_y": "entity_b"})
            .astype({"n_ab": np.int64})
        )

    def name_partials(batch: pd.DataFrame) -> pd.DataFrame:
        m = _mentions_batch(batch)
        return (
            m.groupby("name", sort=False)
            .size()
            .reset_index(name="n_docs")
            .astype({"n_docs": np.int64})
        )

    # per-entity doc counts: ≤ |vocab| × blocks partial rows — driver sum
    from entity_extractor_linker_ray.ops.shuffle import collect_small

    name_counts = (
        collect_small(
            _read_documents(sf_dir).map_batches(
                name_partials, batch_format="pandas"
            ),
            ["name", "n_docs"],
        )
        .groupby("name")["n_docs"]
        .sum()
        .to_dict()
    )
    n_total = rd.read_parquet(f"{sf_dir}/documents.parquet").count()

    def finish(bucket: pd.DataFrame) -> pd.DataFrame:
        summed = (
            bucket.groupby(["entity_a", "entity_b"], sort=False)["n_ab"]
            .sum()
            .reset_index()
            .astype({"n_ab": np.int64})
        )
        n_a = summed["entity_a"].map(name_counts).to_numpy(dtype=np.int64)
        n_b = summed["entity_b"].map(name_counts).to_numpy(dtype=np.int64)
        n_ab = summed["n_ab"].to_numpy(dtype=np.int64)
        summed["lift"] = (n_ab * np.int64(n_total)).astype(np.float64) / (
            n_a * n_b
        ).astype(np.float64)
        return summed

    partials = _read_documents(sf_dir).map_batches(
        pair_partials, batch_format="pandas"
    )
    return grouped_aggregate(partials, ["entity_a", "entity_b"], finish)


def kg_type_distribution(sf_dir: str):
    partials = kg_entities(sf_dir).map_batches(
        lambda b: b.groupby("type", sort=False).size().reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    return partials.groupby("type").aggregate(Sum("n", alias_name="n"))


def kg_linked_counts(sf_dir: str) -> pd.DataFrame:
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "total": [np.int64(len(batch))],
                "wikidata": [np.int64((batch["wikidata_id"] != "").sum())],
                "dbpedia": [np.int64((batch["dbpedia_uri"] != "").sum())],
            }
        )

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    parts = collect_small(
        kg_entities(sf_dir).map_batches(partial, batch_format="pandas"),
        ["total", "wikidata", "dbpedia"],
    )
    total = int(parts["total"].sum())
    wikidata = int(parts["wikidata"].sum())
    dbpedia = int(parts["dbpedia"].sum())
    return pd.DataFrame(
        [
            {
                "total_mentions": np.int64(total),
                "wikidata_count": np.int64(wikidata),
                "dbpedia_count": np.int64(dbpedia),
                "wikidata_percent": (wikidata * 100 / total) if total else 0.0,
                "dbpedia_percent": (dbpedia * 100 / total) if total else 0.0,
            }
        ]
    )


def kg_top_categories(sf_dir: str, k: int = 10):
    cats = pd.DataFrame(
        [
            {"name": r["label"], "category": c}
            for r in vocab()
            for c in r["categories"]
            if not is_maintenance_category(c)
        ]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        joined = batch[["doc_id", "name"]].merge(cats, on="name")
        return (
            joined.groupby("category", sort=False).size().reset_index(name="n")
            .astype({"n": np.int64})
        )

    partials = kg_mentions(sf_dir).map_batches(partial, batch_format="pandas")
    counts = partials.groupby("category").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "category"], descending=[True, False]).limit(k)


# ----------------------------------------------------------------------
# chunk accounting (M1) and citation offsets (M9)
# ----------------------------------------------------------------------

def kg_chunk_counts(sf_dir: str):
    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        lengths = batch["text"].fillna("").str.len()
        counts = [num_chunks(int(n), CHUNK_SIZE, CHUNK_OVERLAP) for n in lengths]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "n_chunks": np.array(counts, np.int64)}
        )

    return _read_documents(sf_dir).map_batches(kernel, batch_format="pandas")


def kg_citations(sf_dir: str):
    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        out = _mentions_batch(batch)
        term_len = out["name"].str.len().to_numpy(dtype=np.int64)
        start = out["pos"].to_numpy() - 1
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(),
                "name": out["name"].to_numpy(),
                "citation_start": start,
                "citation_end": start + term_len,
            }
        )

    return _read_documents(sf_dir).map_batches(kernel, batch_format="pandas")


# ----------------------------------------------------------------------
# transcript x KG cross operators: which conversation ROLE utters each
# mention. The transcripts derivation is pure arithmetic over the
# documents text (12-word turns, roles cycling user/assistant/tool —
# synthetic.turns_from_document), so a mention's char offset maps to
# its turn as word_index // 12 and to its speaker as turn % 3; both
# sides of the oracle replay that mapping exactly.
# ----------------------------------------------------------------------

_ROLE_CYCLE = ("user", "assistant", "tool")
_WORDS_PER_TURN = 12


def _mentions_with_role(batch: pd.DataFrame) -> pd.DataFrame:
    """Mentions extended with the transcript turn index and role of the
    turn containing the mention's first character. The word index is
    the space count before the 1-based char position ``pos`` — exact,
    because the corpus is single-space separated."""
    m = _mentions_batch(batch)
    if m.empty:
        m["ti"] = pd.Series([], dtype=np.int64)
        m["role"] = pd.Series([], dtype=str)
        return m
    text_by_doc = dict(
        zip(batch["doc_id"].to_numpy(), batch["text"].fillna("").astype(str))
    )
    word_idx = np.fromiter(
        (
            text_by_doc[d][: p - 1].count(" ")
            for d, p in zip(m["doc_id"].to_numpy(), m["pos"].to_numpy())
        ),
        dtype=np.int64,
        count=len(m),
    )
    m["ti"] = word_idx // _WORDS_PER_TURN
    m["role"] = np.array(_ROLE_CYCLE, dtype=object)[(m["ti"] % 3).to_numpy()]
    return m


def kg_mention_role_profile(sf_dir: str):
    """Per (role, entity type): mention count, distinct entities, and
    distinct conversations — the 'who talks about what' profile of a
    transcript corpus (user turns naming Organizations vs tool turns
    naming Resources read very differently in an agent-trace KG).

    Shape: mention detection, offset→turn→role mapping, and a partial
    (role, type, name, doc) rollup all happen inside the scan kernel;
    one bucketed exchange on the (role, type) grid — 3 x |types|
    groups, corpus-independent — finishes the distinct counts."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    keys = ["role", "type"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = _mentions_with_role(batch)
        if m.empty:
            return pd.DataFrame(
                {"role": pd.Series([], dtype=str),
                 "type": pd.Series([], dtype=str),
                 "name": pd.Series([], dtype=str),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        return (
            m.groupby(["role", "type", "name", "doc_id"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False)
            .agg(
                n_mentions=("n", "sum"),
                n_entities=("name", "nunique"),
                n_docs=("doc_id", "nunique"),
            )
            .reset_index()
            .astype({c: np.int64 for c in ("n_mentions", "n_entities", "n_docs")})
        )

    return grouped_aggregate(
        _read_documents(sf_dir), keys, combine, partial=partial,
        num_partitions=8,
    )


def kg_mention_turn_histogram(sf_dir: str, cap: int = 19):
    """Mentions per transcript turn position (turn index capped at
    ``cap`` so the grid is fixed-width): where in a conversation do KG
    entities appear — early user framing vs late tool output. Columns:
    turn_bucket, n_mentions, n_docs. Same scan-local shape as the role
    profile; the exchange grid is ``cap + 1`` rows."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = _mentions_with_role(batch)
        if m.empty:
            return pd.DataFrame(
                {"turn_bucket": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        m["turn_bucket"] = np.minimum(m["ti"].to_numpy(), np.int64(cap))
        return (
            m.groupby(["turn_bucket", "doc_id"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"turn_bucket": np.int64, "n": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("turn_bucket", sort=False)
            .agg(n_mentions=("n", "sum"), n_docs=("doc_id", "nunique"))
            .reset_index()
            .astype({c: np.int64 for c in
                     ("turn_bucket", "n_mentions", "n_docs")})
        )

    return grouped_aggregate(
        _read_documents(sf_dir), ["turn_bucket"], combine, partial=partial,
        num_partitions=8,
    )


def kg_edge_timespan(sf_dir: str):
    """Temporal KG: per-edge validity window over the transcript
    timeline. Each triple occurrence is stamped with the timestamp of
    the turn containing its SUBJECT mention (the deterministic
    transcript synthesis formula ``EPOCH + doc_id*3600e6 + turn*1e6``,
    ``synthetic.turns_from_document``); per (subject, predicate,
    object) edge we report first_seen_ts / last_seen_ts (int64 µs),
    distinct-document support and total assertion count — the validity
    interval a temporal-KG builder attaches before reasoning about
    edge freshness/decay.

    Scale shape: the fused kernel builds doc-local partials (a doc
    never straddles a batch, so per-batch nunique(doc_id) sums exactly
    across batches) and the final is ONE exchange over the edge domain
    (≤ |vocab|² rows)."""
    partials = _read_documents(sf_dir).map_batches(
        edge_timespan_partial, batch_format="pandas"
    )
    return merge_edge_timespan_partials([partials])


def edge_timespan_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Doc-local (edge → min/max ts, doc support, assertion count)
    partial state. Mergeable: min/max/sum/sum are associative and a
    document lives in exactly one batch of one arriving slice, so
    partials from disjoint slices fold exactly (the incremental
    maintenance contract of ``pipelines/incremental.py``)."""
    from entity_extractor_linker_ray.synthetic import EPOCH_US

    m = _mentions_with_role(batch)
    cols = {
        "subject": str, "predicate": str, "object": str,
        "first_seen_ts": np.int64, "last_seen_ts": np.int64,
        "n_docs": np.int64, "n_assertions": np.int64,
    }
    if m.empty:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
    b = m.sort_values(["doc_id", "pos", "name"], kind="stable")
    nxt_name = b["name"].shift(-1)
    nxt_doc = b["doc_id"].shift(-1)
    mask = (nxt_doc == b["doc_id"]).to_numpy()
    doc = b.loc[mask, "doc_id"].to_numpy(dtype=np.int64)
    ts = (
        np.int64(EPOCH_US)
        + doc * np.int64(3_600_000_000)
        + b.loc[mask, "ti"].to_numpy(dtype=np.int64) * np.int64(1_000_000)
    )
    t = pd.DataFrame(
        {
            "doc_id": doc,
            "subject": b.loc[mask, "name"].to_numpy(),
            "predicate": PREDICATE,
            "object": nxt_name[mask].to_numpy(),
            "ts": ts,
        }
    )
    return (
        t.groupby(["subject", "predicate", "object"], sort=False)
        .agg(
            first_seen_ts=("ts", "min"),
            last_seen_ts=("ts", "max"),
            n_docs=("doc_id", "nunique"),
            n_assertions=("ts", "size"),
        )
        .reset_index()
        .astype({c: np.int64 for c in
                 ("first_seen_ts", "last_seen_ts", "n_docs", "n_assertions")})
    )


def merge_edge_timespan_partials(states):
    """Fold timespan partial states into the final table — one union,
    one bounded hash-bucket exchange over the edge domain (same
    two-phase shape as :func:`kg_edges`; the sort-based Aggregate was
    the wall on 3-string keys at the grown-KB cardinality)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)
    keys = ["subject", "predicate", "object"]
    return grouped_aggregate(
        merged, keys,
        lambda b: b.groupby(keys, sort=False, as_index=False)
        .agg(first_seen_ts=("first_seen_ts", "min"),
             last_seen_ts=("last_seen_ts", "max"),
             n_docs=("n_docs", "sum"),
             n_assertions=("n_assertions", "sum"))
        .astype({c: np.int64 for c in
                 ("first_seen_ts", "last_seen_ts", "n_docs", "n_assertions")}),
        coalesce=True,
    )


def kg_entity_timespan(sf_dir: str):
    """Node-level twin of :func:`kg_edge_timespan`: per (name, type)
    the first/last mention timestamp (each mention stamped with its
    containing turn's ts), distinct-document support and total mention
    count — when an entity enters and leaves the corpus timeline.
    Same doc-local-partials + one bounded exchange shape."""
    from entity_extractor_linker_ray.synthetic import EPOCH_US

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = _mentions_with_role(batch)
        cols = {
            "name": str, "type": str,
            "first_seen_ts": np.int64, "last_seen_ts": np.int64,
            "n_docs": np.int64, "n_mentions": np.int64,
        }
        if m.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        m = m.copy()
        m["ts"] = (
            np.int64(EPOCH_US)
            + m["doc_id"].to_numpy(dtype=np.int64) * np.int64(3_600_000_000)
            + m["ti"].to_numpy(dtype=np.int64) * np.int64(1_000_000)
        )
        return (
            m.groupby(["name", "type"], sort=False)
            .agg(
                first_seen_ts=("ts", "min"),
                last_seen_ts=("ts", "max"),
                n_docs=("doc_id", "nunique"),
                n_mentions=("ts", "size"),
            )
            .reset_index()
            .astype({c: np.int64 for c in
                     ("first_seen_ts", "last_seen_ts", "n_docs", "n_mentions")})
        )

    partials = _read_documents(sf_dir).map_batches(partial, batch_format="pandas")
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    return grouped_aggregate(
        partials, ["name", "type"],
        lambda b: b.groupby(["name", "type"], sort=False, as_index=False)
        .agg(first_seen_ts=("first_seen_ts", "min"),
             last_seen_ts=("last_seen_ts", "max"),
             n_docs=("n_docs", "sum"),
             n_mentions=("n_mentions", "sum"))
        .astype({c: np.int64 for c in
                 ("first_seen_ts", "last_seen_ts", "n_docs", "n_mentions")}),
        coalesce=True,
    )


def kg_edge_diff(sf_dir: str):
    """KG snapshot diff: the edge-level change set between the graph
    built from the even-doc_id half of the corpus and the odd half —
    the upsert plan an incremental graph materializer executes when a
    new corpus slice replaces an old one. Columns: edge key,
    weight_base / weight_new (0 when absent) and status
    ``added`` / ``removed`` / ``common``.

    Scale shape: ONE fused scan tags each doc-local partial with its
    side (no second read of the corpus), one bounded exchange over the
    edge domain, side-pivot inside the bucket."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = _triples_from_mentions(_mentions_batch(batch))
        if t.empty:
            return pd.DataFrame(
                {"subject": pd.Series([], dtype=str),
                 "predicate": pd.Series([], dtype=str),
                 "object": pd.Series([], dtype=str),
                 "side": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        t["side"] = (t["doc_id"].to_numpy(dtype=np.int64) % 2).astype(np.int64)
        return (
            t.groupby(["subject", "predicate", "object", "side"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"subject": pd.Series([], dtype=str),
                 "predicate": pd.Series([], dtype=str),
                 "object": pd.Series([], dtype=str),
                 "weight_base": pd.Series([], dtype=np.int64),
                 "weight_new": pd.Series([], dtype=np.int64),
                 "status": pd.Series([], dtype=str)}
            )
        g = (
            bucket.pivot_table(
                index=["subject", "predicate", "object"], columns="side",
                values="n", aggfunc="sum", fill_value=0,
            )
            .reindex(columns=[0, 1], fill_value=0)
            .reset_index()
        )
        g.columns = ["subject", "predicate", "object", "weight_base", "weight_new"]
        base = g["weight_base"].to_numpy(dtype=np.int64)
        new = g["weight_new"].to_numpy(dtype=np.int64)
        g["weight_base"] = base
        g["weight_new"] = new
        g["status"] = np.where(
            base == 0, "added", np.where(new == 0, "removed", "common")
        )
        return g

    partials = _read_documents(sf_dir).map_batches(partial, batch_format="pandas")
    return grouped_aggregate(
        partials, ["subject", "predicate", "object"], combine
    )


# ----------------------------------------------------------------------
# SQL oracle builders
# ----------------------------------------------------------------------

def _sql_quote(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def vocab_cte() -> str:
    rows = ",\n    ".join(
        f"({_sql_quote(r['label'].lower())}, {_sql_quote(r['label'])}, "
        f"{_sql_quote(r['type'])}, {_sql_quote(r['url_en'])}, "
        f"{_sql_quote(r['wikidata_id'])}, {_sql_quote(r['dbpedia_uri'])})"
        for r in vocab()
    )
    return (
        "vocab(term, name, type, wikipedia_url, wikidata_id, dbpedia_uri) AS (VALUES\n    "
        + rows
        + ")"
    )


def mentions_cte() -> str:
    return (
        "m AS (SELECT d.doc_id, v.name, v.type, v.wikipedia_url, v.wikidata_id, "
        "v.dbpedia_uri, strpos(' '||d.text||' ', ' '||v.term||' ') AS pos "
        "FROM documents d CROSS JOIN vocab v "
        "WHERE strpos(' '||d.text||' ', ' '||v.term||' ') > 0)"
    )


def triples_cte() -> str:
    return (
        "t AS (SELECT doc_id, name AS subject, 'related_to' AS predicate, "
        "lead(name) OVER (PARTITION BY doc_id ORDER BY pos, name) AS object FROM m)"
    )


def categories_cte() -> str:
    rows = ",\n    ".join(
        f"({_sql_quote(r['label'])}, {_sql_quote(c)})"
        for r in vocab()
        for c in r["categories"]
        if not is_maintenance_category(c)
    )
    return f"kbcat(name, category) AS (VALUES\n    {rows})"


ORACLES: dict[str, str] = {
    "kg_mentions": (
        "WITH {vocab}, {m} SELECT doc_id, name, type, pos FROM m"
    ),
    "kg_entities": (
        "WITH {vocab}, {m} SELECT doc_id, name, type, pos, wikipedia_url, "
        "wikidata_id, dbpedia_uri, wikipedia_url AS canonical_id FROM m"
    ),
    "kg_triples": (
        "WITH {vocab}, {m}, {t} "
        "SELECT doc_id, subject, predicate, object FROM t WHERE object IS NOT NULL"
    ),
    "kg_edges": (
        "WITH {vocab}, {m}, {t} "
        "SELECT subject, predicate, object, count(*) AS weight FROM t "
        "WHERE object IS NOT NULL GROUP BY 1, 2, 3"
    ),
    "kg_nodes": (
        "WITH {vocab}, {m} "
        "SELECT name, type, count(DISTINCT doc_id) AS n_docs FROM m GROUP BY 1, 2"
    ),
    "kg_entity_connections": (
        "WITH {vocab}, {m}, {t}, "
        "p AS (SELECT subject, object FROM t WHERE object IS NOT NULL), "
        "u AS (SELECT subject AS entity, object AS neighbor FROM p "
        "UNION SELECT object, subject FROM p) "
        "SELECT entity, count(DISTINCT neighbor) AS n_neighbors FROM u GROUP BY entity"
    ),
    "kg_entity_lift": (
        "WITH {vocab}, {m}, "
        "e AS (SELECT DISTINCT doc_id, name FROM m), "
        "cnt AS (SELECT name, CAST(COUNT(*) AS BIGINT) AS n_docs FROM e GROUP BY 1), "
        "pairs AS (SELECT a.name AS entity_a, b.name AS entity_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_ab "
        "FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.name < b.name "
        "GROUP BY 1, 2) "
        "SELECT p.entity_a, p.entity_b, p.n_ab, "
        "CAST(p.n_ab * (SELECT COUNT(*) FROM documents) AS DOUBLE) "
        "/ (ca.n_docs * cb.n_docs) AS lift "
        "FROM pairs p JOIN cnt ca ON ca.name = p.entity_a "
        "JOIN cnt cb ON cb.name = p.entity_b"
    ),
    # subject-turn timestamp replay: word index = spaces before the
    # 1-based char position, turn = word_index // 12, ts = the
    # synthesis formula EPOCH + doc_id*3600e6 + turn*1e6
    "kg_edge_timespan": (
        "WITH {vocab}, {m}, "
        "mt AS (SELECT m.doc_id, m.name, m.pos, "
        "  (((m.pos - 1) - length(replace(substr(d.text, 1, m.pos - 1), ' ', ''))) // 12) AS ti "
        "  FROM m JOIN documents d USING (doc_id)), "
        "t AS (SELECT doc_id, name AS subject, 'related_to' AS predicate, "
        "  lead(name) OVER (PARTITION BY doc_id ORDER BY pos, name) AS object, "
        "  CAST(1704067200000000 + doc_id * 3600000000 + ti * 1000000 AS BIGINT) AS ts "
        "  FROM mt) "
        "SELECT subject, predicate, object, "
        "  min(ts) AS first_seen_ts, max(ts) AS last_seen_ts, "
        "  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "  CAST(count(*) AS BIGINT) AS n_assertions "
        "FROM t WHERE object IS NOT NULL GROUP BY 1, 2, 3"
    ),
    "kg_entity_timespan": (
        "WITH {vocab}, {m}, "
        "mt AS (SELECT m.doc_id, m.name, m.type, "
        "  CAST(1704067200000000 + m.doc_id * 3600000000 + "
        "  (((m.pos - 1) - length(replace(substr(d.text, 1, m.pos - 1), ' ', ''))) // 12) * 1000000 "
        "  AS BIGINT) AS ts "
        "  FROM m JOIN documents d USING (doc_id)) "
        "SELECT name, type, min(ts) AS first_seen_ts, max(ts) AS last_seen_ts, "
        "  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "  CAST(count(*) AS BIGINT) AS n_mentions "
        "FROM mt GROUP BY 1, 2"
    ),
    "kg_edge_diff": (
        "WITH {vocab}, {m}, {t}, "
        "s AS (SELECT doc_id % 2 AS side, subject, predicate, object "
        "  FROM t WHERE object IS NOT NULL), "
        "p AS (SELECT subject, predicate, object, "
        "  CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS weight_base, "
        "  CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS weight_new "
        "  FROM s GROUP BY 1, 2, 3) "
        "SELECT subject, predicate, object, weight_base, weight_new, "
        "  CASE WHEN weight_base = 0 THEN 'added' "
        "       WHEN weight_new = 0 THEN 'removed' ELSE 'common' END AS status "
        "FROM p"
    ),
    "kg_type_distribution": (
        "WITH {vocab}, {m} SELECT type, count(*) AS n FROM m GROUP BY type"
    ),
    "kg_linked_counts": (
        "WITH {vocab}, {m} SELECT count(*) AS total_mentions, "
        "CAST(sum(CASE WHEN wikidata_id <> '' THEN 1 ELSE 0 END) AS BIGINT) AS wikidata_count, "
        "CAST(sum(CASE WHEN dbpedia_uri <> '' THEN 1 ELSE 0 END) AS BIGINT) AS dbpedia_count, "
        "sum(CASE WHEN wikidata_id <> '' THEN 1 ELSE 0 END) * 100.0 / count(*) AS wikidata_percent, "
        "sum(CASE WHEN dbpedia_uri <> '' THEN 1 ELSE 0 END) * 100.0 / count(*) AS dbpedia_percent "
        "FROM m"
    ),
    "kg_top_categories": (
        "WITH {vocab}, {m}, {kbcat} "
        "SELECT c.category, count(*) AS n FROM m JOIN kbcat c USING (name) "
        "GROUP BY c.category ORDER BY n DESC, c.category ASC LIMIT 10"
    ),
    "kg_chunk_counts": (
        "SELECT doc_id, CASE WHEN length(COALESCE(text, '')) = 0 THEN 0 "
        "WHEN length(text) <= {size} THEN 1 "
        "ELSE 1 + CAST(CEIL((length(text) - {size}) / {step}.0) AS BIGINT) END AS n_chunks "
        "FROM documents"
    ),
    "kg_citations": (
        "WITH {vocab}, {m} SELECT doc_id, name, pos - 1 AS citation_start, "
        "pos - 1 + length(name) AS citation_end FROM m"
    ),
    # offset→turn→role replay: word index = spaces before the 1-based
    # char position (single-space corpus), turn = word_index // 12,
    # role cycles user/assistant/tool (synthetic.turns_from_document)
    "kg_mention_role_profile": (
        "WITH {vocab}, {m}, r AS ("
        "  SELECT m.doc_id, m.name, m.type,"
        "         CASE ((((m.pos - 1) - length(replace(substr(d.text, 1, m.pos - 1), ' ', ''))) // 12) % 3)"
        "              WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'"
        "              ELSE 'tool' END AS role"
        "  FROM m JOIN documents d USING (doc_id)) "
        "SELECT role, type,"
        "       CAST(count(*) AS BIGINT) AS n_mentions,"
        "       CAST(count(DISTINCT name) AS BIGINT) AS n_entities,"
        "       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
        "FROM r GROUP BY 1, 2"
    ),
    "kg_mention_turn_histogram": (
        "WITH {vocab}, {m}, r AS ("
        "  SELECT m.doc_id,"
        "         least((((m.pos - 1) - length(replace(substr(d.text, 1, m.pos - 1), ' ', ''))) // 12), 19)"
        "           AS turn_bucket"
        "  FROM m JOIN documents d USING (doc_id)) "
        "SELECT CAST(turn_bucket AS BIGINT) AS turn_bucket,"
        "       CAST(count(*) AS BIGINT) AS n_mentions,"
        "       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
        "FROM r GROUP BY 1"
    ),
}


def ruleset_llm_agreement(sf_dir: str, llm_entities_ds):
    """KG-construction QA: agreement between the deterministic mention
    rule set (this module) and the stub-LLM extraction pipeline over
    the SAME corpus — how many distinct entity names both extractors
    found, and how many each found alone. The single-row triage signal
    a KG owner reads before trusting either extractor's coverage
    (rule-only names = LLM recall gaps; LLM-only names = surface forms
    the rule vocabulary misses).

    Shape: both sides collapse to distinct names inside their scans
    (vocabulary-bounded on the rule side, entity-cardinality on the LLM
    side), a tagged union meets in one name-keyed bucket exchange, and
    the per-bucket flag counts sum to one driver row — nothing
    corpus-sized moves."""
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    def rule_names(batch: pd.DataFrame) -> pd.DataFrame:
        m = _mentions_batch(batch)
        return pd.DataFrame(
            {"name": pd.unique(m["name"].astype(str))}
        ).assign(in_rule=np.int64(1), in_llm=np.int64(0))

    def llm_names(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"name": pd.unique(batch["entity"].astype(str))}
        ).assign(in_rule=np.int64(0), in_llm=np.int64(1))

    union = _read_documents(sf_dir).map_batches(
        rule_names, batch_format="pandas"
    ).union(
        llm_entities_ds.select_columns(["entity"]).map_batches(
            llm_names, batch_format="pandas"
        )
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"n_both": pd.Series([], dtype=np.int64),
                 "n_rule_only": pd.Series([], dtype=np.int64),
                 "n_llm_only": pd.Series([], dtype=np.int64)}
            )
        g = bucket.groupby("name", sort=False).agg(
            in_rule=("in_rule", "max"), in_llm=("in_llm", "max")
        )
        both = ((g["in_rule"] == 1) & (g["in_llm"] == 1)).sum()
        rule_only = ((g["in_rule"] == 1) & (g["in_llm"] == 0)).sum()
        llm_only = ((g["in_rule"] == 0) & (g["in_llm"] == 1)).sum()
        return pd.DataFrame(
            {"n_both": [np.int64(both)],
             "n_rule_only": [np.int64(rule_only)],
             "n_llm_only": [np.int64(llm_only)]}
        )

    parts = collect_small(
        grouped_aggregate(union, ["name"], combine),
        ["n_both", "n_rule_only", "n_llm_only"],
    )
    totals = parts.sum() if not parts.empty else None
    return pd.DataFrame(
        [{
            "n_both": np.int64(totals["n_both"]) if totals is not None else 0,
            "n_rule_only": (
                np.int64(totals["n_rule_only"]) if totals is not None else 0
            ),
            "n_llm_only": (
                np.int64(totals["n_llm_only"]) if totals is not None else 0
            ),
        }]
    )


def oracle_sql() -> dict[str, str]:
    fill = {
        "vocab": vocab_cte(),
        "m": mentions_cte(),
        "t": triples_cte(),
        "kbcat": categories_cte(),
        "size": CHUNK_SIZE,
        "step": CHUNK_SIZE - CHUNK_OVERLAP,
    }
    return {name: sql.format(**fill) for name, sql in ORACLES.items()}


QUERIES = {
    "kg_mentions": kg_mentions,
    "kg_entities": kg_entities,
    "kg_triples": kg_triples,
    "kg_edges": kg_edges,
    "kg_nodes": kg_nodes,
    "kg_entity_connections": kg_entity_connections,
    "kg_entity_lift": kg_entity_lift,
    "kg_type_distribution": kg_type_distribution,
    "kg_linked_counts": kg_linked_counts,
    "kg_top_categories": kg_top_categories,
    "kg_chunk_counts": kg_chunk_counts,
    "kg_citations": kg_citations,
    "kg_mention_role_profile": kg_mention_role_profile,
    "kg_mention_turn_histogram": kg_mention_turn_histogram,
    "kg_edge_timespan": kg_edge_timespan,
    "kg_edge_diff": kg_edge_diff,
    "kg_entity_timespan": kg_entity_timespan,
}
