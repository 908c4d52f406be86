"""Graph materialization + corpus statistics (SHUFFLES 2-4).

The reference computes its statistics block per document in driver
Python (``core/orchestrator.py:483-591``) and renders the graph from an
in-memory NetworkX object (``core/graph_visualization.py:36-48``). Here
the same semantics become corpus-scale Ray Data aggregates over the
entity/triple datasets, all built on ONE pattern: **two-phase
aggregation** — a vectorized per-batch partial combine inside
``map_batches`` (pandas groupby within the batch), then a small final
``groupby`` over the partials. The partial phase is the skew defense:
a hot entity ("Spark" in ~10% of conversations) contributes at most
one partial row per (key, batch) to the shuffle instead of one row per
mention, so the canonicalization groupby's hot key receives O(#blocks)
rows, not O(#mentions) (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_extractor_linker_ray.functions.categories import is_maintenance_category


# ----------------------------------------------------------------------
# nodes: one row per canonical entity (dedup D1 corpus-wide)
# ----------------------------------------------------------------------

def _node_partials(batch: pd.DataFrame) -> pd.DataFrame:
    grouped = batch.groupby(["canonical_id", "conv_id"], sort=False)
    out = grouped.agg(
        n_mentions=("entity", "size"),
        min_ord=("ord", "min"),
    ).reset_index()
    first = batch.sort_values(["canonical_id", "conv_id", "ord"], kind="stable").groupby(
        ["canonical_id", "conv_id"], sort=False
    ).first().reset_index()[["canonical_id", "conv_id", "entity", "type"]]
    merged = out.merge(first, on=["canonical_id", "conv_id"])
    return merged.rename(columns={"entity": "label"})


def _node_final(bucket: pd.DataFrame) -> pd.DataFrame:
    """Vectorized final over a whole hash bucket of canonical_ids: one
    sort + one pandas groupby covers every entity in the bucket (no
    per-group Python — at 10^8 nodes the per-group pattern collapses)."""
    g = bucket.sort_values(["canonical_id", "conv_id", "min_ord"], kind="stable")
    return (
        g.groupby("canonical_id", sort=False)
        .agg(
            label=("label", "first"),
            type=("type", "first"),
            n_mentions=("n_mentions", "sum"),
            n_convs=("conv_id", "nunique"),
        )
        .reset_index()
        .astype({"n_mentions": np.int64, "n_convs": np.int64})
    )


def build_nodes(entities_ds):
    """entities → nodes keyed by ``canonical_id`` (= ``wikipedia_url or
    name``, the reference's D1 key, ``orchestrator.py:58``). Label/type
    come from the first mention in (conv_id, ord) order — the same
    first-wins rule distributed. Final reduce goes through the bucketed
    two-phase aggregate (`ops/shuffle.py`) since node count ≈ group
    count."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    partials = entities_ds.select_columns(
        ["canonical_id", "conv_id", "ord", "entity", "type"]
    ).map_batches(_node_partials, batch_format="pandas")
    return grouped_aggregate(partials, ["canonical_id"], _node_final)


# ----------------------------------------------------------------------
# edges: weighted dedup of (subject_id, predicate, object_id)
# ----------------------------------------------------------------------

def _edge_partials(batch: pd.DataFrame) -> pd.DataFrame:
    out = (
        batch.groupby(["subject_id", "predicate", "object_id", "inferred"], sort=False)
        .size()
        .reset_index(name="weight")
    )
    out["weight"] = out["weight"].astype(np.int64)
    return out


def build_edges(triples_ds):
    """triples → weighted edge list (D3 corpus-wide: the canonical
    shuffle, pre-combined per batch). Final reduce via the bucketed
    two-phase hash aggregate (`ops/shuffle.py`): edge cardinality ≈
    group cardinality (285k distinct edges at sf0.1 with the grown KB),
    exactly the regime where the sort-based
    ``Dataset.groupby().aggregate(Sum)`` spends its wall sorting
    4-string-key partial rows — the simple-KG twin of this shape
    measured 21.9 → 2.8 s at sf0.1 when it switched
    (``pipelines/simple_kg.py`` ``kg_edges``)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    KEYS = ["subject_id", "predicate", "object_id", "inferred"]
    partials = triples_ds.select_columns(KEYS).map_batches(
        _edge_partials, batch_format="pandas"
    )
    return grouped_aggregate(
        partials, KEYS,
        lambda b: b.groupby(KEYS, sort=False, as_index=False)["weight"]
        .sum()
        .astype({"weight": np.int64}),
        coalesce=True,  # partials are combiner-bounded per batch
    )


# ----------------------------------------------------------------------
# statistics (G1-G8, orchestrator.py:483-591)
# ----------------------------------------------------------------------

def _connection_partials(batch: pd.DataFrame) -> pd.DataFrame:
    fwd = batch[["subject", "object"]].rename(
        columns={"subject": "entity", "object": "neighbor"}
    )
    rev = batch[["object", "subject"]].rename(
        columns={"object": "entity", "subject": "neighbor"}
    )
    both = pd.concat([fwd, rev], ignore_index=True)
    both = both[(both["entity"] != "") & (both["neighbor"] != "")]
    return both.drop_duplicates()


def _connection_final(bucket: pd.DataFrame) -> pd.DataFrame:
    """Distinct-neighbor count for every entity in the hash bucket via
    one vectorized nunique — no per-entity Python groups."""
    return (
        bucket.groupby("entity", sort=False)["neighbor"]
        .nunique()
        .reset_index(name="n_neighbors")
        .astype({"n_neighbors": np.int64})
    )


def entity_connections(triples_ds):
    """Distinct undirected neighbor count per entity name, descending —
    G8 (``orchestrator.py:581-590``). Final reduce bucketed
    (`ops/shuffle.py`): entity cardinality ≈ group cardinality."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    partials = triples_ds.select_columns(["subject", "object"]).map_batches(
        _connection_partials, batch_format="pandas"
    )
    counts = grouped_aggregate(partials, ["entity"], _connection_final)
    return counts.sort(["n_neighbors", "entity"], descending=[True, False])


def type_distribution(entities_ds):
    """G2: count by entity type (``orchestrator.py:488-492``). Group
    count is tiny (#types), but the final rides the same bucketed hash
    aggregate as the other graph finals so the flagship never carries a
    sort-based Aggregate plan anywhere (partials are ~#types rows per
    batch; the exchange coalesces to cpus/2 blocks)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    partials = entities_ds.select_columns(["type"]).map_batches(
        lambda b: b.groupby("type", sort=False).size().reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    return grouped_aggregate(
        partials, ["type"],
        lambda b: b.groupby("type", sort=False, as_index=False)["n"]
        .sum()
        .astype({"n": np.int64}),
        coalesce=True,
    )


def linked_counts(entities_ds) -> pd.DataFrame:
    """G3: linking success counts + percents
    (``orchestrator.py:494-506``). Small single-row result computed via
    per-batch partial sums (returned as pandas)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "total": [np.int64(len(batch))],
                "wikipedia": [np.int64((batch["wikipedia_url"] != "").sum())],
                "wikidata": [np.int64((batch["wikidata_id"] != "").sum())],
                "dbpedia": [np.int64((batch["dbpedia_uri"] != "").sum())],
            }
        )

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    # collect_small, not to_pandas: an EMPTY corpus yields a zero-block
    # Dataset whose to_pandas() drops columns (Ray 2.49), which turned
    # the empty-input path into a KeyError instead of a zero row
    parts = collect_small(
        entities_ds.select_columns(
            ["wikipedia_url", "wikidata_id", "dbpedia_uri"]
        ).map_batches(partial, batch_format="pandas"),
        ["total", "wikipedia", "wikidata", "dbpedia"],
    )
    totals = parts.sum()
    total = int(totals["total"]) if len(parts) else 0
    row = {"total_entities": total}
    for src in ("wikipedia", "wikidata", "dbpedia"):
        count = int(totals[src]) if total else 0
        row[f"{src}_count"] = count
        row[f"{src}_percent"] = (count * 100 / total) if total else 0.0
    return pd.DataFrame([row])


def _explode_counts(column: str, out_key: str, drop_maintenance: bool):
    def kernel(batch: pa.Table) -> pd.DataFrame:
        values: list[str] = []
        for lst in batch.column(column).to_pylist():
            if not lst:
                continue
            values.extend(lst)
        if drop_maintenance:
            values = [v for v in values if not is_maintenance_category(v)]
        if not values:
            return pd.DataFrame({out_key: pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        series = pd.Series(values).value_counts()
        return pd.DataFrame({out_key: series.index, "n": series.values.astype(np.int64)})

    return kernel


def top_k_exploded(entities_ds, column: str, out_key: str, k: int = 10,
                   drop_maintenance: bool = False):
    """G4-G7 (``orchestrator.py:508-579``): explode a list column,
    count, (maintenance-filter for categories), top-k by count with a
    deterministic name tiebreak."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    partials = entities_ds.select_columns([column]).map_batches(
        _explode_counts(column, out_key, drop_maintenance), batch_format="pyarrow"
    )
    counts = grouped_aggregate(
        partials, [out_key],
        lambda b: b.groupby(out_key, sort=False, as_index=False)["n"]
        .sum()
        .astype({"n": np.int64}),
        coalesce=True,  # value_counts partials are key-bounded per batch
    )
    return counts.sort(["n", out_key], descending=[True, False]).limit(k)


def top_wikipedia_categories(entities_ds, k: int = 10):
    return top_k_exploded(entities_ds, "wikipedia_categories", "category", k,
                          drop_maintenance=True)


def compute_stats(entities_ds, triples_ds) -> dict:
    """The reference's full statistics block as a dict of small pandas
    frames (each member also exposed individually for queries())."""
    return {
        "linked": linked_counts(entities_ds),
        "types_distribution": type_distribution(entities_ds).to_pandas(),
        "top_wikipedia_categories": top_wikipedia_categories(entities_ds).to_pandas(),
        "top_wikidata_types": top_k_exploded(entities_ds, "wikidata_types", "type").to_pandas(),
        "top_wikidata_part_of": top_k_exploded(entities_ds, "wikidata_part_of", "part_of").to_pandas(),
        "top_wikidata_has_parts": top_k_exploded(entities_ds, "wikidata_has_parts", "has_parts").to_pandas(),
        "top_dbpedia_subjects": top_k_exploded(entities_ds, "dbpedia_subjects", "subject").to_pandas(),
        "entity_connections": entity_connections(triples_ds).to_pandas(),
    }


# ----------------------------------------------------------------------
# schema induction over the constructed KG (round 3)
# ----------------------------------------------------------------------

def predicate_profile(triples_ds):
    """Per-predicate cardinality profile — the schema-induction signal a
    KG builder reads before declaring a predicate functional (one
    object per subject), inverse-functional, or noise: triple count,
    distinct subject count, distinct object count, and how many of the
    triples were implicit (relation-inference A4/A5 output) rather than
    explicit. ``n_triples / n_subjects`` ≈ 1 marks a functional
    predicate; a large gap marks a hub-shaped one.

    Shape: per-batch partials pre-group on (predicate, subject, object)
    — wire rows are bounded by distinct triples per batch — then one
    predicate-keyed bucketed exchange where both distinct counts are
    bucket-local (every row of a predicate lands in its bucket)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "predicate": batch["predicate"].astype(str).to_numpy(),
                "subject": batch["subject"].astype(str).to_numpy(),
                "object": batch["object"].astype(str).to_numpy(),
                "cnt": np.int64(1),
                "n_implicit": (
                    batch["inferred"].astype(str).to_numpy() == "implicit"
                ).astype(np.int64),
            }
        )
        return (
            df.groupby(["predicate", "subject", "object"], sort=False)
            .agg(cnt=("cnt", "sum"), n_implicit=("n_implicit", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {
                    "predicate": pd.Series([], dtype=str),
                    "n_triples": pd.Series([], dtype=np.int64),
                    "n_subjects": pd.Series([], dtype=np.int64),
                    "n_objects": pd.Series([], dtype=np.int64),
                    "n_implicit": pd.Series([], dtype=np.int64),
                }
            )
        return (
            bucket.groupby("predicate", sort=False)
            .agg(
                n_triples=("cnt", "sum"),
                n_subjects=("subject", "nunique"),
                n_objects=("object", "nunique"),
                n_implicit=("n_implicit", "sum"),
            )
            .reset_index()
            .astype({c: np.int64 for c in ("n_triples", "n_subjects",
                                           "n_objects", "n_implicit")})
        )

    return grouped_aggregate(triples_ds, ["predicate"], combine,
                             partial=partial)


def schema_signatures(triples_ds):
    """Type-signature induction: per (subject_type, predicate,
    object_type) — triple count and distinct (subject, object) entity-
    pair count. This is the ontology skeleton the reference renders as
    its type-distribution block, lifted to edge level: which type pairs
    each predicate actually connects, and with how much entity-level
    support behind the raw co-occurrence count.

    Shape: identical two-phase contract as :func:`predicate_profile`
    with the composite key; the distinct-pair count rides the same
    pre-grouped partial rows at zero extra wire cost."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    KEYS = ["subject_type", "predicate", "object_type"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "subject_type": batch["subject_type"].astype(str).to_numpy(),
                "predicate": batch["predicate"].astype(str).to_numpy(),
                "object_type": batch["object_type"].astype(str).to_numpy(),
                "subject": batch["subject"].astype(str).to_numpy(),
                "object": batch["object"].astype(str).to_numpy(),
                "cnt": np.int64(1),
            }
        )
        return (
            df.groupby(KEYS + ["subject", "object"], sort=False)
            .agg(cnt=("cnt", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {
                    "subject_type": pd.Series([], dtype=str),
                    "predicate": pd.Series([], dtype=str),
                    "object_type": pd.Series([], dtype=str),
                    "n_triples": pd.Series([], dtype=np.int64),
                    "n_entity_pairs": pd.Series([], dtype=np.int64),
                }
            )
        pair = bucket["subject"] + "\x1f" + bucket["object"]
        return (
            bucket.assign(pair=pair)
            .groupby(KEYS, sort=False)
            .agg(n_triples=("cnt", "sum"), n_entity_pairs=("pair", "nunique"))
            .reset_index()
            .astype({"n_triples": np.int64, "n_entity_pairs": np.int64})
        )

    return grouped_aggregate(triples_ds, KEYS, combine, partial=partial)


def inverse_predicate_candidates(triples_ds):
    """Inverse-predicate mining: for every ordered predicate pair
    (pred_a, pred_b), how many distinct-triple pairs exist where
    ``(s, pred_a, o)`` and ``(o, pred_b, s)`` both occur — the signal
    for declaring ``q = a⁻¹`` (or, on the diagonal, that a predicate is
    symmetric) during KG canonicalization. Triples are deduplicated to
    distinct (subject, predicate, object) first, so multiplicity from
    repeated conversations doesn't inflate the evidence.

    Shape: this is a self-join on the REVERSED entity key, expressed
    without joining: each distinct triple maps to one row keyed by the
    unordered pair (min(s,o), max(s,o)) carrying its direction flag, so
    both directions of an entity pair land in the same hash bucket and
    the predicate×predicate cross-count is bucket-local (bounded by the
    distinct predicates touching ONE entity pair, never corpus-sized).
    Self-loop triples (s == o) are excluded — their direction is
    undefined (mirrored in the oracle's ``subject <> object``)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str)
        o = batch["object"].astype(str)
        keep = (s != o).to_numpy()
        if not keep.any():
            return pd.DataFrame(
                {"lo": pd.Series([], dtype=str),
                 "hi": pd.Series([], dtype=str),
                 "predicate": pd.Series([], dtype=str),
                 "fwd": pd.Series([], dtype=np.int64)}
            )
        s, o = s[keep], o[keep]
        pred = batch["predicate"].astype(str)[keep]
        s_arr, o_arr = s.to_numpy(dtype=object), o.to_numpy(dtype=object)
        is_fwd = (s < o).to_numpy()
        return pd.DataFrame(
            {"lo": np.where(is_fwd, s_arr, o_arr),
             "hi": np.where(is_fwd, o_arr, s_arr),
             "predicate": pred.to_numpy(),
             "fwd": is_fwd.astype(np.int64)}
        ).drop_duplicates(["lo", "hi", "predicate", "fwd"])

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "pred_a": pd.Series([], dtype=str),
                "pred_b": pd.Series([], dtype=str),
                "n_pairs": pd.Series([], dtype=np.int64),
            }
        )
        if bucket.empty:
            return empty
        # partials may re-emit the same (lo, hi, predicate, fwd) from
        # different batches — global dedup is bucket-local by key
        b = bucket.drop_duplicates(["lo", "hi", "predicate", "fwd"])
        f = b[b["fwd"] == 1][["lo", "hi", "predicate"]]
        r = b[b["fwd"] == 0][["lo", "hi", "predicate"]]
        if f.empty or r.empty:
            return empty
        m = f.merge(r, on=["lo", "hi"], suffixes=("_f", "_r"))
        if m.empty:
            return empty
        # (s,a,o) with s==lo pairs with (o,b,s): t1 fwd, t2 rev gives
        # (a, b); the SQL self-join also emits the flipped visit (b, a)
        both = pd.concat(
            [
                m.rename(columns={"predicate_f": "pred_a",
                                  "predicate_r": "pred_b"}),
                m.rename(columns={"predicate_r": "pred_a",
                                  "predicate_f": "pred_b"}),
            ],
            ignore_index=True,
        )[["pred_a", "pred_b"]]
        return (
            both.groupby(["pred_a", "pred_b"], sort=False)
            .size()
            .reset_index(name="n_pairs")
            .astype({"n_pairs": np.int64})
        )

    pairs = grouped_aggregate(triples_ds, ["lo", "hi"], combine,
                              partial=partial)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {
                    "pred_a": pd.Series([], dtype=str),
                    "pred_b": pd.Series([], dtype=str),
                    "n_pairs": pd.Series([], dtype=np.int64),
                }
            )
        return (
            bucket.groupby(["pred_a", "pred_b"], sort=False)
            .agg(n_pairs=("n_pairs", "sum"))
            .reset_index()
            .astype({"n_pairs": np.int64})
        )

    return grouped_aggregate(pairs, ["pred_a", "pred_b"], final)


# multiplicative-hash constants for deterministic negative sampling —
# integer arithmetic only, so DuckDB replays the draw bit-for-bit
_NEG_A = np.int64(2654435761)   # Knuth multiplicative (as ops/sampling)
_NEG_B = np.int64(40503)        # 16-bit Knuth companion
_NEG_C = np.int64(2654435789)
_NEG_MOD = np.int64(1) << np.int64(32)


def negative_samples(triples_ds):
    """Filtered negative sampling for KG link prediction — for every
    distinct true triple (s, p, o), a deterministically drawn corrupted
    object o' from the entity pool, with the filter flag that marks
    draws which happen to be true triples themselves (the standard
    'filtered' protocol: downstream training drops flagged rows rather
    than resampling, keeping the op a pure function of the corpus).
    The draw is integer arithmetic over dense entity/predicate ranks —
    ``(si·A + pi·B + oi·C) mod 2³² mod N`` — not an RNG, so the sample
    is reproducible at any parallelism and in SQL.

    Shape: the entity and predicate index spaces are vocabulary-bounded
    → driver-collected once and broadcast into the scan (the KB
    small-side rule, J5); the truth filter is one bucketed exchange
    keyed (subject, predicate) — every candidate meets every true
    object of its pair in one bucket, so no corpus-sized set is ever
    broadcast."""
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    def distinct_parts(batch: pd.DataFrame) -> pd.DataFrame:
        e = pd.unique(
            np.concatenate(
                [batch["subject"].astype(str).to_numpy(dtype=object),
                 batch["object"].astype(str).to_numpy(dtype=object)]
            )
        )
        p = pd.unique(batch["predicate"].astype(str).to_numpy(dtype=object))
        n = max(len(e), len(p))
        return pd.DataFrame(
            {"entity": np.concatenate([e, np.array([None] * (n - len(e)),
                                                   dtype=object)]),
             "predicate": np.concatenate([p, np.array([None] * (n - len(p)),
                                                      dtype=object)])}
        )

    vocab = collect_small(
        triples_ds.map_batches(distinct_parts, batch_format="pandas"),
        ["entity", "predicate"],
    )
    ents = sorted({e for e in vocab["entity"] if e is not None})
    preds = sorted({p for p in vocab["predicate"] if p is not None})
    ent_idx = {e: np.int64(i) for i, e in enumerate(ents)}
    pred_idx = {p: np.int64(i) for i, p in enumerate(preds)}
    ent_arr = np.array(ents, dtype=object)
    n_ents = np.int64(len(ents))

    def draw(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str)
        p = batch["predicate"].astype(str)
        o = batch["object"].astype(str)
        si = s.map(ent_idx).to_numpy(dtype=np.int64)
        pi = p.map(pred_idx).to_numpy(dtype=np.int64)
        oi = o.map(ent_idx).to_numpy(dtype=np.int64)
        h = ((si * _NEG_A + pi * _NEG_B + oi * _NEG_C) % _NEG_MOD) % n_ents
        return pd.DataFrame(
            {"subject": s.to_numpy(), "predicate": p.to_numpy(),
             "object": o.to_numpy(), "neg_object": ent_arr[h]}
        ).drop_duplicates()

    candidates = triples_ds.map_batches(draw, batch_format="pandas")

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"subject": pd.Series([], dtype=str),
                 "predicate": pd.Series([], dtype=str),
                 "object": pd.Series([], dtype=str),
                 "neg_object": pd.Series([], dtype=str),
                 "is_true_negative": pd.Series([], dtype=np.int64)}
            )
        b = bucket.drop_duplicates(["subject", "predicate", "object",
                                    "neg_object"])
        truth = b.groupby(["subject", "predicate"], sort=False)["object"].agg(
            set
        )
        keys = pd.MultiIndex.from_arrays([b["subject"], b["predicate"]])
        flags = np.fromiter(
            (neg in truth.loc[key]
             for key, neg in zip(keys, b["neg_object"])),
            dtype=bool, count=len(b),
        )
        # is_true_negative = 1 when the draw is a GENUINE negative
        # (not a true triple) — the rows a trainer keeps
        return b.assign(is_true_negative=(~flags).astype(np.int64))

    return grouped_aggregate(candidates, ["subject", "predicate"], combine)


def qa_pairs(triples_ds):
    """QA training pairs from the constructed KG — the reference's
    knowledge-graph outputs feed QA-style training material
    (compendium/training sinks, ``orchestrator.py`` artifact surface);
    this is that sink over the triple stream: every (s, p, o) yields a
    FORWARD question ('What does "s" p?' → o) and an INVERSE one
    ('Which entity p "o"?' → s), deduplicated across the corpus with a
    support count (how many extracted triples back the answer) — the
    weak-supervision weight a QA fine-tune filters on.

    Shape: pure map to QA rows, then ONE (direction, question, answer)
    two-phase count — wire rows bounded by distinct QA pairs per
    batch. Value-gated against the reference-produced golden triples
    (the SQL twin replays the identical string construction)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    keys = ["direction", "question", "answer"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str)
        p = batch["predicate"].astype(str)
        o = batch["object"].astype(str)
        fwd = pd.DataFrame(
            {"direction": "forward",
             "question": 'What does "' + s + '" ' + p + "?",
             "answer": o}
        )
        inv = pd.DataFrame(
            {"direction": "inverse",
             "question": "Which entity " + p + ' "' + o + '"?',
             "answer": s}
        )
        df = pd.concat([fwd, inv], ignore_index=True)
        return (
            df.groupby(keys, sort=False)
            .size()
            .reset_index(name="n_support")
            .astype({"n_support": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["n_support"]
            .sum()
            .astype({"n_support": np.int64})
        )

    return grouped_aggregate(triples_ds, keys, combine, partial=partial)
