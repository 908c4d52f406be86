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

from ray.data.aggregate import Sum

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
    shuffle, pre-combined per batch)."""
    partials = triples_ds.select_columns(
        ["subject_id", "predicate", "object_id", "inferred"]
    ).map_batches(_edge_partials, batch_format="pandas")
    return (
        partials.groupby(["subject_id", "predicate", "object_id", "inferred"])
        .aggregate(Sum("weight", alias_name="weight"))
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
    """G2: count by entity type (``orchestrator.py:488-492``)."""
    partials = entities_ds.select_columns(["type"]).map_batches(
        lambda b: b.groupby("type", sort=False).size().reset_index(name="n"),
        batch_format="pandas",
    )
    return partials.groupby("type").aggregate(Sum("n", alias_name="n"))


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

    parts = entities_ds.select_columns(
        ["wikipedia_url", "wikidata_id", "dbpedia_uri"]
    ).map_batches(partial, batch_format="pandas").to_pandas()
    totals = parts.sum()
    total = int(totals["total"]) or 0
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
    partials = entities_ds.select_columns([column]).map_batches(
        _explode_counts(column, out_key, drop_maintenance), batch_format="pyarrow"
    )
    counts = partials.groupby(out_key).aggregate(Sum("n", alias_name="n"))
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
