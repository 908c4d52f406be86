"""Incremental (CDC-style) knowledge-graph maintenance.

At 100 TB a graph is never rebuilt from scratch: new document batches
arrive and must fold into the existing node/edge tables without
re-reading the processed corpus. The enabling property is that the
graph aggregates are MERGEABLE — their partial states combine by pure
addition/union:

* nodes  (name, type, n_docs): per-partition distinct-doc counts are
  exact partials because document partitions are disjoint, so merge is
  an integer sum;
* edges  (subject, predicate, object, weight): triple counts, merge is
  a sum.

:func:`node_partials` / :func:`edge_partials` produce those states
from any documents Dataset (one streaming pass, per-batch combine
first — the exchange moves entity-cardinality partials, never
mentions); :func:`merge_node_partials` / :func:`merge_edge_partials`
fold ANY number of states — freshly computed or reloaded from a
parquet checkpoint — into the final tables with one small aggregate.
``tests/test_incremental.py`` asserts build(A) ⊕ build(B) ==
build(A ∪ B) including a write-to-parquet/reload round trip, and the
driver gates ``kg_nodes_incremental`` / ``kg_edges_incremental``
against the SAME DuckDB oracles as the from-scratch builds — the
incremental path must be value-identical, not merely similar.

Semantics (mention/triple rules) are shared with
``pipelines/simple_kg`` so the oracles transfer unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Sum

from entity_extractor_linker_ray.pipelines.simple_kg import (
    _mentions_batch,
    _read_documents,
    _triples_from_mentions,
)


def partition_documents(sf_dir: str, modulus: int, residue: int):
    """A deterministic horizontal slice of the documents table
    (``doc_id % modulus == residue``) standing in for one arriving
    batch; in production this is simply the new files of the day."""

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["doc_id"] % modulus == residue]

    return _read_documents(sf_dir).map_batches(keep, batch_format="pandas")


def node_partials(docs):
    """(name, type, n_docs) partial counts for one document batch.
    Distinct-doc counting is exact per batch (every doc lives in one
    batch) and partitions are disjoint, so partials sum exactly."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = _mentions_batch(batch)
        return (
            m.groupby(["name", "type"], sort=False)
            .agg(n_docs=("doc_id", "nunique"))
            .reset_index()
            .astype({"n_docs": np.int64})
        )

    return docs.map_batches(partial, batch_format="pandas")


def edge_partials(docs):
    """(subject, predicate, object, weight) partial counts — the
    mention scan and pairing are fused so one document's mentions never
    straddle a batch boundary."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = _triples_from_mentions(_mentions_batch(batch))
        return (
            t.groupby(["subject", "predicate", "object"], sort=False)
            .size()
            .reset_index(name="weight")
            .astype({"weight": np.int64})
        )

    return docs.map_batches(partial, batch_format="pandas")


def merge_node_partials(states):
    """Fold node partial states (freshly built or reloaded from a
    checkpoint) into the final node table — one union of the small
    partial datasets, one aggregate."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)
    return merged.groupby(["name", "type"]).aggregate(Sum("n_docs", alias_name="n_docs"))


def merge_edge_partials(states):
    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)
    return merged.groupby(["subject", "predicate", "object"]).aggregate(
        Sum("weight", alias_name="weight")
    )


def kg_nodes_incremental(sf_dir: str, partitions: int = 2):
    """Full node table built the incremental way: each document slice
    contributes an independent partial state; states merge by
    addition. Value-identical to ``simple_kg.kg_nodes`` (same DuckDB
    oracle gates both)."""
    states = [
        node_partials(partition_documents(sf_dir, partitions, r))
        for r in range(partitions)
    ]
    return merge_node_partials(states)


def kg_edges_incremental(sf_dir: str, partitions: int = 2):
    states = [
        edge_partials(partition_documents(sf_dir, partitions, r))
        for r in range(partitions)
    ]
    return merge_edge_partials(states)
