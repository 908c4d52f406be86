"""Iterative graph algorithms as Ray Data pipelines.

:func:`duplicate_clusters` — connected components over the verified
near-duplicate pairs (`ops/dedupe.py:ngram_jaccard_pairs`), i.e. the
dedup CLUSTER assignment a curation pipeline actually needs (keep one
doc per component, not one per pair). Hash-min label propagation:
every node starts labelled with itself; each round every node takes
the min of its own label and its neighbors' labels; fixpoint in
O(component diameter) rounds.

Scale shape: the pair list is tiny relative to the corpus (only docs
with a near-dup appear), so the edge set and label frontier are
materialized once and iterated — each round is two bucketed two-phase
shuffles (`ops/shuffle.grouped_aggregate`): a hash join of labels to
edge sources, then a min-combine per node. Convergence is detected
from the SUM of labels: hash-min labels are monotonically
non-increasing, so an unchanged sum is exactly "no label changed" —
one cheap scalar aggregate per round instead of an old-vs-new join.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def _labels_min(bucket: pd.DataFrame) -> pd.DataFrame:
    return (
        bucket.groupby("node", sort=False)["label"]
        .min()
        .reset_index()
        .astype({"node": np.int64, "label": np.int64})
    )


def duplicate_clusters(sf_dir: str, max_iters: int = 25):
    """(doc_id, cluster_id) for every document in >=1 verified
    near-dup pair; cluster_id = min doc_id of its component."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.dedupe import ngram_jaccard_pairs
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    pairs = ngram_jaccard_pairs(sf_dir).select_columns(["doc_a", "doc_b"]).materialize()

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy(dtype=np.int64)
        b = batch["doc_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([a, b]), "d": np.concatenate([b, a])}
        )

    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["s"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": s, "label": s})

    labels = grouped_aggregate(
        edges.map_batches(init_labels, batch_format="pandas"), ["node"], _labels_min,
        num_partitions=16,
    ).materialize()
    prev_sum = labels.sum("label") or 0

    def tag_labels(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["node"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"key": n, "node": n,
             "label": batch["label"].to_numpy(dtype=np.int64),
             "side": np.zeros(len(n), dtype=np.int64)}
        )

    def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["s"].to_numpy(dtype=np.int64),
             "node": batch["d"].to_numpy(dtype=np.int64),
             "label": np.full(len(batch), -1, dtype=np.int64),
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    tagged_edges = edges.map_batches(tag_edges, batch_format="pandas").materialize()

    def send_msgs(bucket: pd.DataFrame) -> pd.DataFrame:
        own = bucket[bucket["side"] == 0][["key", "node", "label"]]
        e = bucket[bucket["side"] == 1][["key", "node"]]
        if e.empty:
            return own[["node", "label"]]
        msgs = e.merge(
            own[["key", "label"]].rename(columns={"label": "src_label"}), on="key"
        )
        out = pd.concat(
            [own[["node", "label"]],
             msgs[["node", "src_label"]].rename(columns={"src_label": "label"})],
            ignore_index=True,
        )
        return out.astype({"node": np.int64, "label": np.int64})

    for it in range(max_iters):
        unioned = labels.map_batches(tag_labels, batch_format="pandas").union(
            tagged_edges
        )
        # the frontier is pair-involved docs only — small; fewer buckets
        # cut the per-round barrier cost
        candidates = grouped_aggregate(unioned, ["key"], send_msgs, num_partitions=16)
        labels = grouped_aggregate(candidates, ["node"], _labels_min, num_partitions=16).materialize()
        new_sum = labels.sum("label") or 0
        if new_sum == prev_sum:
            logger.info("duplicate_clusters converged after %d rounds", it + 1)
            break
        prev_sum = new_sum

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["node"].to_numpy(dtype=np.int64),
             "cluster_id": batch["label"].to_numpy(dtype=np.int64)}
        )

    out_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    return labels.map_batches(rename, batch_format="pandas").union(
        rd.from_arrow(out_schema.empty_table())
    )


def duplicate_clusters_oracle() -> str:
    from entity_extractor_linker_ray.ops.dedupe import NGRAM_JACCARD_ORACLE

    return f"""
WITH RECURSIVE pairs AS ({NGRAM_JACCARD_ORACLE.strip()}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d AS node, r.label
  FROM reach r JOIN edges e ON e.s = r.node
  WHERE r.label < e.d
)
SELECT node AS doc_id, min(label) AS cluster_id
FROM reach GROUP BY node
"""
