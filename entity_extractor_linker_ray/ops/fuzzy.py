"""Blocked fuzzy matching: per-document nearest neighbor by edit
distance within a blocking key — the classic entity-resolution /
record-linkage primitive (and the fuzzy cousin of the reference's
0.85-similarity predicate dedup, ``functions/dedup.py`` D5).

All-pairs edit distance over a corpus is O(n²·L²) — never viable.
The standard mitigation is BLOCKING: compare only within small
partitions keyed by cheap attributes (here ``(lang, source)``), the
same partitioning assumption every production record-linkage system
documents. Block size is the scale contract: with B docs per block the
work is O(B² · L²) per block, embarrassingly parallel across blocks
via one bucketed exchange (``ops/shuffle.grouped_aggregate``). Choose
blocking keys so B stays in the thousands; a skewed block shows up as
one straggling bucket, not a wrong answer.

The distance kernel is a BATCHED Levenshtein: one dynamic-programming
sweep vectorized across every pair in the block simultaneously (numpy
row recurrence over the L×L grid — ~L² vector ops on a
pairs-wide lane, no per-pair Python). Distances are computed over
UTF-8 BYTES of the first ``PREFIX_CHARS`` characters, exactly matching
DuckDB's byte-semantics ``levenshtein()`` (``'héllo' → 'hello'`` is
distance 2 there), so the oracle is bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops.readers import read_split

PREFIX_CHARS = 30
# pairs are evaluated in fixed-size chunks so the DP working set
# (chunk × (PREFIX_BYTES+1) int32 lanes) stays ~100 MB regardless of
# block size
PAIR_CHUNK = 200_000


def batched_levenshtein(a_texts: np.ndarray, b_texts: np.ndarray) -> np.ndarray:
    """Edit distance for each (a_texts[i], b_texts[i]) pair, DP over
    UTF-8 bytes, vectorized across pairs. Returns int64 distances."""
    n = len(a_texts)
    if n == 0:
        return np.array([], dtype=np.int64)

    def encode(texts):
        bs = [t.encode("utf-8") for t in texts]
        lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
        width = max(1, int(lens.max()))
        arr = np.zeros((len(bs), width), dtype=np.uint8)
        for i, b in enumerate(bs):
            arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        return arr, lens

    A, la = encode(a_texts)
    B, lb = encode(b_texts)
    max_a, max_b = A.shape[1], B.shape[1]

    # classic row recurrence: cur[j] = min(prev[j]+1, cur[j-1]+1,
    # prev[j-1]+(A[i-1]!=B[j-1])); rows beyond a pair's own la never
    # get captured, columns beyond lb never influence captured cells,
    # so zero-padding is harmless
    out = np.empty(n, dtype=np.int64)
    done_zero = la == 0
    out[done_zero] = lb[done_zero]
    prev = np.broadcast_to(
        np.arange(max_b + 1, dtype=np.int32), (n, max_b + 1)
    ).copy()
    rows = np.arange(n)
    for i in range(1, max_a + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B).astype(np.int32)
        dele = prev[:, 1:] + 1
        best = np.minimum(sub, dele)
        # the insert transition depends on cur[j-1] — a left-to-right
        # scan, but over columns (≤ PREFIX bytes), each step vectorized
        # across all pairs
        for j in range(1, max_b + 1):
            cur[:, j] = np.minimum(best[:, j - 1], cur[:, j - 1] + 1)
        hit = la == i
        if hit.any():
            out[hit] = cur[rows[hit], lb[hit]]
        prev = cur
    return out


def fuzzy_neighbors(sf_dir: str, prefix_chars: int = PREFIX_CHARS):
    """For every document, its minimum-edit-distance neighbor (and the
    distance) among documents sharing its ``(lang, source)`` block,
    compared on the first ``prefix_chars`` characters; ties broken by
    smallest ``other_id``. Singleton blocks emit nothing — exactly the
    oracle's self-join semantics."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "text"]
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "lang": batch["lang"].to_numpy(),
             "source": batch["source"].to_numpy(),
             "prefix": batch["text"].fillna("").str.slice(0, prefix_chars).to_numpy()}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, blk in bucket.groupby(["lang", "source"], sort=False):
            m = len(blk)
            if m < 2:
                continue
            ids = blk["doc_id"].to_numpy(dtype=np.int64)
            prefixes = blk["prefix"].to_numpy(dtype=object)
            iu, ju = np.triu_indices(m, k=1)
            dists = np.empty(len(iu), dtype=np.int64)
            for s in range(0, len(iu), PAIR_CHUNK):
                e = s + PAIR_CHUNK
                dists[s:e] = batched_levenshtein(
                    prefixes[iu[s:e]], prefixes[ju[s:e]]
                )
            both = pd.DataFrame(
                {"doc_id": np.concatenate([ids[iu], ids[ju]]),
                 "other_id": np.concatenate([ids[ju], ids[iu]]),
                 "dist": np.concatenate([dists, dists])}
            )
            best = both.sort_values(
                ["doc_id", "dist", "other_id"], kind="stable"
            ).drop_duplicates("doc_id", keep="first")
            frames.append(best)
        if not frames:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64),
                 "other_id": np.array([], dtype=np.int64),
                 "dist": np.array([], dtype=np.int64)}
            )
        return pd.concat(frames, ignore_index=True)

    prepped = docs.map_batches(prep, batch_format="pandas")
    return grouped_aggregate(prepped, ["lang", "source"], combine)


def fuzzy_neighbors_oracle(prefix_chars: int = PREFIX_CHARS) -> str:
    return f"""
WITH p AS (
  SELECT doc_id, lang, source,
         substr(COALESCE(text, ''), 1, {prefix_chars}) AS prefix
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS other_id,
         levenshtein(a.prefix, b.prefix) AS dist
  FROM p a JOIN p b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
),
best AS (
  SELECT doc_id, other_id, dist,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY dist ASC, other_id ASC) AS rn
  FROM pairs
)
SELECT doc_id, other_id, CAST(dist AS BIGINT) AS dist FROM best WHERE rn = 1
"""


FUZZY_CLUSTER_DIST = 14


def fuzzy_dup_clusters(sf_dir: str, max_dist: int = FUZZY_CLUSTER_DIST,
                       prefix_chars: int = PREFIX_CHARS):
    """Fuzzy duplicate families — the transitive closure of "edit
    distance ≤ ``max_dist`` on the first ``prefix_chars`` chars within
    a (lang, source) block": every document that fuzzy-matches at least
    one other gets a (doc_id, cluster_id) row, cluster_id = min doc_id
    of its family. This is record-linkage canonicalization (the fuzzy
    analog of the exact/n-gram `dedup_clusters`): near-miss rewrites
    chain A~B~C into one family even when A and C differ by more than
    the threshold.

    Shape: threshold pairs are enumerated inside the same blocked
    kernel as :func:`fuzzy_neighbors` (the block-size contract is the
    scale assumption, documented there), then the generic hash-min
    label propagation (`ops/graph_algos.min_label_components`) closes
    the transitive chain — per-round message volume is 2·|pairs|,
    never all-pairs."""
    from entity_extractor_linker_ray.ops.graph_algos import (
        min_label_components,
    )
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "text"],
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "lang": batch["lang"].to_numpy(),
             "source": batch["source"].to_numpy(),
             "prefix": batch["text"].fillna("").str.slice(
                 0, prefix_chars).to_numpy()}
        )

    def pairs_in_block(bucket: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, blk in bucket.groupby(["lang", "source"], sort=False):
            m = len(blk)
            if m < 2:
                continue
            ids = blk["doc_id"].to_numpy(dtype=np.int64)
            prefixes = blk["prefix"].to_numpy(dtype=object)
            iu, ju = np.triu_indices(m, k=1)
            dists = np.empty(len(iu), dtype=np.int64)
            for s in range(0, len(iu), PAIR_CHUNK):
                e = s + PAIR_CHUNK
                dists[s:e] = batched_levenshtein(
                    prefixes[iu[s:e]], prefixes[ju[s:e]]
                )
            keep = dists <= max_dist
            if not keep.any():
                continue
            frames.append(
                pd.DataFrame({"s": ids[iu[keep]], "d": ids[ju[keep]]})
            )
        if not frames:
            return pd.DataFrame(
                {"s": np.array([], dtype=np.int64),
                 "d": np.array([], dtype=np.int64)}
            )
        return pd.concat(frames, ignore_index=True)

    pairs = grouped_aggregate(
        docs.map_batches(prep, batch_format="pandas"),
        ["lang", "source"], pairs_in_block,
    )

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["s"].to_numpy(dtype=np.int64)
        d = batch["d"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([s, d]), "d": np.concatenate([d, s])}
        )

    labels = min_label_components(
        pairs.map_batches(both_dirs, batch_format="pandas")
    )

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["node"].to_numpy(dtype=np.int64),
             "cluster_id": batch["label"].to_numpy(dtype=np.int64)}
        )

    return labels.map_batches(rename, batch_format="pandas")


def fuzzy_dup_clusters_oracle(max_dist: int = FUZZY_CLUSTER_DIST,
                              prefix_chars: int = PREFIX_CHARS) -> str:
    return f"""
WITH RECURSIVE p AS (
  SELECT doc_id, lang, source,
         substr(COALESCE(text, ''), 1, {prefix_chars}) AS prefix
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM p a JOIN p b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE levenshtein(a.prefix, b.prefix) <= {max_dist}
),
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
