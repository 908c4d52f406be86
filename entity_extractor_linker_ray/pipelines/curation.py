"""End-to-end training-data curation: the dedup / quality / sampling
operators composed into ONE pipeline — what a user actually runs over
a raw corpus before training:

    exact dedup (128-bit content hash, min-doc_id survivor)
      → near-dup cluster removal (n-gram Jaccard pairs → connected
        components; only each cluster's representative survives)
      → quality filter (token count >= 5, repetition <= 50%)
      → deterministic stratified sample (per-language hash rule)

Scale shape: the three decision streams (exact-dedup survivors,
cluster drop-list, per-doc attributes with batch-local quality
kernels) are tagged and fed through a single bucketed shuffle on
hash(doc_id) — one exchange decides every document's fate with one
vectorized kernel per bucket. No step materializes the corpus on the
driver; the cluster drop-list is the only iterative input and is
bounded by the near-dup population. The ENTIRE composition has a
DuckDB oracle (`CURATE_ORACLE`), so the final survivor set is
value-hash-gated, not just each stage in isolation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops.sampling import _KNUTH, _MOD, DEFAULT_FRAC, DEFAULT_FRACS

MIN_TOKENS = 5
MAX_REPETITION_PCT = 50


def curate_documents(sf_dir: str):
    import ray.data as rd
    import pyarrow as pa

    from entity_extractor_linker_ray.ops.dedupe import exact_dedup
    from entity_extractor_linker_ray.ops.graph_algos import duplicate_clusters_cached
    from entity_extractor_linker_ray.ops.readers import read_split
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def tag_survivor(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        return pd.DataFrame(
            {"key": batch["doc_id"].to_numpy(dtype=np.int64),
             "lang": np.full(n, "", dtype=object),
             "n_chars": np.zeros(n, dtype=np.int64),
             "n_tokens": np.zeros(n, dtype=np.int64),
             "repetition_pct": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}
        )

    def tag_drop(batch: pd.DataFrame) -> pd.DataFrame:
        dropped = batch[batch["cluster_id"] != batch["doc_id"]]
        n = len(dropped)
        return pd.DataFrame(
            {"key": dropped["doc_id"].to_numpy(dtype=np.int64),
             "lang": np.full(n, "", dtype=object),
             "n_chars": np.zeros(n, dtype=np.int64),
             "n_tokens": np.zeros(n, dtype=np.int64),
             "repetition_pct": np.zeros(n, dtype=np.int64),
             "side": np.ones(n, dtype=np.int64)}
        )

    def tag_attrs(batch: pd.DataFrame) -> pd.DataFrame:
        # batch-local quality kernel; token rule matches the oracle's
        # string_split(text, ' ') exactly
        n_tokens = []
        rep = []
        for t in batch["text"].fillna(""):
            toks = t.split(" ") if t else []
            total = len(toks)
            n_tokens.append(total)
            rep.append(100 - (100 * len(set(toks))) // total if total else 0)
        n = len(batch)
        return pd.DataFrame(
            {"key": batch["doc_id"].to_numpy(dtype=np.int64),
             "lang": batch["lang"].astype(str).to_numpy(),
             "n_chars": batch["n_chars"].to_numpy(dtype=np.int64),
             "n_tokens": np.asarray(n_tokens, dtype=np.int64),
             "repetition_pct": np.asarray(rep, dtype=np.int64),
             "side": np.full(n, 2, dtype=np.int64)}
        )

    survivors = exact_dedup(sf_dir).map_batches(tag_survivor, batch_format="pandas")
    drops = duplicate_clusters_cached(sf_dir).map_batches(tag_drop, batch_format="pandas")
    attrs = read_split(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    ).map_batches(tag_attrs, batch_format="pandas")

    thresholds = {
        lang: np.int64(frac * float(_MOD)) for lang, frac in DEFAULT_FRACS.items()
    }
    default_threshold = np.int64(DEFAULT_FRAC * float(_MOD))

    def decide(bucket: pd.DataFrame) -> pd.DataFrame:
        surv = bucket.loc[bucket["side"] == 0, "key"].to_numpy(dtype=np.int64)
        drop = bucket.loc[bucket["side"] == 1, "key"].to_numpy(dtype=np.int64)
        a = bucket[bucket["side"] == 2]
        keep = a["key"].isin(surv) & ~a["key"].isin(drop)
        a = a[keep
              & (a["n_tokens"] >= MIN_TOKENS)
              & (a["repetition_pct"] <= MAX_REPETITION_PCT)]
        if a.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "lang": pd.Series([], dtype=object),
                 "n_chars": pd.Series([], dtype=np.int64)}
            )
        ids = a["key"].to_numpy(dtype=np.int64)
        h = (ids * _KNUTH) % _MOD
        th = a["lang"].map(thresholds).fillna(default_threshold).to_numpy(dtype=np.int64)
        sampled = a[h < th]
        return pd.DataFrame(
            {"doc_id": sampled["key"].to_numpy(dtype=np.int64),
             "lang": sampled["lang"].astype(str).to_numpy(),
             "n_chars": sampled["n_chars"].to_numpy(dtype=np.int64)}
        )

    result = grouped_aggregate(
        survivors.union(drops).union(attrs), ["key"], decide
    )
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64())]
    )
    return result.union(rd.from_arrow(out_schema.empty_table()))


def curate_oracle() -> str:
    from entity_extractor_linker_ray.ops.dedupe import NGRAM_JACCARD_ORACLE

    return f"""
WITH RECURSIVE pairs AS ({NGRAM_JACCARD_ORACLE.strip()}),
cedges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
cnodes AS (SELECT DISTINCT s AS node FROM cedges),
reach(node, label) AS (
  SELECT node, node FROM cnodes
  UNION
  SELECT e.d, r.label FROM reach r JOIN cedges e ON e.s = r.node
  WHERE r.label < e.d
),
clusters AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
exact_survivors AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(COALESCE(text,''))
),
neardup_survivors AS (
  SELECT s.doc_id FROM exact_survivors s
  LEFT JOIN clusters c ON c.doc_id = s.doc_id
  WHERE c.doc_id IS NULL OR c.cluster_id = s.doc_id
),
quality AS (
  SELECT d.doc_id, d.lang, d.n_chars,
         CASE WHEN length(COALESCE(d.text,'')) = 0 THEN 0
              ELSE len(string_split(d.text, ' ')) END AS n_tokens,
         CASE WHEN length(COALESCE(d.text,'')) = 0 THEN 0
              ELSE 100 - (100 * len(list_distinct(string_split(d.text, ' ')))
                          // len(string_split(d.text, ' '))) END AS repetition_pct
  FROM documents d JOIN neardup_survivors s ON s.doc_id = d.doc_id
)
SELECT doc_id, lang, n_chars FROM quality
WHERE n_tokens >= {MIN_TOKENS} AND repetition_pct <= {MAX_REPETITION_PCT}
  AND (doc_id * 2654435761) % 4294967296 <
      CAST((CASE WHEN lang = 'en' THEN 0.5
                 WHEN lang = 'de' THEN 0.25
                 ELSE 0.125 END) * 4294967296 AS BIGINT)
"""
