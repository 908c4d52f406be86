"""Deterministic sampling and per-group selection for training-data
curation: stratified down-sampling (keep a per-language fraction of the
corpus) and per-group top-k (keep the best N documents per stratum).

Both are built to hold at 100 TB:

* ``stratified_sample`` is a pure ``map_batches`` filter — zero
  shuffle, embarrassingly parallel, and reproducible because the keep
  decision is a fixed multiplicative hash of ``doc_id`` (Knuth's
  2654435761 mod 2^32), not an RNG. The same rule is expressible in
  ANSI SQL, so the sample is oracle-verifiable bit-for-bit.
* ``top_docs_per_lang`` does per-batch partial top-k (each batch
  surrenders at most k rows per language) before the single small
  shuffle — the classic partial/final split, so the wide step moves
  O(k × langs × blocks) rows, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Knuth multiplicative hash; doc_id * KNUTH mod 2^32 is uniform enough
# for sampling and trivially reproducible in SQL.
_KNUTH = np.int64(2654435761)
_MOD = np.int64(1) << np.int64(32)

# per-language keep fractions (powers of two so frac * 2^32 is exact in
# both float64 and SQL DOUBLE arithmetic)
DEFAULT_FRACS: dict[str, float] = {"en": 0.5, "de": 0.25}
DEFAULT_FRAC = 0.125


def stratified_sample(sf_dir: str, fracs: dict[str, float] | None = None,
                      default_frac: float = DEFAULT_FRAC):
    """Deterministic per-language sample of the documents table."""
    import ray.data as rd

    fracs = DEFAULT_FRACS if fracs is None else fracs

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    lang_thresholds = {
        lang: np.int64(frac * float(_MOD)) for lang, frac in fracs.items()
    }
    default_threshold = np.int64(default_frac * float(_MOD))

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        h = (ids * _KNUTH) % _MOD
        thresholds = (
            batch["lang"]
            .map(lang_thresholds)
            .fillna(default_threshold)
            .to_numpy(dtype=np.int64)
        )
        kept = batch[h < thresholds]
        return pd.DataFrame(
            {
                "doc_id": kept["doc_id"].to_numpy(dtype=np.int64),
                "lang": kept["lang"].to_numpy(),
                "source": kept["source"].to_numpy(),
                "n_chars": kept["n_chars"].to_numpy(dtype=np.int64),
            }
        )

    return docs.map_batches(kernel, batch_format="pandas")


STRATIFIED_SAMPLE_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (doc_id * 2654435761) % 4294967296 <
      CAST((CASE WHEN lang = 'en' THEN 0.5
                 WHEN lang = 'de' THEN 0.25
                 ELSE 0.125 END) * 4294967296 AS BIGINT)
"""


def top_docs_per_lang(sf_dir: str, k: int = 5):
    """The k longest documents per language (``n_chars`` desc, doc_id
    asc tie-break) — the 'keep the best N per stratum' curation shape.

    Partial top-k inside every batch bounds what the shuffle moves;
    the final per-language selection runs over at most k × n_blocks
    rows per language."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def head_k(frame: pd.DataFrame) -> pd.DataFrame:
        ordered = frame.sort_values(
            ["lang", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        kept = ordered.groupby("lang", sort=False).head(k)
        out = kept.reset_index(drop=True)
        out["rank"] = out.groupby("lang", sort=False).cumcount() + 1
        return out.astype({"doc_id": np.int64, "n_chars": np.int64, "rank": np.int64})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return head_k(batch[["doc_id", "lang", "n_chars"]]).drop(columns=["rank"])

    return grouped_aggregate(docs, ["lang"], head_k, partial=partial)


TOP_DOCS_PER_LANG_ORACLE = """
SELECT doc_id, lang, n_chars, rank FROM (
  SELECT doc_id, lang, n_chars,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
  FROM documents
) WHERE rank <= {k}
"""


def uniform_fixed_sample(sf_dir: str, n: int = 100):
    """Exactly-``n`` uniform sample of the documents table, without an
    RNG and without a full shuffle: every doc gets a deterministic
    pseudo-random PRIORITY (the same Knuth multiplicative hash the rate
    sampler uses) and the sample is the global ``n`` smallest
    priorities — the hash-priority formulation of reservoir sampling,
    which distributes as partial top-n per batch (each batch surrenders
    ≤ n rows) + one tiny final sort over ≤ n·blocks rows. Reproducible
    run-to-run, machine-count-independent, and SQL-mirrorable
    (``ORDER BY hash LIMIT n``), unlike an actual streaming reservoir.
    Ties are impossible while doc_id is unique (the map is injective on
    [0, 2^32)), but doc_id stays the secondary key for belt and braces.
    """
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        out = pd.DataFrame(
            {"priority": (ids * _KNUTH) % _MOD,
             "doc_id": ids,
             "lang": batch["lang"].to_numpy(),
             "n_chars": batch["n_chars"].to_numpy(dtype=np.int64)}
        )
        return out.sort_values(["priority", "doc_id"]).head(n)

    pruned = docs.map_batches(partial, batch_format="pandas")
    return pruned.sort(["priority", "doc_id"]).limit(n)


UNIFORM_FIXED_SAMPLE_ORACLE = """
SELECT (doc_id * 2654435761) % 4294967296 AS priority,
       doc_id, lang, n_chars
FROM documents
ORDER BY priority ASC, doc_id ASC
LIMIT {n}
"""


def weighted_sample(sf_dir: str, n: int = 100):
    """Exactly-``n`` weighted sample, probability ∝ document length
    (the PPS — probability-proportional-to-size — sampling a
    token-budgeted training mix needs): each doc's priority is
    ``hash(doc_id) / n_chars``, so doubling a doc's length halves its
    priority and doubles its selection odds; the sample is the global
    ``n`` smallest priorities. Same partial-top-n-per-batch shape as
    :func:`uniform_fixed_sample` — each batch surrenders ≤ n rows, one
    tiny final sort. The priority is an int/int division: numpy float64
    and SQL DOUBLE are both IEEE-754, so the ordering (and therefore
    the sample) is bit-identical to the oracle; doc_id breaks the
    (practically impossible) exact-ratio ties."""
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        chars = batch["n_chars"].to_numpy(dtype=np.int64)
        pri = ((ids * _KNUTH) % _MOD).astype(np.float64) / np.maximum(
            chars, 1
        ).astype(np.float64)
        out = pd.DataFrame(
            {"priority": pri, "doc_id": ids,
             "lang": batch["lang"].to_numpy(),
             "n_chars": chars}
        )
        return out.sort_values(["priority", "doc_id"]).head(n)

    pruned = docs.map_batches(partial, batch_format="pandas")
    return pruned.sort(["priority", "doc_id"]).limit(n)


WEIGHTED_SAMPLE_ORACLE = """
SELECT CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
         / greatest(n_chars, 1) AS priority,
       doc_id, lang, n_chars
FROM documents
ORDER BY priority ASC, doc_id ASC
LIMIT {n}
"""


def hash_sample_per_group(sf_dir: str, k: int = 3):
    """Exactly-``k`` deterministic pseudo-random documents per
    language — the stratified cousin of :func:`uniform_fixed_sample`
    (per-group reservoir sampling via hash priorities instead of an
    RNG): every doc gets the Knuth multiplicative-hash priority, and
    each language keeps its ``k`` smallest.

    RNG-free reservoirs are the only reservoir that is reproducible,
    machine-count-independent, AND SQL-mirrorable. Distribution is the
    partial-top-k-per-stratum shape of ``top_docs_per_lang``: each
    batch surrenders at most ``k`` rows per language it contains, the
    bucketed shuffle co-locates a language's survivors, and the final
    selection sorts ≤ k x n_blocks rows per language. Priority ties
    are impossible while doc_id < 2^32 (injective map); doc_id stays
    the secondary sort key regardless."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def head_k(frame: pd.DataFrame) -> pd.DataFrame:
        ordered = frame.sort_values(["lang", "priority", "doc_id"], kind="stable")
        kept = ordered.groupby("lang", sort=False).head(k).reset_index(drop=True)
        kept["sample_rank"] = kept.groupby("lang", sort=False).cumcount() + 1
        return kept.astype({"doc_id": np.int64, "priority": np.int64,
                            "sample_rank": np.int64})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        frame = pd.DataFrame(
            {"lang": batch["lang"].to_numpy(),
             "priority": (ids * _KNUTH) % _MOD,
             "doc_id": ids}
        )
        return head_k(frame).drop(columns=["sample_rank"])

    return grouped_aggregate(docs, ["lang"], head_k, partial=partial)


HASH_SAMPLE_PER_GROUP_ORACLE = """
SELECT lang, priority, doc_id, sample_rank FROM (
  SELECT lang, (doc_id * 2654435761) % 4294967296 AS priority, doc_id,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY (doc_id * 2654435761) % 4294967296,
                                          doc_id) AS BIGINT) AS sample_rank
  FROM documents
) WHERE sample_rank <= {k}
"""
