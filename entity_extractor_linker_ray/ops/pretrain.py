"""Pretraining-corpus preparation operators: eval-set decontamination,
repetition-quality signals, sequence packing, and language rebalancing.

These are the four standard corpus-shaping steps an LLM training-data
pipeline runs between dedup and tokenization (decontamination and
repetition filtering per the GPT-3 / Gopher data recipes; packing and
mixture rebalancing per every major pretraining run). Each one is
expressed Ray-Data-first and oracle-verified against DuckDB:

* :func:`decontaminate` — flag training documents that share any word
  ``n``-gram with a held-out evaluation split. The eval side is
  benchmark-suite-sized BY DEFINITION (fixed eval sets, independent of
  corpus scale), so it is the broadcast build side: its distinct grams
  are collected once and shipped to every map task, and the train scan
  is a zero-shuffle ``map_batches`` membership probe. A corpus-sized
  contamination source would instead use the bucketed inverted-index
  join in ``ops/dedupe._inverted_pair_stats``.
* :func:`repetition_signals` — per-document duplicate-bigram fraction
  and top-word fraction (the Gopher repetition filters, adapted to the
  newline-free documents table). Row-local, zero shuffle.
* :func:`pack_sequences` — concat-and-chunk packing: documents are
  laid end-to-end in ``doc_id`` order and cut into fixed-capacity
  bins; each doc gets its global token offset, bin id and offset
  within the bin. A global ordered prefix sum over a distributed
  table is computed as a two-level scan (per-range sums → tiny driver
  prefix → in-range vectorized cumsum), never a serial pass.
* :func:`lang_rebalance` — deterministic down-sampling to a uniform
  language mixture: per-language keep thresholds are exact integer
  ratios of the language counts, the keep decision is the same Knuth
  multiplicative hash ``ops/sampling`` uses, so the sample is
  reproducible, machine-count-independent, and bit-identical to SQL.

Reference analogy: the reference pipeline curates per-conversation
text before extraction (``entityextractor/core/api.py`` mode flags);
these operators are the corpus-level analogue this engine adds for
100 TB training-data preparation.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops.readers import read_split

# same Knuth multiplicative hash as ops/sampling.py — one portable
# sampling primitive across the repo
_KNUTH = np.int64(2654435761)

# ASCII letters only — the DuckDB oracles test '[a-zA-Z]', so the
# Python kernels must not widen to Unicode isalpha().
_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
_MOD_BITS = 32
_MOD = np.int64(1) << np.int64(_MOD_BITS)

DECON_NGRAM = 5
EVAL_MOD = 10
EVAL_REM = 7
PACK_CAPACITY = 256
PACK_RANGE_WIDTH = 4096


def _split_words(texts) -> tuple[list[list[str]], np.ndarray]:
    """Split each text on single spaces (exactly SQL ``string_split``:
    ``''`` → ``['']``), returning per-doc word lists + lengths."""
    words = [(t or "").split(" ") for t in texts]
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    return words, lens


def _word_ngram_frame(doc_ids: np.ndarray, texts, n: int) -> pd.DataFrame:
    """All word ``n``-grams of a batch as (doc_id, gram) rows, grams as
    space-joined strings (identical to the oracle's
    ``array_to_string(words[i:i+n-1], ' ')``). Vectorized: one flat
    word array, doc boundaries enforced by comparing the repeated
    doc-index at window start vs window end, gram strings built by
    ``n`` elementwise object-array concats — no per-doc Python loop."""
    words, lens = _split_words(texts)
    if len(words) == 0 or int(lens.sum()) < n:
        return pd.DataFrame(
            {"doc_id": np.array([], dtype=np.int64),
             "gram": np.array([], dtype=object)}
        )
    flat = np.array(list(chain.from_iterable(words)), dtype=object)
    owner = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    # window [s, s+n-1] stays inside one doc iff both ends share an owner
    valid = owner[: len(flat) - n + 1] == owner[n - 1 :]
    gram = flat[: len(flat) - n + 1].copy()
    for j in range(1, n):
        gram = gram + " "
        gram = gram + flat[j : len(flat) - n + 1 + j]
    return pd.DataFrame(
        {"doc_id": doc_ids[owner[: len(flat) - n + 1][valid]],
         "gram": gram[valid]}
    )


def decontaminate(sf_dir: str, n: int = DECON_NGRAM):
    """Per-training-document eval-overlap counts: ``n_grams`` distinct
    word ``n``-grams, ``n_hit`` of them appearing anywhere in the
    held-out split (``doc_id % 10 == 7``), and a ``contaminated``
    flag — the GPT-3-style n-gram decontamination check.

    Shape at 100 TB: the eval grams are built with one filtered scan
    and collected to the driver — legitimate because eval suites are
    fixed-size regardless of corpus scale (this is the same
    small-side-broadcast rule as the KB snapshot in ``state/kb.py``).
    The training scan is then a single zero-shuffle ``map_batches``
    whose per-batch work is a vectorized hash-set membership probe
    (``pd.Series.isin`` — a C hash join against the broadcast set)."""
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def eval_gram_batch(batch: pd.DataFrame):
        import pyarrow as pa

        sub = batch[batch["doc_id"].to_numpy() % EVAL_MOD == EVAL_REM]
        grams = _word_ngram_frame(
            sub["doc_id"].to_numpy(dtype=np.int64), sub["text"].tolist(), n
        )
        # explicit Arrow string type so an all-train (empty) batch does
        # not produce a null-typed column that breaks block unification
        return pa.table(
            {"gram": pa.array(grams["gram"].drop_duplicates(), type=pa.string())}
        )

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    eval_grams = set(
        collect_small(
            read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
            .map_batches(eval_gram_batch, batch_format="pandas"),
            ["gram"],
        )["gram"]
    )

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        train = batch[batch["doc_id"].to_numpy() % EVAL_MOD != EVAL_REM]
        ids = train["doc_id"].to_numpy(dtype=np.int64)
        grams = _word_ngram_frame(ids, train["text"].tolist(), n)
        distinct = grams.drop_duplicates()
        hit = distinct["gram"].isin(eval_grams)
        stats = (
            pd.DataFrame({"doc_id": distinct["doc_id"], "hit": hit.to_numpy()})
            .groupby("doc_id", sort=False)
            .agg(n_grams=("hit", "size"), n_hit=("hit", "sum"))
            .reset_index()
        )
        out = pd.DataFrame({"doc_id": ids}).merge(stats, on="doc_id", how="left")
        n_grams = out["n_grams"].fillna(0).to_numpy(dtype=np.int64)
        n_hit = out["n_hit"].fillna(0).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": ids,
             "n_grams": n_grams,
             "n_hit": n_hit,
             "contaminated": (n_hit > 0).astype(np.int64)}
        )

    return docs.map_batches(kernel, batch_format="pandas")


DECONTAMINATE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS words FROM documents
),
g AS (
  SELECT doc_id,
         array_to_string(words[CAST(i AS BIGINT):CAST(i AS BIGINT)+{DECON_NGRAM - 1}],
                         ' ') AS gram
  FROM w, unnest(range(1, len(words) - {DECON_NGRAM - 2})) AS t(i)
  WHERE len(words) >= {DECON_NGRAM}
),
eval_grams AS (SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
train AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}),
stats AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM train t LEFT JOIN eval_grams e USING (gram)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(CASE WHEN COALESCE(s.n_hit, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM documents d LEFT JOIN stats s USING (doc_id)
WHERE d.doc_id % {EVAL_MOD} <> {EVAL_REM}
"""


def repetition_signals(sf_dir: str):
    """Gopher-style per-document repetition features: word count,
    duplicate-bigram fraction (``(total − distinct) / total`` word
    bigrams) and most-frequent-word share, with the top word itself
    (ties → lexicographically smallest, as the oracle's
    ``ORDER BY cnt DESC, word ASC``). Both ratios are single IEEE-754
    divisions of small exact integers, so the floats hash-match SQL
    bit-for-bit. Row-local — zero shuffle; one vectorized pass per
    batch (flat token frame → two C-level groupbys), no per-doc
    Python loop."""
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame):
        import pyarrow as pa

        if len(batch) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_words": pa.array([], pa.int64()),
                 "n_bigrams": pa.array([], pa.int64()),
                 "dup_bigram_ratio": pa.array([], pa.float64()),
                 "top_word": pa.array([], pa.string()),
                 "top_word_cnt": pa.array([], pa.int64()),
                 "top_word_ratio": pa.array([], pa.float64())}
            )
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        words, lens = _split_words(batch["text"].tolist())
        flat = np.array(list(chain.from_iterable(words)), dtype=object)
        owner = np.repeat(np.arange(len(words), dtype=np.int64), lens)
        tok = pd.DataFrame({"row": owner, "word": flat})

        counts = tok.groupby(["row", "word"], sort=False).size().reset_index(name="cnt")
        counts = counts.sort_values(
            ["row", "cnt", "word"], ascending=[True, False, True], kind="stable"
        )
        top = counts.drop_duplicates("row", keep="first").set_index("row")

        bigrams = _word_ngram_frame(np.arange(len(words), dtype=np.int64),
                                    batch["text"].tolist(), 2)
        n_bigrams = np.maximum(lens - 1, 0)
        n_distinct = np.zeros(len(words), dtype=np.int64)
        if len(bigrams):
            dist = bigrams.drop_duplicates().groupby("doc_id", sort=False).size()
            n_distinct[dist.index.to_numpy()] = dist.to_numpy()

        rows = np.arange(len(words), dtype=np.int64)
        top_cnt = top["cnt"].reindex(rows).to_numpy(dtype=np.int64)
        top_word = top["word"].reindex(rows).to_numpy(dtype=object)
        dup_ratio = np.where(
            n_bigrams > 0,
            (n_bigrams - n_distinct).astype(np.float64)
            / np.maximum(n_bigrams, 1).astype(np.float64),
            0.0,
        )
        return pd.DataFrame(
            {"doc_id": ids,
             "n_words": lens,
             "n_bigrams": n_bigrams,
             "dup_bigram_ratio": dup_ratio,
             "top_word": top_word,
             "top_word_cnt": top_cnt,
             "top_word_ratio": top_cnt.astype(np.float64) / lens.astype(np.float64)}
        )

    return docs.map_batches(kernel, batch_format="pandas")


REPETITION_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS words FROM documents
),
tok AS (
  SELECT doc_id, words[CAST(i AS BIGINT)] AS word
  FROM w, unnest(range(1, len(words) + 1)) AS t(i)
),
wc AS (SELECT doc_id, word, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
top AS (
  SELECT doc_id, word AS top_word, cnt AS top_cnt
  FROM (SELECT doc_id, word, cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, word ASC) AS rn
        FROM wc)
  WHERE rn = 1
),
bg AS (
  SELECT doc_id,
         array_to_string(words[CAST(i AS BIGINT):CAST(i AS BIGINT)+1], ' ') AS gram
  FROM w, unnest(range(1, len(words))) AS t(i)
  WHERE len(words) >= 2
),
bstats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
  FROM bg GROUP BY 1
)
SELECT d.doc_id,
       CAST(len(string_split(COALESCE(d.text, ''), ' ')) AS BIGINT) AS n_words,
       CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CASE WHEN COALESCE(b.n_bigrams, 0) > 0
            THEN CAST(b.n_bigrams - b.n_distinct AS DOUBLE) / b.n_bigrams
            ELSE 0.0 END AS dup_bigram_ratio,
       t.top_word,
       CAST(t.top_cnt AS BIGINT) AS top_word_cnt,
       CAST(t.top_cnt AS DOUBLE)
         / len(string_split(COALESCE(d.text, ''), ' ')) AS top_word_ratio
FROM documents d
JOIN top t USING (doc_id)
LEFT JOIN bstats b USING (doc_id)
"""


def pack_sequences(sf_dir: str, capacity: int = PACK_CAPACITY,
                   range_width: int = PACK_RANGE_WIDTH):
    """Concat-and-chunk sequence packing: documents laid end-to-end in
    ``doc_id`` order and cut into fixed ``capacity``-token bins; each
    document reports its global token offset (``cum_before``), its bin
    id and its offset within the bin — the layout table a packed
    pretraining dataloader materializes.

    The global ordered prefix sum is the distributed-scan pattern, not
    a serial driver pass: (1) the tiny per-doc token-count table is
    computed once and pinned (16 bytes/doc — at 10^10 docs this is the
    one working set an iterative/multi-pass op may hold, the same call
    ``ops/graph_algos`` makes); (2) per-coarse-range sums (range =
    ``doc_id // range_width``) aggregate to one small frame whose
    exclusive prefix the driver computes in microseconds; (3) a
    bucketed shuffle on the range key finishes with an in-range
    vectorized sort + cumsum. No stage ever sees more than one range's
    rows plus a scalar offset."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        _, lens = _split_words(batch["text"].tolist())
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "n_tokens": lens, "_range": ids // np.int64(range_width)}
        )

    tok = docs.map_batches(count_tokens, batch_format="pandas").materialize()
    return _pack_from_tokens(tok, capacity)


def _pack_from_tokens(tok, capacity: int = PACK_CAPACITY):
    """Distributed ordered prefix scan + binning over a pinned
    (doc_id, n_tokens, _range) token table — the pack machinery,
    shared by :func:`pack_sequences` and the composed
    :func:`pretrain_corpus`. ``tok`` must be materialized (it is read
    twice: range sums, then the in-range cumsum)."""
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    def range_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("_range", sort=False)["n_tokens"].sum().reset_index()
        )

    range_sums = (
        collect_small(tok.map_batches(range_partial, batch_format="pandas"),
                      ["_range", "n_tokens"])
        .groupby("_range", sort=True)["n_tokens"]
        .sum()
    )
    # exclusive prefix over the (tiny) ordered range sums; shipped by
    # closure — a few bytes per range, the cheap path for small state
    # (actor pools / ray.put only pay off for MB-scale payloads)
    off = {
        int(r): int(v)
        for r, v in zip(range_sums.index, range_sums.cumsum() - range_sums)
    }

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        ordered = bucket.sort_values(["_range", "doc_id"], kind="stable")
        n = ordered["n_tokens"].to_numpy(dtype=np.int64)
        cum_in_range = (
            ordered.groupby("_range", sort=False)["n_tokens"].cumsum().to_numpy(
                dtype=np.int64
            )
            - n
        )
        base = ordered["_range"].map(off).to_numpy(dtype=np.int64)
        cum_before = base + cum_in_range
        return pd.DataFrame(
            {"doc_id": ordered["doc_id"].to_numpy(dtype=np.int64),
             "n_tokens": n,
             "cum_before": cum_before,
             "bin_id": cum_before // np.int64(capacity),
             "bin_offset": cum_before % np.int64(capacity)}
        )

    return grouped_aggregate(tok, ["_range"], combine)


def pack_sequences_oracle(capacity: int = PACK_CAPACITY) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM tok
)
SELECT doc_id, n_tokens, cum_before,
       cum_before // {capacity} AS bin_id,
       cum_before % {capacity} AS bin_offset
FROM c
"""


def lang_rebalance(sf_dir: str):
    """Deterministic down-sample to a uniform language mixture: every
    language keeps ``min_count / count_lang`` of its documents, chosen
    by the repo's Knuth-hash rule, so the output is an unbiased,
    reproducible rebalanced corpus (the mixture-reweighting step of a
    pretraining data recipe).

    Per-language counts are a tiny aggregate (|langs| ≪ rows: partial
    per-batch counts, final sum on the driver); the thresholds are
    EXACT integer arithmetic (``(min_cnt << 32) // cnt`` — arbitrary-
    precision in Python, HUGEINT in the oracle), so no float rounding
    can flip a keep decision; the filter itself is one zero-shuffle
    ``map_batches``."""
    docs = read_split(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("lang", sort=False).size().reset_index(name="c")

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    counts = (
        collect_small(docs.map_batches(partial, batch_format="pandas"),
                      ["lang", "c"])
        .groupby("lang")["c"]
        .sum()
    )
    # empty corpus: nothing to rebalance — thresholds empty, kernel
    # passes empty batches through untouched
    mc = int(counts.min()) if len(counts) else 0
    thresholds = {lang: (mc << _MOD_BITS) // int(c) for lang, c in counts.items()}

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        h = (ids * _KNUTH) % _MOD
        thr = batch["lang"].map(thresholds).to_numpy(dtype=np.int64)
        kept = batch[h < thr]
        return pd.DataFrame(
            {"doc_id": kept["doc_id"].to_numpy(dtype=np.int64),
             "lang": kept["lang"].to_numpy(),
             "source": kept["source"].to_numpy(),
             "n_chars": kept["n_chars"].to_numpy(dtype=np.int64)}
        )

    return docs.map_batches(kernel, batch_format="pandas")


LANG_REBALANCE_ORACLE = """
WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
m AS (SELECT MIN(c) AS mc FROM cnt),
thr AS (SELECT lang, CAST((CAST(mc AS HUGEINT) * 4294967296) // c AS BIGINT)
               AS threshold
        FROM cnt, m)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d JOIN thr t USING (lang)
WHERE (d.doc_id * 2654435761) % 4294967296 < t.threshold
"""

def pretrain_corpus(sf_dir: str, capacity: int = PACK_CAPACITY,
                    range_width: int = PACK_RANGE_WIDTH):
    """The COMPOSED pretraining-data recipe — the four corpus-shaping
    steps chained the way a real run chains them, with the full
    composition value-hash-gated against one chained-CTE oracle
    (the second end-to-end pipeline beside ``pipelines/curation``):

      1. train split (``doc_id % 10 != 7``; the eval split is the
         contamination source, never trained on),
      2. decontamination — drop train docs sharing any word 5-gram
         with the eval split (broadcast eval-gram set, zero-shuffle
         probe),
      3. repetition filter — drop docs whose duplicate-bigram count
         exceeds 20% of bigrams (EXACT integer rule:
         ``(total−distinct)·5 ≤ total``; <2-word docs pass vacuously),
      4. language rebalance over the SURVIVORS (per-lang exact-integer
         keep thresholds on the Knuth-hash rule — thresholds differ
         from standalone ``lang_rebalance`` because the counts are
         post-filter, which is the point of composing),
      5. sequence packing of the kept docs in ``doc_id`` order
         (distributed two-level prefix scan, shared machinery
         ``_pack_from_tokens``).

    Steps 1-3 are ONE decision scan emitting a compact (doc_id, lang,
    n_tokens) table; step 4 is a tiny count collect + a second
    zero-shuffle filter; only the pack's one bucketed exchange touches
    a shuffle. Token counts use the ``string_split(' ')`` convention
    (0 for empty text) so the oracle mirrors them exactly."""
    from entity_extractor_linker_ray.ops.shuffle import collect_small

    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def eval_gram_batch(batch: pd.DataFrame):
        import pyarrow as pa

        sub = batch[batch["doc_id"].to_numpy() % EVAL_MOD == EVAL_REM]
        grams = _word_ngram_frame(
            sub["doc_id"].to_numpy(dtype=np.int64), sub["text"].tolist(),
            DECON_NGRAM,
        )
        return pa.table(
            {"gram": pa.array(grams["gram"].drop_duplicates(), type=pa.string())}
        )

    eval_grams = set(
        collect_small(
            docs.map_batches(eval_gram_batch, batch_format="pandas"), ["gram"]
        )["gram"]
    )

    def decide(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        train = batch[ids % EVAL_MOD != EVAL_REM]
        t_ids = train["doc_id"].to_numpy(dtype=np.int64)
        texts = [t or "" for t in train["text"].tolist()]
        grams = _word_ngram_frame(t_ids, texts, DECON_NGRAM).drop_duplicates()
        dirty = set(grams.loc[grams["gram"].isin(eval_grams), "doc_id"])
        rows = []
        for doc_id, lang, t in zip(t_ids, train["lang"].tolist(), texts):
            if int(doc_id) in dirty:
                continue
            words = t.split(" ") if t else []
            if len(words) >= 2:
                total_bg = len(words) - 1
                dist_bg = len(set(zip(words, words[1:])))
                if (total_bg - dist_bg) * 5 > total_bg:
                    continue
            rows.append((doc_id, lang, len(words)))
        return pd.DataFrame(
            rows, columns=["doc_id", "lang", "n_tokens"]
        ).astype({"doc_id": np.int64, "n_tokens": np.int64})

    pre = docs.map_batches(decide, batch_format="pandas").materialize()

    def lang_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("lang", sort=False).size().reset_index(name="c")

    counts = (
        collect_small(pre.map_batches(lang_partial, batch_format="pandas"),
                      ["lang", "c"])
        .groupby("lang")["c"]
        .sum()
    )
    mc = int(counts.min()) if len(counts) else 0
    thresholds = {lang: (mc << _MOD_BITS) // int(c) for lang, c in counts.items()}

    def rebalance(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        h = (ids * _KNUTH) % _MOD
        thr = batch["lang"].map(thresholds).to_numpy(dtype=np.int64)
        kept = batch[h < thr]
        out = kept[["doc_id", "n_tokens"]].copy()
        out["_range"] = out["doc_id"].to_numpy(dtype=np.int64) // np.int64(range_width)
        return out.astype({"doc_id": np.int64, "n_tokens": np.int64,
                           "_range": np.int64})

    tok = pre.map_batches(rebalance, batch_format="pandas").materialize()
    return _pack_from_tokens(tok, capacity)


def pretrain_corpus_oracle(capacity: int = PACK_CAPACITY) -> str:
    n = DECON_NGRAM
    return f"""
WITH allw AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS words FROM documents
),
g AS (
  SELECT doc_id,
         array_to_string(words[CAST(i AS BIGINT):CAST(i AS BIGINT)+{n - 1}],
                         ' ') AS gram
  FROM allw, unnest(range(1, len(words) - {n - 2})) AS t(i)
  WHERE len(words) >= {n}
),
eval_grams AS (SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
dirty AS (
  SELECT DISTINCT g.doc_id FROM g JOIN eval_grams e USING (gram)
  WHERE g.doc_id % {EVAL_MOD} <> {EVAL_REM}
),
w AS (
  SELECT d.doc_id, d.lang, COALESCE(d.text, '') AS text,
         string_split(COALESCE(d.text, ''), ' ') AS words
  FROM documents d
  WHERE d.doc_id % {EVAL_MOD} <> {EVAL_REM}
    AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
),
bg AS (
  SELECT doc_id,
         array_to_string(words[CAST(i AS BIGINT):CAST(i AS BIGINT)+1], ' ') AS b
  FROM w, unnest(range(1, len(words))) AS t(i)
  WHERE len(words) >= 2
),
rep AS (
  SELECT doc_id, COUNT(*) AS total_bg, COUNT(DISTINCT b) AS dist_bg
  FROM bg GROUP BY 1
),
pre AS (
  SELECT w.doc_id, w.lang,
         CASE WHEN length(w.text) = 0 THEN 0 ELSE len(w.words) END AS n_tokens
  FROM w LEFT JOIN rep USING (doc_id)
  WHERE rep.total_bg IS NULL
     OR (rep.total_bg - rep.dist_bg) * 5 <= rep.total_bg
),
cnt AS (SELECT lang, COUNT(*) AS c FROM pre GROUP BY 1),
m AS (SELECT MIN(c) AS mc FROM cnt),
thr AS (SELECT lang, CAST((CAST(mc AS HUGEINT) * 4294967296) // c AS BIGINT)
               AS threshold
        FROM cnt, m),
kept AS (
  SELECT pre.doc_id, pre.n_tokens
  FROM pre JOIN thr USING (lang)
  WHERE (pre.doc_id * 2654435761) % 4294967296 < thr.threshold
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM kept
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, cum_before,
       cum_before // {capacity} AS bin_id,
       cum_before % {capacity} AS bin_offset
FROM c
"""


def train_val_split(sf_dir: str, val_pct: int = 10):
    """Deterministic train/validation assignment — the split every
    training run needs BEFORE packing/rebalancing, done the only way
    that survives 100 TB: a fixed multiplicative hash of ``doc_id``
    (the same Knuth rule ``ops/sampling`` uses), never an RNG. The
    assignment is therefore reproducible across runs, independent of
    partitioning/machine count, stable when the corpus is re-sharded,
    and a later incremental ingest assigns new docs without touching
    old ones. Zero shuffle: one embarrassingly-parallel ``map_batches``
    over a column-pruned read. ``val_pct`` of documents (in
    expectation) land in ``val`` via ``hash % 100 < val_pct``."""
    import ray.data as rd

    knuth = np.int64(2654435761)
    mod = np.int64(1) << np.int64(32)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        h = (ids * knuth) % mod
        return pd.DataFrame(
            {"doc_id": ids,
             "lang": batch["lang"].astype(str).to_numpy(),
             "split": np.where(h % 100 < val_pct, "val", "train")}
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(assign, batch_format="pandas")


def train_val_split_oracle(val_pct: int = 10) -> str:
    return f"""
SELECT doc_id, lang,
       CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < {val_pct}
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def leakage_safe_split(sf_dir: str, val_pct: int = 10):
    """Near-dup-AWARE train/validation split — the leakage-safe variant
    of :func:`train_val_split`. A plain per-doc hash split lets two
    near-identical documents land on opposite sides, leaking validation
    content into training. Here every document in a VERIFIED
    near-duplicate component (exact n-gram Jaccard pairs ->
    min-label connected components, `ops/graph_algos.duplicate_clusters`)
    is assigned by the hash of its CLUSTER representative (the
    component's min doc_id), so a whole duplicate family moves as one
    unit; documents in no pair fall back to their own doc_id — the
    identical Knuth rule, so the assignment stays reproducible,
    shard-independent, and incremental-ingest-stable.

    Shape: the cluster map covers only pair-involved docs (small), but
    at 100 TB it is still corpus-proportional in the worst case, so the
    attach is ONE bucketed tagged-union join on hash(doc_id) — no
    broadcast of either side."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.graph_algos import (
        duplicate_clusters_cached,
    )
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    clusters = duplicate_clusters_cached(sf_dir)

    def doc_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "lang": batch["lang"].astype(str).to_numpy(),
             "cluster_id": np.full(len(batch), -1, dtype=np.int64),
             "_side": np.zeros(len(batch), dtype=np.int64)}
        )

    def cluster_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "lang": np.full(len(batch), "", dtype=object),
             "cluster_id": batch["cluster_id"].to_numpy(dtype=np.int64),
             "_side": np.ones(len(batch), dtype=np.int64)}
        )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(doc_rows, batch_format="pandas")
    unioned = docs.union(clusters.map_batches(cluster_rows, batch_format="pandas"))

    knuth = np.int64(2654435761)
    mod = np.int64(1) << np.int64(32)

    def assign(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[bucket["_side"] == 0][["doc_id", "lang"]]
        c = bucket[bucket["_side"] == 1][["doc_id", "cluster_id"]]
        m = d.merge(c, on="doc_id", how="left")
        rep = m["cluster_id"].fillna(-1).to_numpy(dtype=np.int64)
        ids = m["doc_id"].to_numpy(dtype=np.int64)
        group_id = np.where(rep >= 0, rep, ids).astype(np.int64)
        h = (group_id * knuth) % mod
        return pd.DataFrame(
            {"doc_id": ids,
             "lang": m["lang"].astype(str).to_numpy(),
             "group_id": group_id,
             "split": np.where(h % 100 < val_pct, "val", "train")}
        )

    return grouped_aggregate(unioned, ["doc_id"], assign)


def leakage_safe_split_oracle(val_pct: int = 10) -> str:
    from entity_extractor_linker_ray.ops.graph_algos import (
        duplicate_clusters_oracle,
    )

    return f"""
SELECT d.doc_id, d.lang,
       COALESCE(c.cluster_id, d.doc_id) AS group_id,
       CASE WHEN ((COALESCE(c.cluster_id, d.doc_id) * 2654435761)
                  % 4294967296) % 100 < {val_pct}
            THEN 'val' ELSE 'train' END AS split
FROM documents d
LEFT JOIN ({duplicate_clusters_oracle().strip()}) c USING (doc_id)
"""


def token_budget_pick(sf_dir: str):
    """Greedy quality-ranked selection under a global token budget —
    the final corpus-sizing step of a pretraining mix: rank every
    document by a quality key (descending), walk the ranking, and keep
    documents while the cumulative token count stays within budget
    (here half the corpus's total tokens, so the op is meaningful at
    every sf). The cut is a PREFIX rule — once the running total
    crosses the budget no later document is taken — which is the
    SQL-replayable form of greedy selection (a knapsack that skips
    overflowing docs and keeps filling is order-dependent and not a
    window).

    Quality key: integer alpha-share ``alpha_ppm = alpha_chars·10⁶ //
    n_chars`` (ties broken by ``doc_id``) — self-contained, exact, and
    the same signal family as :func:`ops.textstats.quality_scores`.

    Scale shape — the :func:`pipelines.relational.events_running_total`
    three-step distributed scan, keyed by a RANGE prefix of the order
    key (the ``alpha_ppm // 10⁴`` band, ~100 bands): (1) per-band token
    totals via a two-phase aggregate (band-bounded, driver-safe);
    (2) exclusive prefix over the DESCENDING bands on the driver (tiny)
    plus the global budget scalar; (3) one bucketed exchange on the
    band key; each bucket sorts its bands' rows (quality desc, doc_id
    asc), adds the band offset to a vectorized cumsum, and emits the
    selected flag. No global sort, nothing doc-proportional on the
    driver."""
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    BAND = 10_000

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        lowered = text.str.lower()
        n_chars = text.str.len().to_numpy(dtype=np.int64)
        alpha = lowered.str.count(r"[a-z]").to_numpy(dtype=np.int64)
        words = np.where(
            n_chars > 0,
            text.str.count(" ").to_numpy(dtype=np.int64) + 1,
            np.int64(0),
        ).astype(np.int64)
        ppm = (alpha * 1_000_000) // np.maximum(n_chars, 1)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "alpha_ppm": ppm,
             "band": ppm // BAND,
             "n_words": words}
        )

    rows = docs.map_batches(keyed, batch_format="pandas")

    def band_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("band", sort=False)["n_words"].sum().reset_index(
                name="total"
            )
        )

    def band_final(bucket: pd.DataFrame) -> pd.DataFrame:
        return band_partial(bucket.rename(columns={"total": "n_words"}))

    band_totals = collect_small(
        grouped_aggregate(
            rows.map_batches(
                lambda b: b[["band", "n_words"]], batch_format="pandas"
            ),
            ["band"], band_final, partial=band_partial, num_partitions=8,
        ),
        ["band", "total"],
    ).sort_values("band", ascending=False)  # rank order = quality DESC

    totals = band_totals["total"].to_numpy(dtype=np.int64)
    budget = int(totals.sum()) // 2
    offsets = dict(
        zip(band_totals["band"].tolist(),
            (np.cumsum(totals) - totals).tolist())
    )

    def scan_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.sort_values(["alpha_ppm", "doc_id"],
                                ascending=[False, True], kind="stable")
        cum = (
            df.groupby("band", sort=False)["n_words"].cumsum().to_numpy(
                np.int64
            )
            + df["band"].map(offsets).to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(dtype=np.int64),
             "alpha_ppm": df["alpha_ppm"].to_numpy(dtype=np.int64),
             "n_words": df["n_words"].to_numpy(dtype=np.int64),
             "cum_words": cum,
             "selected": (cum <= budget).astype(np.int64)}
        )

    return grouped_aggregate(rows, ["band"], scan_bucket)


TOKEN_BUDGET_PICK_ORACLE = """
WITH q AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0 THEN 0
              ELSE len(string_split(text, ' ')) END AS n_words,
         (length(regexp_replace(lower(COALESCE(text, '')), '[^a-z]', '',
                                'g')) * 1000000)
           // greatest(length(COALESCE(text, '')), 1) AS alpha_ppm
  FROM documents
), c AS (
  SELECT doc_id, alpha_ppm, n_words,
         CAST(SUM(n_words) OVER (ORDER BY alpha_ppm DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_words,
         (SELECT SUM(n_words) // 2 FROM q) AS budget
  FROM q
)
SELECT doc_id, CAST(alpha_ppm AS BIGINT) AS alpha_ppm,
       CAST(n_words AS BIGINT) AS n_words, cum_words,
       CAST(CASE WHEN cum_words <= budget THEN 1 ELSE 0 END AS BIGINT)
         AS selected
FROM c
"""


def mixture_weights(sf_dir: str):
    """Training-mix recipe table: per (source, lang), document count,
    Gopher-rule survivors (the `ops/textstats.gopher_quality_flags`
    rule set applied inline), and the normalized sampling weight in
    ppm — ``weight_ppm = n_pass·10⁶ // total_pass`` — i.e. the share
    of the curated mix each feed contributes if sampling follows
    quality-gated supply. The artifact a mixture dataloader consumes.

    Shape: one scan with per-batch (source, lang) partials, one tiny
    domain-bounded exchange (sources × langs), and the normalization
    happens on the driver over that bounded table."""
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    STOP = frozenset(
        "the a an and or of to in is are was were be been it this that"
        .split()
    )
    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["source", "lang", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for source, lang, t in zip(batch["source"], batch["lang"],
                                   batch["text"].fillna("")):
            toks = t.split(" ") if t else []
            n = len(toks)
            sum_chars = sum(len(w) for w in toks)
            # ASCII letter test, matching the oracle's regexp_matches
            # '[a-zA-Z]' — Unicode isalpha() would diverge on non-ASCII.
            alpha = sum(
                1 for w in toks if not _ASCII_LETTERS.isdisjoint(w)
            )
            stop = sum(1 for w in toks if w in STOP)
            ok = (50 <= n <= 100_000 and 3 * n <= sum_chars <= 10 * n
                  and 10 * alpha >= 8 * n and stop >= 2)
            rows.append((str(source), str(lang), 1, int(ok)))
        df = pd.DataFrame(rows, columns=["source", "lang", "n_docs",
                                         "n_pass"])
        return (
            df.groupby(["source", "lang"], sort=False, as_index=False)
            .sum()
            .astype({"n_docs": np.int64, "n_pass": np.int64})
        )

    agg = collect_small(
        grouped_aggregate(
            docs, ["source", "lang"],
            lambda b: b.groupby(["source", "lang"], sort=False,
                                as_index=False)[["n_docs", "n_pass"]]
            .sum()
            .astype({"n_docs": np.int64, "n_pass": np.int64}),
            partial=partial, num_partitions=8,
        ),
        ["source", "lang", "n_docs", "n_pass"],
    )
    total = max(int(agg["n_pass"].sum()), 1)
    agg["weight_ppm"] = (
        agg["n_pass"].to_numpy(dtype=np.int64) * 1_000_000
    ) // total
    return agg.astype(
        {c: np.int64 for c in ("n_docs", "n_pass", "weight_ppm")}
    ).reset_index(drop=True)


MIXTURE_WEIGHTS_ORACLE = """
WITH s AS (
  SELECT source, lang,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS toks
  FROM documents
), f AS (
  SELECT source, lang,
         CASE WHEN len(toks) BETWEEN 50 AND 100000
               AND 3 * len(toks) <= length(array_to_string(toks, ''))
               AND length(array_to_string(toks, '')) <= 10 * len(toks)
               AND 10 * len(list_filter(toks,
                       t -> regexp_matches(t, '[a-zA-Z]')))
                   >= 8 * len(toks)
               AND len(list_filter(toks, t -> list_contains(
                   ['the','a','an','and','or','of','to','in','is','are',
                    'was','were','be','been','it','this','that'], t))) >= 2
              THEN 1 ELSE 0 END AS ok
  FROM s
), agg AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(ok) AS BIGINT) AS n_pass
  FROM f GROUP BY 1, 2
), tot AS (SELECT GREATEST(SUM(n_pass), 1) AS t FROM agg)
SELECT source, lang, n_docs, n_pass,
       CAST((n_pass * 1000000) // t AS BIGINT) AS weight_ppm
FROM agg CROSS JOIN tot
"""
