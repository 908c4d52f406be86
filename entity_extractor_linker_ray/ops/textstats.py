"""Text-analysis operators over the ``documents`` table: token
counting, document statistics, quality scoring, language ID,
fingerprinting. All vectorized ``map_batches`` kernels; the only
shuffle is the small per-source aggregate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data.aggregate import Sum

from entity_extractor_linker_ray.ops import memo as _memo
from entity_extractor_linker_ray.ops.readers import read_split

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that".split()
)

# ASCII letters only — the DuckDB oracles test '[a-zA-Z]', so the
# Python kernels must not widen to Unicode isalpha().
_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)

# Tiny character-frequency profiles for the n-gram-free language
# heuristic (deterministic; a stand-in for fasttext-style LID at the
# same pipeline position).
_LANG_MARKERS = {
    "en": frozenset(["the", "and", "of", "is"]),
    "de": frozenset(["der", "die", "das", "und", "ist"]),
    "es": frozenset(["el", "la", "los", "es", "y"]),
    "fr": frozenset(["le", "la", "les", "et", "est"]),
}


def doc_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-document counting stats. Token rule shared with the SQL
    oracle: tokens = spaces + 1 on the raw text (documents are
    space-separated word streams), 0 for empty text."""
    text = batch["text"].fillna("")
    n_chars = text.str.len().to_numpy(dtype=np.int64)
    n_spaces = text.str.count(" ").to_numpy(dtype=np.int64)
    n_tokens = np.where(n_chars == 0, 0, n_spaces + 1).astype(np.int64)
    n_distinct = np.array(
        [len(set(t.split(" "))) if t else 0 for t in text], dtype=np.int64
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_distinct_tokens": n_distinct,
        }
    )


def doc_stats(sf_dir: str):
    import ray.data as rd

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(doc_stats_batch, batch_format="pandas")


def token_totals(sf_dir: str):
    """Corpus token totals per source — two-phase aggregate."""
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        stats = doc_stats_batch(batch)
        stats["source"] = batch["source"].to_numpy()
        out = stats.groupby("source", sort=False).agg(
            n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum")
        ).reset_index()
        return out.astype({"n_docs": np.int64, "total_tokens": np.int64})

    partials = docs.map_batches(partial, batch_format="pandas")
    return partials.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_tokens", alias_name="total_tokens"),
    )


def quality_scores(sf_dir: str):
    """Deterministic quality heuristics (length / repetition /
    stopword-rate), integer-scaled so the oracle hash is exact.

    ``repetition_pct`` = 100 - 100*distinct/total (rounded down);
    ``stopword_pct``   = 100*stopword_tokens/total (rounded down).
    """
    import ray.data as rd

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        rows = []
        for doc_id, t in zip(batch["doc_id"], text):
            tokens = t.split(" ") if t else []
            total = len(tokens)
            distinct = len(set(tokens))
            stop = sum(1 for tok in tokens if tok in _STOPWORDS)
            rows.append(
                (
                    doc_id,
                    np.int64(total),
                    np.int64(100 - (100 * distinct) // total if total else 0),
                    np.int64((100 * stop) // total if total else 0),
                )
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "n_tokens", "repetition_pct", "stopword_pct"]
        )

    return docs.map_batches(kernel, batch_format="pandas")


class LangIdModel:
    """Stopword-marker language ID as a stateful actor stage (the
    'model loaded once per actor' pattern — markers compiled in
    ``__init__``, scoring per batch)."""

    def __init__(self):
        self.markers = {lang: set(words) for lang, words in _LANG_MARKERS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in batch["text"].fillna(""):
            tokens = set(t.split(" ")[:200])
            scores = {
                lang: len(tokens & words) for lang, words in self.markers.items()
            }
            best = max(sorted(scores), key=lambda lang: scores[lang])
            preds.append(best if scores[best] > 0 else "und")
        out = batch[["doc_id"]].copy()
        out["predicted_lang"] = preds
        return out


def lang_id(sf_dir: str):
    import ray.data as rd

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(LangIdModel, batch_format="pandas", concurrency=(1, 16))


def fingerprints(sf_dir: str):
    """Content fingerprint per document: md5 hex of the raw text (the
    reference's cache-key idiom, ``utils/cache_utils.py:22``, promoted
    to a dataset operator; oracle = DuckDB ``md5()``)."""
    import ray.data as rd

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        fps = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"]
        ]
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "fingerprint": fps})

    return docs.map_batches(kernel, batch_format="pandas")


FP_K = 8  # k-gram width
FP_BASE = 257  # polynomial base (> any code point byte)
FP_MOD = 2_147_483_647  # 2^31 - 1; keeps every intermediate in int64
FP_SELECT = 16  # keep grams with h % 16 == 0 (~1/16 of positions)
_FP_POWERS = np.array(
    [pow(FP_BASE, j, FP_MOD) for j in range(FP_K)], dtype=np.int64
)


def kgram_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints (the winnowing-family
    scheme): every k-character gram gets a polynomial hash
    ``Σ code[i+j]·B^j mod M`` and the document keeps the DISTINCT
    hashes with ``h % 16 == 0`` — the classic 0-mod-p selection, so two
    documents sharing long substrings share fingerprints regardless of
    alignment. Output is (doc_id, fp) — a few selected integers per
    document, the index rows a copy-detection / containment system
    stores.

    Vectorized per batch: code points via one ``utf-32`` reinterpret
    (bit-identical to SQL ``unicode()``), all gram hashes in one
    sliding-window int64 matmul (intermediates ≤ 2^44, far from
    overflow), selection + dedup via numpy. Embarrassingly row-local —
    zero shuffle; the oracle replays the same arithmetic through
    ``unnest(range(...))``."""
    import ray.data as rd

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_fps = [], []
        for doc_id, t in zip(batch["doc_id"], batch["text"].fillna("")):
            if len(t) < FP_K:
                continue
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            windows = np.lib.stride_tricks.sliding_window_view(codes, FP_K)
            h = (windows @ _FP_POWERS) % FP_MOD
            sel = np.unique(h[h % FP_SELECT == 0])
            out_ids.append(np.full(len(sel), doc_id, dtype=np.int64))
            out_fps.append(sel)
        if not out_ids:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64),
                 "fp": np.array([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"doc_id": np.concatenate(out_ids), "fp": np.concatenate(out_fps)}
        )

    return docs.map_batches(kernel, batch_format="pandas")


def kgram_fingerprints_oracle() -> str:
    terms = " + ".join(
        f"CAST(unicode(substr(text, CAST(i + {j} AS INT), 1)) AS BIGINT) * {int(p)}"
        for j, p in enumerate(_FP_POWERS)
    )
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(range(1, greatest(length(COALESCE(text, '')) - {FP_K - 2}, 1))) AS i
  FROM documents
),
g AS (SELECT doc_id, ({terms}) % {FP_MOD} AS h FROM pos)
SELECT doc_id, CAST(h AS BIGINT) AS fp
FROM g WHERE h % {FP_SELECT} = 0 GROUP BY 1, 2
"""


def doc_length_quantiles(sf_dir: str):
    """Exact per-language length quantiles (p50/p90/p99 of ``n_chars``)
    via distributed value counting: the per-batch partial collapses
    rows to (lang, n_chars, count) — bounded by the distinct-value
    domain, not the corpus — and the per-language final walks the
    sorted cumulative counts. Matches DuckDB ``quantile_disc``
    (sorted index ``max(ceil(q*n), 1) - 1``) bit-for-bit; no sampling,
    no sketch error, and the only shuffle moves value counts.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["lang", "n_chars"], sort=False)
            .size()
            .reset_index(name="cnt")
            .astype({"n_chars": np.int64, "cnt": np.int64})
        )

    quantiles = (("p50_n_chars", 0.5), ("p90_n_chars", 0.9), ("p99_n_chars", 0.99))

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        vc = (
            bucket.groupby(["lang", "n_chars"], sort=False)["cnt"]
            .sum()
            .reset_index()
            .sort_values(["lang", "n_chars"], kind="stable")
        )
        rows = []
        for lang, g in vc.groupby("lang", sort=False):
            vals = g["n_chars"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64))
            n = int(cum[-1])
            picks = [
                vals[np.searchsorted(cum, max(int(np.ceil(q * n)), 1), side="left")]
                for _, q in quantiles
            ]
            rows.append((lang, np.int64(n), *picks))
        return pd.DataFrame(
            rows, columns=["lang", "n_docs"] + [name for name, _ in quantiles]
        ).astype({c: np.int64 for c in ("n_docs", "p50_n_chars", "p90_n_chars", "p99_n_chars")})

    return grouped_aggregate(docs, ["lang"], combine, partial=partial)


def top_terms_per_lang(sf_dir: str, k: int = 10):
    """Distributed wordcount + per-group top-k: the k most frequent
    terms per language (count desc, term asc tie-break).

    The canonical map-reduce, in its scale-correct Ray Data shape:
    per-batch partial term counts (one short row per distinct term per
    batch, never per token), an exact bucketed two-phase aggregate on
    (lang, term) — term cardinality ≈ vocabulary size, far too many
    groups for Ray's native reduce — then per-block partial top-k so
    the final per-language selection sees at most k rows per (lang,
    block). Tokenization is DuckDB's ``regexp_split_to_array(lower(t),
    '[^a-z0-9]+')`` so the oracle shingled identically."""
    import ray.data as rd

    import re

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        langs: list[str] = []
        terms: list[str] = []
        for lang, text in zip(batch["lang"], batch["text"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            langs.extend([lang] * len(toks))
            terms.extend(toks)
        flat = pd.DataFrame({"lang": langs, "term": terms})
        return (
            flat.groupby(["lang", "term"], sort=False)
            .size()
            .reset_index(name="cnt")
            .astype({"cnt": np.int64})
        )

    def sum_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["lang", "term"], sort=False)["cnt"]
            .sum()
            .reset_index()
            .astype({"cnt": np.int64})
        )

    counts = grouped_aggregate(
        docs.map_batches(partial_counts, batch_format="pandas"),
        ["lang", "term"],
        sum_counts,
    )

    def head_k(frame: pd.DataFrame) -> pd.DataFrame:
        ordered = frame.sort_values(
            ["lang", "cnt", "term"], ascending=[True, False, True], kind="stable"
        )
        kept = ordered.groupby("lang", sort=False).head(k).reset_index(drop=True)
        kept["rank"] = kept.groupby("lang", sort=False).cumcount() + 1
        return kept.astype({"cnt": np.int64, "rank": np.int64})

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return head_k(batch).drop(columns=["rank"])

    return grouped_aggregate(counts, ["lang"], head_k, partial=partial_topk,
                             num_partitions=8)


TOP_TERMS_ORACLE = """
WITH toks AS (
  SELECT lang,
         unnest(list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
), counts AS (
  SELECT lang, term, count(*) AS cnt FROM toks GROUP BY 1, 2
)
SELECT lang, term, cnt, rank FROM (
  SELECT lang, term, cnt,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY cnt DESC, term) AS BIGINT) AS rank
  FROM counts
) WHERE rank <= 10
"""


TEXT_ORACLES = {
    "doc_length_quantiles": (
        "SELECT lang, count(*) AS n_docs, "
        "CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_n_chars, "
        "CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_n_chars, "
        "CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99_n_chars "
        "FROM documents GROUP BY lang"
    ),
    "doc_stats": (
        "SELECT doc_id, length(COALESCE(text,'')) AS n_chars, "
        "CASE WHEN length(COALESCE(text,'')) = 0 THEN 0 "
        "ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS n_tokens, "
        "CASE WHEN length(COALESCE(text,'')) = 0 THEN 0 "
        "ELSE len(list_distinct(string_split(text, ' '))) END AS n_distinct_tokens "
        "FROM documents"
    ),
    "token_totals": (
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(CASE WHEN length(COALESCE(text,'')) = 0 THEN 0 "
        "ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT) AS total_tokens "
        "FROM documents GROUP BY source"
    ),
    "quality_scores": (
        "WITH s AS (SELECT doc_id, string_split(COALESCE(text,''), ' ') AS toks, "
        "length(COALESCE(text,'')) AS n FROM documents) "
        "SELECT doc_id, "
        "CASE WHEN n = 0 THEN 0 ELSE len(toks) END AS n_tokens, "
        "CASE WHEN n = 0 THEN 0 ELSE 100 - (100 * len(list_distinct(toks)) // len(toks)) END AS repetition_pct, "
        "CASE WHEN n = 0 THEN 0 ELSE (100 * len(list_filter(toks, t -> list_contains("
        "['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that'], t))) // len(toks)) END AS stopword_pct "
        "FROM s"
    ),
    "fingerprints": "SELECT doc_id, md5(COALESCE(text,'')) AS fingerprint FROM documents",
}


ROLLUP_ALL = "<all>"


def corpus_rollup(sf_dir: str):
    """GROUP BY ROLLUP(lang, source) — per-(lang, source) doc counts
    and char totals plus per-lang subtotals and a grand total, the
    OLAP rollup shape. ONE pass over the corpus computes the finest
    level (bucketed two-phase aggregate); the coarser levels re-
    aggregate the finest RESULT (cardinality = distinct key combos,
    tiny), never the base table — at 100 TB the corpus streams once
    regardless of how many rollup levels are asked for. Rolled-up
    positions use the '<all>' sentinel (COALESCE'd identically in the
    oracle) so the result is hash-comparable without NULL-ordering
    ambiguity."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["lang", "source"], sort=False)
            .agg(n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))
            .reset_index()
            .astype({"n_docs": np.int64, "total_chars": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["lang", "source"], sort=False)
            .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
            .reset_index()
            .astype({"n_docs": np.int64, "total_chars": np.int64})
        )

    fine = grouped_aggregate(docs, ["lang", "source"], combine, partial=partial,
                             num_partitions=16).materialize()

    def to_lang(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("lang", sort=False)
            .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
            .reset_index()
        )
        out["source"] = ROLLUP_ALL
        return out[["lang", "source", "n_docs", "total_chars"]].astype(
            {"n_docs": np.int64, "total_chars": np.int64}
        )

    def lang_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["lang", "source"], sort=False)
            .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
            .reset_index()
            .astype({"n_docs": np.int64, "total_chars": np.int64})
        )

    lang_level = grouped_aggregate(
        fine.map_batches(to_lang, batch_format="pandas"), ["lang", "source"],
        lang_combine, num_partitions=4,
    )

    def to_total(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"lang": [ROLLUP_ALL], "source": [ROLLUP_ALL],
             "n_docs": [np.int64(batch["n_docs"].sum())],
             "total_chars": [np.int64(batch["total_chars"].sum())]}
        )

    total = grouped_aggregate(
        fine.map_batches(to_total, batch_format="pandas"), ["lang", "source"],
        lang_combine, num_partitions=1,
    )

    return fine.union(lang_level).union(total)


CORPUS_ROLLUP_ORACLE = """
SELECT COALESCE(lang, '<all>') AS lang,
       COALESCE(source, '<all>') AS source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ROLLUP(lang, source)
"""


def _term_tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-(doc, term) exact term frequencies for one batch. Each doc
    lives in exactly one batch, so (doc_id, term) rows are globally
    unique — downstream df counts are plain row counts per term.
    Tokenization matches the oracle's ``regexp_split_to_array(lower(t),
    '[^a-z0-9]+')``."""
    import re

    split = re.compile(r"[^a-z0-9]+")
    doc_ids: list[int] = []
    terms: list[str] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        toks = [t for t in split.split((text or "").lower()) if t]
        doc_ids.extend([doc_id] * len(toks))
        terms.extend(toks)
    flat = pd.DataFrame({"doc_id": doc_ids, "term": terms})
    return (
        flat.groupby(["doc_id", "term"], sort=False)
        .size()
        .reset_index(name="tf")
        .astype({"doc_id": np.int64, "tf": np.int64})
    )


def inverted_index(sf_dir: str, min_df: int = 2):
    """Posting-list build — the index side of retrieval-augmented
    curation: per term, document frequency, total term frequency and
    the doc-id range of its postings, for terms appearing in at least
    ``min_df`` documents.

    Scale shape: the per-batch partial collapses raw tokens to one
    (doc, term, tf) row per distinct term per document, then ONE
    bucketed two-phase aggregate on ``term`` (vocabulary-cardinality —
    far beyond Ray's native reduce) sums df/tf and min/maxes the
    posting range. The corpus streams once; the shuffle moves short
    partial rows, never tokens."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tf = _term_tf_rows(batch)
        return (
            tf.groupby("term", sort=False)
            .agg(df=("doc_id", "size"), total_tf=("tf", "sum"),
                 first_doc=("doc_id", "min"), last_doc=("doc_id", "max"))
            .reset_index()
            .astype({c: np.int64 for c in ("df", "total_tf", "first_doc", "last_doc")})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby("term", sort=False)
            .agg(df=("df", "sum"), total_tf=("total_tf", "sum"),
                 first_doc=("first_doc", "min"), last_doc=("last_doc", "max"))
            .reset_index()
        )
        out = out[out["df"] >= min_df]
        return out.astype(
            {c: np.int64 for c in ("df", "total_tf", "first_doc", "last_doc")}
        )

    return grouped_aggregate(docs, ["term"], combine, partial=partial,
                             num_partitions=16)


INVERTED_INDEX_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
)
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM tf GROUP BY term HAVING count(*) >= 2
"""


def tfidf_top_terms(sf_dir: str, k: int = 3):
    """Per-document top-k terms by tf-idf — the 'most characteristic
    terms' curation feature. The score is integer-exact so the oracle
    hash is bit-stable: ``score_ppm = tf * 1_000_000 // df`` (floor
    division in both pandas and DuckDB), ranked score desc / term asc.

    Scale shape — two bucketed shuffles, no broadcast of the
    vocabulary: (1) (doc, term, tf) partials shuffle on ``term``; each
    term-bucket holds ALL postings for its terms, so df is a local
    ``transform('size')`` and the tf↔df join costs nothing; (2) the
    scored rows shuffle on ``doc_id`` for per-doc selection, with
    partial top-k inside every block (each block surrenders ≤ k rows
    per doc) so the wide step moves O(k) rows per doc per block."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tf_rows = docs.map_batches(_term_tf_rows, batch_format="pandas")

    def score_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.copy()
        # (doc_id, term) rows are globally unique -> df = postings count
        out["df"] = out.groupby("term", sort=False)["term"].transform("size")
        out["score_ppm"] = (out["tf"] * 1_000_000) // out["df"]
        return out.astype({c: np.int64 for c in ("doc_id", "tf", "df", "score_ppm")})

    scored = grouped_aggregate(tf_rows, ["term"], score_bucket, num_partitions=16)

    def head_k(frame: pd.DataFrame) -> pd.DataFrame:
        ordered = frame.sort_values(
            ["doc_id", "score_ppm", "term"], ascending=[True, False, True],
            kind="stable",
        )
        kept = ordered.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
        kept["rank"] = kept.groupby("doc_id", sort=False).cumcount() + 1
        return kept[["doc_id", "term", "tf", "df", "score_ppm", "rank"]].astype(
            {c: np.int64 for c in ("doc_id", "tf", "df", "score_ppm", "rank")}
        )

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return head_k(batch).drop(columns=["rank"])

    return grouped_aggregate(scored, ["doc_id"], head_k, partial=partial_topk)


TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         (tf.tf * 1000000) // df.df AS score_ppm
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, score_ppm, rank FROM (
  SELECT doc_id, term, tf, df, score_ppm,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score_ppm DESC, term) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 3
"""


_HH_SENTINEL = ""  # impossible term (tokenizer drops empties)


def heavy_hitters(sf_dir: str, k: int = 20, capacity: int = 512):
    """Approximate global heavy hitters (most frequent terms) with
    Misra-Gries-style deterministic error bounds — the sketch answer
    when the vocabulary itself is too large to aggregate exactly.

    Every batch computes exact local counts, keeps its ``capacity``
    largest terms and records the largest count it DROPPED as that
    batch's error bound. For a term T: ``count_lower`` sums the counts
    of batches that kept T; any batch that dropped T undercounts it by
    at most that batch's bound, so ``count_upper = count_lower +
    (E_total - err_kept(T))``. Terms with true count > E_total are
    guaranteed candidates (the MG property, proven in
    ``tests/test_curation_ops.py``).

    Scale shape: the shuffle moves at most ``capacity`` rows per batch
    (sketch-sized, corpus-independent); the final top-k runs over the
    merged sketch in one bucket — bounded by capacity x blocks rows,
    never by the vocabulary."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    import re

    split = re.compile(r"[^a-z0-9]+")

    def sketch_batch(batch: pd.DataFrame) -> pd.DataFrame:
        terms: list[str] = []
        for text in batch["text"]:
            terms.extend(t for t in split.split((text or "").lower()) if t)
        counts = (
            pd.Series(terms, dtype=object).value_counts().rename_axis("term")
            .reset_index(name="cnt")
        )
        counts = counts.sort_values(["cnt", "term"], ascending=[False, True],
                                    kind="stable")
        kept, dropped = counts.iloc[:capacity], counts.iloc[capacity:]
        err = np.int64(dropped["cnt"].max()) if len(dropped) else np.int64(0)
        out = pd.DataFrame(
            {"term": kept["term"].to_numpy(),
             "cnt": kept["cnt"].to_numpy(dtype=np.int64)}
        )
        out["err_kept"] = np.int64(err)
        sentinel = pd.DataFrame(
            {"term": [_HH_SENTINEL], "cnt": [np.int64(0)], "err_kept": [err]}
        )
        return pd.concat([out, sentinel], ignore_index=True)

    sketches = docs.map_batches(sketch_batch, batch_format="pandas")

    def merge_terms(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("term", sort=False)
            .agg(cnt=("cnt", "sum"), err_kept=("err_kept", "sum"))
            .reset_index()
            .astype({"cnt": np.int64, "err_kept": np.int64})
        )

    merged = grouped_aggregate(sketches, ["term"], merge_terms, num_partitions=16)

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = merge_terms(bucket.drop(columns=["_const"]))
        sent = agg["term"] == _HH_SENTINEL
        e_total = np.int64(agg.loc[sent, "err_kept"].sum())
        cand = agg[~sent].copy()
        cand["count_lower"] = cand["cnt"]
        cand["count_upper"] = cand["cnt"] + (e_total - cand["err_kept"])
        cand = cand.sort_values(["count_lower", "term"], ascending=[False, True],
                                kind="stable").head(k).reset_index(drop=True)
        cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
        return cand[["rank", "term", "count_lower", "count_upper"]].astype(
            {"rank": np.int64, "count_lower": np.int64, "count_upper": np.int64}
        )

    def add_const(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_const"] = np.int64(0)
        return out

    # final single-bucket pass over the merged sketch (sketch-sized)
    return grouped_aggregate(
        merged.map_batches(add_const, batch_format="pandas"),
        ["_const"], finalize, num_partitions=1,
    )


def corpus_cube(sf_dir: str):
    """GROUP BY CUBE(lang, source) — every grouping set: the finest
    (lang, source) level, per-lang and per-source subtotals, and the
    grand total. Same one-corpus-pass shape as :func:`corpus_rollup`
    (the base table streams ONCE into the finest bucketed two-phase
    aggregate; every coarser grouping set re-aggregates the finest
    RESULT, whose cardinality is distinct key combos, not rows), plus
    the CUBE-only (source) subtotal the rollup lattice omits. At 100 TB
    adding grouping sets costs re-aggregations of a tiny table, never
    another corpus scan."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["lang", "source"], sort=False)
            .agg(n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))
            .reset_index()
            .astype({"n_docs": np.int64, "total_chars": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["lang", "source"], sort=False)
            .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
            .reset_index()
            .astype({"n_docs": np.int64, "total_chars": np.int64})
        )

    fine = grouped_aggregate(docs, ["lang", "source"], combine, partial=partial,
                             num_partitions=16).materialize()

    # one batch -> its partial rows for EVERY coarser grouping set; the
    # '<all>' sentinel makes the sets key-disjoint, so a SINGLE
    # bucketed aggregate finishes all of them at once — one shuffle for
    # the whole lattice instead of one per grouping set (7.5 s -> ~3 s
    # at sf0.1/32: the per-set executions were pure stage latency)
    def all_levels(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for keep in (["lang"], ["source"], []):
            if keep:
                out = (
                    batch.groupby(keep, sort=False)
                    .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
                    .reset_index()
                )
            else:
                out = pd.DataFrame(
                    {"n_docs": [np.int64(batch["n_docs"].sum())],
                     "total_chars": [np.int64(batch["total_chars"].sum())]}
                )
            for col in ("lang", "source"):
                if col not in keep:
                    out[col] = ROLLUP_ALL
            outs.append(out[["lang", "source", "n_docs", "total_chars"]])
        return pd.concat(outs, ignore_index=True).astype(
            {"n_docs": np.int64, "total_chars": np.int64}
        )

    coarse = grouped_aggregate(
        fine.map_batches(all_levels, batch_format="pandas"),
        ["lang", "source"], combine, num_partitions=4,
    )
    return fine.union(coarse)


CORPUS_CUBE_ORACLE = """
SELECT COALESCE(lang, '<all>') AS lang,
       COALESCE(source, '<all>') AS source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE(lang, source)
"""


HIST_BINS = 2048
HIST_LO, HIST_HI = 1.0, 1e9  # n_chars domain; log-spaced bins


def doc_length_quantiles_approx(sf_dir: str):
    """Approximate per-language length quantiles via a FIXED log-spaced
    histogram sketch — the scale path next to the exact
    :func:`doc_length_quantiles`.

    The exact operator's shuffle is bounded by the distinct-VALUE
    domain, which for lengths is benign but for heavy-tailed or
    floating measures can approach the row count. The sketch bounds it
    by construction: every batch histograms its values into the same
    2048 log-spaced bins (pure ``np.searchsorted``), the shuffle moves
    only (lang, bin, count) rows — ≤ langs x 2048 regardless of corpus
    size — and the final walks each language's cumulative bin counts.
    Reported value = the bin's inclusive upper edge, so the relative
    error is one log step, (hi/lo)^(1/bins) - 1 ≈ 1.0%; deterministic
    (no sampling), mergeable (counts add), no oracle by nature —
    accuracy vs the exact quantiles is asserted in pytest."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    edges = np.logspace(np.log10(HIST_LO), np.log10(HIST_HI), HIST_BINS + 1)

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["n_chars"].to_numpy(dtype=np.float64)
        # right-closed bins: bin i covers (edges[i], edges[i+1]]
        b = np.searchsorted(edges, v, side="left") - 1
        b = np.clip(b, 0, HIST_BINS - 1)
        df = pd.DataFrame({"lang": batch["lang"].to_numpy(), "bin": b})
        return (
            df.groupby(["lang", "bin"], sort=False)
            .size()
            .reset_index(name="cnt")
            .astype({"bin": np.int64, "cnt": np.int64})
        )

    quantiles = (("p50_n_chars", 0.5), ("p90_n_chars", 0.9), ("p99_n_chars", 0.99))

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        vc = (
            bucket.groupby(["lang", "bin"], sort=False)["cnt"]
            .sum()
            .reset_index()
            .sort_values(["lang", "bin"], kind="stable")
        )
        rows = []
        for lang, grp in vc.groupby("lang", sort=False):
            cum = grp["cnt"].cumsum().to_numpy()
            n = cum[-1]
            row = {"lang": lang}
            for name, q in quantiles:
                target = max(int(np.ceil(q * n)), 1)
                idx = int(np.searchsorted(cum, target))
                row[name] = np.int64(np.ceil(edges[grp["bin"].to_numpy()[idx] + 1]))
            rows.append(row)
        return pd.DataFrame(rows).astype({name: np.int64 for name, _ in quantiles})

    # buckets on lang: per-language bin vectors are tiny, the per-lang
    # loop in the final runs over ≤ langs-per-bucket groups of ≤ 2048
    return grouped_aggregate(docs, ["lang"], combine, partial=partial,
                             num_partitions=8)


def dup_ngrams(sf_dir: str, n: int = 5, min_df: int = 2):
    """Cross-document repeated word n-grams — the detection half of
    exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a word 5-gram that
    appears verbatim in ≥ ``min_df`` distinct documents marks
    boilerplate / template / copied spans that inflate memorization.
    Output: one row per repeated gram with its document frequency and
    the doc-id range of its occurrences (the seed list a span-removal
    pass would consume).

    Scale shape — the n-gram cousin of :func:`inverted_index`: the
    per-batch partial collapses each document to its DISTINCT grams
    (each doc lives in exactly one batch, so per-doc dedup is local
    and free), then ONE bucketed two-phase aggregate on ``gram``
    (vocabulary-cardinality — n-gram vocab is far beyond Ray's native
    reduce) sums df and min/maxes the doc range. The corpus streams
    once; the shuffle moves short (gram, df, lo, hi) partials, never
    text. At 100 TB the gram strings themselves dominate the wire —
    production would key the exchange on a 128-bit gram hash and keep
    one exemplar string per bucket; the string key is kept here so the
    output is directly oracle-comparable.

    Tokenization matches the corpus oracle convention
    (``regexp_split_to_array(lower(text), '[^a-z0-9]+')``)."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    split = re.compile(r"[^a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids: list[int] = []
        grams: list[str] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            if len(toks) < n:
                continue
            uniq = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            doc_ids.extend([doc_id] * len(uniq))
            grams.extend(uniq)
        flat = pd.DataFrame(
            {"gram": grams, "doc_id": np.asarray(doc_ids, dtype=np.int64)}
        )
        return (
            flat.groupby("gram", sort=False)
            .agg(df=("doc_id", "size"), first_doc=("doc_id", "min"),
                 last_doc=("doc_id", "max"))
            .reset_index()
            .astype({c: np.int64 for c in ("df", "first_doc", "last_doc")})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby("gram", sort=False)
            .agg(df=("df", "sum"), first_doc=("first_doc", "min"),
                 last_doc=("last_doc", "max"))
            .reset_index()
        )
        out = out[out["df"] >= min_df]
        return out.astype({c: np.int64 for c in ("df", "first_doc", "last_doc")})

    return grouped_aggregate(docs, ["gram"], combine, partial=partial,
                             num_partitions=16)


DUP_NGRAMS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                           '[^a-z0-9]+'),
                     x -> x <> '') AS ts
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+4], ' ') AS gram
  FROM toks, unnest(range(1, greatest(len(ts)-3, 1))) AS t(i)
)
SELECT gram, CAST(count(*) AS BIGINT) AS df,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM grams GROUP BY gram HAVING count(*) >= 2
"""

def docs_top_decile(sf_dir: str):
    """Global-percentile threshold filter: keep documents whose
    ``n_chars`` is at or above the corpus's exact 90th DISCRETE
    percentile — the 'top decile by length' curation cut, the shape
    every quality-threshold filter takes (score → global quantile →
    broadcast scalar → filtered scan).

    A global quantile needs the whole DISTRIBUTION, not the whole
    data: per-batch value counts collapse to a (value, count)
    histogram bounded by the value DOMAIN (not the row count), one
    tiny two-phase aggregate lands it on the driver, and the k-th
    smallest (k = ceil(0.9·N), pure integer arithmetic) comes from a
    cumulative-count walk over ≤ |domain| rows. The threshold then
    travels as one scalar inside a closure — the second scan is an
    embarrassingly-parallel filter with NO shuffle (and at 100 TB the
    predicate pushes into the Parquet row-group stats)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("n_chars", sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n_chars": np.int64, "n": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("n_chars", sort=False)["n"].sum().reset_index()
            .astype({"n_chars": np.int64, "n": np.int64})
        )

    hist = grouped_aggregate(docs, ["n_chars"], combine, partial=partial,
                             num_partitions=8).to_pandas()
    if hist.empty:  # empty corpus: typed empty result (schema survives)
        import pyarrow as pa
        import ray.data as rd2

        return rd2.from_arrow(pa.schema(
            [("doc_id", pa.int64()), ("n_chars", pa.int64())]).empty_table())
    hist = hist.sort_values("n_chars", kind="stable")
    cum = hist["n"].to_numpy(dtype=np.int64).cumsum()
    total = int(cum[-1])
    k = (9 * total + 9) // 10  # ceil(0.9 * N) without floats
    thr = int(hist["n_chars"].to_numpy(dtype=np.int64)[np.searchsorted(cum, k, side="left")])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_chars"].to_numpy(dtype=np.int64) >= thr]

    return docs.map_batches(keep, batch_format="pandas")


DOCS_TOP_DECILE_ORACLE = """
WITH s AS (
  SELECT n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars) AS rn,
         COUNT(*) OVER () AS n
  FROM documents
), t AS (
  SELECT min(n_chars) AS thr FROM s WHERE rn = (9 * n + 9) // 10
)
SELECT d.doc_id, d.n_chars FROM documents d, t WHERE d.n_chars >= t.thr
"""

def normalized_fingerprints(sf_dir: str):
    """Canonicalization-before-dedup: Unicode NFC + lowercase +
    whitespace collapse + trim, fingerprinted with md5 — the text
    normalizer every dedup pipeline runs FIRST, so that byte-level
    variants ('Caf\\u00e9' vs 'Cafe\\u0301', double spaces, case) land on
    one key. Output is (doc_id, norm_md5): rows stay narrow, the
    normalized text itself never leaves the batch.

    Row-local, zero shuffle. Python's ``unicodedata.normalize('NFC')``
    and DuckDB's ``nfc_normalize`` implement the same Unicode
    normalization form; ``str.lower`` matches SQL ``lower`` on the
    corpus's character repertoire (locale-dependent exotics like
    dotted-I are out of scope and would diverge — documented, and the
    pytest pins a combining-accent case)."""
    import hashlib
    import re
    import unicodedata

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ws = re.compile(r"\s+")

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in batch["text"].fillna(""):
            norm = ws.sub(" ", unicodedata.normalize("NFC", t).lower()).strip()
            out.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64), "norm_md5": out}
        )

    return docs.map_batches(kernel, batch_format="pandas")


NORMALIZED_FINGERPRINTS_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                               '\\s+', ' ', 'g'))) AS norm_md5
FROM documents
"""

# BPE-style pretokenizer classes (RE2-safe: no lookaheads, ASCII
# classes — Python re and DuckDB produce identical matches; verified
# on contraction/digit/punctuation fixtures)
BPE_ALPHA = "[A-Za-z]+"
BPE_NUM = "[0-9]+"
BPE_OTHER = "[^A-Za-z0-9 \\t\\n]+"
BPE_TOKEN = f"{BPE_ALPHA}|{BPE_NUM}|{BPE_OTHER}"


def bpe_token_counts(sf_dir: str):
    """BPE-pretokenizer token counting: per document the number of
    pretokens under a GPT-2-style class split (letter runs, digit
    runs, punctuation runs — the segmentation a byte-pair tokenizer
    sees BEFORE merges), with the per-class breakdown. This is the
    second token-counting convention beside the whitespace counts in
    :func:`doc_stats` — on natural text they diverge exactly where BPE
    cost diverges from word count (digits, punctuation, contractions).

    Row-local, zero shuffle, one C-level ``Series.str.count`` per
    class; the pattern is RE2-safe so the oracle's
    ``regexp_extract_all`` tokenizes identically."""
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        alpha = text.str.count(BPE_ALPHA).to_numpy(dtype=np.int64)
        num = text.str.count(BPE_NUM).to_numpy(dtype=np.int64)
        other = text.str.count(BPE_OTHER).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "n_pretokens": alpha + num + other,
             "n_alpha": alpha, "n_num": num, "n_punct": other}
        )

    return docs.map_batches(kernel, batch_format="pandas")


BPE_TOKEN_COUNTS_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{BPE_ALPHA}'))
            + len(regexp_extract_all(COALESCE(text, ''), '{BPE_NUM}'))
            + len(regexp_extract_all(COALESCE(text, ''), '{BPE_OTHER}'))
            AS BIGINT) AS n_pretokens,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{BPE_ALPHA}'))
            AS BIGINT) AS n_alpha,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{BPE_NUM}'))
            AS BIGINT) AS n_num,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{BPE_OTHER}'))
            AS BIGINT) AS n_punct
FROM documents
"""


def _cms_cols(terms: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) deterministic column indices: pandas' SipHash keyed
    with a distinct 16-char key per sketch row — stable across
    processes/machines (unlike Python's salted ``hash``)."""
    cols = np.empty((depth, len(terms)), dtype=np.int64)
    for d in range(depth):
        h = pd.util.hash_array(
            np.asarray(terms, dtype=object), hash_key=f"cms-row-{d:08d}"
        )
        cols[d] = (h % np.uint64(width)).astype(np.int64)
    return cols


def cms_heavy_hitters(sf_dir: str, k: int = 20, depth: int = 4,
                      width: int = 2048, capacity: int = 64):
    """Count-min-sketch term frequencies — the fixed-memory sketch
    counterpart of :func:`heavy_hitters` (Misra-Gries): estimates are
    UPPER bounds (``est >= true`` always; over by <= 2N/width per row
    w.h.p., taking the min over ``depth`` independent rows).

    One pass emits, per batch, (a) the batch's sparse sketch cells —
    pre-summed to <= depth x width rows, so the wire cost is
    sketch-bounded, corpus-independent — and (b) its ``capacity``
    locally-heaviest terms as candidates (a global heavy hitter is a
    local one in some batch). Cells merge by (row, col) sum — CMS merge
    is associative — via the bucketed aggregate; the driver then holds
    one dense depth x width matrix + the candidate set and reads each
    candidate's min-cell. Sketches aren't SQL-expressible: rows-only at
    the driver; the hard ``est >= exact`` guarantee and planted
    exactness are pinned in pytest."""
    import re

    import pyarrow as pa

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    split = re.compile(r"[^a-z0-9]+")

    def sketch_batch(batch: pd.DataFrame):
        terms_list: list[str] = []
        for text in batch["text"]:
            terms_list.extend(t for t in split.split((text or "").lower()) if t)
        counts = (
            pd.Series(terms_list, dtype=object).value_counts()
            .rename_axis("term").reset_index(name="cnt")
            .sort_values(["cnt", "term"], ascending=[False, True], kind="stable")
        )
        terms = counts["term"].to_numpy(dtype=object)
        cnts = counts["cnt"].to_numpy(dtype=np.int64)
        if len(terms):
            cols = _cms_cols(terms, depth, width)
            cells = (
                pd.DataFrame(
                    {"r": np.repeat(np.arange(depth, dtype=np.int64), len(terms)),
                     "c": cols.reshape(-1),
                     "cnt": np.tile(cnts, depth)}
                )
                .groupby(["r", "c"], sort=False, as_index=False)["cnt"].sum()
            )
        else:
            cells = pd.DataFrame(
                {"r": pd.Series([], dtype=np.int64),
                 "c": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        cand_terms = list(terms[:capacity])
        n_cells, n_cand = len(cells), len(cand_terms)
        return pa.table(
            {"kind": pa.array([0] * n_cells + [1] * n_cand, pa.int64()),
             "r": pa.array(
                 list(cells["r"].to_numpy()) + [0] * n_cand, pa.int64()),
             "c": pa.array(
                 list(cells["c"].to_numpy()) + [0] * n_cand, pa.int64()),
             "cnt": pa.array(
                 list(cells["cnt"].to_numpy()) + [0] * n_cand, pa.int64()),
             "term": pa.array([""] * n_cells + cand_terms, pa.string())}
        )

    parts = docs.map_batches(sketch_batch, batch_format="pandas").materialize()

    def cell_rows(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["kind"] == 0][["r", "c", "cnt"]]

    def cell_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["r", "c"], sort=False, as_index=False)["cnt"].sum()
            .astype({"r": np.int64, "c": np.int64, "cnt": np.int64})
        )

    cms = collect_small(
        grouped_aggregate(
            parts.map_batches(cell_rows, batch_format="pandas"),
            ["r", "c"], cell_sum, num_partitions=8,
        ),
        ["r", "c", "cnt"],
    )
    cands = collect_small(
        parts.map_batches(
            lambda b: b[b["kind"] == 1][["term"]], batch_format="pandas"
        ),
        ["term"],
    )
    if cms.empty or cands.empty:
        return pd.DataFrame(
            {"term": pd.Series([], dtype=str),
             "est_count": pd.Series([], dtype=np.int64)}
        )
    dense = np.zeros((depth, width), dtype=np.int64)
    dense[cms["r"].to_numpy(dtype=np.int64),
          cms["c"].to_numpy(dtype=np.int64)] = cms["cnt"].to_numpy(dtype=np.int64)
    terms = np.unique(cands["term"].astype(str).to_numpy(dtype=object))
    cols = _cms_cols(terms, depth, width)
    est = dense[np.arange(depth)[:, None], cols].min(axis=0)
    out = pd.DataFrame({"term": terms.astype(str), "est_count": est})
    return (
        out.sort_values(["est_count", "term"], ascending=[False, True],
                        kind="stable")
        .head(k).reset_index(drop=True)
        .astype({"est_count": np.int64})
    )


WILSON_Z = 1.96  # 95% two-sided normal quantile (same literal in SQL)


def quality_pass_wilson(sf_dir: str):
    """Per-language quality pass rates with a Wilson-score LOWER bound
    — the number a curation dashboard should show instead of the raw
    rate (a 2/2 feed is not 'safer' than a 9800/10000 one). A doc
    passes when it has >= 20 whitespace tokens and repetition
    (100 - 100*distinct/total, floored) < 50 — the same integer
    heuristics as :func:`quality_scores`. Counts aggregate two-phase
    to a |langs|-row grid; the Wilson closed form is evaluated ONCE
    per language on the driver with the exact expression shape the
    SQL uses (every intermediate is one IEEE op), so the double
    hash-matches."""
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, t in zip(batch["lang"].astype(str), batch["text"].fillna("")):
            tokens = t.split(" ") if t else []
            total = len(tokens)
            rep = 100 - (100 * len(set(tokens))) // total if total else 0
            rows.append((lang, 1, 1 if (total >= 20 and rep < 50) else 0))
        out = pd.DataFrame(rows, columns=["lang", "n", "n_pass"])
        return out.groupby("lang", sort=False, as_index=False)[
            ["n", "n_pass"]
        ].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("lang", sort=False, as_index=False)[
                ["n", "n_pass"]
            ].sum().astype({"n": np.int64, "n_pass": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(docs, ["lang"], combine, partial=partial,
                          num_partitions=8),
        ["lang", "n", "n_pass"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=str),
             "n": pd.Series([], dtype=np.int64),
             "n_pass": pd.Series([], dtype=np.int64),
             "pass_rate": pd.Series([], dtype=np.float64),
             "wilson_low": pd.Series([], dtype=np.float64)}
        )
    g = grid.groupby("lang", sort=False, as_index=False)[["n", "n_pass"]].sum()
    n = g["n"].to_numpy(dtype=np.int64)
    k = g["n_pass"].to_numpy(dtype=np.int64)
    z = WILSON_Z
    # each line is ONE closed-form step mirrored verbatim in the SQL
    phat = k.astype(np.float64) / n
    zz_n = (z * z) / n
    denom = 1.0 + zz_n
    center = phat + zz_n / 2.0
    rad = (phat * (1.0 - phat) + zz_n / 4.0) / n
    wilson_low = (center - z * np.sqrt(rad)) / denom
    return pd.DataFrame(
        {"lang": g["lang"].astype(str).to_numpy(),
         "n": n, "n_pass": k, "pass_rate": phat, "wilson_low": wilson_low}
    )


QUALITY_PASS_WILSON_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         len(string_split(COALESCE(text, ''), ' ')) AS total,
         CASE WHEN COALESCE(text, '') = '' THEN 0
              ELSE 100 - (100 * len(list_distinct(
                     string_split(text, ' ')))) // len(string_split(text, ' '))
         END AS rep
  FROM documents
), g AS (
  SELECT lang, count(*) AS n,
         count(*) FILTER (total >= 20 AND rep < 50
                          AND COALESCE(total, 0) > 0) AS n_pass
  FROM per_doc GROUP BY 1
), f AS (
  SELECT lang, n, n_pass,
         CAST(n_pass AS DOUBLE) / n AS phat,
         (1.96 * 1.96) / n AS zz_n
  FROM g
)
SELECT lang, CAST(n AS BIGINT) AS n, CAST(n_pass AS BIGINT) AS n_pass,
       phat AS pass_rate,
       ((phat + zz_n / 2.0)
        - 1.96 * sqrt((phat * (1.0 - phat) + zz_n / 4.0) / n))
       / (1.0 + zz_n) AS wilson_low
FROM f
"""


def bm25_components(sf_dir: str, k: int = 3):
    """Per-document top-k terms with the BM25 length-normalized
    term-frequency saturation factor (k1 = 1.2, b = 0.75) plus the raw
    df for the idf side — emitted as COMPONENTS rather than a single
    BM25 score because cross-engine ``ln`` is not bit-reproducible
    (measured: DuckDB's ln differs from numpy's in the last ulp), so a
    score containing ln could never be value-hash-gated; the saturation
    factor is pure rational arithmetic and hashes exactly. Same
    two-shuffle shape as :func:`tfidf_top_terms` (term-bucket df
    attach, doc-bucket partial top-k) with dl attached at tokenize
    time so the top-k partial can run before the doc exchange; avgdl
    is a two-int global all-reduce."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tf_dl_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_term, out_tf, out_dl = [], [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            if not toks:
                continue
            counts = pd.Series(toks, dtype=object).value_counts()
            out_doc.extend([int(doc_id)] * len(counts))
            out_term.extend(counts.index.tolist())
            out_tf.extend(counts.to_numpy(dtype=np.int64).tolist())
            out_dl.extend([len(toks)] * len(counts))
        return pd.DataFrame(
            {"doc_id": np.array(out_doc, dtype=np.int64),
             "term": np.array(out_term, dtype=object),
             "tf": np.array(out_tf, dtype=np.int64),
             "dl": np.array(out_dl, dtype=np.int64)}
        )

    tf_rows = docs.map_batches(tf_dl_rows, batch_format="pandas")

    def totals_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [
            sum(1 for t in split.split((x or "").lower()) if t)
            for x in batch["text"]
        ]
        arr = np.array(toks_per_doc, dtype=np.int64)
        nz = arr > 0  # docs with zero tokens have no dl row in SQL either
        return pd.DataFrame(
            {"n_docs": [np.int64(nz.sum())],
             "total_dl": [np.int64(arr[nz].sum())]}
        )

    totals = collect_small(
        docs.map_batches(totals_partial, batch_format="pandas"),
        ["n_docs", "total_dl"],
    )
    n_docs = np.int64(totals["n_docs"].sum())
    if n_docs == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "term": pd.Series([], dtype=str),
             "tf": pd.Series([], dtype=np.int64),
             "df": pd.Series([], dtype=np.int64),
             "dl": pd.Series([], dtype=np.int64),
             "rank": pd.Series([], dtype=np.int64),
             "tf_sat": pd.Series([], dtype=np.float64)}
        )
    avgdl = np.float64(totals["total_dl"].sum()) / n_docs

    def df_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.copy()
        out["df"] = out.groupby("term", sort=False)["term"].transform("size")
        return out.astype(
            {c: np.int64 for c in ("doc_id", "tf", "dl", "df")}
        )

    scored = grouped_aggregate(tf_rows, ["term"], df_bucket, num_partitions=16)

    def head_k(frame: pd.DataFrame) -> pd.DataFrame:
        ordered = frame.sort_values(
            ["doc_id", "tf", "term"], ascending=[True, False, True],
            kind="stable",
        )
        kept = ordered.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
        kept["rank"] = kept.groupby("doc_id", sort=False).cumcount() + 1
        tf = kept["tf"].to_numpy(dtype=np.int64)
        dl = kept["dl"].to_numpy(dtype=np.int64)
        dlr = dl.astype(np.float64) / avgdl
        inner = 0.25 + 0.75 * dlr
        kept["tf_sat"] = (tf * 2.2) / (tf + 1.2 * inner)
        return kept[
            ["doc_id", "term", "tf", "df", "dl", "rank", "tf_sat"]
        ].astype({c: np.int64 for c in ("doc_id", "tf", "df", "dl", "rank")})

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return head_k(batch).drop(columns=["rank", "tf_sat"])

    return grouped_aggregate(scored, ["doc_id"], head_k, partial=partial_topk)


BM25_COMPONENTS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), tot AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df, dl.dl,
         CAST(row_number() OVER (PARTITION BY tf.doc_id
                                 ORDER BY tf.tf DESC, tf.term)
              AS BIGINT) AS rank
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
)
SELECT doc_id, term, tf, df, dl, rank,
       (tf * CAST(2.2 AS DOUBLE))
       / (tf + CAST(1.2 AS DOUBLE)
               * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / avgdl)))
         AS tf_sat
FROM ranked CROSS JOIN tot WHERE rank <= 3
"""


def term_drift(sf_dir: str, k: int = 20):
    """Term-distribution drift between the two doc_id-parity halves of
    the corpus — the train/serve (or old-snapshot/new-snapshot) drift
    screen: per term the occurrence counts in each half and the L1
    rate gap |ca/na − cb/nb|, top-k by (drift desc, term asc). The
    half totals are a two-int all-reduce broadcast into the term
    buckets, where drift is computed and each bucket surrenders its
    local top-k — the final merge sorts ≤ buckets·k rows."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def term_rows(batch: pd.DataFrame) -> pd.DataFrame:
        terms: list[str] = []
        sides: list[int] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            terms.extend(toks)
            sides.extend([int(doc_id) % 2] * len(toks))
        out = pd.DataFrame({"term": np.array(terms, dtype=object),
                            "side": np.array(sides, dtype=np.int64)})
        out["ca"] = (out["side"] == 0).astype(np.int64)
        out["cb"] = (out["side"] == 1).astype(np.int64)
        return (
            out.groupby("term", sort=False, as_index=False)[["ca", "cb"]]
            .sum()
        )

    rows = docs.map_batches(term_rows, batch_format="pandas")

    def totals_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"na": [np.int64(batch["ca"].sum())],
             "nb": [np.int64(batch["cb"].sum())]}
        )

    rows_mat = rows.materialize()  # small: ≤ vocab rows per block
    totals = collect_small(
        rows_mat.map_batches(totals_partial, batch_format="pandas"),
        ["na", "nb"],
    )
    na = np.int64(totals["na"].sum())
    nb = np.int64(totals["nb"].sum())
    if na == 0 or nb == 0:
        return pd.DataFrame(
            {"term": pd.Series([], dtype=str),
             "ca": pd.Series([], dtype=np.int64),
             "cb": pd.Series([], dtype=np.int64),
             "drift": pd.Series([], dtype=np.float64)}
        )

    def score_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("term", sort=False, as_index=False)[
            ["ca", "cb"]
        ].sum()
        ca = g["ca"].to_numpy(dtype=np.int64)
        cb = g["cb"].to_numpy(dtype=np.int64)
        g["drift"] = np.abs(
            ca.astype(np.float64) / na - cb.astype(np.float64) / nb
        )
        return (
            g.sort_values(["drift", "term"], ascending=[False, True],
                          kind="stable")
            .head(k).astype({"ca": np.int64, "cb": np.int64})
        )

    cand = collect_small(
        grouped_aggregate(rows_mat, ["term"], score_bucket, num_partitions=16),
        ["term", "ca", "cb", "drift"],
    )
    return (
        cand.sort_values(["drift", "term"], ascending=[False, True],
                         kind="stable")
        .head(k).reset_index(drop=True)
    )


def term_drift_oracle(k: int = 20) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id % 2 AS side,
         unnest(list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
), t AS (
  SELECT term,
         count(*) FILTER (side = 0) AS ca,
         count(*) FILTER (side = 1) AS cb
  FROM toks GROUP BY 1
), tot AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM t
), scored AS (
  SELECT term, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
         abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) AS drift
  FROM t CROSS JOIN tot
)
SELECT term, ca, cb, drift FROM scored
ORDER BY drift DESC, term ASC LIMIT {k}
"""


PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_URL_RE = r"https?://[^ \t\n]+"


def docs_pii_scan(sf_dir: str):
    """PII / leakage screen per source: how many documents contain an
    email address or a URL — the pre-release scan every training-data
    export runs. Detection is a compiled-regex flag per doc inside the
    scan (patterns chosen to behave identically under Python ``re``
    and DuckDB RE2); counts aggregate two-phase to a |sources|-row
    grid with one double division per share."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    email_re = re.compile(PII_EMAIL_RE)
    url_re = re.compile(PII_URL_RE)
    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for source, t in zip(batch["source"].astype(str),
                             batch["text"].fillna("")):
            low = t.lower()
            rows.append((source, 1,
                         1 if email_re.search(low) else 0,
                         1 if url_re.search(low) else 0))
        out = pd.DataFrame(
            rows, columns=["source", "n_docs", "n_email", "n_url"]
        )
        return out.groupby("source", sort=False, as_index=False)[
            ["n_docs", "n_email", "n_url"]
        ].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("source", sort=False, as_index=False)[
                ["n_docs", "n_email", "n_url"]
            ].sum().astype(
                {"n_docs": np.int64, "n_email": np.int64, "n_url": np.int64}
            )
        )

    grid = collect_small(
        grouped_aggregate(docs, ["source"], combine, partial=partial,
                          num_partitions=8),
        ["source", "n_docs", "n_email", "n_url"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"source": pd.Series([], dtype=str),
             "n_docs": pd.Series([], dtype=np.int64),
             "n_email": pd.Series([], dtype=np.int64),
             "n_url": pd.Series([], dtype=np.int64),
             "email_share": pd.Series([], dtype=np.float64),
             "url_share": pd.Series([], dtype=np.float64)}
        )
    g = grid.groupby("source", sort=False, as_index=False)[
        ["n_docs", "n_email", "n_url"]
    ].sum()
    n = g["n_docs"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {"source": g["source"].astype(str).to_numpy(),
         "n_docs": n,
         "n_email": g["n_email"].to_numpy(dtype=np.int64),
         "n_url": g["n_url"].to_numpy(dtype=np.int64),
         "email_share": g["n_email"].to_numpy(dtype=np.int64).astype(
             np.float64) / n,
         "url_share": g["n_url"].to_numpy(dtype=np.int64).astype(
             np.float64) / n}
    )


DOCS_PII_SCAN_ORACLE = f"""
WITH flags AS (
  SELECT source,
         CASE WHEN regexp_matches(lower(COALESCE(text, '')),
                                  '{PII_EMAIL_RE}') THEN 1 ELSE 0 END AS e,
         CASE WHEN regexp_matches(lower(COALESCE(text, '')),
                                  '{PII_URL_RE}') THEN 1 ELSE 0 END AS u
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(SUM(e) AS BIGINT) AS n_email,
       CAST(SUM(u) AS BIGINT) AS n_url,
       CAST(SUM(e) AS DOUBLE) / count(*) AS email_share,
       CAST(SUM(u) AS DOUBLE) / count(*) AS url_share
FROM flags GROUP BY 1
"""


def doc_length_pct_by_lang(sf_dir: str):
    """PERCENT_RANK of document length within its language — the
    within-stratum percentile feature a curation rule consumes ("drop
    the shortest 5% per language" without cross-language bias). Same
    zero-row-shuffle plan as the events percent_rank: the bounded
    (lang, n_chars) count grid becomes per-lang (values,
    items-strictly-below, n) arrays broadcast once; a second
    embarrassingly-parallel pass tags every doc row via searchsorted,
    with RANK() tie semantics and ONE int/int double division."""
    import ray

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    keys = ["lang", "nc"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"lang": batch["lang"].astype(str).to_numpy(),
             "nc": batch["n_chars"].to_numpy(dtype=np.int64),
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["c"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["c"].sum()
            .astype({"nc": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(docs, keys, combine, partial=partial,
                          num_partitions=8),
        ["lang", "nc", "c"],
    )
    lookup: dict[str, tuple] = {}
    for lg, g in grid.groupby("lang", sort=False):
        g = g.sort_values("nc", kind="stable")
        c = g["c"].to_numpy(dtype=np.int64)
        below = np.cumsum(c) - c
        lookup[str(lg)] = (g["nc"].to_numpy(dtype=np.int64), below,
                           np.int64(c.sum()))
    lookup_ref = ray.put(lookup)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        langs = batch["lang"].astype(str).to_numpy()
        nc = batch["n_chars"].to_numpy(dtype=np.int64)
        pct = np.zeros(len(batch), dtype=np.float64)
        for lg in pd.unique(langs):
            m = langs == lg
            values, below, n = lk[str(lg)]
            idx = np.searchsorted(values, nc[m])
            pct[m] = 0.0 if n == 1 else below[idx].astype(np.float64) / (n - 1)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "lang": langs, "n_chars": nc, "pct_rank": pct}
        )

    return docs.map_batches(tag, batch_format="pandas")


DOC_LENGTH_PCT_BY_LANG_ORACLE = """
WITH v AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang, n_chars,
       CASE WHEN n = 1 THEN 0.0
            ELSE CAST(rnk - 1 AS DOUBLE) / (n - 1) END AS pct_rank
FROM v
"""


def vocab_growth_curve(sf_dir: str):
    """Heaps-law vocabulary growth: how many NEW distinct terms each
    ingest decile (by doc_id order) contributes, and the cumulative
    vocabulary — the curve that sizes tokenizers/vocabularies before a
    full-corpus pass. A term's arrival decile is the decile of its
    MIN doc_id — a per-term min aggregate (bucketed two-phase), never
    a sequential scan; doc-id bounds are a two-int all-reduce and the
    final curve is a ≤10-row cumsum on the driver."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bounds_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        if not len(ids):
            return pd.DataFrame({"mn": pd.Series([], dtype=np.int64),
                                 "mx": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"mn": [ids.min()], "mx": [ids.max()]})

    b = collect_small(
        docs.map_batches(bounds_partial, batch_format="pandas"), ["mn", "mx"]
    )
    if b.empty:
        return pd.DataFrame(
            {"decile": pd.Series([], dtype=np.int64),
             "n_docs": pd.Series([], dtype=np.int64),
             "new_terms": pd.Series([], dtype=np.int64),
             "vocab_size": pd.Series([], dtype=np.int64)}
        )
    mn, mx = np.int64(b["mn"].min()), np.int64(b["mx"].max())
    span = np.int64(mx - mn + 1)

    def first_seen_partial(batch: pd.DataFrame) -> pd.DataFrame:
        terms: list[str] = []
        ids: list[int] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = set(t for t in split.split((text or "").lower()) if t)
            terms.extend(toks)
            ids.extend([int(doc_id)] * len(toks))
        out = pd.DataFrame({"term": np.array(terms, dtype=object),
                            "d": np.array(ids, dtype=np.int64)})
        return out.groupby("term", sort=False, as_index=False)["d"].min()

    def first_seen_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("term", sort=False, as_index=False)["d"].min()
        # combiner: collapse to per-decile new-term counts right here
        dec = (g["d"].to_numpy(dtype=np.int64) - mn) * 10 // span
        out = pd.DataFrame({"decile": dec,
                            "new_terms": np.ones(len(g), dtype=np.int64)})
        return out.groupby("decile", sort=False, as_index=False)[
            "new_terms"
        ].sum().astype({"decile": np.int64, "new_terms": np.int64})

    fs = collect_small(
        grouped_aggregate(
            docs.map_batches(first_seen_partial, batch_format="pandas"),
            ["term"], first_seen_combine, num_partitions=16,
        ),
        ["decile", "new_terms"],
    )
    fs = fs.groupby("decile", sort=False, as_index=False)["new_terms"].sum()

    def docs_partial(batch: pd.DataFrame) -> pd.DataFrame:
        dec = (batch["doc_id"].to_numpy(dtype=np.int64) - mn) * 10 // span
        out = pd.DataFrame({"decile": dec,
                            "n_docs": np.ones(len(batch), dtype=np.int64)})
        return out.groupby("decile", sort=False, as_index=False)[
            "n_docs"
        ].sum()

    dd = collect_small(
        docs.map_batches(docs_partial, batch_format="pandas"),
        ["decile", "n_docs"],
    ).groupby("decile", sort=False, as_index=False)["n_docs"].sum()

    out = dd.merge(fs, on="decile", how="left").fillna({"new_terms": 0})
    out = out.sort_values("decile").reset_index(drop=True)
    out["new_terms"] = out["new_terms"].astype(np.int64)
    out["vocab_size"] = np.cumsum(out["new_terms"].to_numpy(dtype=np.int64))
    return out.astype(
        {"decile": np.int64, "n_docs": np.int64, "new_terms": np.int64,
         "vocab_size": np.int64}
    )


VOCAB_GROWTH_CURVE_ORACLE = """
WITH bounds AS (
  SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents
), toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
             regexp_split_to_array(lower(COALESCE(text,'')), '[^a-z0-9]+'),
             x -> x <> ''))) AS term
  FROM documents
), fs AS (
  SELECT term, min(doc_id) AS d FROM toks GROUP BY 1
), fd AS (
  SELECT (d - mn) * 10 // (mx - mn + 1) AS decile,
         count(*) AS new_terms
  FROM fs CROSS JOIN bounds GROUP BY 1
), docs_d AS (
  SELECT (doc_id - mn) * 10 // (mx - mn + 1) AS decile,
         count(*) AS n_docs
  FROM documents CROSS JOIN bounds GROUP BY 1
)
SELECT CAST(docs_d.decile AS BIGINT) AS decile,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(new_terms, 0) AS BIGINT) AS new_terms,
       CAST(SUM(COALESCE(new_terms, 0))
            OVER (ORDER BY docs_d.decile) AS BIGINT) AS vocab_size
FROM docs_d LEFT JOIN fd ON fd.decile = docs_d.decile
"""


def char_class_profile(sf_dir: str):
    """Character-class composition per source — the encoding/garbage
    screen (a feed whose digit or punctuation share jumps is usually
    broken upstream): per source the exact totals of characters,
    ASCII digits, spaces, and lowercase letters, plus one-division
    shares. Counting is vectorized ``str.count`` with the same regex
    classes DuckDB's regexp_replace removes; the grid is
    |sources|-bounded."""
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        out = pd.DataFrame(
            {"source": batch["source"].astype(str).to_numpy(),
             "n_chars": text.str.len().to_numpy(dtype=np.int64),
             "n_digits": text.str.count(r"[0-9]").to_numpy(dtype=np.int64),
             "n_spaces": text.str.count(r" ").to_numpy(dtype=np.int64),
             "n_lower": text.str.count(r"[a-z]").to_numpy(dtype=np.int64)}
        )
        return out.groupby("source", sort=False, as_index=False)[
            ["n_chars", "n_digits", "n_spaces", "n_lower"]
        ].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("source", sort=False, as_index=False)[
                ["n_chars", "n_digits", "n_spaces", "n_lower"]
            ].sum().astype({c: np.int64 for c in
                            ("n_chars", "n_digits", "n_spaces", "n_lower")})
        )

    grid = collect_small(
        grouped_aggregate(docs, ["source"], combine, partial=partial,
                          num_partitions=8),
        ["source", "n_chars", "n_digits", "n_spaces", "n_lower"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"source": pd.Series([], dtype=str),
             "n_chars": pd.Series([], dtype=np.int64),
             "n_digits": pd.Series([], dtype=np.int64),
             "n_spaces": pd.Series([], dtype=np.int64),
             "n_lower": pd.Series([], dtype=np.int64),
             "digit_share": pd.Series([], dtype=np.float64),
             "space_share": pd.Series([], dtype=np.float64)}
        )
    g = grid.groupby("source", sort=False, as_index=False)[
        ["n_chars", "n_digits", "n_spaces", "n_lower"]
    ].sum()
    n = g["n_chars"].to_numpy(dtype=np.int64)
    # Guard n==0 (a source whose texts are all empty): numpy 0/0 gives
    # NaN while SQL double/0 gives NULL — both sides pin that edge to 0.
    safe_n = np.where(n == 0, np.int64(1), n).astype(np.float64)
    digit_share = np.where(
        n == 0, 0.0,
        g["n_digits"].to_numpy(dtype=np.int64).astype(np.float64) / safe_n,
    )
    space_share = np.where(
        n == 0, 0.0,
        g["n_spaces"].to_numpy(dtype=np.int64).astype(np.float64) / safe_n,
    )
    return pd.DataFrame(
        {"source": g["source"].astype(str).to_numpy(),
         "n_chars": n,
         "n_digits": g["n_digits"].to_numpy(dtype=np.int64),
         "n_spaces": g["n_spaces"].to_numpy(dtype=np.int64),
         "n_lower": g["n_lower"].to_numpy(dtype=np.int64),
         "digit_share": digit_share,
         "space_share": space_share}
    )


CHAR_CLASS_PROFILE_ORACLE = """
WITH d AS (
  SELECT source,
         length(COALESCE(text, '')) AS n_chars,
         length(COALESCE(text, ''))
           - length(regexp_replace(COALESCE(text, ''), '[0-9]', '', 'g'))
           AS n_digits,
         length(COALESCE(text, ''))
           - length(regexp_replace(COALESCE(text, ''), ' ', '', 'g'))
           AS n_spaces,
         length(COALESCE(text, ''))
           - length(regexp_replace(COALESCE(text, ''), '[a-z]', '', 'g'))
           AS n_lower
  FROM documents
)
SELECT source,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(n_digits) AS BIGINT) AS n_digits,
       CAST(SUM(n_spaces) AS BIGINT) AS n_spaces,
       CAST(SUM(n_lower) AS BIGINT) AS n_lower,
       CASE WHEN SUM(n_chars) = 0 THEN 0.0
            ELSE CAST(SUM(n_digits) AS DOUBLE) / SUM(n_chars)
       END AS digit_share,
       CASE WHEN SUM(n_chars) = 0 THEN 0.0
            ELSE CAST(SUM(n_spaces) AS DOUBLE) / SUM(n_chars)
       END AS space_share
FROM d GROUP BY 1
"""


BPE_MERGE_K = 32


def bpe_merge_candidates(sf_dir: str, k: int = BPE_MERGE_K):
    """First BPE merge round of tokenizer training: global counts of
    adjacent CHARACTER pairs inside alphabetic pretokens, weighted by
    occurrence (every instance of a word contributes its pairs — the
    statistic byte-pair-encoding greedily merges on). Returns the top-k
    pairs by (count desc, pair asc).

    Scale shape: per batch the words are flattened into ONE
    space-separated byte blob and the pair histogram is computed with
    two numpy slices + ``np.unique`` (no Python loop over words); each
    batch emits <= 52*52 partial rows, so the wire carries
    alphabet²-bounded partials, never tokens. The global merge is a
    bucketed two-phase sum over a <= 2,704-key domain, and the final
    ordered head runs on one block of that bounded table."""
    import re

    import pyarrow as pa
    import ray.data as rd

    word_re = re.compile(r"[A-Za-z]+")
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["text"])

    def pair_partials(batch: pd.DataFrame) -> pd.DataFrame:
        words: list[str] = []
        for text in batch["text"].fillna(""):
            words.extend(word_re.findall(text))
        if not words:
            return pd.DataFrame({"pair_code": np.array([], dtype=np.int64),
                                 "n": np.array([], dtype=np.int64)})
        blob = np.frombuffer(" ".join(words).encode("ascii"), dtype=np.uint8)
        left, right = blob[:-1], blob[1:]
        mask = (left != 32) & (right != 32)
        code = left[mask].astype(np.int64) * 256 + right[mask]
        uniq, cnt = np.unique(code, return_counts=True)
        return pd.DataFrame({"pair_code": uniq.astype(np.int64),
                             "n": cnt.astype(np.int64)})

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    totals = grouped_aggregate(
        docs.map_batches(pair_partials, batch_format="pandas"),
        ["pair_code"],
        lambda b: b.groupby("pair_code", sort=False, as_index=False)["n"].sum(),
        num_partitions=4,
    )

    def head_k(frame: pd.DataFrame) -> pd.DataFrame:
        codes = frame["pair_code"].to_numpy(dtype=np.int64)
        pairs = [chr(c >> 8) + chr(c & 0xFF) for c in codes]
        out = pd.DataFrame({"pair": pairs,
                            "n": frame["n"].to_numpy(dtype=np.int64)})
        out = out.sort_values(["n", "pair"], ascending=[False, True],
                              kind="stable").head(k)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out.reset_index(drop=True)

    schema = pa.schema([("pair", pa.string()), ("n", pa.int64()),
                        ("rank", pa.int64())])
    return totals.repartition(1).map_batches(
        head_k, batch_format="pandas"
    ).union(rd.from_arrow(schema.empty_table()))


BPE_MERGE_CANDIDATES_ORACLE = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]+')) AS w
  FROM documents
), pairs AS (
  SELECT substr(w, CAST(ix AS INTEGER), 2) AS pair
  FROM (SELECT w, unnest(range(1, len(w))) AS ix FROM words)
)
SELECT pair, CAST(count(*) AS BIGINT) AS n,
       CAST(row_number() OVER (ORDER BY count(*) DESC, pair) AS BIGINT)
         AS rank
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT {BPE_MERGE_K}
"""


WINNOW_K = 8        # k-gram length (characters)
WINNOW_W = 4        # winnowing window (grams)
WINNOW_B = 257      # polynomial hash base
WINNOW_M = 2**31 - 1


def winnow_fingerprints(sf_dir: str, k: int = WINNOW_K, w: int = WINNOW_W):
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash
    every character k-gram with a polynomial rolling hash, then select
    the minimum of each w-gram window — the guarantee is that any
    shared substring of length >= k + w - 1 contributes at least one
    IDENTICAL selected fingerprint to both documents, at ~1/w the
    storage of the full gram set. Emits per doc: gram count, distinct
    selected fingerprints, and their min/max (docs shorter than
    k + w - 1 characters have no full window and emit nothing).

    All-integer pipeline: codepoint * B^j mod M polynomial hash (sum
    fits int64 by construction: 8 terms x 2^51), vectorized as one
    sliding-window matmul + two strided reductions per batch — and the
    SAME arithmetic replays in SQL as an 8-term inline polynomial with
    a windowed MIN, so the driver hash-gates every fingerprint."""
    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    weights = np.array(
        [pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)],
        dtype=np.int64,
    )

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        out = {key: [] for key in
               ("doc_id", "n_grams", "n_fps", "fp_min", "fp_max")}
        for doc_id, text in zip(
            batch["doc_id"].to_numpy(dtype=np.int64), batch["text"].fillna("")
        ):
            n_grams = len(text) - k + 1
            if n_grams < w:
                continue
            cp = np.frombuffer(
                text.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            grams = np.lib.stride_tricks.sliding_window_view(cp, k)
            fps = (grams @ weights) % WINNOW_M
            wins = np.lib.stride_tricks.sliding_window_view(fps, w).min(axis=1)
            sel = np.unique(wins)
            out["doc_id"].append(doc_id)
            out["n_grams"].append(n_grams)
            out["n_fps"].append(len(sel))
            out["fp_min"].append(int(sel[0]))
            out["fp_max"].append(int(sel[-1]))
        return pd.DataFrame(
            {key: np.array(vals, dtype=np.int64)
             for key, vals in out.items()}
        )

    return docs.map_batches(kernel, batch_format="pandas")


def _winnow_poly_sql(k: int = WINNOW_K) -> str:
    terms = " + ".join(
        f"CAST(ascii(substr(t, CAST(ix + {j} AS INTEGER), 1)) AS BIGINT) "
        f"* {pow(WINNOW_B, k - 1 - j, WINNOW_M)}"
        for j in range(k)
    )
    return f"({terms}) % {WINNOW_M}"


WINNOW_FINGERPRINTS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS t FROM documents
), g AS (
  SELECT doc_id, ix, {_winnow_poly_sql()} AS fp,
         len(t) - {WINNOW_K} + 1 AS n_grams
  FROM (SELECT doc_id, t,
               unnest(range(1, len(t) - {WINNOW_K} + 2)) AS ix
        FROM d)
), wins AS (
  SELECT doc_id, n_grams, ix,
         min(fp) OVER (PARTITION BY doc_id ORDER BY ix
                       ROWS BETWEEN CURRENT ROW
                       AND {WINNOW_W - 1} FOLLOWING) AS wmin
  FROM g
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fps,
       CAST(MIN(wmin) AS BIGINT) AS fp_min,
       CAST(MAX(wmin) AS BIGINT) AS fp_max
FROM wins
WHERE ix <= n_grams - {WINNOW_W} + 1 AND n_grams >= {WINNOW_W}
GROUP BY doc_id, n_grams
"""


def unigram_commonness(sf_dir: str):
    """CCNet-style corpus-LM document quality signal, integer-exact:
    train a unigram 'model' (global term counts) on the corpus itself,
    then score every document by the mean commonness of its tokens in
    parts-per-million — ``cpm(term) = global_count * 10^6 // N_total``
    (floor division, bit-identical in pandas and DuckDB). Documents
    dominated by rare/garbled tokens score low, exactly the signal the
    CCNet perplexity filter thresholds on — but with integer sufficient
    statistics instead of ``ln`` (cross-engine ``ln`` differs in the
    last ulp, see :func:`bm25_components`), so the value hash gates it.

    Scale shape — the :func:`tfidf_top_terms` two-shuffle plan, no
    vocabulary broadcast: (1) (doc, term, tf) partials shuffle on
    ``term``; a term's bucket holds ALL its postings, so the global
    count is a local ``transform('sum')`` and the cpm attach costs
    nothing; (2) the (doc, tf*cpm) contributions shuffle on ``doc`` and
    sum. ``N_total`` is a one-int all-reduce done before stage 1. The
    only float is the final ``mean_cpm = sum_cpm / n_tokens``, one
    closed-form double over two exact int64s."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_term, out_tf = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            if not toks:
                continue
            counts = pd.Series(toks, dtype=object).value_counts()
            out_doc.extend([int(doc_id)] * len(counts))
            out_term.extend(counts.index.tolist())
            out_tf.extend(counts.to_numpy(dtype=np.int64).tolist())
        return pd.DataFrame(
            {"doc_id": np.array(out_doc, dtype=np.int64),
             "term": np.array(out_term, dtype=object),
             "tf": np.array(out_tf, dtype=np.int64)}
        )

    tf = docs.map_batches(tf_rows, batch_format="pandas")

    def n_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(batch["tf"].sum())]})

    n_total = int(
        collect_small(
            tf.map_batches(n_partial, batch_format="pandas"), ["n"]
        )["n"].sum()
    )

    def attach_cpm(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.copy()
        c = g.groupby("term", sort=False)["tf"].transform("sum")
        cpm = (c.to_numpy(dtype=np.int64) * 1_000_000) // n_total
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(dtype=np.int64),
             "tf": g["tf"].to_numpy(dtype=np.int64),
             "contrib": g["tf"].to_numpy(dtype=np.int64) * cpm}
        )

    scored = grouped_aggregate(tf, ["term"], attach_cpm, num_partitions=16)

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("doc_id", sort=False).agg(
            n_tokens=("tf", "sum"), sum_cpm=("contrib", "sum")
        ).reset_index()
        g["mean_cpm"] = (
            g["sum_cpm"].to_numpy(dtype=np.float64)
            / g["n_tokens"].to_numpy(dtype=np.float64)
        )
        return g.astype({"doc_id": np.int64, "n_tokens": np.int64,
                         "sum_cpm": np.int64})

    return grouped_aggregate(scored, ["doc_id"], per_doc, num_partitions=8)


UNIGRAM_COMMONNESS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(tf) AS BIGINT) AS n FROM tf
), c AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf.tf * ((c.cnt * 1000000) // t.n)) AS BIGINT) AS sum_cpm,
       CAST(SUM(tf.tf * ((c.cnt * 1000000) // t.n)) AS DOUBLE)
         / CAST(SUM(tf.tf) AS DOUBLE) AS mean_cpm
FROM tf JOIN c USING (term) CROSS JOIN tot t
GROUP BY 1
"""


def source_token_diversity(sf_dir: str):
    """Per-source lexical diversity — the corpus-mix health check a
    pretraining pipeline runs per provider: token count N, vocabulary
    size V, type-token ratio V/N, and the Gini-Simpson diversity index
    ``1 - Σ c_t² / N²`` (the probability two random tokens differ — a
    repetition/templating detector that, unlike Shannon entropy, needs
    NO ``ln`` so it value-hashes exactly; Σ c², N, V are integer
    sufficient statistics, each final a single closed-form double).

    Scale shape: (source, term, tf) partials shuffle ONCE on ``term``
    (not on source — sources are few and would skew); a term's bucket
    holds all its (source, term) postings, so the bucket emits exact
    per-source partials (Σc, V-count, Σc²) that SUM across buckets
    because term sets are disjoint. The final per-source add-up is
    source-bounded."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out_src, out_term, out_tf = [], [], []
        for src, text in zip(batch["source"], batch["text"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            if not toks:
                continue
            counts = pd.Series(toks, dtype=object).value_counts()
            out_src.extend([str(src)] * len(counts))
            out_term.extend(counts.index.tolist())
            out_tf.extend(counts.to_numpy(dtype=np.int64).tolist())
        return pd.DataFrame(
            {"source": np.array(out_src, dtype=object),
             "term": np.array(out_term, dtype=object),
             "tf": np.array(out_tf, dtype=np.int64)}
        )

    tf = docs.map_batches(tf_rows, batch_format="pandas")

    def bucket_partials(bucket: pd.DataFrame) -> pd.DataFrame:
        per_st = (
            bucket.groupby(["source", "term"], sort=False)["tf"]
            .sum().reset_index()
        )
        c = per_st["tf"].to_numpy(dtype=np.int64)
        per_st["c2"] = c * c
        g = per_st.groupby("source", sort=False).agg(
            n_part=("tf", "sum"), v_part=("term", "size"), c2_part=("c2", "sum")
        ).reset_index()
        return g.astype({"n_part": np.int64, "v_part": np.int64,
                         "c2_part": np.int64})

    partials = grouped_aggregate(tf, ["term"], bucket_partials,
                                 num_partitions=16)
    small = collect_small(partials, ["source", "n_part", "v_part", "c2_part"])
    out = small.groupby("source", as_index=False)[
        ["n_part", "v_part", "c2_part"]
    ].sum()
    out = out.rename(columns={"n_part": "n_tokens", "v_part": "vocab",
                              "c2_part": "sum_c2"})
    n = out["n_tokens"].to_numpy(dtype=np.float64)
    out["ttr"] = out["vocab"].to_numpy(dtype=np.float64) / n
    out["gini_simpson"] = (
        1.0 - out["sum_c2"].to_numpy(dtype=np.float64) / (n * n)
    )
    out = out.sort_values("source").reset_index(drop=True)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    out["vocab"] = out["vocab"].astype(np.int64)
    out["sum_c2"] = out["sum_c2"].astype(np.int64)
    return out


SOURCE_TOKEN_DIVERSITY_ORACLE = """
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(SUM(c * c) AS BIGINT) AS sum_c2,
       CAST(count(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS ttr,
       1.0 - CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
         AS gini_simpson
FROM tf GROUP BY 1
"""


def bigram_commonness(sf_dir: str):
    """Conditional bigram LM quality signal, integer-exact: score every
    document by the mean conditional commonness of its adjacent token
    pairs — ``cond_ppm(w1, w2) = c(w1, w2) · 10⁶ // c_first(w1)`` where
    ``c_first`` counts bigrams starting with ``w1``. This is the
    2-gram refinement of :func:`unigram_commonness` (the KenLM-style
    perplexity proxy without ``ln``): text whose next-token choices are
    typical of the corpus scores high, garbled or spliced text scores
    low.

    Scale shape — ONE term-side exchange, not two: bigram partials
    shuffle on ``w1`` ONLY, so a bucket holds every bigram sharing a
    first token and BOTH aggregates the ratio needs — c(w1,w2)
    (groupby w1,w2) and c_first(w1) (transform sum) — are local to the
    bucket. Then the (doc, tf·ppm) contributions shuffle on doc_id and
    sum. Docs with <2 tokens emit no row (no bigrams), matching the
    oracle's range(len−1) expansion."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    def bigram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_w1, out_w2 = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            if len(toks) < 2:
                continue
            out_doc.extend([int(doc_id)] * (len(toks) - 1))
            out_w1.extend(toks[:-1])
            out_w2.extend(toks[1:])
        df = pd.DataFrame(
            {"doc_id": np.array(out_doc, dtype=np.int64),
             "w1": np.array(out_w1, dtype=object),
             "w2": np.array(out_w2, dtype=object)}
        )
        return (
            df.groupby(["doc_id", "w1", "w2"], sort=False).size()
            .reset_index(name="tf").astype({"tf": np.int64})
        )

    tf = docs.map_batches(bigram_rows, batch_format="pandas")

    def attach_ppm(bucket: pd.DataFrame) -> pd.DataFrame:
        c = (
            bucket.groupby(["w1", "w2"], sort=False)["tf"].transform("sum")
            .to_numpy(dtype=np.int64)
        )
        cf = (
            bucket.groupby("w1", sort=False)["tf"].transform("sum")
            .to_numpy(dtype=np.int64)
        )
        ppm = (c * 1_000_000) // cf
        return pd.DataFrame(
            {"doc_id": bucket["doc_id"].to_numpy(dtype=np.int64),
             "tf": bucket["tf"].to_numpy(dtype=np.int64),
             "contrib": bucket["tf"].to_numpy(dtype=np.int64) * ppm}
        )

    scored = grouped_aggregate(tf, ["w1"], attach_ppm, num_partitions=16)

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("doc_id", sort=False).agg(
            n_bigrams=("tf", "sum"), sum_ppm=("contrib", "sum")
        ).reset_index()
        g["mean_cond_ppm"] = (
            g["sum_ppm"].to_numpy(dtype=np.float64)
            / g["n_bigrams"].to_numpy(dtype=np.float64)
        )
        return g.astype({"doc_id": np.int64, "n_bigrams": np.int64,
                         "sum_ppm": np.int64})

    return grouped_aggregate(scored, ["doc_id"], per_doc, num_partitions=8)


BIGRAM_COMMONNESS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                           '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), idx AS (
  SELECT doc_id, toks,
         CAST(unnest(range(0, len(toks) - 1)) AS BIGINT) AS i
  FROM d WHERE len(toks) >= 2
), big AS (
  SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2 FROM idx
), tfb AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
  FROM big GROUP BY 1, 2, 3
), cb AS (
  SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c FROM tfb GROUP BY 1, 2
), cf AS (
  SELECT w1, CAST(SUM(tf) AS BIGINT) AS cfirst FROM tfb GROUP BY 1
), scored AS (
  SELECT t.doc_id, t.tf, (cb.c * 1000000) // cf.cfirst AS ppm
  FROM tfb t
  JOIN cb ON cb.w1 = t.w1 AND cb.w2 = t.w2
  JOIN cf ON cf.w1 = t.w1
)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_bigrams,
       CAST(sum(tf * ppm) AS BIGINT) AS sum_ppm,
       CAST(sum(tf * ppm) AS DOUBLE) / sum(tf) AS mean_cond_ppm
FROM scored GROUP BY 1
"""


def gopher_quality_flags(sf_dir: str):
    """Gopher-style rule-based quality gate with per-rule attribution:
    each document gets four 0/1 rule flags — word count in [50, 10⁵],
    mean word length in [3, 10] (the integer cross-multiplied form
    ``3n ≤ Σchars ≤ 10n``, no float mean), ≥80% of words containing a
    letter (``10·alpha ≥ 8·n``), and ≥2 stopwords — plus the composed
    ``pass_all``. Unlike :func:`quality_scores` (continuous scores for
    threshold tuning) this is the rule-set semantics a curation recipe
    applies verbatim, and the attribution columns say WHICH rule killed
    a document. Embarrassingly parallel scan, integer-only, oracle
    replays every rule with list kernels. Rule set follows Rae et al.
    2021 (Gopher) §A1.1 adapted to the schema's single-space corpus."""
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = t.split(" ") if t else []
            n = len(toks)
            sum_chars = sum(len(w) for w in toks)
            # ASCII letter test, matching the oracle's regexp_matches
            # '[a-zA-Z]' — Unicode isalpha() would diverge on non-ASCII.
            alpha = sum(
                1 for w in toks if not _ASCII_LETTERS.isdisjoint(w)
            )
            stop = sum(1 for w in toks if w in _STOPWORDS)
            r_wc = 50 <= n <= 100_000
            r_ml = 3 * n <= sum_chars <= 10 * n
            r_al = 10 * alpha >= 8 * n
            r_st = stop >= 2
            rows.append((int(doc_id), n, sum_chars, alpha, stop,
                         int(r_wc), int(r_ml), int(r_al), int(r_st),
                         int(r_wc and r_ml and r_al and r_st)))
        out = pd.DataFrame(
            rows,
            columns=["doc_id", "n_words", "sum_word_chars", "n_alpha_words",
                     "n_stopwords", "r_wordcount", "r_meanlen", "r_alpha",
                     "r_stopwords", "pass_all"],
        )
        return out.astype({c: np.int64 for c in out.columns})

    return docs.map_batches(kernel, batch_format="pandas")


GOPHER_QUALITY_FLAGS_ORACLE = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS toks
  FROM documents
), agg AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(length(array_to_string(toks, '')) AS BIGINT)
           AS sum_word_chars,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_filter(toks, t -> list_contains(
             ['the','a','an','and','or','of','to','in','is','are','was',
              'were','be','been','it','this','that'], t))) AS BIGINT)
           AS n_stopwords
  FROM s
)
SELECT doc_id, n_words, sum_word_chars, n_alpha_words, n_stopwords,
       CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
         AS r_wordcount,
       CASE WHEN 3 * n_words <= sum_word_chars
             AND sum_word_chars <= 10 * n_words THEN 1 ELSE 0 END
         AS r_meanlen,
       CASE WHEN 10 * n_alpha_words >= 8 * n_words THEN 1 ELSE 0 END
         AS r_alpha,
       CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END AS r_stopwords,
       CASE WHEN n_words BETWEEN 50 AND 100000
             AND 3 * n_words <= sum_word_chars
             AND sum_word_chars <= 10 * n_words
             AND 10 * n_alpha_words >= 8 * n_words
             AND n_stopwords >= 2 THEN 1 ELSE 0 END AS pass_all
FROM agg
"""


def intra_doc_repeats(sf_dir: str, n: int = 3):
    """Self-repetition localization — the within-document complement of
    the cross-document `dup_ngrams` screen: per document, how many of
    its word-``n``-gram positions repeat a gram that already occurred
    EARLIER in the same document (the looping-generator signature), and
    how many distinct grams do the repeating. `repetition_signals`
    reports corpus-level rates; this pins the mass to documents so a
    curation pass can drop or truncate the loopers. Documents with no
    internal repetition emit no row.

    Shape: entirely scan-local (each document's gram positions live in
    its own row) — zero exchange, embarrassingly parallel; output is
    bounded by the repeating documents, never the gram stream."""
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids, n_pos, n_rep, n_grams = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_numpy(), batch["text"].fillna("").astype(str)
        ):
            words = text.split()
            if len(words) < n:
                continue
            seen: dict[str, int] = {}
            repeats = 0
            repeated: set[str] = set()
            for i in range(len(words) - n + 1):
                gram = " ".join(words[i : i + n])
                if gram in seen:
                    repeats += 1
                    repeated.add(gram)
                else:
                    seen[gram] = i
            if repeats == 0:
                continue
            ids.append(doc_id)
            n_pos.append(len(words) - n + 1)
            n_rep.append(repeats)
            n_grams.append(len(repeated))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype=np.int64),
                "n_positions": pd.Series(n_pos, dtype=np.int64),
                "n_repeat_positions": pd.Series(n_rep, dtype=np.int64),
                "n_repeated_grams": pd.Series(n_grams, dtype=np.int64),
            }
        )

    return docs.map_batches(kernel, batch_format="pandas")


def intra_doc_repeats_oracle(n: int = 3) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE length(COALESCE(text, '')) > 0
), t AS (
  SELECT doc_id, words, len(words) AS wlen FROM d WHERE len(words) >= {n}
), g AS (
  SELECT doc_id, wlen,
         CAST(unnest(range(1, wlen - {n} + 2)) AS BIGINT) AS i
  FROM t
), grams AS (
  SELECT g.doc_id, g.wlen, g.i,
         array_to_string(t.words[g.i : g.i + {n} - 1], ' ') AS gram
  FROM g JOIN t USING (doc_id)
), marked AS (
  SELECT doc_id, wlen, gram,
         row_number() OVER (PARTITION BY doc_id, gram ORDER BY i) AS rn
  FROM grams
)
SELECT doc_id,
       CAST(max(wlen) - {n} + 1 AS BIGINT) AS n_positions,
       CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_repeat_positions,
       CAST(count(DISTINCT gram) FILTER (rn > 1) AS BIGINT)
         AS n_repeated_grams
FROM marked GROUP BY 1 HAVING count(*) FILTER (rn > 1) > 0
"""


def gram_novelty(sf_dir: str, k: int = 3):
    """Per-document n-gram novelty — the curation signal for "how much
    NEW content does this doc add": among a doc's distinct word
    k-grams, the share whose global first occurrence (min ``doc_id``
    over the corpus) is this doc. Boilerplate-heavy or near-duplicate
    docs score low; the corpus's earliest docs score high by
    construction (`vocab_growth_curve` is the corpus-level decile view
    of the same arrival idea — this is the per-doc score).

    Shape: one explode pass to (gram, doc_id) posting rows (distinct
    per doc, shared tokenizer with the dedup family so the DuckDB
    oracle shingles identically), a gram-keyed two-phase MIN for the
    owner, then owner counts and per-doc gram totals meet in ONE
    doc-keyed tagged-union aggregate. Both exchanges are combiner
    partials (min / sum), never row-proportional rescans; output ints
    only, so the driver hash is exact.
    """
    import pyarrow as pa

    from entity_extractor_linker_ray.ops.dedupe import _word_ngrams
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> "pa.Table":
        ids: list[int] = []
        grams: list[str] = []
        for d, t in zip(batch["doc_id"], batch["text"]):
            gs = _word_ngrams(t, k)
            ids.extend([int(d)] * len(gs))
            grams.extend(gs)
        return pa.table(
            {"g": pa.array(grams, pa.string()),
             "doc_id": pa.array(ids, pa.int64())}
        )

    gram_rows = docs.map_batches(explode, batch_format="pandas")

    def min_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("g", sort=False, as_index=False)["doc_id"].min()

    owners = grouped_aggregate(gram_rows, ["g"], min_partial,
                               partial=min_partial)

    def novel_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("doc_id", sort=False).size().reset_index(name="n_novel")
        )
        out["n_grams"] = np.int64(0)
        return out[["doc_id", "n_grams", "n_novel"]].astype(
            {"doc_id": np.int64, "n_grams": np.int64, "n_novel": np.int64}
        )

    def total_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("doc_id", sort=False).size().reset_index(name="n_grams")
        )
        out["n_novel"] = np.int64(0)
        return out[["doc_id", "n_grams", "n_novel"]].astype(
            {"doc_id": np.int64, "n_grams": np.int64, "n_novel": np.int64}
        )

    unioned = gram_rows.map_batches(total_partial, batch_format="pandas").union(
        owners.map_batches(novel_partial, batch_format="pandas")
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("doc_id", sort=False, as_index=False)[
            ["n_grams", "n_novel"]
        ].sum()
        g = g[g["n_grams"] > 0]
        grams_n = g["n_grams"].to_numpy(dtype=np.int64)
        novel_n = g["n_novel"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(dtype=np.int64),
             "n_grams": grams_n, "n_novel": novel_n,
             "novelty_pct": (100 * novel_n) // grams_n}
        )

    return grouped_aggregate(unioned, ["doc_id"], final, coalesce=True)


def gram_novelty_oracle(k: int = 3) -> str:
    gram_expr = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(COALESCE(text,'')), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, {gram_expr} AS g
  FROM toks, UNNEST(generate_series(1, len(w) - {k - 1})) AS t(i)
), own AS (
  SELECT g, min(doc_id) AS owner FROM grams GROUP BY g
), per_doc AS (
  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
), nov AS (
  SELECT owner AS doc_id, count(*) AS n_novel FROM own GROUP BY owner
)
SELECT d.doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
       CAST((100 * COALESCE(n_novel, 0)) // n_grams AS BIGINT) AS novelty_pct
FROM per_doc d LEFT JOIN nov USING (doc_id)
"""


def source_gram_overlap(sf_dir: str, k: int = 3):
    """Pairwise source-level content overlap: exact Jaccard between
    the distinct word-k-gram sets of every source pair that shares at
    least one gram — the inter-feed contamination matrix (two sources
    with high gram Jaccard are mirroring each other and double-count
    in training mixes).

    Shape: the all-pairs comparison never happens — per gram the
    SORTED SET OF SOURCES containing it is built by a gram-keyed
    two-phase union (partials are per-batch distinct (gram, source)
    pairs, bounded by grams x |sources|), each bucket emits per
    source-set COUNTS (<= 2^|sources| rows per bucket), and the
    |sources|^2 matrix falls out of the tiny mask histogram on the
    driver. One exchange; wire rows are gram-keyed partials.
    """
    from entity_extractor_linker_ray.ops.dedupe import _word_ngrams
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    import pyarrow as pa

    docs = read_split(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def explode(batch: pd.DataFrame) -> "pa.Table":
        srcs: list[str] = []
        grams: list[str] = []
        for s, t in zip(batch["source"], batch["text"]):
            gs = _word_ngrams(t, k)
            srcs.extend([str(s)] * len(gs))
            grams.extend(gs)
        out = pd.DataFrame({"g": grams, "source": srcs})
        out = out.drop_duplicates()
        return pa.table(
            {"g": pa.array(out["g"].tolist(), pa.string()),
             "source": pa.array(out["source"].tolist(), pa.string())}
        )

    gram_rows = docs.map_batches(explode, batch_format="pandas")

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["g", "source"])

    def srcset_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"srcset": pd.Series([], dtype=str),
                 "n_grams": pd.Series([], dtype=np.int64)}
            )
        dedup = bucket.drop_duplicates(["g", "source"]).sort_values(
            ["g", "source"], kind="stable"
        )
        sets = dedup.groupby("g", sort=False)["source"].agg("|".join)
        vc = sets.value_counts()
        return pd.DataFrame(
            {"srcset": vc.index.to_numpy(dtype=object),
             "n_grams": vc.to_numpy(dtype=np.int64)}
        )

    grid = collect_small(
        grouped_aggregate(gram_rows, ["g"], srcset_counts,
                          partial=pair_partial),
        ["srcset", "n_grams"],
    )
    empty = pd.DataFrame(
        {"source_a": pd.Series([], dtype=str),
         "source_b": pd.Series([], dtype=str),
         "n_common": pd.Series([], dtype=np.int64),
         "n_a": pd.Series([], dtype=np.int64),
         "n_b": pd.Series([], dtype=np.int64),
         "jaccard_pct": pd.Series([], dtype=np.int64)}
    )
    if grid.empty:
        return empty
    hist = grid.groupby("srcset")["n_grams"].sum()
    sizes: dict[str, int] = {}
    commons: dict[tuple[str, str], int] = {}
    for srcset, n in hist.items():
        members = srcset.split("|")
        for s in members:
            sizes[s] = sizes.get(s, 0) + int(n)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                key = (members[i], members[j])
                commons[key] = commons.get(key, 0) + int(n)
    if not commons:
        return empty
    rows = []
    for (sa, sb), c in sorted(commons.items()):
        na, nb = sizes[sa], sizes[sb]
        union = na + nb - c
        rows.append((sa, sb, c, na, nb, (100 * c) // union))
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_common", "n_a", "n_b",
                 "jaccard_pct"],
    ).astype({c: np.int64 for c in ("n_common", "n_a", "n_b", "jaccard_pct")})


def source_gram_overlap_oracle(k: int = 3) -> str:
    gram_expr = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(COALESCE(text,'')), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT source, {gram_expr} AS g
  FROM toks, UNNEST(generate_series(1, len(w) - {k - 1})) AS t(i)
), sizes AS (
  SELECT source, count(*) AS n FROM grams GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS c
  FROM grams a JOIN grams b USING (g)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(c AS BIGINT) AS n_common,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST((100 * c) // (sa.n + sb.n - c) AS BIGINT) AS jaccard_pct
FROM inter
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""


def _bpe_apply(word: str, ranks: dict) -> list:
    """Apply learned merges to one word, lowest-rank pair first (ties
    impossible: ranks are unique). Standard greedy BPE application —
    every non-overlapping occurrence of the chosen pair merges
    left-to-right, then the scan repeats until no learned pair
    remains."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        out = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and ranks.get((syms[i], syms[i + 1])) == best_rank
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_local_replica(word_counts: dict, n_merges: int) -> list:
    """Single-machine BPE trainer over a {word: count} dict — the
    correctness twin the distributed trainer is pytest-asserted equal
    to. Returns [(rank, left, right, count)] with the (count desc,
    left asc, right asc) tie-break."""
    merges: list = []
    ranks: dict = {}
    for rank in range(1, n_merges + 1):
        pair_counts: dict = {}
        for word, cnt in word_counts.items():
            syms = _bpe_apply(word, ranks)
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        ranks[(left, right)] = rank
    return merges


def bpe_train_merges(sf_dir: str, n_merges: int = 8):
    """Iterative BPE tokenizer training — the full merge-table learner
    (`bpe_merge_candidates` is round 1 only): ``n_merges`` greedy
    rounds, each picking the globally most frequent adjacent symbol
    pair (count desc, pair asc tie-break) over the corpus and merging
    it into a new symbol.

    Scale shape: ONE corpus pass collapses text to a {word -> count}
    table (combiner-bounded by the word vocabulary), pinned with
    ``materialize()`` exactly like the memoized KG edge list — every
    merge round then re-reads the vocabulary table, never the corpus.
    Per round: tokenize each distinct word under the current merge
    ranks (broadcast in the stage closure — the merge table is
    ``n_merges`` rows), emit per-batch pair-count partials, two-phase
    sum them, and each bucket surrenders only its LOCAL argmax row, so
    the driver picks the global best from <= #buckets candidates. The
    loop state on the driver is the merge table itself, never data.

    Verification: distributed == ``bpe_local_replica`` on the same
    corpus (pytest), plus a planted-corpus test with hand-computed
    merges; no SQL oracle by nature (iterative argmax)."""
    import re

    import pyarrow as pa

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    word_re = re.compile(r"[a-z]+")
    docs = read_split(f"{sf_dir}/documents.parquet", columns=["text"])

    def word_partial(batch: pd.DataFrame) -> pd.DataFrame:
        words: list = []
        for text in batch["text"]:
            words.extend(word_re.findall((text or "").lower()))
        if not words:
            return pd.DataFrame({"word": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64)})
        vc = pd.Series(words).value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(dtype=np.int64)})

    vocab = grouped_aggregate(
        docs.map_batches(word_partial, batch_format="pandas"),
        ["word"],
        lambda b: b.groupby("word", sort=False, as_index=False)["cnt"].sum(),
        partial=lambda b: b.groupby("word", sort=False,
                                    as_index=False)["cnt"].sum(),
    ).materialize()

    merges: list = []
    ranks: dict = {}
    for rank in range(1, n_merges + 1):
        frozen = dict(ranks)

        def pair_partial(batch: pd.DataFrame, _ranks=frozen) -> pd.DataFrame:
            lefts: list = []
            rights: list = []
            cnts: list = []
            for word, cnt in zip(batch["word"], batch["cnt"]):
                syms = _bpe_apply(word, _ranks)
                for a, b in zip(syms, syms[1:]):
                    lefts.append(a)
                    rights.append(b)
                    cnts.append(int(cnt))
            out = pd.DataFrame({"left": lefts, "right": rights, "cnt": cnts})
            if out.empty:
                return pd.DataFrame({"left": pd.Series([], dtype=str),
                                     "right": pd.Series([], dtype=str),
                                     "cnt": pd.Series([], dtype=np.int64)})
            return out.groupby(["left", "right"], sort=False,
                               as_index=False)["cnt"].sum()

        def bucket_argmax(bucket: pd.DataFrame) -> pd.DataFrame:
            if bucket.empty:
                return pd.DataFrame({"left": pd.Series([], dtype=str),
                                     "right": pd.Series([], dtype=str),
                                     "cnt": pd.Series([], dtype=np.int64)})
            tot = bucket.groupby(["left", "right"], sort=False,
                                 as_index=False)["cnt"].sum()
            tot = tot.sort_values(["cnt", "left", "right"],
                                  ascending=[False, True, True],
                                  kind="stable")
            return tot.head(1).astype({"cnt": np.int64})

        cands = collect_small(
            grouped_aggregate(
                vocab.map_batches(pair_partial, batch_format="pandas"),
                ["left", "right"], bucket_argmax,
            ),
            ["left", "right", "cnt"],
        )
        if cands.empty:
            break
        cands = cands.sort_values(["cnt", "left", "right"],
                                  ascending=[False, True, True],
                                  kind="stable")
        left, right, cnt = (cands.iloc[0]["left"], cands.iloc[0]["right"],
                            int(cands.iloc[0]["cnt"]))
        merges.append((np.int64(rank), left, right, left + right,
                       np.int64(cnt)))
        ranks[(left, right)] = rank

    return pd.DataFrame(
        merges,
        columns=["rank", "left", "right", "merged", "pair_count"],
    ).astype({"rank": np.int64, "pair_count": np.int64})


def dsir_importance(sf_dir: str, target_lang: str = "en", k: int = 2):
    """DSIR-style importance score per document — the data-selection
    signal of Xie et al. 2023 ("Data Selection for Language Models via
    Importance Resampling"): score every document by how much more its
    word-k-gram mass looks like a TARGET domain than like the raw
    corpus, here with the ``lang == target_lang`` slice standing in for
    the target sample. Documents whose grams are relatively more
    frequent in the target slice score high and would be up-weighted
    in an importance-resampled pretraining mix.

    Integer-exact variant so the value hash gates it: instead of
    ``Σ log p_t(g)/p_r(g)`` (cross-engine ``ln`` differs in the last
    ulp, see :func:`bm25_components`), the per-gram signal is the
    DIFFERENCE of Laplace-smoothed frequencies in parts-per-million —
    ``ppm_x(g) = (c_x(g)+1)·10⁶ // (N_x + V)`` with ``c_x`` the gram's
    occurrence count in class x, ``N_x`` the class's total gram
    occurrences and ``V`` the corpus-wide distinct-gram count — and the
    document score is ``Σ_g tf(g)·(ppm_t(g) − ppm_r(g))``: all int64,
    order-free, floor divisions over non-negative operands only.

    Scale shape (the :func:`unigram_commonness` plan, one extra
    vocab-bounded pass for the smoothing scalars): (1) (g, tf, class)
    partials collapse via a gram-keyed two-phase sum into the per-gram
    class-count table — vocab-bounded, materialized once like the
    memoized pair stream; the three smoothing scalars (N_t, N_r, V)
    are one tiny aggregate over it, never a vocabulary broadcast;
    (2) the (doc, g, tf) postings and the gram table meet in ONE
    gram-keyed tagged-union bucket that attaches ``tf·diff``;
    (3) a doc-keyed two-phase sum finishes. Nothing doc-proportional
    ever sits on the driver."""
    import re

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    split = re.compile(r"[^a-z0-9]+")
    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang"])

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_gram, out_tf, out_tgt = [], [], [], []
        for doc_id, text, lang in zip(batch["doc_id"], batch["text"],
                                      batch["lang"]):
            toks = [t for t in split.split((text or "").lower()) if t]
            if len(toks) < k:
                continue
            grams = [" ".join(toks[i : i + k])
                     for i in range(len(toks) - k + 1)]
            counts = pd.Series(grams, dtype=object).value_counts()
            out_doc.extend([int(doc_id)] * len(counts))
            out_gram.extend(counts.index.tolist())
            out_tf.extend(counts.to_numpy(dtype=np.int64).tolist())
            out_tgt.extend([np.int64(1 if lang == target_lang else 0)]
                           * len(counts))
        return pd.DataFrame(
            {"doc_id": np.array(out_doc, dtype=np.int64),
             "g": np.array(out_gram, dtype=object),
             "tf": np.array(out_tf, dtype=np.int64),
             "is_t": np.array(out_tgt, dtype=np.int64)}
        )

    tf = docs.map_batches(tf_rows, batch_format="pandas")

    # ---- stage 1: per-gram class counts (vocab-bounded) -------------
    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(c_t=batch["tf"] * batch["is_t"],
                         c_r=batch["tf"] * (1 - batch["is_t"]))
        return (
            b.groupby("g", sort=False)[["c_t", "c_r"]].sum().reset_index()
        )

    def count_final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("g", sort=False)[["c_t", "c_r"]]
            .sum()
            .reset_index()
            .astype({"c_t": np.int64, "c_r": np.int64})
        )

    gram_counts = grouped_aggregate(
        tf.map_batches(
            lambda b: b[["g", "tf", "is_t"]], batch_format="pandas"
        ),
        ["g"], count_final, partial=count_partial,
    ).materialize()  # vocab-bounded; reused for scalars + the join

    def scalar_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n_t": [int(batch["c_t"].sum())],
             "n_r": [int(batch["c_r"].sum())],
             "v": [len(batch)]}
        )

    scalars = collect_small(
        gram_counts.map_batches(scalar_partial, batch_format="pandas"),
        ["n_t", "n_r", "v"],
    )
    n_t = int(scalars["n_t"].sum())
    n_r = int(scalars["n_r"].sum())
    v = int(scalars["v"].sum())

    # ---- stage 2: tagged union attaches tf·(ppm_t − ppm_r) ----------
    def tag_postings(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": batch["g"].to_numpy(dtype=object),
             "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "tf": batch["tf"].to_numpy(dtype=np.int64),
             "c_t": np.int64(-1), "c_r": np.int64(-1)}
        )

    def tag_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": batch["g"].to_numpy(dtype=object),
             "doc_id": np.int64(-1), "tf": np.int64(0),
             "c_t": batch["c_t"].to_numpy(dtype=np.int64),
             "c_r": batch["c_r"].to_numpy(dtype=np.int64)}
        )

    unioned = tf.map_batches(tag_postings, batch_format="pandas").union(
        gram_counts.map_batches(tag_counts, batch_format="pandas")
    )

    def attach(bucket: pd.DataFrame) -> pd.DataFrame:
        counts = bucket[bucket["doc_id"] < 0]
        posts = bucket[bucket["doc_id"] >= 0]
        if posts.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "tf": pd.Series([], dtype=np.int64),
                 "contrib": pd.Series([], dtype=np.int64)}
            )
        m = posts.merge(counts[["g", "c_t", "c_r"]], on="g", how="left",
                        suffixes=("_x", ""))
        ppm_t = ((m["c_t"].to_numpy(dtype=np.int64) + 1) * 1_000_000) // (
            n_t + v
        )
        ppm_r = ((m["c_r"].to_numpy(dtype=np.int64) + 1) * 1_000_000) // (
            n_r + v
        )
        tf_arr = m["tf"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": m["doc_id"].to_numpy(dtype=np.int64),
             "tf": tf_arr, "contrib": tf_arr * (ppm_t - ppm_r)}
        )

    scored = grouped_aggregate(unioned, ["g"], attach, coalesce=True)

    # ---- stage 3: per-doc sum ---------------------------------------
    def doc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("doc_id", sort=False)[["tf", "contrib"]]
            .sum()
            .reset_index()
        )

    def doc_final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("doc_id", sort=False)[["tf", "contrib"]]
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(dtype=np.int64),
             "n_grams": g["tf"].to_numpy(dtype=np.int64),
             "dsir_score": g["contrib"].to_numpy(dtype=np.int64)}
        )

    return grouped_aggregate(scored, ["doc_id"], doc_final,
                             partial=doc_partial)


def dsir_importance_oracle(target_lang: str = "en", k: int = 2) -> str:
    gram_expr = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(COALESCE(text,'')),
                                           '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, (lang = '{target_lang}') AS is_t, {gram_expr} AS g
  FROM toks, UNNEST(generate_series(1, len(w) - {k - 1})) AS t(i)
), tf AS (
  SELECT doc_id, is_t, g, CAST(count(*) AS BIGINT) AS tf
  FROM grams GROUP BY 1, 2, 3
), c AS (
  SELECT g,
         CAST(SUM(CASE WHEN is_t THEN tf ELSE 0 END) AS BIGINT) AS c_t,
         CAST(SUM(CASE WHEN is_t THEN 0 ELSE tf END) AS BIGINT) AS c_r
  FROM tf GROUP BY 1
), s AS (
  SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,
         CAST(SUM(c_r) AS BIGINT) AS n_r,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM c
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_grams,
       CAST(SUM(tf.tf * (((c.c_t + 1) * 1000000) // (s.n_t + s.v)
                         - ((c.c_r + 1) * 1000000) // (s.n_r + s.v)))
            AS BIGINT) AS dsir_score
FROM tf JOIN c USING (g) CROSS JOIN s
GROUP BY 1
"""


_BPE_MERGES_CACHE: dict = _memo.register({})


def bpe_merges_cached(sf_dir: str, n_merges: int = 8) -> pd.DataFrame:
    """Memoized :func:`bpe_train_merges` — the trainer's consumers
    (encode stats, any future vocab export) share one training run per
    session, the `ngram_pairs_materialized` pattern (bounded
    keep-last-N, see ops.memo)."""
    return _memo.memoize(
        _BPE_MERGES_CACHE, (sf_dir, n_merges),
        lambda: bpe_train_merges(sf_dir, n_merges),
    )


def bpe_encode_stats(sf_dir: str, n_merges: int = 8):
    """Apply the trained BPE merge table to the corpus — the tokenizer
    APPLICATION half of the tokenizer story (`bpe_train_merges` is the
    learner): per source, exact word/char/token totals and the
    integer compression ratio ``chars_per_token_milli =
    n_chars·1000 // n_tokens`` (how many characters one learned token
    absorbs — THE metric a tokenizer sweep optimizes).

    Scale shape: the merge table is ``n_merges`` rows, broadcast in
    the task closure; each batch encodes through a batch-local
    word→token-count memo (encoding depends only on the word, so the
    memo hit rate is the corpus's word repetition rate), collapses to
    per-source partials, and ONE tiny source-keyed exchange finishes.
    Rows-only by nature (the merge table comes from the iterative
    trainer): distributed ≡ local replica encoding is pytest-asserted.
    """
    import re

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    merges = bpe_merges_cached(sf_dir, n_merges)
    ranks = {
        (left, right): int(rank)
        for rank, left, right in zip(merges["rank"], merges["left"],
                                     merges["right"])
    }
    word_re = re.compile(r"[a-z]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        memo: dict = {}
        srcs, n_words, n_chars, n_tokens = [], [], [], []
        for source, text in zip(batch["source"], batch["text"]):
            words = word_re.findall((text or "").lower())
            w = len(words)
            c = 0
            t = 0
            for word in words:
                hit = memo.get(word)
                if hit is None:
                    hit = len(_bpe_apply(word, ranks))
                    memo[word] = hit
                c += len(word)
                t += hit
            srcs.append(str(source))
            n_words.append(w)
            n_chars.append(c)
            n_tokens.append(t)
        df = pd.DataFrame(
            {"source": np.array(srcs, dtype=object),
             "n_words": np.array(n_words, dtype=np.int64),
             "n_chars": np.array(n_chars, dtype=np.int64),
             "n_tokens": np.array(n_tokens, dtype=np.int64)}
        )
        return (
            df.groupby("source", sort=False, as_index=False)[
                ["n_words", "n_chars", "n_tokens"]
            ].sum()
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("source", sort=False, as_index=False)[
                ["n_words", "n_chars", "n_tokens"]
            ].sum()
        )
        toks = g["n_tokens"].to_numpy(dtype=np.int64)
        chars = g["n_chars"].to_numpy(dtype=np.int64)
        g["chars_per_token_milli"] = np.where(
            toks > 0, (chars * 1000) // np.maximum(toks, 1), np.int64(0)
        )
        return g.astype(
            {c: np.int64 for c in ("n_words", "n_chars", "n_tokens",
                                   "chars_per_token_milli")}
        )

    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    return grouped_aggregate(docs, ["source"], final, partial=partial)


def _lang_score_sql() -> str:
    """Shared CTE body replaying the `LangId` marker rule: distinct
    first-200 tokens intersected with each language's marker set,
    winner = max score with alphabetical tiebreak, 'und' at zero."""
    markers_sql = {
        lang: "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"
        for lang, words in sorted(_LANG_MARKERS.items())
    }
    scores = ",\n         ".join(
        f"len(list_filter(toks, t -> list_contains({m}, t))) AS s_{lang}"
        for lang, m in markers_sql.items()
    )
    langs = sorted(_LANG_MARKERS)
    greatest = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = " ".join(f"WHEN s_{l} = m THEN '{l}'" for l in langs)
    return f"""
s AS (
  SELECT doc_id, lang,
         list_distinct(list_slice(string_split(COALESCE(text, ''), ' '),
                                  1, 200)) AS toks
  FROM documents
), sc AS (
  SELECT doc_id, lang,
         {scores}
  FROM s
), pred AS (
  SELECT doc_id, lang AS true_lang,
         CASE WHEN m = 0 THEN 'und' {case} END AS predicted_lang
  FROM (SELECT *, {greatest} AS m FROM sc)
)"""


LANG_ID_ORACLE = f"""
WITH {_lang_score_sql().strip()}
SELECT doc_id, predicted_lang FROM pred
"""


def lang_confusion_matrix(sf_dir: str):
    """Language-ID quality surface: the (true lang metadata ×
    predicted lang) confusion matrix with row-share in ppm — the
    artifact an LID threshold review reads. The marker heuristic is a
    pure function of the text, so unlike typical model-eval confusions
    this one is fully value-gated: the oracle replays the scoring rule
    (distinct first-200 tokens ∩ marker sets, alphabetical tiebreak,
    'und' at zero) in SQL.

    Shape: the LID scan emits (true, predicted) partials; one tiny
    |langs|² exchange; the per-true-row normalization is bucket-local
    (a true lang's whole row lands in its bucket)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    markers = {lang: set(words) for lang, words in _LANG_MARKERS.items()}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for true_lang, t in zip(batch["lang"], batch["text"].fillna("")):
            tokens = set(t.split(" ")[:200])
            scores = {lang: len(tokens & words)
                      for lang, words in markers.items()}
            best = max(sorted(scores), key=lambda lang: scores[lang])
            rows.append((str(true_lang),
                         best if scores[best] > 0 else "und", 1))
        df = pd.DataFrame(rows, columns=["true_lang", "predicted_lang", "n"])
        return (
            df.groupby(["true_lang", "predicted_lang"], sort=False,
                       as_index=False)["n"].sum()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["true_lang", "predicted_lang"], sort=False,
                           as_index=False)["n"].sum()
        )
        tot = g.groupby("true_lang", sort=False)["n"].transform("sum")
        g["row_share_ppm"] = (
            g["n"].to_numpy(dtype=np.int64) * 1_000_000
        ) // tot.to_numpy(dtype=np.int64)
        return g.astype({"n": np.int64, "row_share_ppm": np.int64})

    return grouped_aggregate(docs, ["true_lang"], combine, partial=partial)


LANG_CONFUSION_ORACLE = f"""
WITH {_lang_score_sql().strip()}
, cm AS (
  SELECT true_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
)
SELECT true_lang, predicted_lang, n,
       CAST((n * 1000000) // SUM(n) OVER (PARTITION BY true_lang)
            AS BIGINT) AS row_share_ppm
FROM cm
"""
