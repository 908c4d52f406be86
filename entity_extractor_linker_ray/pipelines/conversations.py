"""Conversation-level analytics over the transcripts table — the
per-conversation feature rollup an agent-transcript corpus needs
before any modeling (turn counts, role mix, tool usage, length, span).

The transcripts here are the repo's deterministic documents→turns
derivation (``synthetic.transcripts_dataset_from_documents``: 12-word
turns, roles cycling user/assistant/tool, tools non-empty at
ti%6∈{2,4}, ts = EPOCH + doc_id·3600e6 + ti·1e6) — the SAME corpus the
kg_pipeline_* queries consume. Because that derivation is pure integer
arithmetic over the documents table, the oracle can REPLAY the
synthesis in SQL (``range()`` per doc) and the per-conversation
aggregate is value-hash-gated end to end, unlike the stub-LLM KG
outputs which are rows-only at the driver.

Shape: the conv_id key is conversation-cardinality (groups ≈ docs), so
this is the bucketed two-phase aggregate — per-batch partials (counts,
word sums, min/max ts) collapse each batch to ≤ one row per
conversation before the exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def conv_stats(sf_dir: str):
    """Per-conversation: turn count, user-role turn count, tool-call
    turn count (non-empty ``tool``), total whitespace words across all
    turns, first-turn epoch-µs timestamp, and conversation span in µs.

    All columns are exact integers; the aggregate is mergeable
    (sum/sum/sum/sum/min/max), so partials from any batch split
    combine losslessly."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        words = np.where(
            text.str.len().to_numpy() > 0,
            text.str.count(" ").to_numpy(dtype=np.int64) + 1,
            np.int64(0),
        )
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_numpy(),
                "n_turns": np.int64(1),
                "n_user_turns": (batch["role"].to_numpy() == "user").astype(np.int64),
                "n_tool_turns": (
                    batch["tool"].fillna("").to_numpy(dtype=object) != ""
                ).astype(np.int64),
                "total_words": words,
                "min_ts": ts_us,
                "max_ts": ts_us,
            }
        )
        return (
            df.groupby("conv_id", sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_user_turns=("n_user_turns", "sum"),
                n_tool_turns=("n_tool_turns", "sum"),
                total_words=("total_words", "sum"),
                min_ts=("min_ts", "min"),
                max_ts=("max_ts", "max"),
            )
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby("conv_id", sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_user_turns=("n_user_turns", "sum"),
                n_tool_turns=("n_tool_turns", "sum"),
                total_words=("total_words", "sum"),
                min_ts=("min_ts", "min"),
                max_ts=("max_ts", "max"),
            )
            .reset_index()
        )
        out = m[["conv_id", "n_turns", "n_user_turns", "n_tool_turns",
                 "total_words"]].copy()
        out["first_ts_us"] = m["min_ts"]
        out["span_us"] = m["max_ts"] - m["min_ts"]
        return out.astype(
            {c: np.int64 for c in ("n_turns", "n_user_turns", "n_tool_turns",
                                   "total_words", "first_ts_us", "span_us")}
        )

    return grouped_aggregate(turns, ["conv_id"], combine, partial=partial)


# The oracle replays the synthesis: words = single-space-separated
# tokens (the corpus invariant every documents oracle here relies on),
# n_turns = ceil(words/12) with an empty doc still yielding one empty
# turn, roles cycle period 3 (user at ti%3=0), tools cycle period 6
# (non-empty at ti%6 in (2,4)), ts = 2024-01-01 + doc_id hours + ti
# seconds... in µs: EPOCH + doc_id*3.6e9 + ti*1e6.
CONV_STATS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0 THEN 0
              ELSE len(string_split(text, ' ')) END AS words
  FROM documents
), t AS (
  SELECT doc_id, words,
         CASE WHEN words = 0 THEN 1 ELSE (words + 11) // 12 END AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, n_turns, unnest(range(0, n_turns)) AS ti FROM t
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       CAST(max(n_turns) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN ti % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_user_turns,
       CAST(sum(CASE WHEN ti % 6 IN (2, 4) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool_turns,
       CAST(max(words) AS BIGINT) AS total_words,
       CAST(1704067200000000 + max(doc_id) * 3600000000 AS BIGINT)
         AS first_ts_us,
       CAST((max(n_turns) - 1) * 1000000 AS BIGINT) AS span_us
FROM g GROUP BY 1
"""

def conv_role_words(sf_dir: str):
    """Per-(conversation, role) rollup: turn count and whitespace-word
    count for user / assistant / tool turns separately — the role-mix
    feature behind 'how verbose is the assistant vs the user' analyses
    of agent transcripts. Same two-phase shape as :func:`conv_stats`;
    the oracle replays the deterministic synthesis (roles cycle period
    3, per-turn words = min(12, remaining))."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)
    keys = ["conv_id", "role"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        words = np.where(
            text.str.len().to_numpy() > 0,
            text.str.count(" ").to_numpy(dtype=np.int64) + 1,
            np.int64(0),
        )
        df = pd.DataFrame(
            {"conv_id": batch["conv_id"].to_numpy(),
             "role": batch["role"].to_numpy(),
             "n_turns": np.int64(1),
             "n_words": words}
        )
        return (
            df.groupby(keys, sort=False)
            .agg(n_turns=("n_turns", "sum"), n_words=("n_words", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False)
            .agg(n_turns=("n_turns", "sum"), n_words=("n_words", "sum"))
            .reset_index()
            .astype({"n_turns": np.int64, "n_words": np.int64})
        )

    return grouped_aggregate(turns, keys, combine, partial=partial)


CONV_ROLE_WORDS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0 THEN 0
              ELSE len(string_split(text, ' ')) END AS words
  FROM documents
), t AS (
  SELECT doc_id, words,
         CASE WHEN words = 0 THEN 1 ELSE (words + 11) // 12 END AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, unnest(range(0, n_turns)) AS ti FROM t
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       CASE CAST(ti % 3 AS INTEGER) WHEN 0 THEN 'user'
            WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       count(*) AS n_turns,
       CAST(sum(CASE WHEN words = 0 THEN 0
                     ELSE LEAST(12, words - 12 * ti) END) AS BIGINT) AS n_words
FROM g GROUP BY 1, 2
"""


def conv_role_lexicon(sf_dir: str):
    """Corpus-level lexicon per speaker role: exact word total, distinct
    word count, and type-token ratio for the words uttered by user /
    assistant / tool turns — the 'is the assistant actually adding
    vocabulary or parroting the user' diagnostic of an agent-transcript
    corpus. A word's role is pure arithmetic on its position
    (``(word_idx // 12) % 3``), so the op never needs the turns table.

    Shape: the scan kernel splits each document once and pre-counts per
    (role, word); the single exchange is keyed on ``role`` (3 groups)
    and each bucket's distinct-word count runs over vocabulary-bounded
    partials — the same boundedness argument as the tf-idf family, and
    the reason no corpus-proportional row ever crosses the wire."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    role_names = np.array(["user", "assistant", "tool"], dtype=object)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        roles, words = [], []
        for text in batch["text"].fillna("").astype(str):
            w = text.split()
            if not w:
                continue
            idx = np.arange(len(w), dtype=np.int64)
            roles.append(role_names[(idx // 12) % 3])
            words.append(np.asarray(w, dtype=object))
        if not roles:
            return pd.DataFrame(
                {"role": pd.Series([], dtype=str),
                 "word": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype=np.int64)}
            )
        df = pd.DataFrame(
            {"role": np.concatenate(roles), "word": np.concatenate(words)}
        )
        return (
            df.groupby(["role", "word"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby("role", sort=False)
            .agg(n_words=("n", "sum"), n_distinct_words=("word", "nunique"))
            .reset_index()
            .astype({"n_words": np.int64, "n_distinct_words": np.int64})
        )
        # one division per emitted row — bit-reproducible vs the oracle
        out["type_token_ratio"] = (
            out["n_distinct_words"].to_numpy(dtype=np.float64)
            / out["n_words"].to_numpy(dtype=np.float64)
        )
        return out

    return grouped_aggregate(docs, ["role"], combine, partial=partial,
                             num_partitions=4)


CONV_ROLE_LEXICON_ORACLE = """
WITH d AS (
  SELECT string_split(text, ' ') AS w
  FROM documents WHERE length(COALESCE(text, '')) > 0
), g AS (
  SELECT w, CAST(unnest(range(0, len(w))) AS BIGINT) AS i FROM d
), words AS (
  SELECT w[i + 1] AS word,
         CASE CAST((i // 12) % 3 AS INTEGER) WHEN 0 THEN 'user'
              WHEN 1 THEN 'assistant' ELSE 'tool' END AS role
  FROM g
)
SELECT role,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words,
       CAST(count(DISTINCT word) AS DOUBLE) / count(*) AS type_token_ratio
FROM words GROUP BY 1
"""


def conv_chatml_export(sf_dir: str):
    """Training-format export: each conversation rendered as ONE
    chat-template string (``<|role|>text`` lines joined by newlines, in
    turn order) plus turn and character counts — the packaging step
    between transcript tables and an SFT data loader. Ordered string
    aggregation uses the :func:`~entity_extractor_linker_ray.pipelines.
    relational.user_journeys` segment-slice kernel: one bucketed
    exchange on conv_id, one stable sort per bucket, one C-level join
    into a single buffer, per-conversation slices at segment
    boundaries — no per-row Python. Oracle replays the deterministic
    turn synthesis in SQL and aggregates with ORDER BY string_agg."""
    import ray.data as rd  # noqa: F401

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        line = (
            "<|" + batch["role"].astype(str) + "|>"
            + batch["text"].fillna("").astype(str)
        )
        return pd.DataFrame(
            {"conv_id": batch["conv_id"].astype(str).to_numpy(),
             "turn_idx": batch["turn_idx"].to_numpy(dtype=np.int64),
             "line": line.to_numpy()}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"conv_id": pd.Series([], dtype=str),
                 "n_turns": pd.Series([], dtype=np.int64),
                 "chatml": pd.Series([], dtype=str),
                 "n_chars": pd.Series([], dtype=np.int64)}
            )
        df = bucket.sort_values(["conv_id", "turn_idx"], kind="stable")
        convs = df["conv_id"].to_numpy()
        with_sep = df["line"].astype(str) + "\n"
        big = "".join(with_sep.tolist())
        offs = np.concatenate(
            ([0], np.cumsum(with_sep.str.len().to_numpy(dtype=np.int64)))
        )
        starts = np.flatnonzero(
            np.concatenate(([True], convs[1:] != convs[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(convs)]))
        chat = [big[offs[s]:offs[e] - 1] for s, e in zip(starts, ends)]
        return pd.DataFrame(
            {"conv_id": convs[starts],
             "n_turns": (ends - starts).astype(np.int64),
             "chatml": chat,
             "n_chars": np.array([len(c) for c in chat], dtype=np.int64)}
        )

    return grouped_aggregate(
        turns.map_batches(prep, batch_format="pandas"), ["conv_id"], combine
    )


def conv_sft_pairs(sf_dir: str):
    """Instruction-response pair mining: for every user turn that is
    immediately followed by an assistant turn in the same conversation,
    count the pair and its prompt/response character volumes — the
    selection step between raw agent transcripts and an SFT dataset.

    Shape: adjacency needs turn order, so this is the window-scan
    bucket shape (no ``partial`` — raw per-turn rows move, one stable
    sort per conv_id bucket, vectorized shift compare). Conversations
    with no qualifying pair (single-turn) emit no row, matching the
    oracle's GROUP BY over pairs only."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"conv_id": batch["conv_id"].astype(str).to_numpy(),
             "turn_idx": batch["turn_idx"].to_numpy(dtype=np.int64),
             "role": batch["role"].astype(str).to_numpy(),
             "n_chars": batch["text"].fillna("").str.len().to_numpy(np.int64)}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"conv_id": pd.Series([], dtype=str),
             "n_pairs": pd.Series([], dtype=np.int64),
             "prompt_chars": pd.Series([], dtype=np.int64),
             "response_chars": pd.Series([], dtype=np.int64)}
        )
        if bucket.empty:
            return empty
        df = bucket.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy()
        ch = df["n_chars"].to_numpy(dtype=np.int64)
        nxt_same = np.concatenate((conv[1:] == conv[:-1], [False]))
        nxt_role = np.concatenate((role[1:], [""]))
        is_pair = nxt_same & (role == "user") & (nxt_role == "assistant")
        if not is_pair.any():
            return empty
        resp = np.concatenate((ch[1:], [np.int64(0)]))
        pairs = pd.DataFrame(
            {"conv_id": conv[is_pair],
             "prompt_chars": ch[is_pair],
             "response_chars": resp[is_pair]}
        )
        return (
            pairs.groupby("conv_id", sort=False)
            .agg(n_pairs=("prompt_chars", "size"),
                 prompt_chars=("prompt_chars", "sum"),
                 response_chars=("response_chars", "sum"))
            .reset_index()
            .astype({"n_pairs": np.int64, "prompt_chars": np.int64,
                     "response_chars": np.int64})
        )

    return grouped_aggregate(
        turns.map_batches(prep, batch_format="pandas"), ["conv_id"], combine
    )


# Pairs replay: user turns sit at ti%3=0 and the following turn (when it
# exists) is always 'assistant' (ti%3=1), so lead(n_chars) NULL-ness is
# exactly the pair predicate.
CONV_SFT_PAIRS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         CASE WHEN len(words) = 0 THEN 1 ELSE (len(words) + 11) // 12 END
           AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, wlen,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), chars AS (
  SELECT doc_id, ti,
         length(array_to_string(
             words[ti * 12 + 1 : least((ti + 1) * 12, wlen)], ' '))
           AS n_chars
  FROM g
), p AS (
  SELECT doc_id, ti, n_chars,
         lead(n_chars) OVER (PARTITION BY doc_id ORDER BY ti) AS next_chars
  FROM chars
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       count(*) AS n_pairs,
       CAST(sum(n_chars) AS BIGINT) AS prompt_chars,
       CAST(sum(next_chars) AS BIGINT) AS response_chars
FROM p WHERE ti % 3 = 0 AND next_chars IS NOT NULL
GROUP BY 1
"""


def turn_dedup_stats(sf_dir: str):
    """Message-level exact dedup over the WHOLE corpus: group turns by
    (role, text) across every conversation, then roll up per role —
    total turns, distinct texts, duplicate-turn count (total −
    distinct) and the largest duplicate group. This is the transcript
    analog of document exact-dedup: boilerplate tool outputs and
    repeated user prompts show up as heavy (role, text) groups.

    Shape: phase 1 is the high-cardinality two-phase aggregate on
    (role, text) — per-batch partial counts so the exchange moves one
    row per distinct batch-local text, and each (role, text) group
    lands wholly in one hash bucket, so phase 1 can ALREADY collapse
    each bucket to ≤3 per-role partial rows (sum/count/max are
    mergeable). Phase 2 merges ≤ 64×3 tiny partials — nothing
    text-sized crosses the second exchange."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {"role": batch["role"].astype(str).to_numpy(),
             "text": batch["text"].fillna("").astype(str).to_numpy(),
             "cnt": np.int64(1)}
        )
        return (
            df.groupby(["role", "text"], sort=False)
            .agg(cnt=("cnt", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"role": pd.Series([], dtype=str),
                 "n_turns": pd.Series([], dtype=np.int64),
                 "n_distinct_texts": pd.Series([], dtype=np.int64),
                 "n_dup_turns": pd.Series([], dtype=np.int64),
                 "max_group": pd.Series([], dtype=np.int64)}
            )
        per_text = (
            bucket.groupby(["role", "text"], sort=False)
            .agg(cnt=("cnt", "sum"))
            .reset_index()
        )
        out = (
            per_text.groupby("role", sort=False)
            .agg(n_turns=("cnt", "sum"),
                 n_distinct_texts=("cnt", "size"),
                 max_group=("cnt", "max"))
            .reset_index()
        )
        out["n_dup_turns"] = out["n_turns"] - out["n_distinct_texts"]
        return out[["role", "n_turns", "n_distinct_texts", "n_dup_turns",
                    "max_group"]].astype(
            {c: np.int64 for c in ("n_turns", "n_distinct_texts",
                                   "n_dup_turns", "max_group")}
        )

    bucket_partials = grouped_aggregate(turns, ["role", "text"], combine,
                                        partial=partial)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby("role", sort=False)
            .agg(n_turns=("n_turns", "sum"),
                 n_distinct_texts=("n_distinct_texts", "sum"),
                 n_dup_turns=("n_dup_turns", "sum"),
                 max_group=("max_group", "max"))
            .reset_index()
        )
        return out.astype(
            {c: np.int64 for c in ("n_turns", "n_distinct_texts",
                                   "n_dup_turns", "max_group")}
        )

    return grouped_aggregate(bucket_partials, ["role"], final)


CONV_TURN_DEDUP_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         CASE WHEN len(words) = 0 THEN 1 ELSE (len(words) + 11) // 12 END
           AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, wlen,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), lines AS (
  SELECT CASE CAST(ti % 3 AS INTEGER) WHEN 0 THEN 'user'
              WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         array_to_string(words[ti * 12 + 1 : least((ti + 1) * 12, wlen)],
                         ' ') AS txt
  FROM g
), grp AS (
  SELECT role, txt, count(*) AS c FROM lines GROUP BY 1, 2
)
SELECT role,
       CAST(sum(c) AS BIGINT) AS n_turns,
       count(*) AS n_distinct_texts,
       CAST(sum(c) - count(*) AS BIGINT) AS n_dup_turns,
       CAST(max(c) AS BIGINT) AS max_group
FROM grp GROUP BY 1
"""


def conv_context_growth(sf_dir: str):
    """Context-window budgeting: per conversation, the total character
    volume a context window would accumulate and how many turns it
    takes to cross a 256-char budget (0 if the conversation never
    does) — the feature behind 'how deep into the transcript does the
    context fill' analyses. Window-scan bucket shape: stable sort per
    bucket, segment-reset cumulative sum (vectorized via cumsum minus
    per-segment base), threshold search via a masked argmin."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)
    BUDGET = 256

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"conv_id": batch["conv_id"].astype(str).to_numpy(),
             "turn_idx": batch["turn_idx"].to_numpy(dtype=np.int64),
             "n_chars": batch["text"].fillna("").str.len().to_numpy(np.int64)}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"conv_id": pd.Series([], dtype=str),
                 "n_turns": pd.Series([], dtype=np.int64),
                 "total_chars": pd.Series([], dtype=np.int64),
                 "turns_to_256": pd.Series([], dtype=np.int64)}
            )
        df = bucket.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = df["conv_id"].to_numpy()
        ch = df["n_chars"].to_numpy(dtype=np.int64)
        n = len(conv)
        starts = np.flatnonzero(np.concatenate(([True], conv[1:] != conv[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        cs = np.cumsum(ch)
        base = np.repeat(cs[starts] - ch[starts], ends - starts)
        run = cs - base
        # first in-segment position (1-based) where run >= BUDGET
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts) + 1
        hit = np.where(run >= BUDGET, pos, np.int64(np.iinfo(np.int64).max))
        first_hit = np.minimum.reduceat(hit, starts)
        first_hit = np.where(first_hit == np.iinfo(np.int64).max, 0, first_hit)
        return pd.DataFrame(
            {"conv_id": conv[starts],
             "n_turns": (ends - starts).astype(np.int64),
             "total_chars": run[ends - 1].astype(np.int64),
             "turns_to_256": first_hit.astype(np.int64)}
        )

    return grouped_aggregate(
        turns.map_batches(prep, batch_format="pandas"), ["conv_id"], combine
    )


CONV_CONTEXT_GROWTH_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         CASE WHEN len(words) = 0 THEN 1 ELSE (len(words) + 11) // 12 END
           AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, wlen,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), chars AS (
  SELECT doc_id, ti,
         length(array_to_string(
             words[ti * 12 + 1 : least((ti + 1) * 12, wlen)], ' '))
           AS n_chars
  FROM g
), r AS (
  SELECT doc_id, ti, n_chars,
         sum(n_chars) OVER (PARTITION BY doc_id ORDER BY ti
                            ROWS UNBOUNDED PRECEDING) AS run
  FROM chars
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       count(*) AS n_turns,
       CAST(max(run) AS BIGINT) AS total_chars,
       CAST(COALESCE(min(CASE WHEN run >= 256 THEN ti + 1 END), 0) AS BIGINT)
         AS turns_to_256
FROM r GROUP BY 1
"""


def conv_tool_sequences(sf_dir: str):
    """Agent tool-call analytics: per conversation that calls at least
    one tool, the ordered tool-call sequence (joined with ``>``), call
    count and distinct-tool count — the 'what did the agent actually
    do' rollup. Filter to tool turns happens INSIDE the prep kernel
    (rows with empty ``tool`` never enter the exchange), then the
    ordered join reuses the chatml segment-slice shape."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        tool = batch["tool"].fillna("").astype(str)
        keep = tool.str.len() > 0
        return pd.DataFrame(
            {"conv_id": batch["conv_id"].astype(str).to_numpy()[keep.to_numpy()],
             "turn_idx": batch["turn_idx"].to_numpy(dtype=np.int64)[keep.to_numpy()],
             "tool": tool.to_numpy()[keep.to_numpy()]}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"conv_id": pd.Series([], dtype=str),
                 "n_tool_calls": pd.Series([], dtype=np.int64),
                 "n_distinct_tools": pd.Series([], dtype=np.int64),
                 "tool_seq": pd.Series([], dtype=str)}
            )
        df = bucket.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = df["conv_id"].to_numpy()
        with_sep = df["tool"].astype(str) + ">"
        big = "".join(with_sep.tolist())
        offs = np.concatenate(
            ([0], np.cumsum(with_sep.str.len().to_numpy(dtype=np.int64)))
        )
        starts = np.flatnonzero(np.concatenate(([True], conv[1:] != conv[:-1])))
        ends = np.concatenate((starts[1:], [len(conv)]))
        seqs = [big[offs[s]:offs[e] - 1] for s, e in zip(starts, ends)]
        ndist = (
            df.groupby("conv_id", sort=False)["tool"].nunique()
            .reindex(conv[starts]).to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {"conv_id": conv[starts],
             "n_tool_calls": (ends - starts).astype(np.int64),
             "n_distinct_tools": ndist,
             "tool_seq": seqs}
        )

    return grouped_aggregate(
        turns.map_batches(prep, batch_format="pandas"), ["conv_id"], combine
    )


CONV_TOOL_SEQUENCES_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0 THEN 0
              ELSE len(string_split(text, ' ')) END AS words
  FROM documents
), t AS (
  SELECT doc_id,
         CASE WHEN words = 0 THEN 1 ELSE (words + 11) // 12 END AS n_turns
  FROM d
), g AS (
  SELECT doc_id, CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti FROM t
), tools AS (
  SELECT doc_id, ti,
         CASE WHEN ti % 6 = 2 THEN 'search' ELSE 'calculator' END AS tool
  FROM g WHERE ti % 6 IN (2, 4)
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       count(*) AS n_tool_calls,
       count(DISTINCT tool) AS n_distinct_tools,
       string_agg(tool, '>' ORDER BY ti) AS tool_seq
FROM tools GROUP BY 1
"""


def conv_first_turn_dupes(sf_dir: str):
    """Shared-opening-prompt detection: conversations grouped by the
    md5 of their FIRST turn's text, reporting every group that at least
    two conversations share — the transcript analog of URL/prefix dedup
    (system prompts and templated openers show up as heavy first-turn
    groups; this corpus has real collisions, not a planted fixture).

    Shape: the ``turn_idx == 0`` filter runs INSIDE the scan kernel, so
    exactly one narrow (md5, conv_id) row per conversation leaves the
    read — the exchange is conversation-cardinality no matter how long
    the transcripts are. Per-batch partials pre-group (count + min
    conv_id are mergeable), one bucketed exchange on the digest, and
    the ``n_convs >= 2`` cut happens in the bucket."""
    import hashlib

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        first = batch[batch["turn_idx"].to_numpy() == 0]
        if first.empty:
            return pd.DataFrame(
                {"first_turn_md5": pd.Series([], dtype=str),
                 "n_convs": pd.Series([], dtype=np.int64),
                 "first_conv_id": pd.Series([], dtype=str)}
            )
        md5 = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in first["text"].fillna("").astype(str)
        ]
        df = pd.DataFrame(
            {"first_turn_md5": md5,
             "n_convs": np.int64(1),
             "first_conv_id": first["conv_id"].astype(str).to_numpy()}
        )
        return (
            df.groupby("first_turn_md5", sort=False)
            .agg(n_convs=("n_convs", "sum"),
                 first_conv_id=("first_conv_id", "min"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"first_turn_md5": pd.Series([], dtype=str),
                 "n_convs": pd.Series([], dtype=np.int64),
                 "first_conv_id": pd.Series([], dtype=str)}
            )
        m = (
            bucket.groupby("first_turn_md5", sort=False)
            .agg(n_convs=("n_convs", "sum"),
                 first_conv_id=("first_conv_id", "min"))
            .reset_index()
        )
        m = m[m["n_convs"] >= 2]
        return m.astype({"n_convs": np.int64})

    return grouped_aggregate(turns, ["first_turn_md5"], combine,
                             partial=partial)


# First turn = the document's first min(12, wlen) words (empty doc →
# empty first turn, still one conversation in the '' group).
CONV_FIRST_TURN_DUPES_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), lines AS (
  SELECT doc_id,
         array_to_string(words[1 : least(12, len(words))], ' ') AS txt
  FROM d
)
SELECT md5(txt) AS first_turn_md5,
       count(*) AS n_convs,
       min('doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0'))
         AS first_conv_id
FROM lines GROUP BY 1 HAVING count(*) >= 2
"""


def conv_stale_turns(sf_dir: str):
    """Cross-conversation boilerplate attribution: for every
    conversation, how many of its turns repeat a (role, text) pair that
    FIRST occurred earlier in the corpus (global first = minimum
    (conv_id, turn_idx), conv_ids being zero-padded so lexicographic
    order is corpus order) — the per-conversation 'how much of this
    transcript is recycled content' signal that turn-level exact dedup
    (:func:`turn_dedup_stats`) aggregates away. Conversations whose
    every turn is globally novel emit no row.

    Shape: one bucketed exchange on hash(role, text) — every occurrence
    of a text lands in one bucket, so the global first-occurrence key
    is bucket-local (min of a sortable ``conv_id#turn`` string); stale
    occurrences collapse to per-conversation partial counts INSIDE the
    bucket, then a second conversation-cardinality exchange sums them.
    Nothing text-sized crosses the second exchange."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        ti = batch["turn_idx"].to_numpy(dtype=np.int64)
        conv = pd.Series(batch["conv_id"].astype(str).to_numpy())
        occ = conv + "#" + pd.Series(ti).astype(str).str.zfill(8)
        return pd.DataFrame(
            {"role": batch["role"].astype(str).to_numpy(),
             "text": batch["text"].fillna("").astype(str).to_numpy(),
             "conv_id": conv.to_numpy(),
             "occ_key": occ.to_numpy()}
        )

    def stale_partials(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"conv_id": pd.Series([], dtype=str),
             "n_stale_turns": pd.Series([], dtype=np.int64)}
        )
        if bucket.empty:
            return empty
        first = bucket.groupby(["role", "text"], sort=False)["occ_key"].transform(
            "min"
        )
        stale = bucket[bucket["occ_key"].to_numpy() != first.to_numpy()]
        if stale.empty:
            return empty
        return (
            stale.groupby("conv_id", sort=False)
            .size()
            .rename("n_stale_turns")
            .reset_index()
            .astype({"n_stale_turns": np.int64})
        )

    partials = grouped_aggregate(
        turns.map_batches(prep, batch_format="pandas"),
        ["role", "text"], stale_partials,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"conv_id": pd.Series([], dtype=str),
                 "n_stale_turns": pd.Series([], dtype=np.int64)}
            )
        return (
            bucket.groupby("conv_id", sort=False)
            .agg(n_stale_turns=("n_stale_turns", "sum"))
            .reset_index()
            .astype({"n_stale_turns": np.int64})
        )

    return grouped_aggregate(partials, ["conv_id"], final)


CONV_STALE_TURNS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         CASE WHEN len(words) = 0 THEN 1 ELSE (len(words) + 11) // 12 END
           AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, wlen,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), lines AS (
  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
         'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') || '#'
           || lpad(CAST(ti AS VARCHAR), 8, '0') AS occ_key,
         CASE CAST(ti % 3 AS INTEGER) WHEN 0 THEN 'user'
              WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         array_to_string(words[ti * 12 + 1 : least((ti + 1) * 12, wlen)],
                         ' ') AS txt
  FROM g
), marked AS (
  SELECT conv_id, occ_key,
         min(occ_key) OVER (PARTITION BY role, txt) AS first_key
  FROM lines
)
SELECT conv_id, count(*) AS n_stale_turns
FROM marked WHERE occ_key <> first_key
GROUP BY 1
"""


CONV_CHATML_EXPORT_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         CASE WHEN len(words) = 0 THEN 1 ELSE (len(words) + 11) // 12 END
           AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, wlen, n_turns,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), lines AS (
  SELECT doc_id, n_turns, ti,
         '<|' || CASE ti % 3 WHEN 0 THEN 'user'
                             WHEN 1 THEN 'assistant'
                             ELSE 'tool' END || '|>'
         || array_to_string(words[ti * 12 + 1 : least((ti + 1) * 12, wlen)],
                            ' ') AS line
  FROM g
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       CAST(max(n_turns) AS BIGINT) AS n_turns,
       string_agg(line, chr(10) ORDER BY ti) AS chatml,
       CAST(length(string_agg(line, chr(10) ORDER BY ti)) AS BIGINT)
         AS n_chars
FROM lines GROUP BY 1
"""


def conv_turn_overlap(sf_dir: str):
    """Consecutive-turn lexical-overlap profile — the degenerate-dialogue
    screen an SFT corpus needs (a conversation whose adjacent turns keep
    repeating the same tokens is a looping agent or templated filler,
    and token-overlap between turn ``ti`` and ``ti+1`` is the standard
    cheap signal). Per conversation: number of adjacent turn pairs, the
    summed distinct-token intersection size, and the summed distinct-
    token union size across those pairs — exact integers, so the
    downstream Jaccard ``inter_sum / union_sum`` is reproducible to the
    bit from this row. Conversations with a single turn emit no row.

    Shape: conversations are document-atomic by construction (one
    documents row → one conversation, derived inside the scan kernel:
    ``synthetic.turns_from_document``), so the WHOLE op is scan-local —
    zero exchanges, embarrassingly parallel, and the text never leaves
    the read task. A general transcript source without that atomicity
    would need one conv_id-keyed repartition first; this is the same
    partitioning note as the chatml export."""
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        conv_ids, n_pairs, inter_sums, union_sums = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_numpy(), batch["text"].fillna("").astype(str)
        ):
            words = text.split()
            if len(words) <= 12:  # 0 or 1 turns -> no adjacent pair
                continue
            n_turns = (len(words) + 11) // 12
            toks = [
                set(words[ti * 12 : (ti + 1) * 12]) for ti in range(n_turns)
            ]
            inter = sum(len(toks[i] & toks[i + 1]) for i in range(n_turns - 1))
            union = sum(len(toks[i] | toks[i + 1]) for i in range(n_turns - 1))
            conv_ids.append(f"doc-{doc_id:010d}")
            n_pairs.append(n_turns - 1)
            inter_sums.append(inter)
            union_sums.append(union)
        return pd.DataFrame(
            {
                "conv_id": pd.Series(conv_ids, dtype=str),
                "n_pairs": pd.Series(n_pairs, dtype=np.int64),
                "inter_sum": pd.Series(inter_sums, dtype=np.int64),
                "union_sum": pd.Series(union_sums, dtype=np.int64),
            }
        )

    return docs.map_batches(kernel, batch_format="pandas")


CONV_TURN_OVERLAP_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE length(COALESCE(text, '')) > 0
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         (len(words) + 11) // 12 AS n_turns
  FROM d WHERE len(words) > 12
), g AS (
  SELECT doc_id, words, wlen,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), lines AS (
  SELECT doc_id, ti,
         list_distinct(words[ti * 12 + 1 : least((ti + 1) * 12, wlen)])
           AS toks
  FROM g
), pairs AS (
  SELECT a.doc_id,
         len(list_intersect(a.toks, b.toks)) AS inter,
         len(list_distinct(list_concat(a.toks, b.toks))) AS uni
  FROM lines a JOIN lines b
    ON b.doc_id = a.doc_id AND b.ti = a.ti + 1
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       count(*) AS n_pairs,
       CAST(sum(inter) AS BIGINT) AS inter_sum,
       CAST(sum(uni) AS BIGINT) AS union_sum
FROM pairs GROUP BY 1
"""


def conv_context_budget(sf_dir: str, budget_words: int = 48):
    """Context-window truncation accounting — the keep-the-last-K-turns
    rule every chat trainer applies before tokenization: walking turns
    from the END of the conversation, keep while the running word total
    stays within ``budget_words``; the first turn that would overflow
    (and everything before it) is dropped. Per conversation: total
    turns, kept turns, kept words, dropped turns. A final turn that
    alone exceeds the budget keeps zero turns — the conversation is
    untrainable at this context size, which is exactly the row a corpus
    owner wants to see.

    Shape: turn text collapses to ONE int64 word count inside the scan
    (narrow (conv_id, ti, words) rows on the wire), then a single
    conversation-cardinality bucketed exchange; the suffix scan runs
    vectorized per bucket (sort + grouped cumsum). Unlike the
    scan-local ops this one deliberately does NOT lean on document
    atomicity — it exercises the general any-source transcript path."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        words = np.where(
            text.str.len().to_numpy() > 0,
            text.str.count(" ").to_numpy(dtype=np.int64) + 1,
            np.int64(0),
        )
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"].astype(str).to_numpy(),
                "ti": batch["turn_idx"].to_numpy(dtype=np.int64),
                "words": words,
            }
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=str),
                    "n_turns": pd.Series([], dtype=np.int64),
                    "kept_turns": pd.Series([], dtype=np.int64),
                    "kept_words": pd.Series([], dtype=np.int64),
                    "dropped_turns": pd.Series([], dtype=np.int64),
                }
            )
        b = bucket.sort_values(
            ["conv_id", "ti"], ascending=[True, False], kind="stable"
        )
        revcum = b.groupby("conv_id", sort=False)["words"].cumsum()
        keep = (revcum <= budget_words).to_numpy()
        b = b.assign(
            kept=keep.astype(np.int64),
            kept_w=np.where(keep, b["words"].to_numpy(), np.int64(0)),
        )
        m = (
            b.groupby("conv_id", sort=False)
            .agg(
                n_turns=("ti", "size"),
                kept_turns=("kept", "sum"),
                kept_words=("kept_w", "sum"),
            )
            .reset_index()
        )
        m["dropped_turns"] = m["n_turns"] - m["kept_turns"]
        return m.astype(
            {c: np.int64 for c in ("n_turns", "kept_turns", "kept_words",
                                   "dropped_turns")}
        )

    return grouped_aggregate(
        turns.map_batches(partial, batch_format="pandas"),
        ["conv_id"], combine,
    )


def conv_context_budget_oracle(budget_words: int = 48) -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), t AS (
  SELECT doc_id, len(words) AS wlen,
         CASE WHEN len(words) = 0 THEN 1 ELSE (len(words) + 11) // 12 END
           AS n_turns
  FROM d
), g AS (
  SELECT doc_id, wlen, n_turns,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), lines AS (
  SELECT doc_id, ti,
         CASE WHEN wlen = 0 THEN 0
              WHEN ti = n_turns - 1 THEN wlen - ti * 12
              ELSE 12 END AS turn_words
  FROM g
), scan AS (
  SELECT doc_id, ti, turn_words,
         sum(turn_words) OVER (PARTITION BY doc_id ORDER BY ti DESC
                               ROWS UNBOUNDED PRECEDING) AS revcum
  FROM lines
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       count(*) AS n_turns,
       CAST(sum(CASE WHEN revcum <= {budget_words} THEN 1 ELSE 0 END)
            AS BIGINT) AS kept_turns,
       CAST(sum(CASE WHEN revcum <= {budget_words} THEN turn_words
                     ELSE 0 END) AS BIGINT) AS kept_words,
       CAST(count(*)
            - sum(CASE WHEN revcum <= {budget_words} THEN 1 ELSE 0 END)
            AS BIGINT) AS dropped_turns
FROM scan GROUP BY 1
"""


def conv_common_assistant_turns(sf_dir: str, min_count: int = 2):
    """Boilerplate-response inventory — the per-TEXT view of assistant-
    turn duplication (:func:`conv_stale_turns` charges recycled content
    to conversations; this lists the recycled responses themselves):
    every assistant turn text that occurs at least ``min_count`` times
    corpus-wide, with its total occurrence count, the number of
    distinct conversations it appears in, and the lexicographically
    first conversation as the example to pull. Texts travel as md5
    digests — the full response never crosses an exchange.

    Shape: role filter + digest inside the scan; per-batch partials
    pre-group on (digest, conv_id) so wire rows are bounded by distinct
    pairs per batch; one digest-keyed bucketed exchange where the
    distinct-conversation count is bucket-local."""
    import hashlib

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "text_md5": pd.Series([], dtype=str),
                "conv_id": pd.Series([], dtype=str),
                "cnt": pd.Series([], dtype=np.int64),
            }
        )
        a = batch[batch["role"].to_numpy() == "assistant"]
        if a.empty:
            return empty
        md5 = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in a["text"].fillna("").astype(str)
        ]
        df = pd.DataFrame(
            {
                "text_md5": md5,
                "conv_id": a["conv_id"].astype(str).to_numpy(),
                "cnt": np.int64(1),
            }
        )
        return (
            df.groupby(["text_md5", "conv_id"], sort=False)
            .agg(cnt=("cnt", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "text_md5": pd.Series([], dtype=str),
                "n_occurrences": pd.Series([], dtype=np.int64),
                "n_convs": pd.Series([], dtype=np.int64),
                "first_conv_id": pd.Series([], dtype=str),
            }
        )
        if bucket.empty:
            return empty
        m = (
            bucket.groupby("text_md5", sort=False)
            .agg(
                n_occurrences=("cnt", "sum"),
                n_convs=("conv_id", "nunique"),
                first_conv_id=("conv_id", "min"),
            )
            .reset_index()
        )
        m = m[m["n_occurrences"] >= min_count]
        return m.astype({"n_occurrences": np.int64, "n_convs": np.int64})

    return grouped_aggregate(turns.map_batches(partial, batch_format="pandas"),
                             ["text_md5"], combine)


def conv_common_assistant_turns_oracle(min_count: int = 2) -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, ' ') END AS words
  FROM documents
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         CASE WHEN len(words) = 0 THEN 1 ELSE (len(words) + 11) // 12 END
           AS n_turns
  FROM d
), g AS (
  SELECT doc_id, words, wlen,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), lines AS (
  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
         array_to_string(words[ti * 12 + 1 : least((ti + 1) * 12, wlen)],
                         ' ') AS txt
  FROM g WHERE ti % 3 = 1
)
SELECT md5(txt) AS text_md5,
       count(*) AS n_occurrences,
       count(DISTINCT conv_id) AS n_convs,
       min(conv_id) AS first_conv_id
FROM lines GROUP BY 1 HAVING count(*) >= {min_count}
"""


def conv_preference_pairs(sf_dir: str):
    """Preference-pair synthesis from response variation — the RLHF
    data op that mines naturally-occurring A/B responses: conversations
    that open with the SAME user prompt (identical first-turn text) but
    continue with DIFFERENT assistant first responses yield one
    (prompt, chosen, rejected) row per prompt group. The deterministic
    stand-in for a reward model ranks by response length (more words
    wins — the classic verbosity prior, which is exactly why the rule
    must be explicit and reproducible), ties broken by md5 so the pair
    is stable under any execution order: chosen = (max words, min md5),
    rejected = (min words, max md5). Groups whose responses are all
    identical produce no pair; single-turn conversations have no
    response and never become candidates.

    Shape: the scan collapses each conversation to ONE narrow row
    (prompt digest, response digest, response word count) — turn text
    never leaves the read task — then one prompt-cardinality bucketed
    exchange picks the argmax/argmin per group vectorized."""
    import hashlib

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"prompt_md5": pd.Series([], dtype=str),
             "resp_md5": pd.Series([], dtype=str),
             "resp_words": pd.Series([], dtype=np.int64),
             "conv_id": pd.Series([], dtype=str)}
        )
        ti = batch["turn_idx"].to_numpy(dtype=np.int64)
        first = batch[ti == 0][["conv_id", "text"]].rename(
            columns={"text": "prompt"}
        )
        resp = batch[ti == 1][["conv_id", "text"]].rename(
            columns={"text": "response"}
        )
        if first.empty or resp.empty:
            return empty
        # conversations are document-atomic: ti=0 and ti=1 of one conv
        # are emitted by the same scan kernel call, so this merge is
        # batch-local by construction (same note as the chatml export)
        m = first.merge(resp, on="conv_id")
        if m.empty:
            return empty
        prompt = m["prompt"].fillna("").astype(str)
        response = m["response"].fillna("").astype(str)
        words = np.where(
            response.str.len().to_numpy() > 0,
            response.str.count(" ").to_numpy(dtype=np.int64) + 1,
            np.int64(0),
        )
        return pd.DataFrame(
            {
                "prompt_md5": [
                    hashlib.md5(t.encode()).hexdigest() for t in prompt
                ],
                "resp_md5": [
                    hashlib.md5(t.encode()).hexdigest() for t in response
                ],
                "resp_words": words,
                "conv_id": m["conv_id"].astype(str).to_numpy(),
            }
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"prompt_md5": pd.Series([], dtype=str),
             "n_candidates": pd.Series([], dtype=np.int64),
             "chosen_md5": pd.Series([], dtype=str),
             "rejected_md5": pd.Series([], dtype=str),
             "chosen_conv_id": pd.Series([], dtype=str)}
        )
        if bucket.empty:
            return empty
        # distinct responses per prompt; keep the min conv_id per
        # (prompt, response) as the reproducible example pointer
        d = (
            bucket.groupby(["prompt_md5", "resp_md5"], sort=False)
            .agg(resp_words=("resp_words", "min"),
                 conv_id=("conv_id", "min"))
            .reset_index()
        )
        n = d.groupby("prompt_md5", sort=False)["resp_md5"].transform("size")
        d = d[n.to_numpy() >= 2]
        if d.empty:
            return empty
        asc = d.sort_values(["prompt_md5", "resp_words", "resp_md5"],
                            ascending=[True, False, True], kind="stable")
        chosen = asc.groupby("prompt_md5", sort=False).first().reset_index()
        desc = d.sort_values(["prompt_md5", "resp_words", "resp_md5"],
                             ascending=[True, True, False], kind="stable")
        rejected = desc.groupby("prompt_md5", sort=False).first().reset_index()
        counts = (
            d.groupby("prompt_md5", sort=False)
            .size()
            .reset_index(name="n_candidates")
        )
        out = (
            counts.merge(
                chosen[["prompt_md5", "resp_md5", "conv_id"]].rename(
                    columns={"resp_md5": "chosen_md5",
                             "conv_id": "chosen_conv_id"}
                ),
                on="prompt_md5",
            ).merge(
                rejected[["prompt_md5", "resp_md5"]].rename(
                    columns={"resp_md5": "rejected_md5"}
                ),
                on="prompt_md5",
            )
        )
        return out[["prompt_md5", "n_candidates", "chosen_md5",
                    "rejected_md5", "chosen_conv_id"]].astype(
            {"n_candidates": np.int64}
        )

    return grouped_aggregate(turns.map_batches(partial, batch_format="pandas"),
                             ["prompt_md5"], combine)


CONV_PREFERENCE_PAIRS_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE length(COALESCE(text, '')) > 0
), t AS (
  SELECT doc_id, words, len(words) AS wlen FROM d WHERE len(words) > 12
), pr AS (
  SELECT doc_id,
         md5(array_to_string(words[1 : 12], ' ')) AS prompt_md5,
         md5(array_to_string(words[13 : least(24, wlen)], ' '))
           AS resp_md5,
         least(24, wlen) - 12 AS resp_words,
         'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id
  FROM t
), dist AS (
  SELECT prompt_md5, resp_md5,
         min(resp_words) AS resp_words, min(conv_id) AS conv_id
  FROM pr GROUP BY 1, 2
), sized AS (
  SELECT *, count(*) OVER (PARTITION BY prompt_md5) AS n_candidates,
         row_number() OVER (PARTITION BY prompt_md5
                            ORDER BY resp_words DESC, resp_md5 ASC)
           AS rn_chosen,
         row_number() OVER (PARTITION BY prompt_md5
                            ORDER BY resp_words ASC, resp_md5 DESC)
           AS rn_rejected
  FROM dist
)
SELECT c.prompt_md5,
       CAST(max(c.n_candidates) AS BIGINT) AS n_candidates,
       max(CASE WHEN c.rn_chosen = 1 THEN c.resp_md5 END) AS chosen_md5,
       max(CASE WHEN c.rn_rejected = 1 THEN c.resp_md5 END)
         AS rejected_md5,
       max(CASE WHEN c.rn_chosen = 1 THEN c.conv_id END)
         AS chosen_conv_id
FROM sized c WHERE c.n_candidates >= 2
GROUP BY 1
"""


def conv_sft_windows(sf_dir: str, k_context: int = 3):
    """Windowed SFT example builder — the turn-level training-row
    export every chat trainer runs: ONE row per assistant turn, whose
    context is the previous up-to-``k_context`` turns joined by
    newline (the bounded-context slice, not the whole conversation) and
    whose target is the assistant turn itself. Texts leave the scan as
    md5 digests plus exact integer sizes (context turn count, context
    word count), so the row is verifiable without moving transcript
    bytes; a real exporter would write the same rows with payloads to
    the partitioned sink.

    Shape: conversations are document-atomic in the scan kernel, so
    window construction is scan-local (zero exchange, the map-only
    export path); the general-source note of the chatml export
    applies."""
    import hashlib

    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {
            "conv_id": [], "turn_idx": [], "context_turns": [],
            "context_words": [], "context_md5": [], "response_md5": [],
        }
        for doc_id, text in zip(
            batch["doc_id"].to_numpy(), batch["text"].fillna("").astype(str)
        ):
            words = text.split()
            if len(words) <= 12:  # no assistant turn exists
                continue
            n_turns = (len(words) + 11) // 12
            turns = [
                " ".join(words[ti * 12 : (ti + 1) * 12])
                for ti in range(n_turns)
            ]
            conv = f"doc-{doc_id:010d}"
            for ti in range(1, n_turns, 3):  # assistant turns: ti%3==1
                lo = max(0, ti - k_context)
                ctx = turns[lo:ti]
                out["conv_id"].append(conv)
                out["turn_idx"].append(ti)
                out["context_turns"].append(len(ctx))
                out["context_words"].append(
                    sum(len(t.split()) for t in ctx)
                )
                out["context_md5"].append(
                    hashlib.md5("\n".join(ctx).encode()).hexdigest()
                )
                out["response_md5"].append(
                    hashlib.md5(turns[ti].encode()).hexdigest()
                )
        return pd.DataFrame(
            {
                "conv_id": pd.Series(out["conv_id"], dtype=str),
                "turn_idx": pd.Series(out["turn_idx"], dtype=np.int64),
                "context_turns": pd.Series(out["context_turns"],
                                           dtype=np.int64),
                "context_words": pd.Series(out["context_words"],
                                           dtype=np.int64),
                "context_md5": pd.Series(out["context_md5"], dtype=str),
                "response_md5": pd.Series(out["response_md5"], dtype=str),
            }
        )

    return docs.map_batches(kernel, batch_format="pandas")


def conv_sft_windows_oracle(k_context: int = 3) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE length(COALESCE(text, '')) > 0
), t AS (
  SELECT doc_id, words, len(words) AS wlen,
         (len(words) + 11) // 12 AS n_turns
  FROM d WHERE len(words) > 12
), g AS (
  SELECT doc_id, words, wlen,
         CAST(unnest(range(0, n_turns)) AS BIGINT) AS ti
  FROM t
), lines AS (
  SELECT doc_id, ti,
         array_to_string(words[ti * 12 + 1 : least((ti + 1) * 12, wlen)],
                         ' ') AS txt,
         least((ti + 1) * 12, wlen) - ti * 12 AS turn_words
  FROM g
), ctx AS (
  SELECT doc_id, ti, txt,
         string_agg(txt, chr(10)) OVER w AS context,
         count(*) OVER w AS context_turns,
         sum(turn_words) OVER w AS context_words
  FROM lines
  WINDOW w AS (PARTITION BY doc_id ORDER BY ti
               ROWS BETWEEN {k_context} PRECEDING AND 1 PRECEDING)
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       ti AS turn_idx,
       CAST(context_turns AS BIGINT) AS context_turns,
       CAST(context_words AS BIGINT) AS context_words,
       md5(context) AS context_md5,
       md5(txt) AS response_md5
FROM ctx WHERE ti % 3 = 1
"""


def conv_turn_novelty(sf_dir: str):
    """Within-conversation vocabulary attribution: for every
    conversation and speaker role, how many DISTINCT words make their
    first in-conversation appearance in a turn of that role — the
    'who introduces the vocabulary' diagnostic of an agent transcript
    (an assistant that only ever echoes the user's words introduces
    nothing; a tool that dumps fresh identifiers introduces a lot).

    Shape: the scan kernel splits each turn once and emits per-batch
    partials of (conv_id, word) → min turn_idx — a conversation's
    turns may straddle batches, so first-occurrence is finished by a
    conv-keyed two-phase MIN (partial mins merge losslessly); each
    bucket then maps the winning turn to its role and collapses to
    (conv_id, role) counts before anything leaves the bucket. Wire
    rows are per-conversation DISTINCT words (conversation-vocabulary
    bounded, the same boundedness as the tf-idf family), never raw
    turn text."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    turns = transcripts_dataset_from_documents(sf_dir)
    role_names = np.array(["user", "assistant", "tool"], dtype=object)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        convs: list[str] = []
        words: list[str] = []
        tis: list[int] = []
        for conv, ti, text in zip(batch["conv_id"], batch["turn_idx"],
                                  batch["text"]):
            toks = [w for w in str(text or "").split(" ") if w]
            if not toks:
                continue
            convs.extend([conv] * len(toks))
            words.extend(toks)
            tis.extend([int(ti)] * len(toks))
        df = pd.DataFrame(
            {"conv_id": np.array(convs, dtype=object),
             "word": np.array(words, dtype=object),
             "ti": np.array(tis, dtype=np.int64)}
        )
        return (
            df.groupby(["conv_id", "word"], sort=False)["ti"]
            .min()
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        first = (
            bucket.groupby(["conv_id", "word"], sort=False)["ti"]
            .min()
            .reset_index()
        )
        first["role"] = role_names[
            (first["ti"].to_numpy(dtype=np.int64) % 3)
        ]
        out = (
            first.groupby(["conv_id", "role"], sort=False)
            .size()
            .reset_index(name="n_first_words")
        )
        return out.astype({"n_first_words": np.int64})

    return grouped_aggregate(turns, ["conv_id"], combine, partial=partial)


# The oracle never rebuilds turn text: a doc word at 0-based position p
# sits in turn p // 12, whose role is (p // 12) % 3 — the same position
# arithmetic `conv_role_lexicon` uses. First in-conversation occurrence
# of a word = its minimum position.
CONV_TURN_NOVELTY_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE length(COALESCE(text, '')) > 0
), pos AS (
  SELECT doc_id, w[i] AS word, i - 1 AS p
  FROM d, UNNEST(generate_series(1, len(w))) AS t(i)
), first AS (
  SELECT doc_id, word, min(p) AS p0 FROM pos GROUP BY 1, 2
)
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS conv_id,
       CASE CAST((p0 // 12) % 3 AS INTEGER) WHEN 0 THEN 'user'
            WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       CAST(count(*) AS BIGINT) AS n_first_words
FROM first GROUP BY 1, 2
"""
