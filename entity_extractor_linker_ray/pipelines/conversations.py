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
