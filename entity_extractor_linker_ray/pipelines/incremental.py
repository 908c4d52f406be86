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
    checkpoint) into the final node table — one union of the
    combiner-bounded partials, one coalesced hash-bucket exchange
    (the sort-based Aggregate was the wall on string keys at the
    grown-KB cardinality; same switch as simple_kg.kg_nodes)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)
    return grouped_aggregate(
        merged, ["name", "type"],
        lambda b: b.groupby(["name", "type"], sort=False, as_index=False)[
            "n_docs"
        ].sum().astype({"n_docs": np.int64}),
        coalesce=True,
    )


def merge_edge_partials(states):
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    keys = ["subject", "predicate", "object"]
    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)
    return grouped_aggregate(
        merged, keys,
        lambda b: b.groupby(keys, sort=False, as_index=False)["weight"]
        .sum()
        .astype({"weight": np.int64}),
        coalesce=True,
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


def kg_edge_timespan_incremental(sf_dir: str, partitions: int = 2):
    """Temporal-KG state maintenance: per arriving slice an
    (edge → min/max ts, doc support, assertion count) partial;
    states fold by associative (min, max, sum, sum), so day-over-day
    edge validity windows never rescan history. Value-identical to
    ``simple_kg.kg_edge_timespan`` (same DuckDB oracle gates both)."""
    from entity_extractor_linker_ray.pipelines.simple_kg import (
        edge_timespan_partial,
        merge_edge_timespan_partials,
    )

    states = [
        partition_documents(sf_dir, partitions, r).map_batches(
            edge_timespan_partial, batch_format="pandas"
        )
        for r in range(partitions)
    ]
    return merge_edge_timespan_partials(states)


# ----------------------------------------------------------------------
# incremental sessionization: mergeable session states
# ----------------------------------------------------------------------

SESSION_GAP_MIN = 30
_US_PER_DAY = 86_400_000_000


def session_partials(events_ds, gap_minutes: int = SESSION_GAP_MIN):
    """Per-user session SUMMARIES (start_us, end_us, n_events,
    first_event) for one ingest batch — the mergeable state for
    sessionization. A summary's internal gaps are ≤ gap by
    construction, and adding events can only FUSE sessions, never
    split them, so summaries from arbitrary (even time-interleaved)
    batches merge exactly: fuse consecutive summaries whose
    start − prev running-max end ≤ gap. One bucketed exchange on
    ``hash(user_id)``, one vectorized kernel."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        users = g["user_id"].to_numpy(dtype=np.int64)
        n = len(g)
        if not n:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("user_id", "start_us", "end_us",
                                           "n_events", "first_event")})
        brk = np.ones(n, dtype=bool)
        brk[1:] = (users[1:] != users[:-1]) | (np.diff(ts) > gap_us)
        sess = np.cumsum(brk)
        return (
            pd.DataFrame({"user_id": users, "sess": sess, "ts_us": ts,
                          "event_id": g["event_id"].to_numpy(dtype=np.int64)})
            .groupby(["user_id", "sess"], sort=False)
            .agg(start_us=("ts_us", "min"), end_us=("ts_us", "max"),
                 n_events=("ts_us", "size"), first_event=("event_id", "min"))
            .reset_index()
            .drop(columns=["sess"])
            .astype({c: np.int64 for c in ("user_id", "start_us", "end_us",
                                           "n_events", "first_event")})
        )

    return grouped_aggregate(events_ds, ["user_id"], combine)


def merge_session_partials(states, gap_minutes: int = SESSION_GAP_MIN):
    """Fold ANY number of session-summary states (fresh or reloaded
    from a checkpoint) into final per-user sessions — the gap-tolerant
    interval-union sweep: summaries sorted by (user, start), running
    max of ends per user segment, a new session where
    start > running_max + gap, fused stats by one groupby, session_idx
    by per-user cumcount. Output schema and values are identical to
    the batch ``events_sessionize`` (same DuckDB oracle gates both)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)

    def fuse(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "start_us", "first_event"],
                               kind="stable")
        users = g["user_id"].to_numpy(dtype=np.int64)
        start = g["start_us"].to_numpy(dtype=np.int64)
        end = g["end_us"].to_numpy(dtype=np.int64)
        n = len(g)
        if not n:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "session_idx": pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "first_event": pd.Series([], dtype=np.int64)})
        seg = np.cumsum(np.concatenate(([0], (users[1:] != users[:-1])
                                        .astype(np.int64))))
        run_max = pd.Series(end).groupby(seg).cummax().to_numpy(np.int64)
        prev_max = np.concatenate(([np.int64(-(2**62))], run_max[:-1]))
        new_sess = np.concatenate(
            ([True], (users[1:] != users[:-1]) | (start[1:] > prev_max[1:] + gap_us))
        )
        island = np.cumsum(new_sess)
        fused = (
            pd.DataFrame({"user_id": users, "island": island,
                          "n_events": g["n_events"].to_numpy(dtype=np.int64),
                          "first_event": g["first_event"].to_numpy(dtype=np.int64)})
            .groupby(["user_id", "island"], sort=False)
            .agg(n_events=("n_events", "sum"), first_event=("first_event", "min"))
            .reset_index()
        )
        fused["session_idx"] = fused.groupby("user_id", sort=False).cumcount()
        return fused[["user_id", "session_idx", "n_events", "first_event"]].astype(
            {c: np.int64 for c in ("user_id", "session_idx", "n_events",
                                   "first_event")}
        )

    return grouped_aggregate(merged, ["user_id"], fuse)


def events_sessions_incremental(sf_dir: str, chunks: int = 2,
                                gap_minutes: int = SESSION_GAP_MIN):
    """Full sessionization built the incremental way: events split into
    ``chunks`` deterministic time-interleaved ingest batches (day
    parity — the worst case for boundary stitching: every batch
    interleaves with every other inside the month), each batch reduced
    to mergeable session summaries, summaries fused. Value-identical
    to ``relational.events_sessionize`` — the driver gates it with the
    SAME lag/gap-window DuckDB oracle."""
    import ray.data as rd

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def chunk_of(batch: pd.DataFrame, residue: int) -> pd.DataFrame:
        day = (batch["ts"].to_numpy(dtype="datetime64[us]")
               .astype(np.int64) // _US_PER_DAY)
        return batch[day % chunks == residue]

    states = [
        session_partials(
            events.map_batches(chunk_of, batch_format="pandas",
                               fn_kwargs={"residue": r}),
            gap_minutes,
        )
        for r in range(chunks)
    ]
    return merge_session_partials(states, gap_minutes)

def documents_cdc_merge(sf_dir: str):
    """MERGE INTO (the warehouse upsert): apply a change stream of
    deletes / updates / inserts to the base documents table with the
    standard precedence (delete beats update beats base; inserts are
    new keys) — the missing half of CDC beside the additive partial
    states above. The change stream is derived DETERMINISTICALLY from
    the base table so the op is self-contained and SQL-replayable:
    deletes = doc_id % 11 == 5, updates (text + ' v2') = doc_id % 7
    == 3, inserts (new key doc_id + 10⁷, text + ' new') = doc_id % 13
    == 2.

    Shape: base rows and change rows are two TAGGED scans (the change
    scan is row-local derivation) meeting in ONE bucketed exchange on
    hash(doc_id); per bucket a vectorized precedence resolve (three
    boolean pivots + one take). Only integer lengths travel — never
    the text payload — so the exchange is fixed-width."""
    import numpy as np
    import pandas as pd

    from entity_extractor_linker_ray.ops.readers import read_split
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tag_base(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        lens = batch["text"].fillna("").str.len().to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "kind": np.int64(0), "plen": lens}
        )

    def tag_changes(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        lens = batch["text"].fillna("").str.len().to_numpy(dtype=np.int64)
        frames = []
        dmask = ids % 11 == 5
        if dmask.any():
            frames.append(pd.DataFrame(
                {"doc_id": ids[dmask], "kind": np.int64(1),
                 "plen": np.int64(0)}))
        umask = ids % 7 == 3
        if umask.any():
            frames.append(pd.DataFrame(
                {"doc_id": ids[umask], "kind": np.int64(2),
                 "plen": lens[umask] + 3}))  # + ' v2'
        imask = ids % 13 == 2
        if imask.any():
            frames.append(pd.DataFrame(
                {"doc_id": ids[imask] + 10_000_000, "kind": np.int64(3),
                 "plen": lens[imask] + 4}))  # + ' new'
        if not frames:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "kind": pd.Series([], dtype=np.int64),
                 "plen": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(frames, ignore_index=True)

    tagged = docs.map_batches(tag_base, batch_format="pandas").union(
        docs.map_batches(tag_changes, batch_format="pandas")
    )

    def resolve(bucket: pd.DataFrame) -> pd.DataFrame:
        piv = (
            bucket.pivot_table(index="doc_id", columns="kind", values="plen",
                               aggfunc="max")
            .reindex(columns=[0, 1, 2, 3])
        )
        has = ~piv.isna()
        # delete wins; update beats base; inserts are disjoint new keys
        alive_base = has[0] & ~has[1]
        op = np.where(has[2] & alive_base, "update",
                      np.where(alive_base, "base", "insert"))
        final_len = np.where(
            has[2] & alive_base, piv[2].to_numpy(),
            np.where(alive_base, piv[0].to_numpy(), piv[3].to_numpy()),
        )
        keep = alive_base | has[3]
        out = pd.DataFrame(
            {"doc_id": piv.index.to_numpy(dtype=np.int64),
             "op": op, "final_len": final_len}
        )[keep.to_numpy()]
        return out.astype({"doc_id": np.int64, "final_len": np.int64})

    return grouped_aggregate(tagged, ["doc_id"], resolve, coalesce=True)


DOCUMENTS_CDC_MERGE_ORACLE = """
WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
), del AS (
  SELECT doc_id FROM base WHERE doc_id % 11 = 5
), upd AS (
  SELECT doc_id, text || ' v2' AS text FROM base WHERE doc_id % 7 = 3
), ins AS (
  SELECT doc_id + 10000000 AS doc_id, text || ' new' AS text
  FROM base WHERE doc_id % 13 = 2
), merged AS (
  SELECT b.doc_id,
         CASE WHEN u.doc_id IS NOT NULL THEN 'update' ELSE 'base' END AS op,
         COALESCE(u.text, b.text) AS text
  FROM base b LEFT JOIN upd u USING (doc_id)
  WHERE b.doc_id NOT IN (SELECT doc_id FROM del)
  UNION ALL
  SELECT doc_id, 'insert' AS op, text FROM ins
)
SELECT doc_id, op, CAST(length(text) AS BIGINT) AS final_len FROM merged
"""


# ----------------------------------------------------------------------
# incremental quantiles: mergeable value-count states
# ----------------------------------------------------------------------


def quantile_state(sf_dir: str, modulus: int, residue: int):
    """The mergeable state behind exact distributed quantiles — a
    (lang, n_chars, cnt) value-count table for one ingest slice
    (``doc_id % modulus == residue``). Value counts are the textbook
    mergeable summary: states from arbitrary batch splits merge by
    per-key addition with NO error term (unlike t-digest/KLL), because
    the count grid is bounded by the value DOMAIN, not the corpus."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def keep_and_count(batch: pd.DataFrame) -> pd.DataFrame:
        kept = batch[batch["doc_id"] % modulus == residue]
        out = pd.DataFrame(
            {"lang": kept["lang"].astype(str).to_numpy(),
             "n_chars": kept["n_chars"].to_numpy(dtype=np.int64),
             "cnt": np.ones(len(kept), dtype=np.int64)}
        )
        return out.groupby(["lang", "n_chars"], sort=False,
                           as_index=False)["cnt"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["lang", "n_chars"], sort=False,
                           as_index=False)["cnt"].sum()
            .astype({"n_chars": np.int64, "cnt": np.int64})
        )

    return grouped_aggregate(
        docs.map_batches(keep_and_count, batch_format="pandas"),
        ["lang", "n_chars"], combine, num_partitions=8,
    )


def doc_quantiles_incremental(sf_dir: str, partitions: int = 2):
    """Exact per-language p50/p90/p99 built the INCREMENTAL way: each
    document slice contributes an independent value-count state
    (:func:`quantile_state`), states merge by per-(lang, value)
    addition, and the final quantile walk runs once over the merged
    grid — value-identical to the from-scratch
    ``textstats.doc_length_quantiles`` (the same DuckDB oracle gates
    both), proving exact quantiles need no re-scan of old data on
    ingest."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    states = [
        quantile_state(sf_dir, partitions, r) for r in range(partitions)
    ]
    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)

    quantiles = (("p50_n_chars", 0.5), ("p90_n_chars", 0.9),
                 ("p99_n_chars", 0.99))

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        vc = (
            bucket.groupby(["lang", "n_chars"], sort=False)["cnt"].sum()
            .reset_index().sort_values(["lang", "n_chars"], kind="stable")
        )
        rows = []
        for lang, g in vc.groupby("lang", sort=False):
            vals = g["n_chars"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64))
            n = int(cum[-1])
            picks = [
                vals[np.searchsorted(cum, max(int(np.ceil(q * n)), 1),
                                     side="left")]
                for _, q in quantiles
            ]
            rows.append((lang, np.int64(n), *picks))
        return pd.DataFrame(
            rows,
            columns=["lang", "n_docs"] + [name for name, _ in quantiles],
        ).astype({name: np.int64 for name, _ in quantiles})

    return grouped_aggregate(merged, ["lang"], finalize, num_partitions=4)


# ----------------------------------------------------------------------
# incremental exact dedup: mergeable (h_lo, h_hi) → (min_doc, count)
# ----------------------------------------------------------------------


def dedup_partials(docs):
    """Mergeable exact-dedup state for one arriving document batch:
    per 128-bit content key (the `ops/dedupe.exact_dedup` SipHash
    pair), the minimum doc_id seen and the occurrence count. States
    from disjoint slices merge by (min, sum) — the survivorship rule
    is associative, so day-over-day maintenance never rescans history,
    exactly like the node/edge partials above. Keys are 16 bytes per
    distinct text: a year of daily states is cheap to keep."""
    from entity_extractor_linker_ray.ops.dedupe import (
        _HASH_KEY_A,
        _HASH_KEY_B,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").to_numpy(dtype=object)
        rows = pd.DataFrame(
            {"h_lo": pd.util.hash_array(texts, hash_key=_HASH_KEY_A),
             "h_hi": pd.util.hash_array(texts, hash_key=_HASH_KEY_B),
             "doc_id": batch["doc_id"].to_numpy()}
        )
        return (
            rows.groupby(["h_lo", "h_hi"], sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index()
        )

    return docs.map_batches(partial, batch_format="pandas")


def dedup_exact_incremental(sf_dir: str, partitions: int = 2):
    """Full exact-dedup survivor table built the incremental way: each
    document slice contributes an independent mergeable state; the
    merge is one union + a bucketed (h_lo, h_hi) min/sum — so adding
    tomorrow's documents costs one partial build plus a state-sized
    merge, never a corpus rescan. Value-identical to
    ``ops/dedupe.exact_dedup`` (the same DuckDB oracle gates both)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    states = [
        dedup_partials(partition_documents(sf_dir, partitions, r))
        for r in range(partitions)
    ]
    merged = states[0]
    for s in states[1:]:
        merged = merged.union(s)

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["h_lo", "h_hi"], sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("n_dups", "sum"))
            .reset_index()[["doc_id", "n_dups"]]
            .astype({"doc_id": np.int64, "n_dups": np.int64})
        )

    return grouped_aggregate(merged, ["h_lo", "h_hi"], combine,
                             coalesce=True)
