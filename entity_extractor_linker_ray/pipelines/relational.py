"""Relational / stream-shaped operators over the events and TPC-H-ish
tables — the generic aggregate/sort/window machinery the KG stats reuse
(G1-G8 patterns), each with an exact DuckDB oracle.

Numeric outputs are integers (counts, casts, scaled sums) so the
order-insensitive value hash is bit-exact across engines; float
accumulation order is never relied on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Max, Min, Sum


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per (user, event_type): count + exact
    min/max of value (no float sums).

    (user, type, hour) is near-unique per row (~1 group/row), so this
    uses the bucketed two-phase aggregate (`ops/shuffle.py`) — Ray's
    native ``Aggregate`` does per-group Python work and is ~20× slower
    at this cardinality."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "value"]
    )
    keys = ["user_id", "event_type", "hour_bucket"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # normalize to ns regardless of pandas' datetime64 unit, then
        # bucket by hour (matches the oracle's epoch_us // 3.6e9)
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        out = batch[["user_id", "event_type"]].copy()
        out["hour_bucket"] = ts_ns // 3_600_000_000_000
        out["value_centi"] = np.round(batch["value"].to_numpy() * 100).astype(np.int64)
        out["one"] = np.int64(1)
        return (
            out.groupby(keys, sort=False)
            .agg(
                n_events=("one", "sum"),
                min_value_centi=("value_centi", "min"),
                max_value_centi=("value_centi", "max"),
            )
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False)
            .agg(
                n_events=("n_events", "sum"),
                min_value_centi=("min_value_centi", "min"),
                max_value_centi=("max_value_centi", "max"),
            )
            .reset_index()
            .astype(
                {
                    "n_events": np.int64,
                    "min_value_centi": np.int64,
                    "max_value_centi": np.int64,
                }
            )
        )

    return grouped_aggregate(events, keys, combine, partial=partial)


EVENTS_HOURLY_ORACLE = """
SELECT user_id, event_type,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
       count(*) AS n_events,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_value_centi,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_value_centi
FROM events GROUP BY 1, 2, 3
"""


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: events sorted by (ts, event_id) within
    user, session breaks at gaps > ``gap_minutes``; per session a count
    and the min event_id.

    Shape: bucketed shuffle on ``user_id`` (`ops/shuffle.py`) then ONE
    vectorized kernel over the whole bucket — user boundaries and gap
    breaks found with numpy on the sorted arrays, session ids by cumsum,
    final rollup a single pandas groupby. Same pattern as
    ``events_sliding``; no per-user Python groups. Exact DuckDB oracle
    via lag/gap window SQL (``EVENTS_SESSIONIZE_ORACLE``)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    gap_ns = np.int64(gap_minutes) * 60 * 1_000_000_000

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        users = g["user_id"].to_numpy()
        n = len(g)
        brk = np.ones(n, dtype=np.int64)  # row 0 always starts a session
        if n > 1:
            new_user = users[1:] != users[:-1]
            brk[1:] = (new_user | (np.diff(ts) > gap_ns)).astype(np.int64)
        sess_global = np.cumsum(brk) - 1
        user_start = np.ones(n, dtype=bool)
        if n > 1:
            user_start[1:] = users[1:] != users[:-1]
        seg_id = np.cumsum(user_start) - 1
        session_idx = sess_global - sess_global[user_start][seg_id]
        out = pd.DataFrame(
            {
                "user_id": users,
                "session_idx": session_idx,
                "event_id": g["event_id"].to_numpy(),
            }
        )
        return (
            out.groupby(["user_id", "session_idx"], sort=False)
            .agg(n_events=("event_id", "size"), first_event=("event_id", "min"))
            .reset_index()
            .astype(
                {"session_idx": np.int64, "n_events": np.int64, "first_event": np.int64}
            )
        )

    return grouped_aggregate(events, ["user_id"], combine)


EVENTS_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events, CAST(min(event_id) AS BIGINT) AS first_event
FROM sess GROUP BY 1, 2
"""


def events_sliding(sf_dir: str, window_minutes: int = 60):
    """Sliding event-time window: for every event, the count of that
    user's events in the closed interval ``[ts - window, ts]``
    (matching SQL ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT
    ROW``, which also counts equal-ts peers).

    Shape: bucketed shuffle on ``user_id`` (`ops/shuffle.py`), then per
    user-segment a vectorized two-sided ``searchsorted`` — no per-event
    Python, no self-join blowup."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    win_ns = np.int64(window_minutes) * 60 * 1_000_000_000

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        users = g["user_id"].to_numpy()
        counts = np.empty(len(g), dtype=np.int64)
        start = 0
        for end in np.append(
            np.flatnonzero(users[1:] != users[:-1]) + 1, len(users)
        ):
            seg = ts[start:end]
            hi = np.searchsorted(seg, seg, side="right")
            lo = np.searchsorted(seg, seg - win_ns, side="left")
            counts[start:end] = hi - lo
            start = end
        return pd.DataFrame(
            {
                "user_id": users,
                "event_id": g["event_id"].to_numpy(),
                "n_in_window": counts,
            }
        )

    return grouped_aggregate(events, ["user_id"], combine)


EVENTS_SLIDING_ORACLE = """
SELECT user_id, event_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 60 MINUTES PRECEDING
                            AND CURRENT ROW) AS n_in_window
FROM events
"""


def lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with partial per-batch combine
    and integer-exact sums (quantity is integral; prices scaled to
    cents before summing)."""
    import ray.data as rd

    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["qty"] = b["l_quantity"].astype(np.int64)
        b["price_centi"] = np.round(b["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        b["one"] = np.int64(1)
        return (
            b.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty", "sum"),
                sum_price_centi=("price_centi", "sum"),
                n_rows=("one", "sum"),
            )
            .reset_index()
            .astype({"sum_qty": np.int64, "sum_price_centi": np.int64, "n_rows": np.int64})
        )

    partials = items.map_batches(partial, batch_format="pandas")
    return (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_centi", alias_name="sum_price_centi"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )


LINEITEM_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_centi,
       count(*) AS n_rows
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_customer_join(sf_dir: str):
    """Broadcast hash join: orders ⋈ customer (small side shipped once
    via ray.put, looked up per batch — J5's join pattern on relational
    data), then a grouped count per market segment and status."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    cust = (
        pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        .to_pandas()
        .set_index("c_custkey")["c_mktsegment"]
    )
    cust_ref = ray.put(cust)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    )

    class Joiner:
        def __init__(self):
            self.cust = ray.get(cust_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            seg = batch["o_custkey"].map(self.cust).fillna("UNKNOWN")
            out = pd.DataFrame(
                {"c_mktsegment": seg.to_numpy(), "o_orderstatus": batch["o_orderstatus"]}
            )
            return (
                out.groupby(["c_mktsegment", "o_orderstatus"], sort=False)
                .size()
                .reset_index(name="n_orders")
                .astype({"n_orders": np.int64})
            )

    partials = orders.map_batches(Joiner, batch_format="pandas", concurrency=(1, 4))
    return partials.groupby(["c_mktsegment", "o_orderstatus"]).aggregate(
        Sum("n_orders", alias_name="n_orders")
    )


ORDERS_JOIN_ORACLE = """
SELECT c.c_mktsegment, o.o_orderstatus, count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


def top_parts_by_size(sf_dir: str, k: int = 10):
    """Sort/top-k over part: the per-partition partial top-k then final
    top-k pattern (SURVEY.md §2.8)."""
    import ray.data as rd

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_size"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["p_size", "p_partkey"], ascending=[False, True]
        ).head(k)

    pruned = parts.map_batches(partial, batch_format="pandas")
    return pruned.sort(["p_size", "p_partkey"], descending=[True, False]).limit(k)


TOP_PARTS_ORACLE = """
SELECT p_partkey, p_name, p_size FROM part
ORDER BY p_size DESC, p_partkey ASC LIMIT {k}
"""


def events_orders_asof(sf_dir: str):
    """As-of join: for every event, the customer's most recent order at
    or before the event time (``ts >= o_orderdate``, latest wins;
    events with no prior order keep -1 sentinels so every output column
    stays a concrete int64 — nullable ints would hash differently than
    SQL NULLs).

    Shape: both tables are bucketed on the join key (`ops/shuffle.py`
    hash(user)%P — the ONE partitioning both sides share), then each
    bucket does a single vectorized ``pd.merge_asof`` (C merge over the
    time-sorted frames, ``by=`` handles per-user boundaries). No
    per-user Python, no range-cross-join blowup: cost is sort + one
    linear merge per bucket. Ties (same customer, same order date) are
    broken to the max o_orderkey on BOTH sides so the result is
    deterministic under any partitioning.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def tag_events(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "join_key": batch["user_id"].to_numpy(dtype=np.int64),
                "t_ns": batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64),
                "side": np.zeros(len(batch), dtype=np.int64),
                "id": batch["event_id"].to_numpy(dtype=np.int64),
                "extra": np.zeros(len(batch), dtype=np.int64),
            }
        )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "join_key": batch["o_custkey"].to_numpy(dtype=np.int64),
                "t_ns": batch["o_orderdate"]
                .to_numpy()
                .astype("datetime64[ns]")
                .astype(np.int64),
                "side": np.ones(len(batch), dtype=np.int64),
                "id": batch["o_orderkey"].to_numpy(dtype=np.int64),
                "extra": np.round(batch["o_totalprice"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )

    unioned = events.map_batches(tag_events, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    out_cols = {
        "event_id": np.int64,
        "user_id": np.int64,
        "ts_us": np.int64,
        "o_orderkey": np.int64,
        "o_date_us": np.int64,
        "o_totalprice_centi": np.int64,
    }

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        ev = bucket[bucket["side"] == 0]
        if ev.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
        od = bucket[bucket["side"] == 1][["join_key", "t_ns", "id", "extra"]]
        # deterministic tie-break: one order per (customer, date), max key
        od = od.sort_values(["join_key", "t_ns", "id"], kind="stable").drop_duplicates(
            ["join_key", "t_ns"], keep="last"
        )
        left = ev[["join_key", "t_ns", "id"]].sort_values("t_ns", kind="stable")
        right = od.rename(
            columns={"t_ns": "o_t_ns", "id": "o_id", "extra": "o_extra"}
        ).sort_values("o_t_ns", kind="stable")
        m = pd.merge_asof(
            left,
            right,
            left_on="t_ns",
            right_on="o_t_ns",
            by="join_key",
            direction="backward",
            allow_exact_matches=True,
        )
        for col in ("o_id", "o_t_ns", "o_extra"):
            m[col] = m[col].fillna(-1)
        # missing o_t_ns becomes sentinel -1 (not -1 ns // 1000)
        o_t = m["o_t_ns"].to_numpy(dtype=np.int64)
        o_date_us = np.where(o_t < 0, np.int64(-1), o_t // 1000)
        return pd.DataFrame(
            {
                "event_id": m["id"].to_numpy(dtype=np.int64),
                "user_id": m["join_key"].to_numpy(dtype=np.int64),
                "ts_us": m["t_ns"].to_numpy(dtype=np.int64) // 1000,
                "o_orderkey": m["o_id"].to_numpy(dtype=np.int64),
                "o_date_us": o_date_us,
                "o_totalprice_centi": m["o_extra"].to_numpy(dtype=np.int64),
            }
        )

    # coalesce: the tagged rows are a fixed five-int64 schema (~40 B),
    # far below the 128 MB block target at any realistic events/orders
    # ratio per cluster CPU, so the exchange is latency-bound, not
    # bytes-bound; if a deployment's tagged volume per cpus/2 blocks
    # ever approaches the block target, flip this to False and let the
    # reads' natural blocks amortize the latency instead
    return grouped_aggregate(unioned, ["join_key"], combine, coalesce=True)


EVENTS_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         max(o_orderkey) AS o_orderkey,
         max_by(CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
             AS o_totalprice_centi
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
       COALESCE(o.o_orderkey, -1) AS o_orderkey,
       COALESCE(CAST(epoch_us(o.o_orderdate) AS BIGINT), -1) AS o_date_us,
       COALESCE(o.o_totalprice_centi, -1) AS o_totalprice_centi
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def orders_events_range_join(sf_dir: str, days: int = 7):
    """Range join + aggregate: for every order, the count and exact
    centi-unit value sum of that customer's events in
    ``[o_orderdate, o_orderdate + days)``.

    Shape: both tables bucketed on the shared key (hash(user)%P — one
    partitioning, reused), then per bucket a vectorized two-sided
    ``searchsorted`` against each user's time-sorted event segment with
    a cumulative-sum trick for the value totals. Cost is sort + O(log)
    probes per order — never the events × orders cross product a naive
    range join materializes.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    span_ns = np.int64(days) * 86_400 * 1_000_000_000

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "join_key": batch["o_custkey"].to_numpy(dtype=np.int64),
                "t_ns": batch["o_orderdate"]
                .to_numpy()
                .astype("datetime64[ns]")
                .astype(np.int64),
                "side": np.zeros(len(batch), dtype=np.int64),
                "id": batch["o_orderkey"].to_numpy(dtype=np.int64),
                "value_centi": np.zeros(len(batch), dtype=np.int64),
            }
        )

    def tag_events(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "join_key": batch["user_id"].to_numpy(dtype=np.int64),
                "t_ns": batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64),
                "side": np.ones(len(batch), dtype=np.int64),
                "id": np.zeros(len(batch), dtype=np.int64),
                "value_centi": np.round(batch["value"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )

    unioned = orders.map_batches(tag_orders, batch_format="pandas").union(
        events.map_batches(tag_events, batch_format="pandas")
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        od = bucket[bucket["side"] == 0]
        if od.empty:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "o_custkey": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "value_centi_sum": pd.Series([], dtype=np.int64),
                }
            )
        od = od.sort_values(["join_key", "t_ns"], kind="stable")
        ev = bucket[bucket["side"] == 1].sort_values(
            ["join_key", "t_ns"], kind="stable"
        )
        e_users = ev["join_key"].to_numpy(dtype=np.int64)
        e_ts = ev["t_ns"].to_numpy(dtype=np.int64)
        # prefix sums: cum[i] = sum of event values [0, i)
        cum = np.concatenate(
            ([0], np.cumsum(ev["value_centi"].to_numpy(dtype=np.int64)))
        )
        if len(e_users):
            seg_starts = np.concatenate(
                ([0], np.flatnonzero(e_users[1:] != e_users[:-1]) + 1)
            )
            seg_users = e_users[seg_starts]
            seg_ends = np.concatenate((seg_starts[1:], [len(e_users)]))
        else:
            seg_starts = seg_ends = np.array([], dtype=np.int64)
            seg_users = np.array([], dtype=np.int64)

        o_users = od["join_key"].to_numpy(dtype=np.int64)
        o_ts = od["t_ns"].to_numpy(dtype=np.int64)
        n_events = np.zeros(len(od), dtype=np.int64)
        value_sums = np.zeros(len(od), dtype=np.int64)
        # per order-user segment, vectorized searchsorted against that
        # user's time-sorted event slice (same per-segment pattern as
        # events_sliding; the loop is over distinct users in the
        # bucket, not rows)
        start = 0
        boundaries = (
            np.append(np.flatnonzero(o_users[1:] != o_users[:-1]) + 1, len(o_users))
            if len(o_users)
            else []
        )
        for end in boundaries:
            user = o_users[start]
            si = np.searchsorted(seg_users, user, side="left")
            if si < len(seg_users) and seg_users[si] == user:
                a, b = seg_starts[si], seg_ends[si]
                seg = e_ts[a:b]
                lo = a + np.searchsorted(seg, o_ts[start:end], side="left")
                hi = a + np.searchsorted(seg, o_ts[start:end] + span_ns, side="left")
                n_events[start:end] = hi - lo
                value_sums[start:end] = cum[hi] - cum[lo]
            start = end
        return pd.DataFrame(
            {
                "o_orderkey": od["id"].to_numpy(dtype=np.int64),
                "o_custkey": o_users,
                "n_events": n_events,
                "value_centi_sum": value_sums,
            }
        )

    # same fixed-width-tagged-rows latency argument as the asof join
    return grouped_aggregate(unioned, ["join_key"], combine, coalesce=True)


ORDERS_EVENTS_RANGE_ORACLE = """
SELECT o.o_orderkey, o.o_custkey,
       count(e.user_id) AS n_events,
       COALESCE(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT), 0)
           AS value_centi_sum
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAYS
GROUP BY 1, 2
"""


def customers_without_urgent_orders(sf_dir: str):
    """Anti join: customers with no URGENT-priority order (the 'docs
    not in the blocklist' shape every curation pipeline needs; the
    priority predicate keeps the result non-degenerate on the test
    corpus, where every customer has at least one order).

    Shape: the order side collapses to distinct customer keys per batch
    (the partial), both sides shuffle once on hash(key)%P, and each
    bucket filters with one vectorized ``isin``. No broadcast of the
    full key set, so the filter side may be arbitrarily large.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def tag_customers(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": batch["c_custkey"].to_numpy(dtype=np.int64),
                "c_name": batch["c_name"].astype(str).to_numpy(),
                "side": np.zeros(len(batch), dtype=np.int64),
            }
        )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        urgent = batch[batch["o_orderpriority"] == "1-URGENT"]
        keys = np.unique(urgent["o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "key": keys,
                "c_name": np.full(len(keys), "", dtype=object),
                "side": np.ones(len(keys), dtype=np.int64),
            }
        )

    unioned = customers.map_batches(tag_customers, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        cust = bucket[bucket["side"] == 0]
        with_orders = bucket.loc[bucket["side"] == 1, "key"].to_numpy(dtype=np.int64)
        kept = cust[~cust["key"].isin(with_orders)]
        return pd.DataFrame(
            {
                "c_custkey": kept["key"].to_numpy(dtype=np.int64),
                "c_name": kept["c_name"].astype(str).to_numpy(),
            }
        )

    return grouped_aggregate(unioned, ["key"], combine, coalesce=True)


def customers_with_urgent_orders(sf_dir: str):
    """Semi join — the anti join's mirror: customers having at least
    one URGENT order, without duplicating them per matching order (the
    distinction from an inner join). Same bucketed shape as
    `customers_without_urgent_orders`; only the bucket filter flips."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def tag_customers(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": batch["c_custkey"].to_numpy(dtype=np.int64),
                "c_name": batch["c_name"].astype(str).to_numpy(),
                "side": np.zeros(len(batch), dtype=np.int64),
            }
        )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        urgent = batch[batch["o_orderpriority"] == "1-URGENT"]
        keys = np.unique(urgent["o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "key": keys,
                "c_name": np.full(len(keys), "", dtype=object),
                "side": np.ones(len(keys), dtype=np.int64),
            }
        )

    unioned = customers.map_batches(tag_customers, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        cust = bucket[bucket["side"] == 0]
        with_orders = bucket.loc[bucket["side"] == 1, "key"].to_numpy(dtype=np.int64)
        kept = cust[cust["key"].isin(with_orders)]
        return pd.DataFrame(
            {
                "c_custkey": kept["key"].to_numpy(dtype=np.int64),
                "c_name": kept["c_name"].astype(str).to_numpy(),
            }
        )

    return grouped_aggregate(unioned, ["key"], combine, coalesce=True)


CUSTOMERS_WITH_URGENT_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


CUSTOMERS_WITHOUT_URGENT_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def events_daily_distinct(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per day — the two-phase distinct
    shape: batches pre-dedupe (day, user) locally, the shuffle routes
    each distinct (day, user) to exactly one bucket (hash of both
    keys), so per-bucket user counts per day are disjoint partials that
    a tiny final sum over ~365 day keys combines exactly. Nothing holds
    the full distinct set in one place — the property that makes exact
    distinct-count survive 10^12 rows where a naive
    ``groupby(day).agg(nunique)`` ships every raw row to one reducer.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        out = pd.DataFrame(
            {"day_bucket": ts_ns // 86_400_000_000_000,
             "user_id": batch["user_id"].to_numpy(dtype=np.int64)}
        )
        return (
            out.groupby(["day_bucket", "user_id"], sort=False)
            .size()
            .reset_index(name="n_events")
            .astype({"n_events": np.int64})
        )

    def per_user_day(bucket: pd.DataFrame) -> pd.DataFrame:
        exact = (
            bucket.groupby(["day_bucket", "user_id"], sort=False)["n_events"]
            .sum()
            .reset_index()
        )
        return (
            exact.groupby("day_bucket", sort=False)
            .agg(n_users=("user_id", "size"), n_events=("n_events", "sum"))
            .reset_index()
            .astype({"day_bucket": np.int64, "n_users": np.int64, "n_events": np.int64})
        )

    day_partials = grouped_aggregate(events, ["day_bucket", "user_id"], per_user_day, partial=partial)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("day_bucket", sort=False)
            .agg(n_users=("n_users", "sum"), n_events=("n_events", "sum"))
            .reset_index()
            .astype({"day_bucket": np.int64, "n_users": np.int64, "n_events": np.int64})
        )

    return grouped_aggregate(day_partials, ["day_bucket"], final, num_partitions=16)


EVENTS_DAILY_DISTINCT_ORACLE = """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_bucket,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY 1
"""


EVENT_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_user_pivot(sf_dir: str):
    """Crosstab: one row per user, one count column per event type
    (fixed small vocabulary — the only regime where pivot-to-columns is
    scale-sane; an unbounded pivot key belongs in long format). Users
    are high-cardinality, so this is a bucketed two-phase aggregate
    with the pivot done vectorized INSIDE the partial (unstack to
    columns per batch) — the shuffle moves one short row per
    (user, batch), never raw events."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in EVENT_PIVOT_TYPES]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(batch["user_id"], batch["event_type"])
        ct = ct.reindex(columns=list(EVENT_PIVOT_TYPES), fill_value=0)
        ct.columns = cols
        out = ct.reset_index().rename(columns={"index": "user_id"})
        out["user_id"] = out["user_id"].astype(np.int64)
        return out.astype({c: np.int64 for c in cols})

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("user_id", sort=False)[cols]
            .sum()
            .reset_index()
            .astype({"user_id": np.int64, **{c: np.int64 for c in cols}})
        )

    return grouped_aggregate(events, ["user_id"], combine, partial=partial)


EVENTS_USER_PIVOT_ORACLE = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS n_click,
       count(*) FILTER (event_type = 'error')    AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup')   AS n_signup,
       count(*) FILTER (event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


def events_unpivot(sf_dir: str):
    """Wide-to-long (UNPIVOT/melt): the per-user crosstab back to one
    (user_id, event_type, n) row per cell, zeros included — the
    inverse of :func:`events_user_pivot` and the shape feature stores
    want. Melting is embarrassingly row-local, so it rides the pivot's
    bucketed aggregate and adds ONE stateless vectorized map (np.repeat
    the key column, np.tile the type labels, ravel the count block) —
    no extra shuffle, no per-row Python."""
    cols = [f"n_{t}" for t in EVENT_PIVOT_TYPES]
    types = np.array(list(EVENT_PIVOT_TYPES))

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        counts = batch[cols].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": np.repeat(batch["user_id"].to_numpy(np.int64), len(cols)),
                "event_type": np.tile(types, len(batch)),
                "n": counts.ravel(),
            }
        )

    return events_user_pivot(sf_dir).map_batches(melt, batch_format="pandas")


EVENTS_UNPIVOT_ORACLE = f"""
WITH p AS ({EVENTS_USER_PIVOT_ORACLE})
SELECT user_id, 'click' AS event_type, CAST(n_click AS BIGINT) AS n FROM p
UNION ALL SELECT user_id, 'error', CAST(n_error AS BIGINT) FROM p
UNION ALL SELECT user_id, 'purchase', CAST(n_purchase AS BIGINT) FROM p
UNION ALL SELECT user_id, 'signup', CAST(n_signup AS BIGINT) FROM p
UNION ALL SELECT user_id, 'view', CAST(n_view AS BIGINT) FROM p
"""


def user_journeys(sf_dir: str):
    """Ordered string aggregation: each user's full event sequence as
    a string of event-type initials in (ts, event_id) order — the
    "customer journey" / session-path feature behind sequence mining.

    Ordered STRING_AGG needs the whole partition ordered in one place,
    so: bucketed user shuffle, then per bucket one stable sort, one
    C-level join of ALL initials into a single buffer, and per-user
    slices at the segment boundaries — O(users) cheap slice operations,
    never a per-row Python loop. Order ties broken by event_id exactly
    as in the oracle's ``ORDER BY ts, event_id``."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(dtype=np.int64),
                "ts_us": batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64),
                "event_id": batch["event_id"].to_numpy(dtype=np.int64),
                "initial": batch["event_type"].str[0],
            }
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"user_id": np.array([], dtype=np.int64),
                 "n_events": np.array([], dtype=np.int64),
                 "journey": pd.Series([], dtype=str)}
            )
        df = bucket.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        # NULL event types contribute NOTHING to the journey (SQL
        # string_agg skips NULLs) but still count in n_events, so the
        # slices go by cumulative CHARACTER offsets, not row positions
        init = df["initial"].fillna("")
        big = "".join(init.tolist())
        offs = np.concatenate(
            ([0], np.cumsum(init.str.len().to_numpy(dtype=np.int64)))
        )
        starts = np.flatnonzero(
            np.concatenate(([True], users[1:] != users[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(users)]))
        return pd.DataFrame(
            {
                "user_id": users[starts],
                "n_events": (ends - starts).astype(np.int64),
                "journey": [big[offs[s]:offs[e]] for s, e in zip(starts, ends)],
            }
        )

    return grouped_aggregate(events, ["user_id"], combine, partial=partial,
                             num_partitions=32)


USER_JOURNEYS_ORACLE = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
FROM events GROUP BY user_id
"""


HLL_P = 12  # 2^12 registers/day: ~1.6% standard error, 4 KiB per day


def events_daily_users_approx(sf_dir: str, p: int = HLL_P):
    """Approximate COUNT(DISTINCT user_id) per day via HyperLogLog —
    the sketch path for when even the two-phase exact distinct
    (`events_daily_distinct`) moves too many rows: the shuffle here
    carries at most 2^p (day, register, rho) partials per (day, batch)
    regardless of how many distinct users exist, and register-max is
    associative so partials combine exactly like any other aggregate.

    Vectorized per batch: one multiply-xor avalanche over the whole
    user column, register = top p bits, rho = leading-zero count of
    the rest (via log2 on the remaining 64-p bits). Final per-day
    estimate is the standard HLL harmonic mean with the small-range
    linear-counting correction. Deterministic — same input, same
    estimate — so the rows-only driver check is stable; accuracy vs
    the exact operator is asserted in pytest (within 5% at p=12).
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    m = 1 << p
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def _avalanche(x: np.ndarray) -> np.ndarray:
        # splitmix64 finalizer — a full-period bijection, so distinct
        # user ids map to distinct 64-bit hashes (no sketch-side
        # collision term)
        z = x.astype(np.uint64)
        with np.errstate(over="ignore"):
            z = (z + np.uint64(0x9E3779B97F4A7C15))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
        return z

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        day = ts_ns // 86_400_000_000_000
        h = _avalanche(batch["user_id"].to_numpy(dtype=np.int64))
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
        # rho = leading zeros of `rest` + 1, via the bit length of the
        # value (log2 floor); rest is never 0 thanks to the sentinel
        bits = np.floor(np.log2(rest.astype(np.float64) + 0.5)).astype(np.int64)
        rho = 64 - bits  # in [1, 64-p+1]
        out = pd.DataFrame({"day_bucket": day, "reg": reg, "rho": rho})
        return (
            out.groupby(["day_bucket", "reg"], sort=False)["rho"]
            .max()
            .reset_index()
            .astype({"rho": np.int64})
        )

    def max_rho(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["day_bucket", "reg"], sort=False)["rho"]
            .max()
            .reset_index()
            .astype({"rho": np.int64})
        )

    regs = grouped_aggregate(events, ["day_bucket", "reg"], max_rho, partial=partial)

    alpha = 0.7213 / (1 + 1.079 / m)

    def estimate(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for day, g in bucket.groupby("day_bucket", sort=False):
            registers = np.zeros(m, dtype=np.int64)
            registers[g["reg"].to_numpy(dtype=np.int64)] = g["rho"].to_numpy(dtype=np.int64)
            est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
            zeros = int(np.sum(registers == 0))
            if est <= 2.5 * m and zeros > 0:
                est = m * np.log(m / zeros)  # linear counting
            rows.append((int(day), int(round(est))))
        return pd.DataFrame(rows, columns=["day_bucket", "approx_users"]).astype(
            {"day_bucket": np.int64, "approx_users": np.int64}
        )

    # ~365 day keys: the per-group python loop here is over DAYS, not
    # users — bounded and final
    return grouped_aggregate(regs, ["day_bucket"], estimate, num_partitions=16)


def order_lineitem_rollup(sf_dir: str):
    """LEFT OUTER shuffle join of two LARGE tables — orders x lineitem
    on orderkey, neither side broadcast: per order, line count + summed
    quantity + summed extended price (centi-units, integer-exact),
    INCLUDING orders with no lineitems (count 0).

    The shape `orders_customer_join` deliberately avoids (its build
    side is small enough to `ray.put`): here BOTH sides stream through
    one bucketed shuffle on hash(orderkey) — each bucket sees every
    row of both tables for its keys and does one vectorized merge, so
    no worker ever holds either table whole. The lineitem side is
    pre-aggregated per batch BEFORE the shuffle (partial count/sums per
    orderkey), so the wide step moves one short row per (orderkey,
    batch), not raw lineitems — the combiner-before-join trick that
    makes join-then-aggregate plans tractable at 100 TB.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
    )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["o_orderkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"orderkey": k,
             "side": np.zeros(len(k), dtype=np.int64),
             "n_lines": np.zeros(len(k), dtype=np.int64),
             "sum_qty": np.zeros(len(k), dtype=np.int64),
             "sum_price_centi": np.zeros(len(k), dtype=np.int64)}
        )

    def tag_lines(batch: pd.DataFrame) -> pd.DataFrame:
        part = pd.DataFrame(
            {"orderkey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "qty": np.round(batch["l_quantity"].to_numpy() ).astype(np.int64),
             "price_centi": np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)}
        )
        agg = (
            part.groupby("orderkey", sort=False)
            .agg(n_lines=("qty", "size"), sum_qty=("qty", "sum"),
                 sum_price_centi=("price_centi", "sum"))
            .reset_index()
        )
        agg["side"] = np.int64(1)
        return agg[["orderkey", "side", "n_lines", "sum_qty", "sum_price_centi"]].astype(
            {c: np.int64 for c in ("orderkey", "side", "n_lines", "sum_qty", "sum_price_centi")}
        )

    unioned = orders.map_batches(tag_orders, batch_format="pandas").union(
        lines.map_batches(tag_lines, batch_format="pandas")
    )

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        right = (
            bucket[bucket["side"] == 1]
            .groupby("orderkey", sort=False)
            .agg(n_lines=("n_lines", "sum"), sum_qty=("sum_qty", "sum"),
                 sum_price_centi=("sum_price_centi", "sum"))
            .reset_index()
        )
        left = bucket[bucket["side"] == 0][["orderkey"]].drop_duplicates()
        out = left.merge(right, on="orderkey", how="left").fillna(0)
        return out.astype(
            {c: np.int64 for c in ("orderkey", "n_lines", "sum_qty", "sum_price_centi")}
        )

    return grouped_aggregate(unioned, ["orderkey"], join_bucket, coalesce=True)


ORDER_LINEITEM_ROLLUP_ORACLE = """
SELECT o.o_orderkey AS orderkey,
       count(l.l_orderkey) AS n_lines,
       CAST(COALESCE(sum(CAST(round(l.l_quantity) AS BIGINT)), 0) AS BIGINT) AS sum_qty,
       CAST(COALESCE(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT)
         AS sum_price_centi
FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


BLOOM_BITS = 1 << 20  # 128 KiB of bits; ~0.1% FP at 10^5 keys, k=7
BLOOM_K = 7


def _bloom_hashes(keys: np.ndarray) -> np.ndarray:
    """(len(keys), BLOOM_K) bit positions via double hashing of two
    independent splitmix-style streams — vectorized, no Python loop."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h1 ^= h1 >> np.uint64(33)
        h2 = (x ^ (x >> np.uint64(29))) * np.uint64(0xC4CEB9FE1A85EC53)
        h2 ^= h2 >> np.uint64(32)
        h2 |= np.uint64(1)  # odd step so probes don't cycle
        probes = h1[:, None] + np.arange(BLOOM_K, dtype=np.uint64)[None, :] * h2[:, None]
    return (probes % np.uint64(BLOOM_BITS)).astype(np.int64)


def customers_without_urgent_bloom(sf_dir: str):
    """Anti join with a broadcast Bloom-filter pre-filter — the sketch
    optimization for when the probe side is enormous: a 128 KiB bit
    array summarizing the (distinct) filter-side keys is built with a
    per-batch partial OR + one tiny reduce, broadcast via ``ray.put``,
    and customers whose key is definitely-absent skip the shuffle
    entirely. Bloom false positives pass through to the exact bucketed
    anti join, so the result is IDENTICAL to
    `customers_without_urgent_orders` (asserted in pytest and by
    sharing its oracle) — the sketch only cuts shuffle volume, never
    changes semantics. At a 0.1% FP rate the exact join sees ~1/1000
    of the non-matching probe rows.
    """
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def batch_bits(batch: pd.DataFrame) -> pd.DataFrame:
        urgent = batch[batch["o_orderpriority"] == "1-URGENT"]
        keys = np.unique(urgent["o_custkey"].to_numpy(dtype=np.int64))
        bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        if len(keys):
            pos = _bloom_hashes(keys).ravel()
            np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({"chunk": [bits.tobytes()]})

    # tiny reduce: OR the per-batch bit arrays on the driver — the
    # sketch is fixed-size (128 KiB) no matter how many orders exist,
    # which is exactly why this is allowed to leave the cluster
    bloom = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for row in orders.map_batches(batch_bits, batch_format="pandas").iter_rows():
        bloom |= np.frombuffer(row["chunk"], dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def prefilter(batch: pd.DataFrame, bits_ref=None) -> pd.DataFrame:
        # plain task fn, not an actor pool: the state is one 128 KiB
        # bit array — ray.get of the broadcast ref is plasma-local
        # after the first batch on a worker, and a pool's 2-3 s
        # spin-up would dwarf the whole stage
        bits = ray.get(bits_ref)
        keys = batch["c_custkey"].to_numpy(dtype=np.int64)
        pos = _bloom_hashes(keys)
        hit = (
            (bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
        ).all(axis=1)
        definite_out = batch[~hit][["c_custkey", "c_name"]].copy()
        definite_out["maybe"] = np.int64(0)
        candidates = batch[hit][["c_custkey", "c_name"]].copy()
        candidates["maybe"] = np.int64(1)
        return pd.concat([definite_out, candidates], ignore_index=True)

    # materialize: BOTH branches below (exact anti join on 'maybe'
    # rows, passthrough of definite-outs) consume `marked`; without a
    # pin the customers read + prefilter execute twice. The pin is
    # customer-table-sized — object-store spill handles it at scale
    marked = customers.map_batches(
        prefilter, batch_format="pandas", fn_kwargs={"bits_ref": bloom_ref}
    ).materialize()

    # definite non-members are already final; only 'maybe' rows (true
    # members + bloom FPs) go through the exact bucketed anti join
    def tag_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch[batch["maybe"] == 1]
        return pd.DataFrame(
            {"key": c["c_custkey"].to_numpy(dtype=np.int64),
             "c_name": c["c_name"].astype(str).to_numpy(),
             "side": np.zeros(len(c), dtype=np.int64)}
        )

    def tag_urgent(batch: pd.DataFrame) -> pd.DataFrame:
        urgent = batch[batch["o_orderpriority"] == "1-URGENT"]
        keys = np.unique(urgent["o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"key": keys, "c_name": np.full(len(keys), "", dtype=object),
             "side": np.ones(len(keys), dtype=np.int64)}
        )

    unioned = marked.map_batches(tag_candidates, batch_format="pandas").union(
        orders.map_batches(tag_urgent, batch_format="pandas")
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        cust = bucket[bucket["side"] == 0]
        members = bucket.loc[bucket["side"] == 1, "key"].to_numpy(dtype=np.int64)
        kept = cust[~cust["key"].isin(members)]
        return pd.DataFrame(
            {"c_custkey": kept["key"].to_numpy(dtype=np.int64),
             "c_name": kept["c_name"].astype(str).to_numpy()}
        )

    survivors = grouped_aggregate(unioned, ["key"], combine)

    def passthrough(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["maybe"] == 0]
        return pd.DataFrame(
            {"c_custkey": d["c_custkey"].to_numpy(dtype=np.int64),
             "c_name": d["c_name"].astype(str).to_numpy()}
        )

    return survivors.union(marked.map_batches(passthrough, batch_format="pandas"))


def events_running_count(sf_dir: str):
    """Cumulative window: for every event, that user's running event
    count up to and including it (SQL ``ROWS UNBOUNDED PRECEDING``).
    Same bucketed-shuffle-then-vectorized-segment shape as
    ``events_sliding``: one cumcount over the sorted bucket, segment
    boundaries by user change — no per-user Python groups."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy()
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.zeros(n, dtype=np.int64)
        if n > 1:
            starts = np.flatnonzero(
                np.concatenate(([True], users[1:] != users[:-1]))
            )
            seg_start = starts[np.cumsum(np.concatenate(
                ([True], users[1:] != users[:-1]))) - 1]
        running = pos - seg_start + 1
        return pd.DataFrame(
            {"user_id": users,
             "event_id": g["event_id"].to_numpy(dtype=np.int64),
             "running_count": running}
        )

    return grouped_aggregate(events, ["user_id"], combine)


EVENTS_RUNNING_COUNT_ORACLE = """
SELECT user_id, event_id,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_count
FROM events
"""


def first_events_global(sf_dir: str, k: int = 100):
    """Global sort + limit: the first ``k`` events corpus-wide by
    (ts, event_id) — the one operator family where Ray Data's NATIVE
    range-partitioned ``Dataset.sort`` is the right tool (a total
    order genuinely needs the all-to-all; everything else in this repo
    avoids it via bucketing). ``limit`` then streams only the head
    blocks."""
    import ray.data as rd

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def to_ns(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"ts_ns": batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64),
             "event_id": batch["event_id"].to_numpy(dtype=np.int64),
             "user_id": batch["user_id"].to_numpy(dtype=np.int64)}
        )
        return out

    ranked = events.map_batches(to_ns, batch_format="pandas").sort(
        ["ts_ns", "event_id"]
    ).limit(k)

    # rank assignment needs a global offset; with k small the head is
    # one narrow result — rank it in one final bounded kernel
    def rank_all(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values(["ts_ns", "event_id"], kind="stable").reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["rank", "ts_ns", "event_id", "user_id"]]

    return ranked.repartition(1).map_batches(
        rank_all, batch_format="pandas", batch_size=k
    )


FIRST_EVENTS_ORACLE = """
SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rank,
       CAST(epoch_ns(ts) AS BIGINT) AS ts_ns,
       event_id, user_id
FROM events
ORDER BY ts, event_id
LIMIT 100
"""


def props_extract_stats(sf_dir: str):
    """Semi-structured column flattening: pull the integer field out of
    the JSON-string ``props`` column (vectorized ``str.extract`` with a
    compiled regex — no per-row json.loads in the hot path) and
    aggregate per event_type. The extraction is a per-batch map; the
    aggregate is the usual two-phase combine over a tiny key space."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = (
            batch["props"]
            .astype(str)
            .str.extract(r"(\d+)", expand=False)
            .fillna("0")
            .astype(np.int64)
        )
        out = pd.DataFrame({"event_type": batch["event_type"], "k": k})
        return (
            out.groupby("event_type", sort=False)
            .agg(n_events=("k", "size"), sum_k=("k", "sum"),
                 min_k=("k", "min"), max_k=("k", "max"))
            .reset_index()
            .astype({c: np.int64 for c in ("n_events", "sum_k", "min_k", "max_k")})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("event_type", sort=False)
            .agg(n_events=("n_events", "sum"), sum_k=("sum_k", "sum"),
                 min_k=("min_k", "min"), max_k=("max_k", "max"))
            .reset_index()
            .astype({c: np.int64 for c in ("n_events", "sum_k", "min_k", "max_k")})
        )

    return grouped_aggregate(events, ["event_type"], combine, partial=partial,
                             num_partitions=8)


PROPS_EXTRACT_ORACLE = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(COALESCE(regexp_extract(props, '[0-9]+'), '0') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(COALESCE(regexp_extract(props, '[0-9]+'), '0') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(COALESCE(regexp_extract(props, '[0-9]+'), '0') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


def events_lag_gaps(sf_dir: str):
    """Per-user LAG window: for every event, the exact time (in
    microseconds) since that user's previous event, -1 for the user's
    first event — the inter-arrival feature behind sessionization and
    bot detection.

    Row-wise windows (LAG/LEAD) need every row of a partition
    co-located and ordered; Ray Data has no window operator, so this is
    the bucketed shuffle on ``hash(user_id)`` + ONE vectorized
    sort-and-diff per bucket (sort by (user, ts, event_id), ``np.diff``
    on the epoch-microsecond column, mask the first row of each user
    segment) — no per-user Python, the same segment-kernel shape as
    ``events_sliding``. Integer microseconds end-to-end so the oracle
    (``LAG`` + ``epoch_us``) hashes exactly."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.copy()
        df["ts_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        ts = df["ts_us"].to_numpy()
        users = df["user_id"].to_numpy(dtype=np.int64)
        gaps = np.empty(len(df), dtype=np.int64)
        if len(df):
            gaps[0] = -1
            gaps[1:] = ts[1:] - ts[:-1]
            gaps[np.flatnonzero(users[1:] != users[:-1]) + 1] = -1
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(dtype=np.int64),
             "user_id": users,
             "gap_us": gaps}
        )

    return grouped_aggregate(events, ["user_id"], combine, num_partitions=32)


EVENTS_LAG_GAPS_ORACLE = """
SELECT event_id, user_id,
       CAST(COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT)
         AS gap_us
FROM events
"""


def redact_props(sf_dir: str):
    """PII-shaped scrubbing: replace every digit run in the ``props``
    payload with ``<NUM>`` and count the redactions — the vectorized
    regex-redaction stage of a training-data pipeline (the synthetic
    corpus has no real PII; digit runs in the JSON props stand in for
    IDs/phone numbers).

    Pure ``map_batches`` — zero shuffle, embarrassingly parallel,
    pandas ``str.replace``/``str.count`` (compiled regex, C loop).
    The redacted text itself is returned so downstream stages consume
    the scrubbed corpus, not a report about it."""
    import ray.data as rd

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"]
    )

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        props = batch["props"].fillna("")
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(dtype=np.int64),
             "n_redactions": props.str.count(r"[0-9]+").to_numpy(dtype=np.int64),
             "redacted": props.str.replace(r"[0-9]+", "<NUM>", regex=True)}
        )

    return events.map_batches(kernel, batch_format="pandas")


REDACT_PROPS_ORACLE = """
SELECT event_id,
       CAST(len(regexp_extract_all(COALESCE(props, ''), '[0-9]+')) AS BIGINT)
         AS n_redactions,
       regexp_replace(COALESCE(props, ''), '[0-9]+', '<NUM>', 'g') AS redacted
FROM events
"""


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """DuckDB-compatible rounding for non-negative floats: half away
    from zero (``floor(x+0.5)``), not numpy's banker's rounding — the
    two differ on exact .5 products like extendedprice*(1-discount)."""
    return np.floor(x + 0.5).astype(np.int64)


# --------------------------------------------------------------------
# Three-table join chain (TPC-H Q3 shape): broadcast semi-join on the
# small filtered side, ONE bucketed shuffle for the large-large join,
# partial top-k before the final sort.
# --------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"


def top_revenue_orders(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with filters on all
    three tables, revenue aggregation, and a global top-k.

    Scale plan (the interesting part — three joins, ONE shuffle):

    * ``customer`` filtered on mktsegment collapses to a bare custkey
      set — the classic small side. It is collected once, ``ray.put``,
      and applied to ``orders`` as a broadcast **semi-join filter**
      (``np.isin`` per batch), so the customer table never enters a
      shuffle. At 100 TB the filtered-key set for one segment is a few
      GB of int64 at most; if a segment ever outgrew worker heaps the
      fallback is tagging custkeys into the same bucketed exchange as
      the orders side (the ``order_lineitem_rollup`` shape).
    * ``orders`` x ``lineitem`` — both large — go through ONE bucketed
      exchange on hash(orderkey), with the lineitem side pre-aggregated
      per batch (partial revenue sums per orderkey) so the shuffle
      moves one short row per (orderkey, batch), not raw lineitems.
    * top-k: each bucket emits only its local top ``k``; the final
      ``sort().limit(k)`` sees ≤ k·P rows — never the full join result.

    Revenue is per-line ``round(extendedprice·(1-discount)·100)`` summed
    as int64 centi-units, so the hash matches the oracle bit-exactly
    regardless of accumulation order.
    """
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def cust_keys(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch.loc[batch["c_mktsegment"] == Q3_SEGMENT, ["c_custkey"]]
        return keep.astype({"c_custkey": np.int64})

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    keys = np.unique(
        collect_small(cust.map_batches(cust_keys, batch_format="pandas"),
                      ["c_custkey"])["c_custkey"]
        .to_numpy(dtype=np.int64)
    )
    keys_ref = ray.put(keys)

    cutoff = np.datetime64(Q3_DATE, "us")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        wanted = np.asarray(ray.get(keys_ref))
        ok = batch["o_custkey"].to_numpy(dtype=np.int64)
        dates = batch["o_orderdate"].to_numpy(dtype="datetime64[us]")
        m = (dates < cutoff) & np.isin(ok, wanted)
        kept = batch.loc[m]
        return pd.DataFrame(
            {"orderkey": kept["o_orderkey"].to_numpy(dtype=np.int64),
             "side": np.zeros(int(m.sum()), dtype=np.int64),
             "orderdate": kept["o_orderdate"].dt.strftime("%Y-%m-%d"),
             "orderpriority": kept["o_orderpriority"].astype(str),
             "revenue_centi": np.zeros(int(m.sum()), dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def tag_lines(batch: pd.DataFrame) -> pd.DataFrame:
        ship = batch["l_shipdate"].to_numpy(dtype="datetime64[us]")
        kept = batch.loc[ship > cutoff]
        rev = _round_half_up(
            kept["l_extendedprice"].to_numpy()
            * (1.0 - kept["l_discount"].to_numpy())
            * 100.0
        )
        part = (
            pd.DataFrame(
                {"orderkey": kept["l_orderkey"].to_numpy(dtype=np.int64),
                 "revenue_centi": rev}
            )
            .groupby("orderkey", sort=False)["revenue_centi"]
            .sum()
            .reset_index()
        )
        n = len(part)
        return pd.DataFrame(
            {"orderkey": part["orderkey"].to_numpy(dtype=np.int64),
             "side": np.ones(n, dtype=np.int64),
             "orderdate": np.full(n, "", dtype=object),
             "orderpriority": np.full(n, "", dtype=object),
             "revenue_centi": part["revenue_centi"].to_numpy(dtype=np.int64)}
        )

    unioned = orders.map_batches(tag_orders, batch_format="pandas").union(
        lines.map_batches(tag_lines, batch_format="pandas")
    )

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        left = bucket[bucket["side"] == 0][
            ["orderkey", "orderdate", "orderpriority"]
        ].drop_duplicates("orderkey")
        rev = (
            bucket[bucket["side"] == 1]
            .groupby("orderkey", sort=False)["revenue_centi"]
            .sum()
            .reset_index()
        )
        out = left.merge(rev, on="orderkey", how="inner")
        out = out.astype({"orderkey": np.int64, "revenue_centi": np.int64})
        # local top-k: only k rows per bucket reach the final sort
        return out.sort_values(
            ["revenue_centi", "orderkey"], ascending=[False, True]
        ).head(k)

    joined = grouped_aggregate(unioned, ["orderkey"], join_bucket, coalesce=True)
    return joined.sort(["revenue_centi", "orderkey"], descending=[True, False]).limit(k)


TOP_REVENUE_ORDERS_ORACLE = f"""
SELECT o.o_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS orderpriority,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
         AS revenue_centi
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l.l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY 1, 2, 3
ORDER BY revenue_centi DESC, orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------
# Set operations (EXCEPT / INTERSECT) as one tagged-flag aggregation.
# --------------------------------------------------------------------

_WINDOW_A = ("2024-01-01", "2024-01-02")
_WINDOW_B = ("2024-01-02", "2024-01-03")


def _user_window_flags(sf_dir: str):
    """Per user: was the user active in window A / window B? ONE pass
    over events, per-batch partial OR of the two flags, one bucketed
    combine — both set operations below are filters over this, so
    EXCEPT and INTERSECT cost a single narrow shuffle of (user, 2 bits)
    rather than two distinct scans + a distributed set-difference."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    a_lo, a_hi = (np.datetime64(t, "us") for t in _WINDOW_A)
    b_lo, b_hi = (np.datetime64(t, "us") for t in _WINDOW_B)

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].to_numpy(dtype="datetime64[us]")
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(dtype=np.int64),
             "in_a": ((ts >= a_lo) & (ts < a_hi)).astype(np.int64),
             "in_b": ((ts >= b_lo) & (ts < b_hi)).astype(np.int64)}
        )
        return (
            df.groupby("user_id", sort=False)
            .agg(in_a=("in_a", "max"), in_b=("in_b", "max"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("user_id", sort=False)
            .agg(in_a=("in_a", "max"), in_b=("in_b", "max"))
            .reset_index()
            .astype({"user_id": np.int64, "in_a": np.int64, "in_b": np.int64})
        )

    return grouped_aggregate(events, ["user_id"], combine, partial=partial,
                             num_partitions=32)


def _pick_users(flags_ds, want_b: int):
    """Filter the per-user flag table; a result can legitimately be
    EMPTY (every day-1 user returned on day 2), so each output batch is
    an Arrow table with an explicit schema — empty pandas blocks drop
    their columns and would leave a schemaless dataset."""
    import pyarrow as pa

    schema = pa.schema([("user_id", pa.int64())])

    def pick(batch: pd.DataFrame) -> pa.Table:
        m = (batch["in_a"] == 1) & (batch["in_b"] == want_b)
        kept = batch.loc[m, "user_id"].to_numpy(dtype=np.int64)
        return pa.Table.from_arrays([pa.array(kept, type=pa.int64())], schema=schema)

    return flags_ds.map_batches(pick, batch_format="pandas")


def users_lapsed(sf_dir: str):
    """Set EXCEPT: users active on day 1 but not day 2 (churn list)."""
    return _pick_users(_user_window_flags(sf_dir), want_b=0)


def users_retained(sf_dir: str):
    """Set INTERSECT: users active on both day 1 and day 2."""
    return _pick_users(_user_window_flags(sf_dir), want_b=1)


_SETOP_WINDOWS_SQL = (
    "SELECT DISTINCT user_id FROM events "
    f"WHERE ts >= TIMESTAMP '{_WINDOW_A[0]}' AND ts < TIMESTAMP '{_WINDOW_A[1]}' "
    "{setop} "
    "SELECT DISTINCT user_id FROM events "
    f"WHERE ts >= TIMESTAMP '{_WINDOW_B[0]}' AND ts < TIMESTAMP '{_WINDOW_B[1]}'"
)

USERS_LAPSED_ORACLE = _SETOP_WINDOWS_SQL.format(setop="EXCEPT")
USERS_RETAINED_ORACLE = _SETOP_WINDOWS_SQL.format(setop="INTERSECT")


# --------------------------------------------------------------------
# Rolling row-frame window (moving sum over the last 4 events/user).
# --------------------------------------------------------------------


def events_moving_window(sf_dir: str, frame: int = 4):
    """ROWS-frame window: for every event, the sum of ``value`` over
    that user's last ``frame`` events (including this one) — the
    moving-average feature behind anomaly scoring.

    Same partition-and-segment-kernel shape as ``events_lag_gaps``:
    bucketed shuffle on hash(user_id), then per bucket ONE stable sort
    by (user, ts, event_id) and a fully vectorized windowed sum —
    cumsum minus the cumsum ``frame`` rows back, clamped at each user
    segment's start (``np.maximum.accumulate`` over segment-start
    indices). No per-user Python, no pandas ``rolling`` per group.
    Values are summed as centi-unit int64 so the oracle hash is exact.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.copy()
        df["ts_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        v = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"event_id": np.array([], dtype=np.int64),
                 "user_id": np.array([], dtype=np.int64),
                 "w_sum_centi": np.array([], dtype=np.int64)}
            )
        w = windowed_sum(users, v, frame)
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(dtype=np.int64),
             "user_id": users,
             "w_sum_centi": w.astype(np.int64)}
        )

    return grouped_aggregate(events, ["user_id"], combine, num_partitions=32)


EVENTS_MOVING_WINDOW_ORACLE = """
SELECT event_id, user_id,
       SUM(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS w_sum_centi
FROM events
"""


# --------------------------------------------------------------------
# Five-table join chain (TPC-H Q5 shape): dimension broadcast ladder +
# ONE fact shuffle.
# --------------------------------------------------------------------

Q5_REGION = "EUROPE"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1998-01-01"


def _np_lookup(sorted_keys: np.ndarray, values: np.ndarray, queries: np.ndarray,
               missing: np.int64 = np.int64(-1)) -> np.ndarray:
    """Vectorized key→value map: searchsorted over the sorted key array
    (no Python dict, no per-row hashing). Absent keys get ``missing``."""
    if len(sorted_keys) == 0:
        return np.full(len(queries), missing, dtype=np.int64)
    pos = np.searchsorted(sorted_keys, queries)
    pos = np.clip(pos, 0, len(sorted_keys) - 1)
    hit = sorted_keys[pos] == queries
    out = np.where(hit, values[pos], missing)
    return out.astype(np.int64)


def local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape: revenue per nation from lineitems whose SUPPLIER
    sits in the same nation as the order's CUSTOMER, region- and
    date-filtered — five joins, ONE shuffle.

    The dimension ladder (region → nation → customer / supplier)
    collapses into two broadcast int64 lookup arrays built once on the
    driver: custkey→nationkey (region-filtered — doubles as the
    semi-join) and suppkey→nationkey. Orders tag their customer's
    nation per batch; lineitems tag their supplier's nation and
    pre-aggregate revenue per (orderkey, supp_nation) per batch; both
    sides meet in ONE bucketed exchange on hash(orderkey) where the
    equality ``cust_nation == supp_nation`` is applied as a vectorized
    merge filter, and each bucket emits per-nation partials — the final
    aggregate is 25 rows. At 100 TB the customer map is the one side
    that could outgrow worker heaps; the fallback is tagging custkeys
    into the same exchange (``order_lineitem_rollup`` shape) — the
    supplier and nation maps stay broadcast at any realistic scale.
    """
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    # dimension ladder: nation/region are CONSTANT-size tables (25/5
    # rows at any scale factor) — read them with plain pyarrow on the
    # driver; spinning a distributed dataset execution per tiny file
    # costs ~1 s of pure overhead each (measured at sf0.1)
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    rkeys = region.loc[region["r_name"] == Q5_REGION, "r_regionkey"]
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nat_keys = set(nat["n_nationkey"].astype(int))
    nat_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    cust = collect_small(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        ["c_custkey", "c_nationkey"],
    )
    cust = cust[cust["c_nationkey"].astype(int).isin(nat_keys)]
    order_c = np.argsort(cust["c_custkey"].to_numpy())
    cust_map = ray.put(
        (cust["c_custkey"].to_numpy(dtype=np.int64)[order_c],
         cust["c_nationkey"].to_numpy(dtype=np.int64)[order_c])
    )

    supp = collect_small(
        rd.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ),
        ["s_suppkey", "s_nationkey"],
    )
    order_s = np.argsort(supp["s_suppkey"].to_numpy())
    supp_map = ray.put(
        (supp["s_suppkey"].to_numpy(dtype=np.int64)[order_s],
         supp["s_nationkey"].to_numpy(dtype=np.int64)[order_s])
    )

    lo = np.datetime64(Q5_DATE_LO, "us")
    hi = np.datetime64(Q5_DATE_HI, "us")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nations = ray.get(cust_map)
        dates = batch["o_orderdate"].to_numpy(dtype="datetime64[us]")
        kept = batch.loc[(dates >= lo) & (dates < hi)]
        cnat = _np_lookup(keys, nations,
                          kept["o_custkey"].to_numpy(dtype=np.int64))
        kept = kept.loc[cnat >= 0]
        n = len(kept)
        return pd.DataFrame(
            {"orderkey": kept["o_orderkey"].to_numpy(dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64),
             "nationkey": cnat[cnat >= 0],
             "revenue_centi": np.zeros(n, dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def tag_lines(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nations = ray.get(supp_map)
        snat = _np_lookup(keys, nations,
                          batch["l_suppkey"].to_numpy(dtype=np.int64))
        rev = _round_half_up(
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy())
            * 100.0
        )
        part = (
            pd.DataFrame(
                {"orderkey": batch["l_orderkey"].to_numpy(dtype=np.int64),
                 "nationkey": snat, "revenue_centi": rev}
            )
            .groupby(["orderkey", "nationkey"], sort=False)["revenue_centi"]
            .sum()
            .reset_index()
        )
        part["side"] = np.int64(1)
        return part[["orderkey", "side", "nationkey", "revenue_centi"]].astype(
            {c: np.int64 for c in ("orderkey", "side", "nationkey", "revenue_centi")}
        )

    unioned = orders.map_batches(tag_orders, batch_format="pandas").union(
        lines.map_batches(tag_lines, batch_format="pandas")
    )

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        left = bucket[bucket["side"] == 0][["orderkey", "nationkey"]]
        right = bucket[bucket["side"] == 1][
            ["orderkey", "nationkey", "revenue_centi"]
        ]
        # local-supplier condition: same nation on both sides of the
        # merge key, so join on (orderkey, nationkey) directly
        m = left.merge(right, on=["orderkey", "nationkey"], how="inner")
        out = (
            m.groupby("nationkey", sort=False)["revenue_centi"]
            .sum()
            .reset_index()
            .astype({"nationkey": np.int64, "revenue_centi": np.int64})
        )
        return out

    partials = grouped_aggregate(unioned, ["orderkey"], join_bucket, coalesce=True)

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby("nationkey", sort=False)["revenue_centi"]
            .sum()
            .reset_index()
        )
        out["n_name"] = out["nationkey"].astype(int).map(nat_names)
        out = out[["n_name", "revenue_centi"]].astype({"revenue_centi": np.int64})
        return out.sort_values("revenue_centi", ascending=False)

    # the partials are ≤ nations-per-bucket rows per bucket (tiny): one
    # narrow repartition(1) + a single vectorized final beats a second
    # full bucketed shuffle + distributed sort by ~2 s of stage latency
    return partials.repartition(1).map_batches(finalize, batch_format="pandas")


LOCAL_SUPPLIER_REVENUE_ORACLE = f"""
SELECT n.n_name,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
         AS revenue_centi
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o.o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
GROUP BY 1
ORDER BY revenue_centi DESC
"""


# --------------------------------------------------------------------
# Skew-resilient enrichment join (salted shuffle).
# --------------------------------------------------------------------


def lineitem_enriched(sf_dir: str, num_salts: int = 8):
    """Enrichment join: every lineitem row annotated with its order's
    priority — output is ONE ROW PER LINEITEM, so unlike
    ``order_lineitem_rollup`` there is no per-key partial that can
    absorb a hot orderkey before the shuffle; a single key with
    millions of lines would melt one reducer in a plain bucketed join.

    Runs on :func:`ops.shuffle.salted_join`: the orders (build) side is
    replicated once per salt, each lineitem draws a deterministic salt
    from its batch position, and the exchange keys on (orderkey, salt)
    — the hot key's probe rows spread across ``num_salts`` buckets.
    Replication cost is num_salts × |orders-projection|, the standard
    trade for skewed enrichment joins. Exactness under a forced 90%%
    hot key is asserted in pytest."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import salted_join

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    def project_lines(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"orderkey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "linenumber": batch["l_linenumber"].to_numpy(dtype=np.int64),
             "price_centi": _round_half_up(
                 batch["l_extendedprice"].to_numpy() * 100.0
             )}
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def project_orders(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"orderkey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "orderpriority": batch["o_orderpriority"].astype(str)}
        )

    return salted_join(
        lines.map_batches(project_lines, batch_format="pandas"),
        orders.map_batches(project_orders, batch_format="pandas"),
        "orderkey",
        ["linenumber", "price_centi"],
        ["orderpriority"],
        defaults={"orderpriority": ""},
        num_salts=num_salts,
    )


LINEITEM_ENRICHED_ORACLE = """
SELECT l.l_orderkey AS orderkey,
       CAST(l.l_linenumber AS BIGINT) AS linenumber,
       CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_centi,
       o.o_orderpriority AS orderpriority
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
"""


# --------------------------------------------------------------------
# Groupwise latest-record selection and NTILE bucketing.
# --------------------------------------------------------------------


def latest_event_per_user(sf_dir: str):
    """Latest record per key — the recency-dedup shape every CDC /
    upsert-compaction pipeline runs: for each user, the single event
    with the greatest (ts, event_id).

    Per-batch partial argmax first (each batch surrenders ONE row per
    user it saw), so the shuffle moves at most users×blocks rows, never
    raw events; the bucketed final repeats the same vectorized
    sort+drop_duplicates argmax. Tie-break on event_id makes the row
    choice total, so the oracle (ROW_NUMBER() = 1) hashes exactly."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def argmax_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        out = df.drop_duplicates("user_id", keep="last")
        return out[["user_id", "event_id", "ts_us", "event_type"]].astype(
            {"user_id": np.int64, "event_id": np.int64, "ts_us": np.int64}
        )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch.copy()
        df["ts_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return argmax_rows(df)

    return grouped_aggregate(events, ["user_id"], argmax_rows, partial=partial,
                             num_partitions=32)


LATEST_EVENT_PER_USER_ORACLE = """
SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


def events_ntile(sf_dir: str, tiles: int = 4):
    """NTILE(4): every event assigned its user's value-quartile — the
    per-group equal-frequency bucketing behind feature binning.

    All rows of a partition must be ranked together (no partial can
    shrink this — assignment depends on the group's total size), so
    this is the bucketed user shuffle + ONE vectorized pass per bucket:
    stable sort by (user, value, event_id), per-segment index via a
    global arange minus each segment's start, then SQL NTILE's exact
    split arithmetic (first ``size % tiles`` tiles get the extra row)
    computed with integer vector math — no per-user Python."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.copy()
        df["value_centi"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        df = df.sort_values(["user_id", "value_centi", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"event_id": np.array([], dtype=np.int64),
                 "user_id": np.array([], dtype=np.int64),
                 "tile": np.array([], dtype=np.int64)}
            )
        tile = ntile_assign(users, tiles)
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(dtype=np.int64),
             "user_id": users,
             "tile": tile}
        )

    return grouped_aggregate(events, ["user_id"], combine, num_partitions=32)


EVENTS_NTILE_ORACLE = """
SELECT event_id, user_id,
       CAST(NTILE(4) OVER (
           PARTITION BY user_id
           ORDER BY CAST(round(value * 100) AS BIGINT), event_id
       ) AS BIGINT) AS tile
FROM events
"""


def events_rank(sf_dir: str):
    """RANK + DENSE_RANK per user over value (descending) — the
    leaderboard/window-ranking shape.  Like NTILE, a partition must be
    ranked whole (a row's rank depends on every tied/greater row in its
    partition), so the shape is ONE bucketed user shuffle + a single
    vectorized pass per bucket: stable sort by
    (user, -value_centi, event_id), tie runs found via
    :func:`segment_starts` over the composite (user, value) key, then

    * ``rank``       = run_start_index − user_segment_start + 1
    * ``dense_rank`` = #runs since the user segment started

    both as pure integer vector math (no per-user Python).  Ties share
    a rank in BOTH engines by construction, so the output is
    order-independent and hash-stable; value→centi uses half-up
    ``floor(x*100+0.5)`` mirrored literally in the oracle."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"event_id": np.array([], dtype=np.int64),
                 "user_id": np.array([], dtype=np.int64),
                 "rnk": np.array([], dtype=np.int64),
                 "rnk_dense": np.array([], dtype=np.int64)}
            )
        df = bucket.copy()
        df["neg_centi"] = -_round_half_up(df["value"].to_numpy() * 100.0)
        df = df.sort_values(["user_id", "neg_centi", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        neg = df["neg_centi"].to_numpy(dtype=np.int64)
        idx = np.arange(len(df), dtype=np.int64)
        useg = segment_starts(users)
        # composite (user, value) runs: a run starts where either changes
        run_start = np.empty(len(df), dtype=bool)
        run_start[0] = True
        run_start[1:] = (users[1:] != users[:-1]) | (neg[1:] != neg[:-1])
        vstart = np.maximum.accumulate(np.where(run_start, idx, 0))
        runs = np.cumsum(run_start.astype(np.int64))
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(dtype=np.int64),
             "user_id": users,
             "rnk": vstart - useg + 1,
             "rnk_dense": runs - runs[useg] + 1}
        )

    return grouped_aggregate(events, ["user_id"], combine, num_partitions=32)


EVENTS_RANK_ORACLE = """
SELECT event_id, user_id,
       RANK() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC
       ) AS rnk,
       DENSE_RANK() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC
       ) AS rnk_dense
FROM events
"""


def events_percentiles(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per user over value (descending) —
    the normalized-position windows behind percentile features. Same
    single bucketed shuffle + one vectorized pass as
    :func:`events_rank`; both outputs are ratios of small exact
    integers ((rank−1)/(n−1) and run_end/n), and IEEE-754 division of
    identical ints is bit-identical in numpy and SQL, so the floats
    hash-match. Single-row partitions define pct_rank = 0 exactly as
    SQL does."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"event_id": np.array([], dtype=np.int64),
                 "user_id": np.array([], dtype=np.int64),
                 "pct_rank": np.array([], dtype=np.float64),
                 "cume": np.array([], dtype=np.float64)}
            )
        df = bucket.copy()
        df["neg_centi"] = -_round_half_up(df["value"].to_numpy() * 100.0)
        df = df.sort_values(["user_id", "neg_centi", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        neg = df["neg_centi"].to_numpy(dtype=np.int64)
        n = len(df)
        idx = np.arange(n, dtype=np.int64)
        useg = segment_starts(users)
        # segment end per row = nearest following index whose row is
        # its user's last (reverse maximum-accumulate trick)
        is_last = np.empty(n, dtype=bool)
        is_last[-1] = True
        is_last[:-1] = users[1:] != users[:-1]
        seg_end = n - 1 - np.maximum.accumulate(
            np.where(is_last[::-1], idx, 0)
        )[::-1]
        # value-run boundaries within each user segment
        run_start = np.empty(n, dtype=bool)
        run_start[0] = True
        run_start[1:] = (users[1:] != users[:-1]) | (neg[1:] != neg[:-1])
        run_last = np.empty(n, dtype=bool)
        run_last[-1] = True
        run_last[:-1] = run_start[1:]
        run_end = n - 1 - np.maximum.accumulate(
            np.where(run_last[::-1], idx, 0)
        )[::-1]
        vstart = np.maximum.accumulate(np.where(run_start, idx, 0))
        n_user = (seg_end - useg + 1).astype(np.float64)
        rnk = (vstart - useg + 1).astype(np.float64)
        pct = np.where(n_user > 1, (rnk - 1.0) / (n_user - 1.0), 0.0)
        cume = (run_end - useg + 1).astype(np.float64) / n_user
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(dtype=np.int64),
             "user_id": users,
             "pct_rank": pct,
             "cume": cume}
        )

    return grouped_aggregate(events, ["user_id"], combine, num_partitions=32)


EVENTS_PERCENTILES_ORACLE = """
SELECT event_id, user_id,
       PERCENT_RANK() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC
       ) AS pct_rank,
       CUME_DIST() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC
       ) AS cume
FROM events
"""


FUNNEL_FROM = "click"
FUNNEL_TO = "purchase"
FUNNEL_WINDOW_US = 14_400_000_000  # 4 hours


def events_funnel(sf_dir: str):
    """Two-step funnel conversion: for every user who ever clicked,
    did a purchase follow their FIRST click within four hours — the
    sequence-analytics shape (funnel/retention/attribution) that needs
    a user's whole event stream co-located.

    One bucketed user shuffle; the per-batch partial drops every row
    that is neither funnel step and projects to (user, ts_us, step)
    BEFORE the exchange, so the shuffle moves only funnel-relevant
    integers. The per-bucket combine is three vectorized groupbys
    (min-click per user, window test on purchase rows, any() per
    user) — no per-user Python. Integer epoch-microseconds end-to-end
    so the EXISTS-window oracle hashes exactly."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch["event_type"].isin([FUNNEL_FROM, FUNNEL_TO])
        b = batch[mask]
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(dtype=np.int64),
                "ts_us": b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64),
                "step": (b["event_type"] == FUNNEL_TO).to_numpy(dtype=np.int64),
            }
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"user_id": np.array([], dtype=np.int64),
                 "first_click_us": np.array([], dtype=np.int64),
                 "converted": np.array([], dtype=np.int64)}
            )
        first = (
            bucket[bucket["step"] == 0]
            .groupby("user_id", sort=True)["ts_us"]
            .min()
            .rename("first_click_us")
        )
        to_rows = bucket[bucket["step"] == 1].merge(
            first, left_on="user_id", right_index=True
        )
        in_window = to_rows[
            (to_rows["ts_us"] > to_rows["first_click_us"])
            & (to_rows["ts_us"] <= to_rows["first_click_us"] + FUNNEL_WINDOW_US)
        ]
        converted = set(in_window["user_id"].to_numpy())
        out = first.reset_index()
        out["converted"] = out["user_id"].isin(converted).to_numpy(dtype=np.int64)
        return out.astype(
            {"user_id": np.int64, "first_click_us": np.int64, "converted": np.int64}
        )

    return grouped_aggregate(events, ["user_id"], combine, partial=partial,
                             num_partitions=32)


EVENTS_FUNNEL_ORACLE = f"""
WITH fa AS (
  SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS first_click_us
  FROM events WHERE event_type = '{FUNNEL_FROM}' GROUP BY 1
)
SELECT fa.user_id, fa.first_click_us,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM events e
         WHERE e.user_id = fa.user_id AND e.event_type = '{FUNNEL_TO}'
           AND epoch_us(e.ts) > fa.first_click_us
           AND epoch_us(e.ts) <= fa.first_click_us + {FUNNEL_WINDOW_US}
       ) THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM fa
"""


def segment_starts(keys_sorted: np.ndarray) -> np.ndarray:
    """For a SORTED key array: each row's index of its segment's first
    row — the shared primitive behind every per-partition window kernel
    here (moving frames, NTILE, LAG). Pure integer vector math."""
    n = len(keys_sorted)
    idx = np.arange(n, dtype=np.int64)
    is_start = np.empty(n, dtype=bool)
    if n == 0:
        return idx
    is_start[0] = True
    is_start[1:] = keys_sorted[1:] != keys_sorted[:-1]
    return np.maximum.accumulate(np.where(is_start, idx, 0))


def windowed_sum(keys_sorted: np.ndarray, values: np.ndarray, frame: int) -> np.ndarray:
    """ROWS-frame sum over the last ``frame`` rows per segment
    (inclusive), clamped at each segment's start: cumsum minus the
    cumsum ``frame`` rows back."""
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=values.dtype)
    cum = np.cumsum(values)
    idx = np.arange(n, dtype=np.int64)
    lo = np.maximum(idx - (frame - 1), segment_starts(keys_sorted))
    return cum - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)


def ntile_assign(keys_sorted: np.ndarray, tiles: int) -> np.ndarray:
    """SQL NTILE over pre-sorted segments: the first ``size % tiles``
    tiles get ``size // tiles + 1`` rows, the rest ``size // tiles`` —
    computed for every row at once with integer vector math."""
    n = len(keys_sorted)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    seg_start = segment_starts(keys_sorted)
    starts = idx[np.append(True, keys_sorted[1:] != keys_sorted[:-1])]
    sizes = np.diff(np.append(starts, n))
    seg_size = np.repeat(sizes, sizes)
    pos = idx - seg_start
    big = seg_size // tiles + 1
    n_big = seg_size % tiles
    big_span = n_big * big
    in_big = pos < big_span
    small = np.maximum(seg_size // tiles, 1)
    tile = np.where(
        in_big, pos // np.maximum(big, 1), n_big + (pos - big_span) // small
    ) + 1
    return tile.astype(np.int64)


def gini_from_histogram(v: np.ndarray, c: np.ndarray) -> tuple[int, float]:
    """Exact Gini from a VALUE-SORTED count histogram via the
    mean-absolute-difference form Δ = 2·Σᵢ cᵢ·(vᵢ·N₍<ᵢ₎ − S₍<ᵢ₎),
    G = Δ/(2·n·S) — tie-correct where the rank formula is not; all
    cumulatives in int64, the division a single IEEE op. Returns
    ``(n, gini)``; an all-zero (or empty) mass defines G = 0."""
    if len(v) == 0:
        return 0, 0.0
    n_lt = np.concatenate([[0], np.cumsum(c)[:-1]])
    s_lt = np.concatenate([[0], np.cumsum(c * v)[:-1]])
    delta = int((2 * c * (v * n_lt - s_lt)).sum())
    n = int(c.sum())
    s = int((c * v).sum())
    return n, (float(np.float64(delta) / np.float64(2 * n * s)) if s else 0.0)


def expand_ranges(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Flat indices of the half-open ranges ``[lo_i, hi_i)`` laid end
    to end — the vectorized replacement for ``for i: for j in
    range(lo[i], hi[i])`` that pair-expansion kernels (attribution,
    bipartite projection) use: one repeat + one arange, no Python
    loop. Empty ranges contribute nothing."""
    counts = np.maximum(hi - lo, 0).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    return np.repeat(lo, counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(counts) - counts, counts)
    )


def events_value_stats(sf_dir: str):
    """Per-user distribution moments (count, sum, sum of squares) in
    EXACT integer arithmetic — the mergeable form of mean/variance:
    var = (n·Σx² − (Σx)²) / n², computable downstream from these
    partials without a second corpus pass. Floating-point accumulation
    would hash differently per accumulation order; centi-unit int64
    sums are associative, so the partial/combine split is lossless and
    the oracle matches bit-for-bit. (Σx² of centi values fits int64 up
    to ~9·10¹⁴ value²-units per user — bound documented rather than
    discovered in production.)"""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.round(batch["value"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(dtype=np.int64),
             "n_events": np.ones(len(v), dtype=np.int64),
             "sum_centi": v,
             "sumsq_centi2": v * v}
        )
        return (
            df.groupby("user_id", sort=False)
            .agg(n_events=("n_events", "sum"), sum_centi=("sum_centi", "sum"),
                 sumsq_centi2=("sumsq_centi2", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("user_id", sort=False)
            .agg(n_events=("n_events", "sum"), sum_centi=("sum_centi", "sum"),
                 sumsq_centi2=("sumsq_centi2", "sum"))
            .reset_index()
            .astype({c: np.int64 for c in
                     ("user_id", "n_events", "sum_centi", "sumsq_centi2")})
        )

    return grouped_aggregate(events, ["user_id"], combine, partial=partial,
                             num_partitions=32)


EVENTS_VALUE_STATS_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       SUM(CAST(round(value * 100) AS BIGINT)) AS sum_centi,
       SUM(CAST(round(value * 100) AS BIGINT)
           * CAST(round(value * 100) AS BIGINT)) AS sumsq_centi2
FROM events
GROUP BY 1
"""


def user_retention_cohorts(sf_dir: str, max_offset: int = 7):
    """Retention cohort matrix: users cohorted by their FIRST active
    day; for each (cohort_day, day_offset ≤ ``max_offset``) the number
    of cohort members active on that offset day — the day-N retention
    table every growth dashboard draws.

    Two bucketed exchanges, partials combined before each: (1) keyed
    by user — batches pre-dedupe (user, day) locally, each bucket then
    derives the user's cohort (vectorized ``transform('min')``) and
    emits one (cohort_day, day_offset) row per user-day in the window,
    pre-counted per bucket; (2) keyed by the tiny (cohort_day, offset)
    pair — a final sum over ~days × offsets keys. Distinctness of
    (user, day) inside one bucket makes the partial counts disjoint,
    so no step ships raw events twice and no reducer ever sees a
    corpus-sized group. Day = epoch-days from the event timestamp, the
    same integer bucketing as :func:`events_daily_distinct`."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        return (
            pd.DataFrame(
                {"user_id": batch["user_id"].to_numpy(dtype=np.int64),
                 "day": ts_ns // 86_400_000_000_000}
            )
            .drop_duplicates()
        )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        a = bucket.drop_duplicates(["user_id", "day"])
        cohort = a.groupby("user_id", sort=False)["day"].transform("min")
        offset = a["day"].to_numpy(dtype=np.int64) - cohort.to_numpy(dtype=np.int64)
        rows = pd.DataFrame(
            {"cohort_day": cohort.to_numpy(dtype=np.int64), "day_offset": offset}
        )
        rows = rows[(rows["day_offset"] >= 0) & (rows["day_offset"] <= max_offset)]
        return (
            rows.groupby(["cohort_day", "day_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
            .astype({"n_users": np.int64})
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["cohort_day", "day_offset"], sort=False)["n_users"]
            .sum()
            .reset_index()
            .astype({"cohort_day": np.int64, "day_offset": np.int64,
                     "n_users": np.int64})
        )

    per_user_rows = grouped_aggregate(events, ["user_id"], per_user,
                                      partial=partial)
    return grouped_aggregate(per_user_rows, ["cohort_day", "day_offset"], final)


USER_RETENTION_ORACLE = """
WITH a AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY 1)
SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN c USING (user_id)
WHERE a.day - c.cohort_day BETWEEN 0 AND 7
GROUP BY 1, 2
"""


def customer_event_activity(sf_dir: str):
    """FULL OUTER join of two independently-aggregated activity
    tables — per-customer order counts vs per-user event counts on the
    shared integer key — keeping every key present on EITHER side with
    zero-filled gaps (the reconciliation shape: 'which customers
    ordered but never produced events, and vice versa').

    Distributed outer join without a join operator: both sides
    pre-aggregate per batch (the combiner bound: at most one row per
    key per batch reaches the wire), the partials meet in ONE bucketed
    hash exchange as a tagged union, and each bucket does a vectorized
    outer merge + zero fill. No side is broadcast — both aggregates
    scale with their key cardinality, and a key's rows from both
    tables land in the same bucket by construction."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def order_partials(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby("o_custkey", sort=False)
            .size()
            .reset_index(name="n_orders")
        )
        return pd.DataFrame(
            {"custkey": g["o_custkey"].to_numpy(dtype=np.int64),
             "n_orders": g["n_orders"].to_numpy(dtype=np.int64),
             "n_events": np.zeros(len(g), dtype=np.int64)}
        )

    def event_partials(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("user_id", sort=False).size().reset_index(name="n_events")
        return pd.DataFrame(
            {"custkey": g["user_id"].to_numpy(dtype=np.int64),
             "n_orders": np.zeros(len(g), dtype=np.int64),
             "n_events": g["n_events"].to_numpy(dtype=np.int64)}
        )

    unioned = orders.map_batches(order_partials, batch_format="pandas").union(
        events.map_batches(event_partials, batch_format="pandas")
    )

    def outer_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("custkey", sort=False)[["n_orders", "n_events"]]
            .sum()
            .reset_index()
            .astype({"custkey": np.int64, "n_orders": np.int64,
                     "n_events": np.int64})
        )

    return grouped_aggregate(unioned, ["custkey"], outer_merge, coalesce=True)


CUSTOMER_EVENT_ACTIVITY_ORACLE = """
WITH o AS (SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1),
e AS (SELECT user_id AS custkey, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
SELECT custkey,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events
FROM o FULL OUTER JOIN e USING (custkey)
"""


HIST_BIN_WIDTH = 50.0


def events_value_histogram(sf_dir: str, bin_width: float = HIST_BIN_WIDTH):
    """Per-event-type value histogram with fixed-width bins
    (``bin = floor(value / width)``) — the grouped-distribution view a
    monitoring pipeline materializes. Bin assignment is one float64
    division + floor, identical IEEE operations in numpy and SQL, so
    even bin EDGES agree bit-for-bit; counting is the standard
    combiner-then-bucketed-sum over the tiny (type × bin) key space."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bins = np.floor(
            batch["value"].to_numpy(dtype=np.float64) / bin_width
        ).astype(np.int64)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_numpy(),
                          "bin": bins})
            .groupby(["event_type", "bin"], sort=False)
            .size()
            .reset_index(name="n_events")
            .astype({"bin": np.int64, "n_events": np.int64})
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["event_type", "bin"], sort=False)["n_events"]
            .sum()
            .reset_index()
            .astype({"bin": np.int64, "n_events": np.int64})
        )

    return grouped_aggregate(events, ["event_type", "bin"], final,
                             partial=partial)


EVENTS_VALUE_HISTOGRAM_ORACLE = f"""
SELECT event_type,
       CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2
"""


def events_transitions(sf_dir: str):
    """Markov transition-count matrix over per-user event streams: for
    every consecutive pair of events (ordered by ``(ts, event_id)``
    within a user), count occurrences of ``event_type -> next_type`` —
    the behavioral-model input a recommendation/anomaly pipeline
    derives from clickstreams.

    LEAD needs each user's rows co-located and ordered, so phase one is
    the bucketed shuffle on ``hash(user_id)`` with ONE vectorized
    sort-and-shift per bucket (the ``events_lag_gaps`` segment-kernel
    shape: sort by (user, ts, event_id), compare ``arr[1:]`` against
    ``arr[:-1]``, mask user boundaries) that emits per-bucket partial
    pair counts; phase two sums the partials over the tiny
    ``(type x type)`` key space. The wire between phases carries at
    most ``buckets x |types|^2`` rows regardless of event count."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def pair_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.copy()
        df["ts_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        types = df["event_type"].to_numpy(dtype=object)
        if len(df) < 2:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "next_type": pd.Series([], dtype=object),
                                 "n_pairs": pd.Series([], dtype=np.int64)})
        same_user = users[1:] == users[:-1]
        return (
            pd.DataFrame({"event_type": types[:-1][same_user],
                          "next_type": types[1:][same_user]})
            .groupby(["event_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n_pairs")
            .astype({"n_pairs": np.int64})
        )

    partials = grouped_aggregate(events, ["user_id"], pair_counts)

    def total(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["event_type", "next_type"], sort=False)["n_pairs"]
            .sum()
            .reset_index()
            .astype({"n_pairs": np.int64})
        )

    return grouped_aggregate(partials, ["event_type", "next_type"], total,
                             num_partitions=8)


EVENTS_TRANSITIONS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM s WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


def user_event_mode(sf_dir: str):
    """Per-user modal event type (most frequent; ties broken by the
    alphabetically-first type) plus its count — the grouped-mode /
    argmax-per-key aggregate SQL spells as a ROW_NUMBER-over-counts
    subquery and Ray Data has no operator for.

    Two-phase: per-batch partial counts on ``(user_id, event_type)``
    (the combiner bound — at most ``|types|`` rows per user per batch
    cross the wire), bucketed on ``hash(user_id)`` so each user's
    partials meet exactly once, then ONE vectorized
    sum -> sort -> drop_duplicates per bucket. No per-user Python even
    with user-cardinality keys."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n_mode")
            .astype({"user_id": np.int64, "n_mode": np.int64})
        )

    def argmax(bucket: pd.DataFrame) -> pd.DataFrame:
        summed = (
            bucket.groupby(["user_id", "event_type"], sort=False)["n_mode"]
            .sum()
            .reset_index()
        )
        best = (
            summed.sort_values(["user_id", "n_mode", "event_type"],
                               ascending=[True, False, True], kind="stable")
            .drop_duplicates("user_id")
            .rename(columns={"event_type": "mode_type"})
        )
        return best.astype({"user_id": np.int64, "n_mode": np.int64})[
            ["user_id", "mode_type", "n_mode"]
        ]

    return grouped_aggregate(events, ["user_id"], argmax, partial=partial)


USER_EVENT_MODE_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n_mode
FROM r WHERE rn = 1
"""


def events_running_total(sf_dir: str):
    """GLOBAL running total of event value (milli fixed-point) over the
    whole stream ordered by ``(ts, event_id)`` — the distributed prefix
    scan (SQL ``SUM(...) OVER (ORDER BY ...)`` with no PARTITION BY),
    the one window shape that cannot hide behind a partition key.

    Scan at scale = three bounded steps, never a single-node sort:

    1. bucket rows by a RANGE prefix of the order key (the UTC hour of
       ``ts`` — order within an hour implies order across hours), and
       two-phase-aggregate exact per-hour totals: output is one row per
       hour (~10^5 rows for years of data), safe to bring to the
       driver;
    2. exclusive prefix scan of the hour totals ON THE DRIVER (tiny)
       → ``{hour: offset}``, shipped back inside the map closure;
    3. one bucketed shuffle on the hour key; each bucket does a
       vectorized sort + per-hour-segment ``cumsum`` + offset add.

    Values go through :func:`~entity_extractor_linker_ray.ops.cluster.
    milli_round` (int64 milli, half away from zero) so the cumulative
    sums are integer-exact and hash identically to the oracle
    regardless of summation order."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    US_PER_HOUR = 3_600_000_000

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"]
    )

    def milli_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(dtype=np.int64),
             "ts_us": ts_us,
             "hour": ts_us // US_PER_HOUR,
             "milli": milli_round(batch["value"].to_numpy(dtype=np.float64))}
        )

    rows = events.map_batches(milli_rows, batch_format="pandas")

    def hour_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("hour", sort=False)["milli"].sum().reset_index(
            name="total"
        )
        return out.astype({"hour": np.int64, "total": np.int64})

    def hour_final(bucket: pd.DataFrame) -> pd.DataFrame:
        return hour_partial(bucket.rename(columns={"total": "milli"}))

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    hour_totals = collect_small(
        grouped_aggregate(rows.select_columns(["hour", "milli"]), ["hour"],
                          hour_final, partial=hour_partial, num_partitions=8),
        ["hour", "total"],  # one row per hour — bounded, driver-safe
    ).sort_values("hour")
    totals = hour_totals["total"].to_numpy(dtype=np.int64)
    offsets = dict(
        zip(hour_totals["hour"].tolist(),
            (np.cumsum(totals) - totals).tolist())
    )

    def scan_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.sort_values(["hour", "ts_us", "event_id"], kind="stable")
        running = (
            df.groupby("hour", sort=False)["milli"].cumsum().to_numpy(np.int64)
            + df["hour"].map(offsets).to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(dtype=np.int64),
             "running_milli": running}
        )

    return grouped_aggregate(rows, ["hour"], scan_bucket)


EVENTS_RUNNING_TOTAL_ORACLE = """
SELECT event_id,
       CAST(SUM(CAST(round(value * 1000) AS BIGINT)) OVER (
                ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS running_milli
FROM events
"""


ACTIVE_WINDOW_US = 300_000_000  # each event opens a 5-minute window


def interval_union_sweep(
    users: np.ndarray, start: np.ndarray, end: np.ndarray
) -> pd.DataFrame:
    """Vectorized interval-union sweep: merge overlapping/touching
    ``[start, end)`` intervals per user and return one row per user
    with total covered length + island count. Inputs must already be
    sorted by (user, start). Property-tested against a brute-force
    union in ``tests/test_window_kernels.py``."""
    if not len(users):
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "active_us": pd.Series([], dtype=np.int64),
                             "n_islands": pd.Series([], dtype=np.int64)})
    # running max of ends, restarted at each user boundary —
    # per-segment cummax is a single C pass in pandas
    seg_id = np.cumsum(
        np.concatenate(([0], (users[1:] != users[:-1]).astype(np.int64)))
    )
    run_max = pd.Series(end).groupby(seg_id).cummax().to_numpy(np.int64)
    prev_max = np.concatenate(([np.int64(-1)], run_max[:-1]))
    new_island = np.concatenate(
        ([True], (users[1:] != users[:-1]) | (start[1:] > prev_max[1:]))
    )
    island = np.cumsum(new_island)
    grouped = pd.DataFrame(
        {"user_id": users, "island": island, "start_us": start, "end_us": end}
    ).groupby(["user_id", "island"], sort=False).agg(
        s=("start_us", "min"), e=("end_us", "max")
    ).reset_index()
    grouped["len_us"] = grouped["e"] - grouped["s"]
    out = grouped.groupby("user_id", sort=False).agg(
        active_us=("len_us", "sum"), n_islands=("island", "size")
    ).reset_index()
    return out.astype({"user_id": np.int64, "active_us": np.int64,
                       "n_islands": np.int64})


def user_active_span(sf_dir: str, window_us: int = ACTIVE_WINDOW_US):
    """Interval-union coverage: each event opens a ``[ts, ts+window)``
    activity interval; per user, merge overlapping intervals into
    islands and report total covered time + island count — the
    'distinct active time' metric (billing, engagement) that naive
    ``count * window`` double-counts.

    The sweep line is fully vectorized inside one bucketed shuffle on
    ``hash(user_id)``: sort by (user, start, event_id), running
    ``np.maximum.accumulate`` of interval ends per user segment, an
    island starts where ``start > prev_running_max``, island ids by
    cumsum of those flags, then ONE pandas groupby over (user, island)
    for min(start)/max(end) and a second over user for the totals —
    integer microseconds end-to-end so the oracle (the MAX ... OVER
    (ROWS ... 1 PRECEDING) island idiom) hashes exactly."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def sweep(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.copy()
        df["start_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "start_us", "event_id"], kind="stable")
        start = df["start_us"].to_numpy()
        return interval_union_sweep(
            df["user_id"].to_numpy(dtype=np.int64), start, start + window_us
        )

    return grouped_aggregate(events, ["user_id"], sweep)


USER_ACTIVE_SPAN_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS start_us,
         epoch_us(ts) + {ACTIVE_WINDOW_US} AS end_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, start_us, end_us,
         CASE WHEN start_us > COALESCE(MAX(end_us) OVER (
                  PARTITION BY user_id ORDER BY start_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, start_us, end_us,
         SUM(new_island) OVER (PARTITION BY user_id
                               ORDER BY start_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, MAX(end_us) - MIN(start_us) AS len_us
  FROM islands GROUP BY 1, 2
)
SELECT user_id, CAST(SUM(len_us) AS BIGINT) AS active_us,
       CAST(COUNT(*) AS BIGINT) AS n_islands
FROM merged GROUP BY 1
"""


def fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit across the warehouse's FK edges —
    the data-quality sweep a lake runs before training consumes a
    drop: for each relation, how many child rows reference a missing
    parent key (orphans), plus the child row count for rate context.

    ALL relations share ONE exchange: rows are tagged with a composite
    (relation_id, key) — child partials count rows per key, parent
    partials mark key existence — so five anti-joins cost five column-
    pruned reads plus a single bucketed exchange on hash(rel, key),
    not five shuffles (measured 30 s -> ~4 s at sf0.1; an exchange's
    fixed coordination cost dwarfs these partials' bytes). The bucket
    kernel sums child rows whose parent mark never arrived and emits
    one partial row per (bucket, relation); a final single-partition
    fold produces the report. Wire rows are key-bounded; no side is
    broadcast, so a 100 TB fact table audits in one pass."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    relations = [
        ("orders.o_custkey->customer.c_custkey",
         "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
         "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer.c_nationkey->nation.n_nationkey",
         "customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region.r_regionkey",
         "nation", "n_regionkey", "region", "r_regionkey"),
        ("events.user_id->customer.c_custkey",
         "events", "user_id", "customer", "c_custkey"),
    ]
    rel_names = [r[0] for r in relations]

    def tag_child(rel_id: int, key: str):
        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            g = batch.groupby(key, sort=False).size().reset_index(name="n_child")
            return pd.DataFrame(
                {"rel": np.full(len(g), rel_id, dtype=np.int64),
                 "key": g[key].to_numpy(dtype=np.int64),
                 "n_child": g["n_child"].to_numpy(dtype=np.int64),
                 "has_parent": np.zeros(len(g), dtype=np.int64)}
            )
        return tag

    def tag_parent(rel_id: int, key: str):
        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            keys = np.unique(batch[key].to_numpy(dtype=np.int64))
            return pd.DataFrame(
                {"rel": np.full(len(keys), rel_id, dtype=np.int64),
                 "key": keys,
                 "n_child": np.zeros(len(keys), dtype=np.int64),
                 "has_parent": np.ones(len(keys), dtype=np.int64)}
            )
        return tag

    from entity_extractor_linker_ray.ops.readers import read_sized

    unioned = None
    for rel_id, (_, child, ckey, parent, pkey) in enumerate(relations):
        child_ds = read_sized(
            f"{sf_dir}/{child}.parquet", columns=[ckey]
        ).map_batches(tag_child(rel_id, ckey), batch_format="pandas")
        parent_ds = read_sized(
            f"{sf_dir}/{parent}.parquet", columns=[pkey]
        ).map_batches(tag_parent(rel_id, pkey), batch_format="pandas")
        both = child_ds.union(parent_ds)
        unioned = both if unioned is None else unioned.union(both)

    def orphan_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        per_key = bucket.groupby(["rel", "key"], sort=False).agg(
            n_child=("n_child", "sum"), has_parent=("has_parent", "max")
        ).reset_index()
        per_key["orphans"] = per_key["n_child"].where(
            per_key["has_parent"] == 0, 0
        )
        out = per_key.groupby("rel", sort=False).agg(
            n_orphans=("orphans", "sum"), n_child_rows=("n_child", "sum")
        ).reset_index()
        return out.astype({c: np.int64 for c in out.columns})

    per_bucket = grouped_aggregate(unioned, ["rel", "key"], orphan_counts,
                                   coalesce=True)

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("rel", sort=False)[["n_orphans", "n_child_rows"]]
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {"relation": [rel_names[i] for i in out["rel"]],
             "n_orphans": out["n_orphans"].to_numpy(dtype=np.int64),
             "n_child_rows": out["n_child_rows"].to_numpy(dtype=np.int64)}
        )

    def prefold(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("rel", sort=False)[["n_orphans", "n_child_rows"]]
            .sum()
            .reset_index()
            .astype({c: np.int64 for c in ("rel", "n_orphans", "n_child_rows")})
        )

    return grouped_aggregate(per_bucket, ["rel"], fold, partial=prefold,
                             num_partitions=1)


FK_INTEGRITY_AUDIT_ORACLE = """
SELECT 'orders.o_custkey->customer.c_custkey' AS relation,
       CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphans,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem.l_orderkey->orders.o_orderkey',
       CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'customer.c_nationkey->nation.n_nationkey',
       CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
UNION ALL
SELECT 'nation.n_regionkey->region.r_regionkey',
       CAST(COUNT(*) FILTER (WHERE r.r_regionkey IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
UNION ALL
SELECT 'events.user_id->customer.c_custkey',
       CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


def events_type_percentiles(sf_dir: str):
    """EXACT p50/p90/p99 of event value per event type at any row
    count — the distributed-exact-quantile shape: quantiles need the
    whole distribution, but not the whole DATA. Rows collapse to a
    per-(type, milli-value) count histogram inside ``map_batches``
    (wire rows bounded by the value DOMAIN, not the row count), one
    bucketed exchange co-locates each type's histogram, and the kernel
    walks the cumulative counts to the k-th smallest value.

    k is computed in pure integer arithmetic (``ceil(p*N) =
    (p_num*N + p_den - 1) // p_den``) so a 10^12-row N never meets a
    float; values are int64 milli (`milli_round`), so the result
    hashes exactly against the ROW_NUMBER-based oracle."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_numpy(),
                 "milli": milli_round(batch["value"].to_numpy(dtype=np.float64))}
            )
            .groupby(["event_type", "milli"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"milli": np.int64, "n": np.int64})
        )

    KS = [("p50_milli", 1, 2), ("p90_milli", 9, 10), ("p99_milli", 99, 100)]

    def walk(bucket: pd.DataFrame) -> pd.DataFrame:
        hist = (
            bucket.groupby(["event_type", "milli"], sort=False)["n"]
            .sum()
            .reset_index()
            .sort_values(["event_type", "milli"], kind="stable")
        )
        rows = []
        for etype, g in hist.groupby("event_type", sort=False):
            cum = g["n"].to_numpy(dtype=np.int64).cumsum()
            milli = g["milli"].to_numpy(dtype=np.int64)
            total = int(cum[-1])
            row = {"event_type": etype, "n_events": total}
            for col, num, den in KS:
                k = (num * total + den - 1) // den
                row[col] = int(milli[np.searchsorted(cum, k, side="left")])
            rows.append(row)
        out = pd.DataFrame(
            rows, columns=["event_type", "p50_milli", "p90_milli",
                           "p99_milli", "n_events"]
        )
        return out.astype({c: np.int64 for c in out.columns if c != "event_type"})

    return grouped_aggregate(events, ["event_type"], walk, partial=partial,
                             num_partitions=8)


EVENTS_TYPE_PERCENTILES_ORACLE = """
WITH m AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS milli FROM events
),
r AS (
  SELECT event_type, milli,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY milli) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM m
)
SELECT event_type,
       CAST(MAX(CASE WHEN rn = (n+1)//2        THEN milli END) AS BIGINT) AS p50_milli,
       CAST(MAX(CASE WHEN rn = (9*n+9)//10     THEN milli END) AS BIGINT) AS p90_milli,
       CAST(MAX(CASE WHEN rn = (99*n+99)//100  THEN milli END) AS BIGINT) AS p99_milli,
       CAST(MAX(n) AS BIGINT) AS n_events
FROM r GROUP BY 1
"""


def _skyline(df: pd.DataFrame) -> pd.DataFrame:
    """2-D Pareto frontier on (price_centi max, date_ms max): keep rows
    whose (price, date) pair no other pair dominates (≥ in both, > in
    one). Vectorized: over DISTINCT pairs sorted (price desc, date
    desc), a pair is dominated iff the running max date over strictly
    preceding pairs already reaches its date — exact duplicates are
    collapsed first so they can't mask each other, and every original
    row carrying a frontier pair is kept via the final inner merge."""
    pairs = (
        df[["price_centi", "date_ms"]]
        .drop_duplicates()
        .sort_values(["price_centi", "date_ms"], ascending=False, kind="stable")
    )
    best_prev = pairs["date_ms"].cummax().shift(1)
    keep = best_prev.isna() | (pairs["date_ms"] > best_prev)
    return df.merge(
        pairs[keep.to_numpy()], on=["price_centi", "date_ms"], how="inner"
    )


def pareto_orders(sf_dir: str):
    """Skyline / Pareto-frontier query: the orders not dominated on
    (o_totalprice, o_orderdate) — no other order is both at least as
    expensive AND at least as recent (strictly better in one). The
    multi-objective "best candidates" selection shape (price/recency,
    quality/length, score/cost) that no single ORDER BY expresses.

    Scale shape: the skyline operator is distributive — every global
    frontier row survives its own block's local frontier — so each
    batch surrenders only its local skyline (partial), and one bounded
    final pass merges the candidates. The wide step moves
    O(local-frontier × blocks) rows, never the table; for correlated
    attributes the local frontier is tiny (8 rows at sf0.01). The
    worst case (perfectly anti-correlated attributes) degrades to the
    full table, a property of the *query*, not the plan. Prices are
    compared as exact centi ints (2-decimal money), dates as epoch ms."""
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(dtype=np.int64),
                "price_centi": np.round(
                    batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
                ).astype(np.int64),
                "date_ms": batch["o_orderdate"]
                .to_numpy()
                .astype("datetime64[ms]")
                .astype(np.int64),
            }
        )
        return _skyline(out)

    cands = orders.map_batches(partial, batch_format="pandas")
    return cands.repartition(1).map_batches(_skyline, batch_format="pandas")


PARETO_ORDERS_ORACLE = """
WITH o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_centi,
         CAST(epoch_us(o_orderdate) // 1000 AS BIGINT) AS date_ms
  FROM orders
), pairs AS (
  SELECT DISTINCT price_centi, date_ms FROM o
), ranked AS (
  SELECT price_centi, date_ms,
         max(date_ms) OVER (ORDER BY price_centi DESC, date_ms DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS best_prev
  FROM pairs
)
SELECT o.o_orderkey, o.price_centi, o.date_ms
FROM o JOIN ranked r USING (price_centi, date_ms)
WHERE r.best_prev IS NULL OR r.best_prev < r.date_ms
"""


def events_hourly_zscores(sf_dir: str):
    """Volume-anomaly scores: for every (event_type, hour) the hourly
    event count and its z-score against that type's own hourly
    distribution — the drift/incident detector a continuously ingesting
    corpus runs over its telemetry. The z-score is computed CLOSED-FORM
    from exact integer sufficient statistics, never from a streaming
    variance: with n hours, S = Σc and Q = Σc² (all int64-exact),

        z = (n·c − S) / sqrt(n·Q − S²)

    which is one correctly-rounded IEEE division of exactly-computed
    integers, so the doubles are bit-identical to the oracle's (the SQL
    mirrors the same formula rather than calling STDDEV, whose
    incremental accumulation is order-dependent). Zero-variance types
    emit z = 0.

    Scale shape: ONE bucketed exchange keyed on ``event_type`` moving
    per-batch (type, hour, count) partials — hour-cardinality is
    time-bounded (~10⁵ rows/decade/type), so each type's full hourly
    vector fits its bucket and both aggregation levels are one
    vectorized pandas pass."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        out = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(),
                "hour_bucket": ts_ns // 3_600_000_000_000,
            }
        )
        return (
            out.groupby(["event_type", "hour_bucket"], sort=False)
            .size()
            .reset_index(name="cnt")
            .astype({"hour_bucket": np.int64, "cnt": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        hc = (
            bucket.groupby(["event_type", "hour_bucket"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        grp = hc.groupby("event_type", sort=False)
        c = hc["cnt"].to_numpy(dtype=np.int64)
        n = grp["cnt"].transform("size").to_numpy(dtype=np.int64)
        s = grp["cnt"].transform("sum").to_numpy(dtype=np.int64)
        hc["_c2"] = c * c
        q = (
            hc.groupby("event_type", sort=False)["_c2"]
            .transform("sum")
            .to_numpy(dtype=np.int64)
        )
        num = (n * c - s).astype(np.float64)
        den = n * q - s * s
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(den > 0, num / np.sqrt(den.astype(np.float64)), 0.0)
        return pd.DataFrame(
            {
                "event_type": hc["event_type"].to_numpy(),
                "hour_bucket": hc["hour_bucket"].to_numpy(dtype=np.int64),
                "n_events": c,
                "z": z,
            }
        )

    return grouped_aggregate(events, ["event_type"], combine, partial=partial,
                             num_partitions=8)


EVENTS_HOURLY_ZSCORES_ORACLE = """
WITH h AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, count(*) AS n, sum(cnt) AS sc, sum(cnt * cnt) AS q
  FROM h GROUP BY 1
)
SELECT h.event_type, h.hour_bucket, CAST(h.cnt AS BIGINT) AS n_events,
       CASE WHEN s.n * s.q - s.sc * s.sc <= 0 THEN 0.0
            ELSE CAST(s.n * h.cnt - s.sc AS DOUBLE)
                 / sqrt(CAST(s.n * s.q - s.sc * s.sc AS DOUBLE)) END AS z
FROM h JOIN s USING (event_type)
"""


def session_stats(sf_dir: str, gap_minutes: int = 30):
    """Per-session rollup on top of gap sessionization: for every
    (user, session) the event count, start/end timestamps (epoch ms),
    duration, and distinct-event-type count — the session-quality
    features an engagement or funnel model consumes.

    Same single-exchange shape as :func:`events_sessionize` (bucketed
    shuffle on ``user_id``, session ids by one vectorized cumsum over
    the bucket-sorted arrays); the rollup is one additional vectorized
    pandas groupby inside the same bucket pass — sessions never leave
    the bucket that computed them. NULL event types don't count toward
    ``n_types`` (matching SQL ``count(DISTINCT ...)``)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )
    gap_ns = np.int64(gap_minutes) * 60 * 1_000_000_000

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        users = g["user_id"].to_numpy()
        n = len(g)
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            new_user = users[1:] != users[:-1]
            brk[1:] = (new_user | (np.diff(ts) > gap_ns)).astype(np.int64)
        sess_global = np.cumsum(brk) - 1
        user_start = np.ones(n, dtype=bool)
        if n > 1:
            user_start[1:] = users[1:] != users[:-1]
        seg_id = np.cumsum(user_start) - 1
        session_idx = sess_global - sess_global[user_start][seg_id]
        out = pd.DataFrame(
            {
                "user_id": users,
                "session_idx": session_idx,
                "ts_ms": ts // 1_000_000,
                "event_type": g["event_type"].to_numpy(),
            }
        )
        agg = (
            out.groupby(["user_id", "session_idx"], sort=False)
            .agg(
                n_events=("ts_ms", "size"),
                start_ms=("ts_ms", "min"),
                end_ms=("ts_ms", "max"),
                n_types=("event_type", "nunique"),
            )
            .reset_index()
        )
        agg["duration_ms"] = agg["end_ms"] - agg["start_ms"]
        return agg.astype(
            {c: np.int64 for c in ("session_idx", "n_events", "start_ms",
                                   "end_ms", "n_types", "duration_ms")}
        )

    return grouped_aggregate(events, ["user_id"], combine)


SESSION_STATS_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       CAST(epoch_us(min(ts)) // 1000 AS BIGINT) AS start_ms,
       CAST(epoch_us(max(ts)) // 1000 AS BIGINT) AS end_ms,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(epoch_us(max(ts)) // 1000 - epoch_us(min(ts)) // 1000
            AS BIGINT) AS duration_ms
FROM sess GROUP BY 1, 2
"""

def events_dedup_consecutive(sf_dir: str):
    """Consecutive-duplicate compaction: per user in (ts, event_id)
    order, keep an event only when its type differs from the
    immediately preceding event's type — the run-length dedup an
    at-least-once event stream needs before counting (double-fired
    clicks collapse, alternations survive).

    Shape: one bucketed shuffle on ``user_id`` (row-proportional — no
    combiner exists for a window predicate, so no coalesce), then ONE
    vectorized pass per bucket: sort, shift-compare type and user
    arrays, boolean-mask. No per-user Python groups. Matches the
    ``LAG ... IS DISTINCT FROM`` oracle exactly (first row per user is
    always kept; type comparison on the raw strings — the table has no
    NULL types, and ``IS DISTINCT FROM`` would match the fillna
    sentinel semantics if it ever did)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy()
        types = g["event_type"].fillna("").to_numpy(dtype=object)
        n = len(g)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            same_user = users[1:] == users[:-1]
            same_type = types[1:] == types[:-1]
            keep[1:] = ~(same_user & same_type)
        out = g.loc[keep, ["user_id", "event_id", "event_type"]].reset_index(drop=True)
        return out.astype({"user_id": np.int64, "event_id": np.int64})

    return grouped_aggregate(events, ["user_id"], combine)


EVENTS_DEDUP_CONSECUTIVE_ORACLE = """
WITH lagged AS (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT user_id, event_id, event_type
FROM lagged
WHERE prev_type IS DISTINCT FROM event_type
"""


def events_gap_fill(sf_dir: str):
    """Dense hourly series per event type: the count for EVERY hour
    between that type's first and last event, zeros filled in — the
    dimension-densification step a time-series model or dashboard
    needs (missing hours are real zeros, not absent rows).

    The hourly count table is domain-bounded (types x hours), so the
    heavy work is the same two-phase (partial + bucketed combine)
    aggregate as :func:`events_hourly`; generation of the missing
    hours happens inside the per-type bucket with one ``np.arange``
    over the type's own [min, max] hour span and an O(span) scatter —
    no cross join, no driver loop. Oracle generates the same spans
    with ``range()`` + LEFT JOIN."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(),
             "hour_bucket": ts_ns // 3_600_000_000_000}
        )
        df = df[df["event_type"].notna()]
        return (
            df.groupby(["event_type", "hour_bucket"], sort=False)
            .size()
            .reset_index(name="n_events")
            .astype({"hour_bucket": np.int64, "n_events": np.int64})
        )

    def densify(bucket: pd.DataFrame) -> pd.DataFrame:
        hist = (
            bucket.groupby(["event_type", "hour_bucket"], sort=False)["n_events"]
            .sum()
            .reset_index()
        )
        frames = []
        for etype, g in hist.groupby("event_type", sort=False):
            lo = int(g["hour_bucket"].min())
            hi = int(g["hour_bucket"].max())
            hours = np.arange(lo, hi + 1, dtype=np.int64)
            counts = np.zeros(len(hours), dtype=np.int64)
            counts[g["hour_bucket"].to_numpy(dtype=np.int64) - lo] = (
                g["n_events"].to_numpy(dtype=np.int64)
            )
            frames.append(
                pd.DataFrame(
                    {"event_type": etype, "hour_bucket": hours, "n_events": counts}
                )
            )
        if not frames:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "hour_bucket": pd.Series([], dtype=np.int64),
                 "n_events": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(frames, ignore_index=True)

    return grouped_aggregate(events, ["event_type"], densify, partial=partial,
                             num_partitions=8)


EVENTS_GAP_FILL_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
         count(*) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(hour_bucket) AS lo, max(hour_bucket) AS hi FROM c GROUP BY 1
), dense AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS hour_bucket FROM spans
)
SELECT dense.event_type, CAST(dense.hour_bucket AS BIGINT) AS hour_bucket,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM dense LEFT JOIN c
  ON dense.event_type = c.event_type AND dense.hour_bucket = c.hour_bucket
"""


def lineitem_corr(sf_dir: str):
    """Exact per-group Pearson correlation of quantity vs extended
    price — the two-column dependence statistic, computed the only way
    that is both distributed-exact and SQL-reproducible: accumulate the
    five integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) in
    int64 per batch (associative, hence hash-stable under any
    accumulation order), then evaluate the closed form
    ``(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̂)·√(n·Σy² − Σy²̂))`` ONCE per
    group in double precision — every multiply/subtract/sqrt/divide is
    a correctly-rounded IEEE op on identical inputs in numpy and
    DuckDB, so even the float column hash-matches.

    Units are part of the semantics (corr is scale-invariant, the
    int64 bounds are not): x = quantity in centi-units (≤5e3 ⇒ Σx²
    per group ≤ 2.5e7·rows), y = price FLOORED to whole units (≤1.1e5
    ⇒ Σy² ≤ 1.2e10·rows) — safe past 10^8 rows/group; the n·Σ products
    are taken AFTER the cast to double. floor, not round: numpy rounds
    half-to-even while SQL rounds half away from zero, so exact .50
    values would diverge — floor is identical in both engines."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    cols = ["n_rows", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = np.round(batch["l_quantity"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        y = np.floor(batch["l_extendedprice"].to_numpy(dtype=np.float64)).astype(np.int64)
        df = pd.DataFrame(
            {"l_returnflag": batch["l_returnflag"].to_numpy(),
             "n_rows": np.ones(len(x), dtype=np.int64),
             "sum_x": x, "sum_y": y, "sum_xy": x * y,
             "sum_xx": x * x, "sum_yy": y * y}
        )
        return (
            df.groupby("l_returnflag", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = (
            bucket.groupby("l_returnflag", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
            .astype({c: np.int64 for c in cols})
        )
        n = agg["n_rows"].to_numpy(dtype=np.float64)
        sx = agg["sum_x"].to_numpy(dtype=np.float64)
        sy = agg["sum_y"].to_numpy(dtype=np.float64)
        sxy = agg["sum_xy"].to_numpy(dtype=np.float64)
        sxx = agg["sum_xx"].to_numpy(dtype=np.float64)
        syy = agg["sum_yy"].to_numpy(dtype=np.float64)
        num = n * sxy - sx * sy
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        corr = np.where(den > 0.0, num / np.where(den > 0.0, den, 1.0), 0.0)
        return pd.DataFrame(
            {"l_returnflag": agg["l_returnflag"],
             "n_rows": agg["n_rows"],
             "corr_qty_price": corr}
        )

    return grouped_aggregate(lines, ["l_returnflag"], finalize, partial=partial,
                             num_partitions=4)


LINEITEM_CORR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
         SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS sy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(floor(l_extendedprice) AS BIGINT)) AS sxy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx,
         SUM(CAST(floor(l_extendedprice) AS BIGINT)
             * CAST(floor(l_extendedprice) AS BIGINT)) AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
            ELSE 0.0 END AS corr_qty_price
FROM s
"""


def lineitem_regr(sf_dir: str):
    """Exact per-group ordinary-least-squares fit of extended price on
    quantity — slope, intercept and R² per return flag, the grouped
    regression every feature/metrics pipeline runs (trend per segment).
    Same distributed-exact recipe as :func:`lineitem_corr`: the six
    integer sufficient statistics accumulate associatively in int64
    (hash-stable under any batch order), then the closed forms

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
        intercept = (Σy − slope·Σx) / n
        r²        = num² / (denx·deny)

    evaluate ONCE per group in double precision with the SAME
    expression shape on both sides — every multiply/subtract/divide is
    a correctly-rounded IEEE op on identical inputs, so the float
    columns hash-match the oracle bit-exactly. Unit choices (centi
    quantity via round — exact on 2-decimal data; floored price — round
    halves diverge between numpy and SQL) inherit from lineitem_corr,
    as do the int64 overflow bounds (safe past 10^8 rows/group)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    cols = ["n_rows", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = np.round(batch["l_quantity"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        y = np.floor(batch["l_extendedprice"].to_numpy(dtype=np.float64)).astype(np.int64)
        df = pd.DataFrame(
            {"l_returnflag": batch["l_returnflag"].to_numpy(),
             "n_rows": np.ones(len(x), dtype=np.int64),
             "sum_x": x, "sum_y": y, "sum_xy": x * y,
             "sum_xx": x * x, "sum_yy": y * y}
        )
        return (
            df.groupby("l_returnflag", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = (
            bucket.groupby("l_returnflag", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
            .astype({c: np.int64 for c in cols})
        )
        n = agg["n_rows"].to_numpy(dtype=np.float64)
        sx = agg["sum_x"].to_numpy(dtype=np.float64)
        sy = agg["sum_y"].to_numpy(dtype=np.float64)
        sxy = agg["sum_xy"].to_numpy(dtype=np.float64)
        sxx = agg["sum_xx"].to_numpy(dtype=np.float64)
        syy = agg["sum_yy"].to_numpy(dtype=np.float64)
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        slope = np.where(denx > 0.0, num / np.where(denx > 0.0, denx, 1.0), 0.0)
        intercept = (sy - slope * sx) / n
        both = (denx > 0.0) & (deny > 0.0)
        r2 = np.where(
            both, (num * num) / np.where(both, denx * deny, 1.0), 0.0
        )
        return pd.DataFrame(
            {"l_returnflag": agg["l_returnflag"],
             "n_rows": agg["n_rows"],
             "slope": slope, "intercept": intercept, "r2": r2}
        )

    return grouped_aggregate(lines, ["l_returnflag"], finalize, partial=partial,
                             num_partitions=4)


LINEITEM_REGR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
         SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS sy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(floor(l_extendedprice) AS BIGINT)) AS sxy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx,
         SUM(CAST(floor(l_extendedprice) AS BIGINT)
             * CAST(floor(l_extendedprice) AS BIGINT)) AS syy
  FROM lineitem GROUP BY 1
),
d AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM s
),
sl AS (
  SELECT l_returnflag, n, num, denx, deny, sxd, syd,
         CASE WHEN denx > 0 THEN num / denx ELSE 0.0 END AS slope
  FROM d
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, slope,
       (syd - slope * sxd) / CAST(n AS DOUBLE) AS intercept,
       CASE WHEN denx > 0 AND deny > 0
            THEN (num * num) / (denx * deny) ELSE 0.0 END AS r2
FROM sl
"""


def purchase_attribution(sf_dir: str):
    """Last-touch attribution: for every purchase, the same user's most
    recent STRICTLY PRECEDING click (in (ts, event_id) order) and the
    gap to it — the marketing-attribution self-as-of join, done without
    a join operator: both event roles ride ONE bucketed shuffle on
    ``hash(user_id)`` and the per-bucket kernel is a single vectorized
    pass (sort; candidate index = own index where click else -1; global
    ``np.maximum.accumulate`` shifted one row; a cross-SEGMENT carry is
    impossible to mistake for a hit because indices grow monotonically,
    so any index below the row's segment start is a miss).

    Unattributed purchases (no prior click) are kept with a -1
    sentinel, mirrored by COALESCE in the IGNORE-NULLS-window oracle."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy(dtype=np.int64)
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        types = g["event_type"].fillna("").to_numpy(dtype=object)
        ids = g["event_id"].to_numpy(dtype=np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "purchase_id": pd.Series([], dtype=np.int64),
                 "click_event_id": pd.Series([], dtype=np.int64),
                 "gap_us": pd.Series([], dtype=np.int64)}
            )
        seg = segment_starts(users)
        idx = np.arange(n, dtype=np.int64)
        cand = np.where(types == "click", idx, np.int64(-1))
        acc = np.maximum.accumulate(cand)
        prev = np.empty(n, dtype=np.int64)
        prev[0] = -1
        prev[1:] = acc[:-1]
        valid = prev >= seg  # a carry from an earlier user has index < seg start
        is_purchase = types == "purchase"
        safe_prev = np.where(valid, prev, 0)
        click_id = np.where(valid, ids[safe_prev], np.int64(-1))
        gap = np.where(valid, ts_us - ts_us[safe_prev], np.int64(-1))
        return pd.DataFrame(
            {"user_id": users[is_purchase],
             "purchase_id": ids[is_purchase],
             "click_event_id": click_id[is_purchase],
             "gap_us": gap[is_purchase]}
        )

    return grouped_aggregate(events, ["user_id"], combine)


PURCHASE_ATTRIBUTION_ORACLE = """
WITH w AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
  FROM events
)
SELECT user_id, event_id AS purchase_id,
       CAST(COALESCE(click_id, -1) AS BIGINT) AS click_event_id,
       CAST(COALESCE(epoch_us(ts) - epoch_us(click_ts), -1) AS BIGINT) AS gap_us
FROM w WHERE event_type = 'purchase'
"""


def orders_monthly_growth(sf_dir: str):
    """Month-over-month revenue growth: per calendar month the order
    count, exact centi-unit revenue, the previous month's revenue, and
    the growth ratio — the time-series KPI every report derives from a
    fact table.

    The month table is DOMAIN-bounded (10^12 rows still span only
    hundreds of months), so the scale-relevant work is the two-phase
    aggregate that collapses facts to months; the LAG itself runs in
    one single-bucket final over that tiny table (num_partitions=1 is
    the honest encoding of 'this fits anywhere'). Growth is ONE IEEE
    division of exact int64s, so the float column hash-matches SQL;
    the first month has no predecessor and is excluded, exactly like
    the oracle's ``WHERE prev IS NOT NULL``."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(batch["o_orderdate"])
        month_idx = (d.year.to_numpy() * 12 + (d.month.to_numpy() - 1)).astype(np.int64)
        rev = np.round(batch["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        return (
            pd.DataFrame({"month_idx": month_idx, "n_orders": np.int64(1),
                          "revenue_centi": rev})
            .groupby("month_idx", sort=False)
            .agg(n_orders=("n_orders", "sum"), revenue_centi=("revenue_centi", "sum"))
            .reset_index()
        )

    def lag_growth(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby("month_idx", sort=False)
            .agg(n_orders=("n_orders", "sum"), revenue_centi=("revenue_centi", "sum"))
            .reset_index()
            .sort_values("month_idx", kind="stable")
        )
        rev = m["revenue_centi"].to_numpy(dtype=np.int64)
        prev = np.empty(len(m), dtype=np.int64)
        if len(m):
            prev[0] = -1
            prev[1:] = rev[:-1]
        out = m.iloc[1:].copy() if len(m) else m
        out["prev_revenue_centi"] = prev[1:] if len(m) else prev
        out["growth"] = (
            (out["revenue_centi"].to_numpy(dtype=np.float64)
             - out["prev_revenue_centi"].to_numpy(dtype=np.float64))
            / out["prev_revenue_centi"].to_numpy(dtype=np.float64)
        )
        return out.astype(
            {"month_idx": np.int64, "n_orders": np.int64,
             "revenue_centi": np.int64, "prev_revenue_centi": np.int64}
        )

    return grouped_aggregate(orders, ["month_idx"], lag_growth, partial=partial,
                             num_partitions=1)


ORDERS_MONTHLY_GROWTH_ORACLE = """
WITH m AS (
  SELECT CAST(date_part('year', o_orderdate) * 12
              + date_part('month', o_orderdate) - 1 AS BIGINT) AS month_idx,
         count(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_centi
  FROM orders GROUP BY 1
), lagged AS (
  SELECT month_idx, n_orders, revenue_centi,
         lag(revenue_centi) OVER (ORDER BY month_idx) AS prev_revenue_centi
  FROM m
)
SELECT month_idx, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(revenue_centi AS BIGINT) AS revenue_centi,
       CAST(prev_revenue_centi AS BIGINT) AS prev_revenue_centi,
       (CAST(revenue_centi AS DOUBLE) - CAST(prev_revenue_centi AS DOUBLE))
         / CAST(prev_revenue_centi AS DOUBLE) AS growth
FROM lagged WHERE prev_revenue_centi IS NOT NULL
"""


def event_type_shares(sf_dir: str):
    """Share-of-total per event type: count and fraction of ALL events
    — the percent-of-total normalization every report footer runs. The
    group key domain is bounded (event types), so the per-type counts
    AND the global total come out of the same single-bucket final over
    pre-combined partials; the share is ONE IEEE division of exact
    int64s (hash-identical to SQL's)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("event_type", sort=False, dropna=False)
            .size()
            .reset_index(name="n_events")
            .astype({"n_events": np.int64})
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby("event_type", sort=False, dropna=False)["n_events"]
            .sum()
            .reset_index()
            .astype({"n_events": np.int64})
        )
        total = np.float64(m["n_events"].sum())
        m["share"] = m["n_events"].to_numpy(dtype=np.float64) / total
        return m

    return grouped_aggregate(events, ["event_type"], finalize, partial=partial,
                             num_partitions=1)


EVENT_TYPE_SHARES_ORACLE = """
SELECT event_type, count(*) AS n_events,
       CAST(count(*) AS DOUBLE)
         / CAST((SELECT count(*) FROM events) AS DOUBLE) AS share
FROM events GROUP BY 1
"""

def top_parts_with_ties(sf_dir: str, k: int = 10):
    """Top-k WITH TIES (``RANK() <= k`` semantics): every part whose
    size ranks in the top ``k`` — possibly many more than ``k`` rows
    when sizes tie, the difference between LIMIT and a ranked cut.

    The partial is PROVABLY sufficient: a row's final rank can only be
    ≥ its rank within any subset, so per-batch ``rank ≤ k`` rows are a
    superset of the final answer; the final pass ranks the pruned
    union (≤ k distinct sizes per batch) in one small kernel. Rank is
    computed on the DISTINCT size values (dense over values = RANK
    over rows only when ties share the value — exactly RANK's tie
    behavior for a single ordering key)."""
    import ray.data as rd

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_size"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sizes = np.sort(batch["p_size"].unique())[::-1]
        if len(sizes) > k:
            cutoff = sizes[k - 1]
        elif len(sizes):
            cutoff = sizes[-1]
        else:
            return batch
        return batch[batch["p_size"].to_numpy() >= cutoff]

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        # RANK() OVER (ORDER BY p_size DESC) = 1 + #rows strictly larger
        sizes = batch["p_size"].to_numpy()
        order = np.sort(sizes)[::-1]
        rank = np.searchsorted(-order, -sizes, side="left") + 1
        return batch[rank <= k]

    pruned = parts.map_batches(partial, batch_format="pandas")
    # the pruned set is ≤ k distinct sizes per batch — small enough for
    # one final kernel (repartition(1) is the honest 'fits anywhere')
    return pruned.repartition(1).map_batches(final, batch_format="pandas")


TOP_PARTS_WITH_TIES_ORACLE = """
SELECT p_partkey, p_name, p_size FROM (
  SELECT p_partkey, p_name, p_size,
         RANK() OVER (ORDER BY p_size DESC) AS r
  FROM part
) WHERE r <= {k}
"""


def events_value_bands(sf_dir: str):
    """Percentile-band enrichment: label every event low/mid/high by
    its type's own exact p33/p66 value cutoffs — the derived-dimension
    pattern (thresholds computed once from the distribution, then a
    shuffle-free labeling scan; nothing re-shuffles the fact rows).

    Pass 1 reuses the distributed-exact-quantile shape
    (:func:`events_type_percentiles`): rows collapse to a per-(type,
    milli) count histogram, one tiny exchange, cumulative-count walk —
    output is |types| rows, safely collected. Pass 2 broadcasts the
    cutoff dict inside a closure and maps batches; band edges are
    integer milli comparisons so the oracle CASE matches exactly."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_numpy(),
                 "milli": milli_round(batch["value"].to_numpy(dtype=np.float64))}
            )
            .groupby(["event_type", "milli"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"milli": np.int64, "n": np.int64})
        )

    def walk(bucket: pd.DataFrame) -> pd.DataFrame:
        hist = (
            bucket.groupby(["event_type", "milli"], sort=False)["n"]
            .sum()
            .reset_index()
            .sort_values(["event_type", "milli"], kind="stable")
        )
        rows = []
        for etype, g in hist.groupby("event_type", sort=False):
            cum = g["n"].to_numpy(dtype=np.int64).cumsum()
            milli = g["milli"].to_numpy(dtype=np.int64)
            total = int(cum[-1])
            p33 = int(milli[np.searchsorted(cum, (total + 2) // 3, side="left")])
            p66 = int(milli[np.searchsorted(cum, (2 * total + 2) // 3, side="left")])
            rows.append({"event_type": etype, "p33": p33, "p66": p66})
        return pd.DataFrame(rows, columns=["event_type", "p33", "p66"])

    cuts = grouped_aggregate(events, ["event_type"], walk, partial=partial,
                             num_partitions=8).to_pandas()  # |types| rows
    if cuts.empty:  # empty corpus: typed empty result (schema survives)
        import pyarrow as pa
        import ray.data as rd2

        return rd2.from_arrow(pa.schema(
            [("event_id", pa.int64()), ("event_type", pa.string()),
             ("band", pa.string())]).empty_table())
    p33 = dict(zip(cuts["event_type"], cuts["p33"].astype(np.int64)))
    p66 = dict(zip(cuts["event_type"], cuts["p66"].astype(np.int64)))

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        milli = milli_round(batch["value"].to_numpy(dtype=np.float64))
        lo = batch["event_type"].map(p33).to_numpy(dtype=np.int64)
        hi = batch["event_type"].map(p66).to_numpy(dtype=np.int64)
        band = np.where(milli <= lo, "low", np.where(milli <= hi, "mid", "high"))
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(dtype=np.int64),
             "event_type": batch["event_type"].to_numpy(),
             "band": band}
        )

    return events.map_batches(label, batch_format="pandas")


EVENTS_VALUE_BANDS_ORACLE = """
WITH m AS (
  SELECT event_id, event_type,
         CAST(round(value * 1000) AS BIGINT) AS milli
  FROM events
), r AS (
  SELECT event_type, milli,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY milli) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM m
), cuts AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 2) // 3     THEN milli END) AS p33,
         MAX(CASE WHEN rn = (2*n + 2) // 3   THEN milli END) AS p66
  FROM r GROUP BY 1
)
SELECT m.event_id, m.event_type,
       CASE WHEN m.milli <= c.p33 THEN 'low'
            WHEN m.milli <= c.p66 THEN 'mid'
            ELSE 'high' END AS band
FROM m JOIN cuts c ON m.event_type = c.event_type
"""

def events_mad(sf_dir: str):
    """Robust outlier scale per event type: the exact median absolute
    deviation (median of |value − median|) — the statistic quality
    monitors prefer over stddev because one corrupt batch can't drag
    it. Two passes of the distributed-exact-quantile shape: pass 1
    walks the per-type milli-value histogram to the median; pass 2
    re-bins |v − med| (medians broadcast as a dict scalar) and walks
    again. Both exchanges are bounded by the value DOMAIN; the fact
    table is scanned twice but never shuffled. All integer milli, so
    the two-CTE ROW_NUMBER oracle hashes exactly."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def _median_walk(col: str):
        def walk(bucket: pd.DataFrame) -> pd.DataFrame:
            hist = (
                bucket.groupby(["event_type", col], sort=False)["n"]
                .sum()
                .reset_index()
                .sort_values(["event_type", col], kind="stable")
            )
            rows = []
            for etype, g in hist.groupby("event_type", sort=False):
                cum = g["n"].to_numpy(dtype=np.int64).cumsum()
                vals = g[col].to_numpy(dtype=np.int64)
                total = int(cum[-1])
                k = (total + 1) // 2
                rows.append(
                    {"event_type": etype,
                     "med": int(vals[np.searchsorted(cum, k, side="left")])}
                )
            return pd.DataFrame(rows, columns=["event_type", "med"])
        return walk

    def partial_value(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_numpy(),
                 "milli": milli_round(batch["value"].to_numpy(dtype=np.float64))}
            )
            .groupby(["event_type", "milli"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"milli": np.int64, "n": np.int64})
        )

    med = grouped_aggregate(events, ["event_type"], _median_walk("milli"),
                            partial=partial_value, num_partitions=8).to_pandas()
    if med.empty:  # empty corpus: typed empty result (schema survives)
        import pyarrow as pa
        import ray.data as rd2

        return rd2.from_arrow(pa.schema(
            [("event_type", pa.string()), ("median_milli", pa.int64()),
             ("mad_milli", pa.int64())]).empty_table())
    med_map = dict(zip(med["event_type"], med["med"].astype(np.int64)))

    def partial_dev(batch: pd.DataFrame) -> pd.DataFrame:
        milli = milli_round(batch["value"].to_numpy(dtype=np.float64))
        m = batch["event_type"].map(med_map).to_numpy(dtype=np.int64)
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_numpy(),
                 "dev": np.abs(milli - m)}
            )
            .groupby(["event_type", "dev"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"dev": np.int64, "n": np.int64})
        )

    mad = grouped_aggregate(events, ["event_type"], _median_walk("dev"),
                            partial=partial_dev, num_partitions=8).to_pandas()
    out = med.merge(mad.rename(columns={"med": "mad_milli"}), on="event_type")
    out = out.rename(columns={"med": "median_milli"})
    import ray.data as rd2

    return rd2.from_pandas(
        out.astype({"median_milli": np.int64, "mad_milli": np.int64})
    )


EVENTS_MAD_ORACLE = """
WITH m AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS milli FROM events
), r1 AS (
  SELECT event_type, milli,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY milli) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM m
), med AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN milli END) AS median_milli
  FROM r1 GROUP BY 1
), dev AS (
  SELECT m.event_type, abs(m.milli - med.median_milli) AS d
  FROM m JOIN med ON m.event_type = med.event_type
), r2 AS (
  SELECT event_type, d,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
)
SELECT med.event_type,
       CAST(med.median_milli AS BIGINT) AS median_milli,
       CAST(MAX(CASE WHEN r2.rn = (r2.n + 1) // 2 THEN r2.d END) AS BIGINT)
         AS mad_milli
FROM r2 JOIN med ON r2.event_type = med.event_type
GROUP BY 1, 2
"""


def engaged_users(sf_dir: str, min_days: int = 2):
    """Nested distinct with a threshold: per event type, how many users
    were active on at least ``min_days`` DISTINCT days — the 'engaged
    user' metric, the shape where a naive count(distinct) over a join
    explodes and the right plan is dedup-then-count twice.

    Two bucketed exchanges with pre-deduped partials: (1) batches
    pre-dedup (type, user, day) locally, the bucket (keyed on
    hash(type, user)) counts each user's distinct days exactly because
    bucket partials are disjoint after the in-bucket dedup; (2) the
    survivors (≥ min_days) are counted per type over the tiny type key
    space. No step ships raw events twice."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_numpy(),
                 "user_id": batch["user_id"].to_numpy(dtype=np.int64),
                 "day": ts_ns // 86_400_000_000_000}
            )
            .drop_duplicates()
        )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates(["event_type", "user_id", "day"])
        days = (
            d.groupby(["event_type", "user_id"], sort=False)
            .size()
            .reset_index(name="n_days")
        )
        hit = days[days["n_days"] >= min_days]
        return (
            hit.groupby("event_type", sort=False)
            .size()
            .reset_index(name="n_engaged")
            .astype({"n_engaged": np.int64})
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("event_type", sort=False)["n_engaged"]
            .sum()
            .reset_index()
            .astype({"n_engaged": np.int64})
        )

    per_bucket = grouped_aggregate(events, ["event_type", "user_id"], per_user,
                                   partial=partial)
    return grouped_aggregate(per_bucket, ["event_type"], final,
                             num_partitions=4)


ENGAGED_USERS_ORACLE = """
WITH d AS (
  SELECT DISTINCT event_type, user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
), u AS (
  SELECT event_type, user_id, count(*) AS n_days
  FROM d GROUP BY 1, 2
)
SELECT event_type, count(*) AS n_engaged
FROM u WHERE n_days >= 2 GROUP BY 1
"""


def user_longest_streak(sf_dir: str):
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days — the retention streak metric. Per user: distinct days sorted,
    islands split where the day gap exceeds 1 (`day - row_number` is
    constant within an island — the classic SQL idiom, here as one
    vectorized diff/cumsum over the whole bucket), longest island per
    user. One bucketed exchange over pre-deduped (user, day) partials;
    days per user bound the per-bucket work."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        return (
            pd.DataFrame(
                {"user_id": batch["user_id"].to_numpy(dtype=np.int64),
                 "day": ts_ns // 86_400_000_000_000}
            )
            .drop_duplicates()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        d = (
            bucket.drop_duplicates(["user_id", "day"])
            .sort_values(["user_id", "day"], kind="stable")
        )
        users = d["user_id"].to_numpy(dtype=np.int64)
        days = d["day"].to_numpy(dtype=np.int64)
        n = len(d)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "longest_streak": pd.Series([], dtype=np.int64)}
            )
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (
                (users[1:] != users[:-1]) | (np.diff(days) > 1)
            ).astype(np.int64)
        island = np.cumsum(brk)
        lengths = (
            pd.DataFrame({"user_id": users, "island": island})
            .groupby(["user_id", "island"], sort=False)
            .size()
            .reset_index(name="len")
        )
        return (
            lengths.groupby("user_id", sort=False)["len"]
            .max()
            .reset_index(name="longest_streak")
            .astype({"user_id": np.int64, "longest_streak": np.int64})
        )

    return grouped_aggregate(events, ["user_id"], combine, partial=partial)


USER_LONGEST_STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
), g AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
), runs AS (
  SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2
)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY 1
"""

# hours from epoch to 2024-01-01T00:00Z — rebasing the regression
# abscissa keeps x² sums well inside int64 (see events_value_trend)
_TREND_BASE_HOUR = 473_352


def events_value_trend(sf_dir: str):
    """Per-type least-squares time trend: slope and intercept of value
    (centi-units) over the hour index — the drift detector behind
    'is this metric degrading'. Same exact-sufficient-statistics
    discipline as :func:`lineitem_corr`: per batch the five int64 sums
    (n, Σx, Σy, Σxy, Σx²) collapse per type, the closed form
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` and
    ``intercept = (Σy − slope·Σx) / n`` run ONCE per type in double
    precision — each a handful of correctly-rounded IEEE ops on
    identical inputs, so both float columns hash-match SQL.

    x is rebased to hours since 2024-01-01 (`_TREND_BASE_HOUR`), which
    keeps Σx² ≤ ~1e10·rows — safe past 10^8 rows/type for a decade of
    data; the unrebased epoch-hour would overflow int64 at ~4·10^7
    rows."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    cols = ["n_rows", "sum_x", "sum_y", "sum_xy", "sum_xx"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        x = ts_us // 3_600_000_000 - _TREND_BASE_HOUR
        y = np.round(batch["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(),
             "n_rows": np.ones(len(x), dtype=np.int64),
             "sum_x": x, "sum_y": y, "sum_xy": x * y, "sum_xx": x * x}
        )
        return (
            df.groupby("event_type", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = (
            bucket.groupby("event_type", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
            .astype({c: np.int64 for c in cols})
        )
        n = agg["n_rows"].to_numpy(dtype=np.float64)
        sx = agg["sum_x"].to_numpy(dtype=np.float64)
        sy = agg["sum_y"].to_numpy(dtype=np.float64)
        sxy = agg["sum_xy"].to_numpy(dtype=np.float64)
        sxx = agg["sum_xx"].to_numpy(dtype=np.float64)
        den = n * sxx - sx * sx
        slope = np.where(den > 0.0, (n * sxy - sx * sy) / np.where(den > 0.0, den, 1.0), 0.0)
        intercept = (sy - slope * sx) / n
        return pd.DataFrame(
            {"event_type": agg["event_type"], "n_rows": agg["n_rows"],
             "slope_centi_per_hour": slope, "intercept_centi": intercept}
        )

    return grouped_aggregate(events, ["event_type"], finalize, partial=partial,
                             num_partitions=4)


EVENTS_VALUE_TREND_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         count(*) AS n,
         SUM(epoch_us(ts) // 3600000000 - {_TREND_BASE_HOUR}) AS sx,
         SUM(CAST(round(value * 100) AS BIGINT)) AS sy,
         SUM((epoch_us(ts) // 3600000000 - {_TREND_BASE_HOUR})
             * CAST(round(value * 100) AS BIGINT)) AS sxy,
         SUM((epoch_us(ts) // 3600000000 - {_TREND_BASE_HOUR})
             * (epoch_us(ts) // 3600000000 - {_TREND_BASE_HOUR})) AS sxx
  FROM events GROUP BY 1
), f AS (
  SELECT event_type, n, sx, sy,
         CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
              THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              ELSE 0.0 END AS slope
  FROM s
)
SELECT event_type, CAST(n AS BIGINT) AS n_rows,
       slope AS slope_centi_per_hour,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
         AS intercept_centi
FROM f
"""


def daily_active_7d(sf_dir: str):
    """Rolling 7-day distinct active users per day (the WAU-per-day
    series) — the windowed-distinct shape a naive plan turns into a
    7-way self-join of raw events. Here: batches pre-dedup (day, user)
    locally and EXPLODE each pair into its ≤7 target days (volume
    bounded by 7 × distinct (day,user), independent of event count),
    one bucketed exchange on hash(target_day, user) dedups
    contributions exactly (disjoint buckets ⇒ disjoint user sets), and
    the per-bucket partial counts sum over the tiny day key space in a
    second exchange. Target days are restricted to days that actually
    occur (broadcast of the domain-bounded day set), matching the
    oracle's join against the distinct-day list."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def day_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        return (
            pd.DataFrame(
                {"user_id": batch["user_id"].to_numpy(dtype=np.int64),
                 "day": ts_ns // 86_400_000_000_000}
            )
            .drop_duplicates()
        )

    def day_set(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket[["day"]].drop_duplicates()

    days_df = grouped_aggregate(events, ["day"], day_set, partial=day_partial,
                                num_partitions=8).to_pandas()
    if days_df.empty:  # empty corpus: typed empty result (schema survives)
        import pyarrow as pa
        import ray.data as rd2

        return rd2.from_arrow(pa.schema(
            [("target_day", pa.int64()),
             ("active_users_7d", pa.int64())]).empty_table())
    valid_days = np.sort(days_df["day"].to_numpy(dtype=np.int64))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        d = day_partial(batch)
        day = d["day"].to_numpy(dtype=np.int64)
        user = d["user_id"].to_numpy(dtype=np.int64)
        t = np.repeat(day, 7) + np.tile(np.arange(7, dtype=np.int64), len(day))
        u = np.repeat(user, 7)
        keep = np.isin(t, valid_days)
        return (
            pd.DataFrame({"target_day": t[keep], "user_id": u[keep]})
            .drop_duplicates()
        )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates(["target_day", "user_id"])
        return (
            d.groupby("target_day", sort=False)
            .size()
            .reset_index(name="active_users_7d")
            .astype({"active_users_7d": np.int64})
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("target_day", sort=False)["active_users_7d"]
            .sum()
            .reset_index()
            .astype({"active_users_7d": np.int64})
        )

    partials = grouped_aggregate(events, ["target_day", "user_id"], per_bucket,
                                 partial=explode)
    return grouped_aggregate(partials, ["target_day"], final, num_partitions=8)


DAILY_ACTIVE_7D_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id
  FROM events
), days AS (
  SELECT DISTINCT day FROM du
)
SELECT d.day AS target_day, count(DISTINCT u.user_id) AS active_users_7d
FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
"""


def session_conversions(sf_dir: str, gap_minutes: int = 30):
    """Within-session conversion: per (user, session) the click and
    purchase counts and whether the session converted (≥1 of each) —
    sessionization and funnel COMPOSED in the same single user-bucket
    pass as :func:`events_sessionize` (session ids by one cumsum, the
    conversion rollup one more vectorized groupby; sessions never
    leave their bucket)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )
    gap_ns = np.int64(gap_minutes) * 60 * 1_000_000_000

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        users = g["user_id"].to_numpy()
        types = g["event_type"].fillna("").to_numpy(dtype=object)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "session_idx": pd.Series([], dtype=np.int64),
                 "n_clicks": pd.Series([], dtype=np.int64),
                 "n_purchases": pd.Series([], dtype=np.int64),
                 "converted": pd.Series([], dtype=np.int64)}
            )
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            new_user = users[1:] != users[:-1]
            brk[1:] = (new_user | (np.diff(ts) > gap_ns)).astype(np.int64)
        sess_global = np.cumsum(brk) - 1
        user_start = np.ones(n, dtype=bool)
        if n > 1:
            user_start[1:] = users[1:] != users[:-1]
        seg_id = np.cumsum(user_start) - 1
        session_idx = sess_global - sess_global[user_start][seg_id]
        out = pd.DataFrame(
            {"user_id": users, "session_idx": session_idx,
             "is_click": (types == "click").astype(np.int64),
             "is_purchase": (types == "purchase").astype(np.int64)}
        )
        agg = (
            out.groupby(["user_id", "session_idx"], sort=False)
            .agg(n_clicks=("is_click", "sum"), n_purchases=("is_purchase", "sum"))
            .reset_index()
        )
        agg["converted"] = (
            (agg["n_clicks"] > 0) & (agg["n_purchases"] > 0)
        ).astype(np.int64)
        return agg.astype(
            {c: np.int64 for c in ("session_idx", "n_clicks", "n_purchases",
                                   "converted")}
        )

    return grouped_aggregate(events, ["user_id"], combine)


SESSION_CONVERSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clicks,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases,
       CAST(CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
                  AND sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM sess GROUP BY 1, 2
"""


def events_dow_hour_heatmap(sf_dir: str):
    """Seasonality heatmap: event counts by (day-of-week, hour-of-day)
    — the calendar pivot behind every traffic dashboard. One two-phase
    aggregate over a 7×24-bounded key space; the interesting part is
    the CALENDAR PARITY: dow is computed as ``(epoch_days + 4) % 7``
    (1970-01-01 was a Thursday; +4 lands Sunday on 0) to match SQL's
    Sunday-based ``dayofweek`` exactly, and hour-of-day is the epoch
    hour mod 24 (UTC — both engines read the naive timestamps as-is)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    keys = ["dow", "hour_of_day"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        days = ts_us // 86_400_000_000
        return (
            pd.DataFrame(
                {"dow": (days + 4) % 7,
                 "hour_of_day": (ts_us // 3_600_000_000) % 24}
            )
            .groupby(keys, sort=False)
            .size()
            .reset_index(name="n_events")
            .astype({"dow": np.int64, "hour_of_day": np.int64,
                     "n_events": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False)["n_events"]
            .sum()
            .reset_index()
            .astype({"dow": np.int64, "hour_of_day": np.int64,
                     "n_events": np.int64})
        )

    return grouped_aggregate(events, keys, combine, partial=partial,
                             num_partitions=4)


EVENTS_DOW_HOUR_ORACLE = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour_of_day,
       count(*) AS n_events
FROM events GROUP BY 1, 2
"""

def lineitem_weighted_discount(sf_dir: str):
    """Revenue-weighted average discount per return flag — the weighted
    mean every 'blended rate' metric is: Σ(wᵢ·xᵢ)/Σwᵢ with weight =
    extended price. Numerator and denominator are exact int64 sums
    (price in centi, discount in basis points ⇒ products ≤ 1e7·1e4 =
    1e11 per row), the blend is ONE IEEE division so the float column
    hashes exactly; the unweighted mean is emitted beside it because
    the gap between the two IS the metric's reason to exist."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_discount"],
    )
    cols = ["n_rows", "sum_w", "sum_wx", "sum_x"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = np.round(batch["l_extendedprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        x = np.round(batch["l_discount"].to_numpy(dtype=np.float64) * 10_000).astype(np.int64)
        df = pd.DataFrame(
            {"l_returnflag": batch["l_returnflag"].to_numpy(),
             "n_rows": np.ones(len(w), dtype=np.int64),
             "sum_w": w, "sum_wx": w * x, "sum_x": x}
        )
        return (
            df.groupby("l_returnflag", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = (
            bucket.groupby("l_returnflag", sort=False)
            .agg({c: "sum" for c in cols})
            .reset_index()
            .astype({c: np.int64 for c in cols})
        )
        return pd.DataFrame(
            {"l_returnflag": agg["l_returnflag"],
             "n_rows": agg["n_rows"],
             "weighted_discount_bp": agg["sum_wx"].to_numpy(dtype=np.float64)
                 / agg["sum_w"].to_numpy(dtype=np.float64),
             "plain_discount_bp": agg["sum_x"].to_numpy(dtype=np.float64)
                 / agg["n_rows"].to_numpy(dtype=np.float64)}
        )

    return grouped_aggregate(lines, ["l_returnflag"], finalize, partial=partial,
                             num_partitions=4)


LINEITEM_WEIGHTED_DISCOUNT_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sw,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 10000) AS BIGINT)) AS swx,
         SUM(CAST(round(l_discount * 10000) AS BIGINT)) AS sx
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS weighted_discount_bp,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS plain_discount_bp
FROM s
"""


def user_value_drawdown(sf_dir: str):
    """Maximum drawdown per user: the largest drop of the event value
    below its running maximum over the user's (ts, event_id)-ordered
    stream — the composed window (cummax, then max of the gap) that a
    risk or engagement-decay monitor runs. One bucketed user shuffle,
    one vectorized pass per bucket: segment-reset running max via the
    index-monotonicity trick (a cummax carried across a user boundary
    is detected by comparing against the segment's own prefix), values
    in exact centi ints."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy(dtype=np.int64)
        v = np.round(g["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "max_drawdown_centi": pd.Series([], dtype=np.int64),
                 "peak_centi": pd.Series([], dtype=np.int64)}
            )
        # segment-reset cummax: per user segment, running max of v
        seg = segment_starts(users)
        # offset trick: shift each segment's values into a disjoint
        # ascending band so one global cummax never crosses users
        band = seg.astype(np.int64) * (np.int64(1) << 40)
        run = np.maximum.accumulate(v + band) - band
        draw = run - v
        out = pd.DataFrame(
            {"user_id": users, "draw": draw, "v": v}
        )
        agg = (
            out.groupby("user_id", sort=False)
            .agg(max_drawdown_centi=("draw", "max"), peak_centi=("v", "max"))
            .reset_index()
        )
        return agg.astype({c: np.int64 for c in
                           ("user_id", "max_drawdown_centi", "peak_centi")})

    return grouped_aggregate(events, ["user_id"], combine)


USER_VALUE_DRAWDOWN_ORACLE = """
WITH r AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         MAX(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS run_max
  FROM events
)
SELECT user_id,
       CAST(MAX(run_max - v) AS BIGINT) AS max_drawdown_centi,
       CAST(MAX(v) AS BIGINT) AS peak_centi
FROM r GROUP BY 1
"""


def click_attribution(sf_dir: str, window_hours: int = 24):
    """Linear (equal-credit) attribution: every purchase splits one
    unit of credit equally over the SAME user's clicks in the
    preceding ``window_hours`` — the multi-touch model beside
    :func:`purchase_attribution`'s last-touch. Credit is integer
    MICRO-credits (``1_000_000 // n_clicks``) so sums are exact and
    order-independent — summing 1/n floats would hash differently per
    accumulation order. One bucketed user shuffle; per bucket the
    click↔purchase pairing is two vectorized ``searchsorted`` calls
    over the per-user sorted click timestamps (window edges), then one
    repeat/arange expansion of the pair ranges — no per-event Python.
    Window is half-open (click strictly before the purchase, within
    ``window_hours``], mirrored by the oracle's BETWEEN + <."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )
    win_us = np.int64(window_hours) * 3_600_000_000

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        types = g["event_type"].fillna("").to_numpy(dtype=object)
        empty = pd.DataFrame(
            {"click_event_id": pd.Series([], dtype=np.int64),
             "credit_micros": pd.Series([], dtype=np.int64)}
        )
        if not len(g):
            return empty
        users = g["user_id"].to_numpy(dtype=np.int64)
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = g["event_id"].to_numpy(dtype=np.int64)
        frames = []
        clicks = types == "click"
        purchases = types == "purchase"
        # per-user spans (users are contiguous after the sort)
        seg = segment_starts(users)
        starts = np.unique(seg)
        bounds = np.append(starts, len(g))
        for s, e in zip(bounds[:-1], bounds[1:]):
            c_ts = ts_us[s:e][clicks[s:e]]
            c_id = ids[s:e][clicks[s:e]]
            p_ts = ts_us[s:e][purchases[s:e]]
            if not len(c_ts) or not len(p_ts):
                continue
            lo = np.searchsorted(c_ts, p_ts - win_us, side="left")
            hi = np.searchsorted(c_ts, p_ts, side="left")  # strictly before
            counts = hi - lo
            mask = counts > 0
            if not mask.any():
                continue
            lo, hi, counts = lo[mask], hi[mask], counts[mask]
            credit = (1_000_000 // counts).astype(np.int64)
            idx = expand_ranges(lo, hi)
            frames.append(
                pd.DataFrame(
                    {"click_event_id": c_id[idx],
                     "credit_micros": np.repeat(credit, counts)}
                )
            )
        if not frames:
            return empty
        allp = pd.concat(frames, ignore_index=True)
        return (
            allp.groupby("click_event_id", sort=False)["credit_micros"]
            .sum()
            .reset_index()
            .astype({"click_event_id": np.int64, "credit_micros": np.int64})
        )

    # per-user loops above iterate USER SPANS inside one bucket — the
    # span count per bucket is users/buckets, and each span's work is
    # vectorized; acceptable because the inner work is O(pairs) numpy.
    partials = grouped_aggregate(events, ["user_id"], combine)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("click_event_id", sort=False)["credit_micros"]
            .sum()
            .reset_index()
            .astype({"click_event_id": np.int64, "credit_micros": np.int64})
        )

    return grouped_aggregate(partials, ["click_event_id"], final,
                             num_partitions=16)


CLICK_ATTRIBUTION_ORACLE = """
WITH c AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT c.event_id AS click_event_id, p.event_id AS purchase_id,
         COUNT(*) OVER (PARTITION BY p.event_id) AS n_clicks
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.ts < p.ts
   AND c.ts >= p.ts - INTERVAL 24 HOURS
)
SELECT click_event_id,
       CAST(SUM(1000000 // n_clicks) AS BIGINT) AS credit_micros
FROM pairs GROUP BY 1
"""

def user_type_share(sf_dir: str):
    """Ratio-to-partition window: each (user, type)'s share of that
    USER's events — `n / SUM(n) OVER (PARTITION BY user)`, the
    within-group normalization (ratio_to_report) that turns counts
    into a per-user behavioral profile. The per-(user, type) counts
    are combiner-bounded partials; the partition total never needs a
    second exchange because bucketing on hash(user) co-locates a
    user's whole profile — one vectorized transform('sum') per bucket
    and ONE IEEE division make the share hash-exact."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"user_id": np.int64, "n": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby(["user_id", "event_type"], sort=False)["n"]
            .sum()
            .reset_index()
            .astype({"user_id": np.int64, "n": np.int64})
        )
        total = m.groupby("user_id", sort=False)["n"].transform("sum")
        m["share"] = m["n"].to_numpy(dtype=np.float64) / total.to_numpy(
            dtype=np.float64
        )
        return m

    return grouped_aggregate(events, ["user_id"], combine, partial=partial)


USER_TYPE_SHARE_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY user_id) AS DOUBLE) AS share
FROM c
"""


def user_type_gaps(sf_dir: str):
    """Dimension-coverage anti join: the (customer, event_type)
    combinations a customer NEVER produced — the coverage-gap matrix a
    recommendation or onboarding funnel reads (a customer with no
    events gaps on every type). The naive plan is a customers × types
    cross join minus an EXISTS over a fact table; here the type domain
    is collected once (domain-bounded), customer keys and the
    pre-deduped observed pairs are two TAGGED scans sharing ONE
    bucketed exchange on hash(key), and the per-bucket kernel emits
    each customer's complement via one vectorized left-merge over the
    (customer × domain) lattice — output bounded by customers ×
    |types|, never event count."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def type_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["event_type"]].dropna().drop_duplicates()

    def type_set(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    domain_df = grouped_aggregate(events, ["event_type"], type_set,
                                  partial=type_partial, num_partitions=4).to_pandas()
    if domain_df.empty:  # no observed types: every lattice is empty
        import pyarrow as pa
        import ray.data as rd2

        return rd2.from_arrow(pa.schema(
            [("user_id", pa.int64()), ("event_type", pa.string())]).empty_table())
    domain = np.sort(domain_df["event_type"].to_numpy(dtype=object))

    def tag_customers(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": batch["c_custkey"].to_numpy(dtype=np.int64),
             "event_type": "", "kind": np.int64(0)}
        )

    def tag_observed(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch.dropna().drop_duplicates()
        return pd.DataFrame(
            {"user_id": d["user_id"].to_numpy(dtype=np.int64),
             "event_type": d["event_type"].to_numpy(),
             "kind": np.int64(1)}
        )

    tagged = customers.map_batches(tag_customers, batch_format="pandas").union(
        events.map_batches(tag_observed, batch_format="pandas")
    )

    def complement(bucket: pd.DataFrame) -> pd.DataFrame:
        users = np.sort(
            bucket.loc[bucket["kind"] == 0, "user_id"].unique()
        ).astype(np.int64)
        seen = bucket[bucket["kind"] == 1][["user_id", "event_type"]].drop_duplicates()
        lattice = pd.DataFrame(
            {"user_id": np.repeat(users, len(domain)),
             "event_type": np.tile(domain, len(users))}
        )
        merged = lattice.merge(
            seen.assign(_seen=1), on=["user_id", "event_type"], how="left"
        )
        out = merged[merged["_seen"].isna()][["user_id", "event_type"]]
        return out.astype({"user_id": np.int64}).reset_index(drop=True)

    return grouped_aggregate(tagged, ["user_id"], complement, coalesce=True)


USER_TYPE_GAPS_ORACLE = """
WITH u AS (SELECT c_custkey AS user_id FROM customer),
t AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL),
seen AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT u.user_id, t.event_type
FROM u CROSS JOIN t
WHERE NOT EXISTS (
  SELECT 1 FROM seen s
  WHERE s.user_id = u.user_id AND s.event_type = t.event_type
)
"""


def orders_fulfillment(sf_dir: str, grace_days: int = 90):
    """Grouped universal quantifier (relational division): an order is
    FULLY FULFILLED iff EVERY lineitem shipped within ``grace_days``
    of the order date; report per priority the order count, fully-
    fulfilled count, and rate. The ALL() predicate is computed as a
    mergeable MAX: every line is within grace iff the LATEST ship date
    is, so each batch contributes one max-ship row per order; tagged
    orders and line-partials share ONE bucketed exchange on
    hash(orderkey) (combiner-bounded: ≤2 rows per order per batch),
    and the per-priority rollup is a second tiny exchange.
    Orders with NO lineitems count as fulfilled (vacuous truth), same
    as the oracle's COALESCE(bool_and, TRUE)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    grace_us = np.int64(grace_days) * 86_400_000_000

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderkey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "kind": np.int64(0),
             "odate_us": batch["o_orderdate"].to_numpy()
                 .astype("datetime64[us]").astype(np.int64),
             "o_orderpriority": batch["o_orderpriority"].to_numpy()}
        )

    def tag_lines(batch: pd.DataFrame) -> pd.DataFrame:
        # per-batch partial: ALL-within-grace is a mergeable MAX over
        # ship dates (every line ok iff the latest ship is ok), so one
        # row per order per batch leaves the combiner
        return (
            pd.DataFrame(
                {"o_orderkey": batch["l_orderkey"].to_numpy(dtype=np.int64),
                 "kind": np.int64(1),
                 "odate_us": batch["l_shipdate"].to_numpy()
                     .astype("datetime64[us]").astype(np.int64),
                 "o_orderpriority": ""}
            )
            .groupby("o_orderkey", sort=False)
            .agg(kind=("kind", "max"), odate_us=("odate_us", "max"),
                 o_orderpriority=("o_orderpriority", "max"))
            .reset_index()
        )

    tagged = orders.map_batches(tag_orders, batch_format="pandas").union(
        lines.map_batches(tag_lines, batch_format="pandas")
    )

    def per_order(bucket: pd.DataFrame) -> pd.DataFrame:
        o = bucket[bucket["kind"] == 0]
        l = (
            bucket[bucket["kind"] == 1]
            .groupby("o_orderkey", sort=False)["odate_us"]
            .max()  # latest ship date across all partials
            .rename("max_ship_us")
            .reset_index()
        )
        m = o.merge(l, on="o_orderkey", how="left")
        has_lines = m["max_ship_us"].notna()
        ok = (~has_lines) | (
            m["max_ship_us"].fillna(0).to_numpy(dtype=np.int64)
            <= m["odate_us"].to_numpy(dtype=np.int64) + grace_us
        )
        return (
            pd.DataFrame(
                {"o_orderpriority": m["o_orderpriority"].to_numpy(),
                 "n_orders": np.int64(1),
                 "n_fulfilled": ok.astype(np.int64)}
            )
            .groupby("o_orderpriority", sort=False)
            .sum()
            .reset_index()
        )

    partials = grouped_aggregate(tagged, ["o_orderkey"], per_order,
                                 coalesce=True)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby("o_orderpriority", sort=False)
            .agg(n_orders=("n_orders", "sum"), n_fulfilled=("n_fulfilled", "sum"))
            .reset_index()
            .astype({"n_orders": np.int64, "n_fulfilled": np.int64})
        )
        m["rate"] = m["n_fulfilled"].to_numpy(dtype=np.float64) / m[
            "n_orders"
        ].to_numpy(dtype=np.float64)
        return m

    return grouped_aggregate(partials, ["o_orderpriority"], final,
                             num_partitions=4)


ORDERS_FULFILLMENT_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         COALESCE(bool_and(l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAYS),
                  TRUE) AS ok
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS rate
FROM per_order GROUP BY 1
"""


def source_lang_diversity(sf_dir: str):
    """Simpson diversity index per document source: the probability
    two documents drawn without replacement share a language —
    Σ n_l·(n_l−1) / (N·(N−1)) — the concentration measure a corpus-mix
    dashboard tracks (1 = monolingual, →0 = evenly mixed). The
    (source, lang) counts are combiner-bounded partials over a tiny
    key domain; the index is ONE IEEE division of two exact int64
    products, so the float hashes exactly. Single-document sources
    (N=1) define the index as 1."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["source", "lang"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby(["source", "lang"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        n = m["n"].to_numpy(dtype=np.int64)
        m["pair"] = n * (n - 1)
        agg = (
            m.groupby("source", sort=False)
            .agg(n_docs=("n", "sum"), same_pairs=("pair", "sum"))
            .reset_index()
            .astype({"n_docs": np.int64, "same_pairs": np.int64})
        )
        nd = agg["n_docs"].to_numpy(dtype=np.int64)
        total_pairs = nd * (nd - 1)
        agg["simpson"] = np.where(
            total_pairs > 0,
            agg["same_pairs"].to_numpy(dtype=np.float64)
            / np.where(total_pairs > 0, total_pairs, 1).astype(np.float64),
            1.0,
        )
        return agg[["source", "n_docs", "simpson"]]

    return grouped_aggregate(docs, ["source"], combine, partial=partial,
                             num_partitions=4)


SOURCE_LANG_DIVERSITY_ORACLE = """
WITH c AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
), s AS (
  SELECT source, SUM(n) AS n_docs, SUM(n * (n - 1)) AS same_pairs
  FROM c GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CASE WHEN n_docs * (n_docs - 1) > 0
            THEN CAST(same_pairs AS DOUBLE)
                 / CAST(n_docs * (n_docs - 1) AS DOUBLE)
            ELSE 1.0 END AS simpson
FROM s
"""

def peak_concurrency(sf_dir: str, gap_minutes: int = 30):
    """Peak simultaneous sessions (the occupancy / meeting-rooms
    sweep): sessionize per user, turn each session into a +1 delta at
    its start and a −1 delta just after its end (closed interval), and
    take the global running sum's maximum plus the first instant it is
    reached — the capacity-planning number every service sizes against.

    The global ordered scan is the :func:`events_running_total`
    two-level pattern, with the boundary case the per-hour offset trick
    must survive: deltas ordered by (ts, delta DESC) so a session
    opening at the exact microsecond another closes counts as
    overlapping (both engines pin the same tie rule). Session deltas
    come out of the same single user-bucket pass as sessionize;
    per-hour delta totals are domain-bounded, their exclusive prefix is
    a driver scalar per hour, and each hour bucket reports (local max,
    first ts at max) — one tiny final merge picks the global pair."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    gap_ns = np.int64(gap_minutes) * 60 * 1_000_000_000

    def deltas(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        users = g["user_id"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"ts_us": pd.Series([], dtype=np.int64),
                 "delta": pd.Series([], dtype=np.int64)}
            )
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (users[1:] != users[:-1]) | (np.diff(ts) > gap_ns)
        starts = ts[brk] // 1_000
        end_idx = np.roll(brk, -1)  # row before each break = session end
        end_idx[-1] = True
        ends = ts[end_idx] // 1_000 + 1  # exclusive end: closed interval
        return pd.DataFrame(
            {"ts_us": np.concatenate([starts, ends]),
             "delta": np.concatenate(
                 [np.ones(len(starts), dtype=np.int64),
                  -np.ones(len(ends), dtype=np.int64)]
             )}
        )

    delta_ds = grouped_aggregate(events, ["user_id"], deltas).materialize()

    def hour_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["hour"] = out["ts_us"].to_numpy(dtype=np.int64) // 3_600_000_000
        return (
            out.groupby("hour", sort=False)["delta"].sum().reset_index()
            .astype({"hour": np.int64, "delta": np.int64})
        )

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    hour_sums = (
        collect_small(
            delta_ds.map_batches(hour_partial, batch_format="pandas"),
            ["hour", "delta"],
        )
        .groupby("hour", sort=True)["delta"]
        .sum()
    )
    offsets = {
        int(h): int(v)
        for h, v in zip(hour_sums.index, hour_sums.cumsum() - hour_sums)
    }

    def add_hour(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["hour"] = out["ts_us"].to_numpy(dtype=np.int64) // 3_600_000_000
        return out

    def local_peak(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(
            ["hour", "ts_us", "delta"], ascending=[True, True, False],
            kind="stable",
        )
        run = g.groupby("hour", sort=False)["delta"].cumsum().to_numpy(
            dtype=np.int64
        )
        base = g["hour"].map(offsets).to_numpy(dtype=np.int64)
        occ = base + run
        out = pd.DataFrame(
            {"occ": occ, "ts_us": g["ts_us"].to_numpy(dtype=np.int64)}
        )
        best = out["occ"].max()
        first = out.loc[out["occ"] == best, "ts_us"].min()
        return pd.DataFrame(
            {"peak": np.array([best], dtype=np.int64),
             "first_ts_us": np.array([first], dtype=np.int64)}
        )

    per_hour = grouped_aggregate(
        delta_ds.map_batches(add_hour, batch_format="pandas"),
        ["hour"],
        local_peak,
    )

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        best = batch["peak"].max()
        first = batch.loc[batch["peak"] == best, "first_ts_us"].min()
        return pd.DataFrame(
            {"peak": np.array([best], dtype=np.int64),
             "first_ts_us": np.array([first], dtype=np.int64)}
        )

    return per_hour.repartition(1).map_batches(final, batch_format="pandas")


PEAK_CONCURRENCY_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid,
         ts
  FROM flagged
), spans AS (
  SELECT user_id, sid,
         CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
         CAST(epoch_us(max(ts)) AS BIGINT) + 1 AS end_us
  FROM sess GROUP BY 1, 2
), deltas AS (
  SELECT start_us AS ts_us, 1 AS delta FROM spans
  UNION ALL
  SELECT end_us AS ts_us, -1 AS delta FROM spans
), run AS (
  SELECT ts_us,
         SUM(delta) OVER (ORDER BY ts_us, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS occ
  FROM deltas
)
SELECT CAST(MAX(occ) AS BIGINT) AS peak,
       CAST(MIN(CASE WHEN occ = (SELECT MAX(occ) FROM run) THEN ts_us END)
            AS BIGINT) AS first_ts_us
FROM run
"""


def nation_revenue_share(sf_dir: str):
    """Hierarchical ratio-to-parent: each nation's order revenue as a
    share of its REGION's total — the two-level rollup every
    geo dashboard draws. The customer→nation→region ladder rides the
    same broadcast searchsorted lookup arrays as the Q5 join
    (dimension tables are constant-size by definition); revenue
    collapses per nation in the fact scan's combiner (25 keys), and
    the within-region share is one vectorized transform over the tiny
    final — a single IEEE division, hash-exact."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas().sort_values("c_custkey")
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas().sort_values("n_nationkey")
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas().sort_values("r_regionkey")

    ckeys = cust["c_custkey"].to_numpy(dtype=np.int64)
    cnat = cust["c_nationkey"].to_numpy(dtype=np.int64)
    nkeys = nation["n_nationkey"].to_numpy(dtype=np.int64)
    nnames = nation["n_name"].to_numpy(dtype=object)
    nregion = nation["n_regionkey"].to_numpy(dtype=np.int64)
    rkeys = region["r_regionkey"].to_numpy(dtype=np.int64)
    rnames = region["r_name"].to_numpy(dtype=object)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ck = batch["o_custkey"].to_numpy(dtype=np.int64)
        nat = cnat[np.searchsorted(ckeys, ck)]
        ni = np.searchsorted(nkeys, nat)
        rev = np.round(
            batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"nation": nnames[ni],
                 "region": rnames[np.searchsorted(rkeys, nregion[ni])],
                 "revenue_centi": rev}
            )
            .groupby(["nation", "region"], sort=False)["revenue_centi"]
            .sum()
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby(["nation", "region"], sort=False)["revenue_centi"]
            .sum()
            .reset_index()
            .astype({"revenue_centi": np.int64})
        )
        total = m.groupby("region", sort=False)["revenue_centi"].transform("sum")
        m["region_share"] = m["revenue_centi"].to_numpy(
            dtype=np.float64
        ) / total.to_numpy(dtype=np.float64)
        return m

    # num_partitions=1: 25 nations — the share needs its region's
    # whole rollup co-located, and the final is domain-bounded anyway
    return grouped_aggregate(orders, ["nation"], combine, partial=partial,
                             num_partitions=1)


NATION_REVENUE_SHARE_ORACLE = """
WITH rev AS (
  SELECT n.n_name AS nation, r.r_name AS region,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS revenue_centi
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT nation, region, CAST(revenue_centi AS BIGINT) AS revenue_centi,
       CAST(revenue_centi AS DOUBLE)
         / CAST(SUM(revenue_centi) OVER (PARTITION BY region) AS DOUBLE)
         AS region_share
FROM rev
"""

def customer_rfm(sf_dir: str):
    """RFM scoring — the classic marketing composite, and the repo's
    cleanest aggregate→distribution→enrich composition: (1) one
    fact-scan combiner collapses orders to per-customer (recency day,
    frequency, monetary centi); (2) each metric's exact quintile cuts
    (p20/40/60/80, the discrete k=ceil(p·N) walk over a value
    histogram) come from domain-bounded aggregates; (3) a shuffle-free
    enrich scan scores every customer 1-5 per metric by VALUE cuts
    (value-based quintiles, not NTILE's positional split, so ties
    score identically and the result is order-independent). All three
    score ascending — a larger last-order day IS more recent, so
    recency needs no inversion. Only customers with orders appear,
    like the oracle's per-customer rollup."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        rev = np.round(batch["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        return (
            pd.DataFrame(
                {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
                 "last_day": day, "n_orders": np.int64(1), "revenue_centi": rev}
            )
            .groupby("custkey", sort=False)
            .agg(last_day=("last_day", "max"), n_orders=("n_orders", "sum"),
                 revenue_centi=("revenue_centi", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("custkey", sort=False)
            .agg(last_day=("last_day", "max"), n_orders=("n_orders", "sum"),
                 revenue_centi=("revenue_centi", "sum"))
            .reset_index()
            .astype({c: np.int64 for c in
                     ("custkey", "last_day", "n_orders", "revenue_centi")})
        )

    per_cust = grouped_aggregate(orders, ["custkey"], combine,
                                 partial=partial).materialize()
    if per_cust.count() == 0:  # empty corpus: typed empty result
        import pyarrow as pa
        import ray.data as rd2

        return rd2.from_arrow(pa.schema(
            [("custkey", pa.int64()), ("r_score", pa.int64()),
             ("f_score", pa.int64()), ("m_score", pa.int64())]).empty_table())

    def quintile_cuts(col: str) -> np.ndarray:
        def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
            return (
                batch.groupby(col, sort=False).size().reset_index(name="n")
                .astype({col: np.int64, "n": np.int64})
            )

        def hist_sum(bucket: pd.DataFrame) -> pd.DataFrame:
            return (
                bucket.groupby(col, sort=False)["n"].sum().reset_index()
                .astype({col: np.int64, "n": np.int64})
            )

        hist = (
            grouped_aggregate(per_cust, [col], hist_sum, partial=hist_partial,
                              num_partitions=8)
            .to_pandas()
            .sort_values(col, kind="stable")
        )
        cum = hist["n"].to_numpy(dtype=np.int64).cumsum()
        vals = hist[col].to_numpy(dtype=np.int64)
        total = int(cum[-1])
        cuts = []
        for num in (1, 2, 3, 4):  # p20/p40/p60/p80 as k = ceil(p*N)
            k = (num * total + 4) // 5
            cuts.append(int(vals[np.searchsorted(cum, k, side="left")]))
        return np.array(cuts, dtype=np.int64)

    cuts = {c: quintile_cuts(c) for c in ("last_day", "n_orders", "revenue_centi")}

    def score(values: np.ndarray, c: np.ndarray) -> np.ndarray:
        # value <= p20 -> 1 ... value > p80 -> 5 (searchsorted over cuts)
        return (np.searchsorted(c, values, side="left") + 1).astype(np.int64)

    def enrich(batch: pd.DataFrame) -> pd.DataFrame:
        r = score(batch["last_day"].to_numpy(dtype=np.int64), cuts["last_day"])
        f = score(batch["n_orders"].to_numpy(dtype=np.int64), cuts["n_orders"])
        m = score(batch["revenue_centi"].to_numpy(dtype=np.int64),
                  cuts["revenue_centi"])
        return pd.DataFrame(
            {"custkey": batch["custkey"].to_numpy(dtype=np.int64),
             "r_score": r, "f_score": f, "m_score": m}
        )

    return per_cust.map_batches(enrich, batch_format="pandas")


CUSTOMER_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS last_day,
         count(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_centi
  FROM orders GROUP BY 1
),
rr AS (SELECT last_day AS v, ROW_NUMBER() OVER (ORDER BY last_day) AS rn,
              COUNT(*) OVER () AS n FROM per_cust),
rc AS (SELECT
  MIN(CASE WHEN rn = (1*n + 4) // 5 THEN v END) AS c1,
  MIN(CASE WHEN rn = (2*n + 4) // 5 THEN v END) AS c2,
  MIN(CASE WHEN rn = (3*n + 4) // 5 THEN v END) AS c3,
  MIN(CASE WHEN rn = (4*n + 4) // 5 THEN v END) AS c4 FROM rr),
fr AS (SELECT n_orders AS v, ROW_NUMBER() OVER (ORDER BY n_orders) AS rn,
              COUNT(*) OVER () AS n FROM per_cust),
fc AS (SELECT
  MIN(CASE WHEN rn = (1*n + 4) // 5 THEN v END) AS c1,
  MIN(CASE WHEN rn = (2*n + 4) // 5 THEN v END) AS c2,
  MIN(CASE WHEN rn = (3*n + 4) // 5 THEN v END) AS c3,
  MIN(CASE WHEN rn = (4*n + 4) // 5 THEN v END) AS c4 FROM fr),
mr AS (SELECT revenue_centi AS v, ROW_NUMBER() OVER (ORDER BY revenue_centi) AS rn,
              COUNT(*) OVER () AS n FROM per_cust),
mc AS (SELECT
  MIN(CASE WHEN rn = (1*n + 4) // 5 THEN v END) AS c1,
  MIN(CASE WHEN rn = (2*n + 4) // 5 THEN v END) AS c2,
  MIN(CASE WHEN rn = (3*n + 4) // 5 THEN v END) AS c3,
  MIN(CASE WHEN rn = (4*n + 4) // 5 THEN v END) AS c4 FROM mr)
SELECT p.custkey,
  CAST(CASE WHEN p.last_day <= rc.c1 THEN 1 WHEN p.last_day <= rc.c2 THEN 2
            WHEN p.last_day <= rc.c3 THEN 3 WHEN p.last_day <= rc.c4 THEN 4
            ELSE 5 END AS BIGINT) AS r_score,
  CAST(CASE WHEN p.n_orders <= fc.c1 THEN 1 WHEN p.n_orders <= fc.c2 THEN 2
            WHEN p.n_orders <= fc.c3 THEN 3 WHEN p.n_orders <= fc.c4 THEN 4
            ELSE 5 END AS BIGINT) AS f_score,
  CAST(CASE WHEN p.revenue_centi <= mc.c1 THEN 1 WHEN p.revenue_centi <= mc.c2 THEN 2
            WHEN p.revenue_centi <= mc.c3 THEN 3 WHEN p.revenue_centi <= mc.c4 THEN 4
            ELSE 5 END AS BIGINT) AS m_score
FROM per_cust p, rc, fc, mc
"""


def orders_yoy_growth(sf_dir: str):
    """Year-over-year growth: each month's revenue against the SAME
    month one year earlier — the seasonally-honest growth metric,
    distinct from MoM's LAG-1 in that the comparison is a self-join at
    a fixed offset (month_idx − 12). Same domain-bounded month rollup
    as :func:`orders_monthly_growth`; the offset join happens in the
    single-bucket final (an int-index merge over a tiny table), growth
    is one IEEE division, months without a year-ago counterpart are
    excluded like the oracle's inner self-join."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(batch["o_orderdate"])
        month_idx = (d.year.to_numpy() * 12 + (d.month.to_numpy() - 1)).astype(np.int64)
        rev = np.round(batch["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        return (
            pd.DataFrame({"month_idx": month_idx, "revenue_centi": rev})
            .groupby("month_idx", sort=False)["revenue_centi"]
            .sum()
            .reset_index()
        )

    def yoy(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby("month_idx", sort=False)["revenue_centi"]
            .sum()
            .reset_index()
            .astype({"month_idx": np.int64, "revenue_centi": np.int64})
        )
        prev = m.copy()
        prev["month_idx"] = prev["month_idx"] + 12
        out = m.merge(
            prev.rename(columns={"revenue_centi": "prev_year_centi"}),
            on="month_idx", how="inner",
        )
        out["yoy_growth"] = (
            (out["revenue_centi"].to_numpy(dtype=np.float64)
             - out["prev_year_centi"].to_numpy(dtype=np.float64))
            / out["prev_year_centi"].to_numpy(dtype=np.float64)
        )
        return out.astype(
            {"month_idx": np.int64, "revenue_centi": np.int64,
             "prev_year_centi": np.int64}
        )

    return grouped_aggregate(orders, ["month_idx"], yoy, partial=partial,
                             num_partitions=1)


ORDERS_YOY_GROWTH_ORACLE = """
WITH m AS (
  SELECT CAST(date_part('year', o_orderdate) * 12
              + date_part('month', o_orderdate) - 1 AS BIGINT) AS month_idx,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_centi
  FROM orders GROUP BY 1
)
SELECT cur.month_idx,
       CAST(cur.revenue_centi AS BIGINT) AS revenue_centi,
       CAST(prev.revenue_centi AS BIGINT) AS prev_year_centi,
       (CAST(cur.revenue_centi AS DOUBLE) - CAST(prev.revenue_centi AS DOUBLE))
         / CAST(prev.revenue_centi AS DOUBLE) AS yoy_growth
FROM m cur JOIN m prev ON prev.month_idx = cur.month_idx - 12
"""

def type_affinity(sf_dir: str):
    """Bipartite projection (the item-item co-engagement matrix): for
    every unordered event-type pair, how many DISTINCT users did both
    — the collaborative-filtering affinity table, projected from the
    user–type bipartite graph. Per-user type sets are pre-deduped into
    one hash(user) exchange; each user's bucket emits its ≤ C(|types|,2)
    pairs (fan-out bounded by the type-domain square, never by event
    count), and a second tiny exchange sums over the pair key space."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def observed(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.dropna().drop_duplicates()

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates().sort_values(
            ["user_id", "event_type"], kind="stable"
        )
        users = d["user_id"].to_numpy(dtype=np.int64)
        types = d["event_type"].to_numpy(dtype=object)
        seg = segment_starts(users)
        lens = np.bincount(seg, minlength=len(users))[seg]
        # vectorized within-segment pair expansion: for row i at local
        # offset o with segment length L, pair with the (L - o - 1)
        # following rows
        idx = np.arange(len(users), dtype=np.int64)
        local = idx - seg
        reps = lens - local - 1
        if not len(users) or int(reps.sum()) == 0:
            return pd.DataFrame(
                {"type_a": pd.Series([], dtype=object),
                 "type_b": pd.Series([], dtype=object),
                 "n_users": pd.Series([], dtype=np.int64)}
            )
        left = np.repeat(idx, reps)
        right = expand_ranges(idx + 1, idx + 1 + reps)
        out = pd.DataFrame(
            {"type_a": types[left], "type_b": types[right],
             "n_users": np.int64(1)}
        )
        return (
            out.groupby(["type_a", "type_b"], sort=False)["n_users"]
            .sum()
            .reset_index()
            .astype({"n_users": np.int64})
        )

    partials = grouped_aggregate(events, ["user_id"], pairs, partial=observed)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["type_a", "type_b"], sort=False)["n_users"]
            .sum()
            .reset_index()
            .astype({"n_users": np.int64})
        )

    return grouped_aggregate(partials, ["type_a", "type_b"], final,
                             num_partitions=4)


TYPE_AFFINITY_ORACLE = """
WITH seen AS (SELECT DISTINCT user_id, event_type FROM events
              WHERE event_type IS NOT NULL)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM seen a JOIN seen b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def lineitem_quantity_gini(sf_dir: str):
    """Exact Gini coefficient of the quantity distribution per return
    flag — the inequality/concentration index, computed the only way
    that is both tie-correct and distributed-exact: collapse rows to a
    per-(flag, value) count histogram (quantity's DOMAIN is 50 values,
    so the exchange is constant-size), then evaluate the mean-absolute-
    difference form Δ = 2·Σᵢ cᵢ·(vᵢ·N₍<ᵢ₎ − S₍<ᵢ₎) over the sorted
    histogram with integer cumulatives, and G = Δ / (2·n·S) as ONE IEEE
    division. The rank-based textbook formula miscounts ties; this form
    is exact for any tie structure (pinned in pytest)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.round(batch["l_quantity"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        return (
            pd.DataFrame({"l_returnflag": batch["l_returnflag"].to_numpy(),
                          "v": v})
            .groupby(["l_returnflag", "v"], sort=False)
            .size()
            .reset_index(name="c")
            .astype({"v": np.int64, "c": np.int64})
        )

    def gini(bucket: pd.DataFrame) -> pd.DataFrame:
        hist = (
            bucket.groupby(["l_returnflag", "v"], sort=False)["c"]
            .sum()
            .reset_index()
            .sort_values(["l_returnflag", "v"], kind="stable")
        )
        rows = []
        for flag, g in hist.groupby("l_returnflag", sort=False):
            n, gval = gini_from_histogram(
                g["v"].to_numpy(dtype=np.int64), g["c"].to_numpy(dtype=np.int64)
            )
            rows.append({"l_returnflag": flag, "n_rows": n, "gini": gval})
        out = pd.DataFrame(rows, columns=["l_returnflag", "n_rows", "gini"])
        return out.astype({"n_rows": np.int64})

    return grouped_aggregate(lines, ["l_returnflag"], gini, partial=partial,
                             num_partitions=4)


LINEITEM_QUANTITY_GINI_ORACLE = """
WITH h AS (
  SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS v,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v, c,
         CAST(COALESCE(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_lt,
         CAST(COALESCE(SUM(c * v) OVER (PARTITION BY l_returnflag ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS s_lt
  FROM h
)
SELECT l_returnflag,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(SUM(2 * c * (v * n_lt - s_lt)) AS DOUBLE)
         / CAST(2 * SUM(c) * SUM(c * v) AS DOUBLE) AS gini
FROM cum GROUP BY 1
"""


def events_burstiness(sf_dir: str):
    """Burstiness (Fano factor) of hourly event volume per type:
    variance-to-mean of the per-hour counts over the type's own
    [first, last] hour span, ZERO hours included — 1 ≈ Poisson, ≫1 =
    bursty, the dispersion diagnostic a traffic model checks first.
    Zero hours never materialize: the dense span only contributes its
    LENGTH (max−min+1 from the same histogram), so the whole statistic
    reduces to (n·Σc² − (Σc)²) / (n·Σc) over the domain-bounded
    (type, hour) count table — exact int64 sufficient statistics, one
    closed-form evaluation in double, hash-identical to SQL."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(),
             "hour": ts_ns // 3_600_000_000_000}
        )
        df = df[df["event_type"].notna()]
        return (
            df.groupby(["event_type", "hour"], sort=False)
            .size()
            .reset_index(name="c")
            .astype({"hour": np.int64, "c": np.int64})
        )

    def fano(bucket: pd.DataFrame) -> pd.DataFrame:
        hist = (
            bucket.groupby(["event_type", "hour"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        rows = []
        for etype, g in hist.groupby("event_type", sort=False):
            c = g["c"].to_numpy(dtype=np.int64)
            h = g["hour"].to_numpy(dtype=np.int64)
            n_hours = int(h.max() - h.min() + 1)
            sc = int(c.sum())
            sc2 = int((c * c).sum())
            fano_val = (
                float(np.float64(n_hours * sc2 - sc * sc)
                      / np.float64(n_hours * sc))
                if sc else 0.0
            )
            rows.append({"event_type": etype, "n_hours": n_hours,
                         "n_events": sc, "fano": fano_val})
        out = pd.DataFrame(
            rows, columns=["event_type", "n_hours", "n_events", "fano"]
        )
        return out.astype({"n_hours": np.int64, "n_events": np.int64})

    return grouped_aggregate(events, ["event_type"], fano, partial=partial,
                             num_partitions=4)


EVENTS_BURSTINESS_ORACLE = """
WITH h AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         count(*) AS c
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(MAX(hour) - MIN(hour) + 1 AS BIGINT) AS n_hours,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS sc2
  FROM h GROUP BY 1
)
SELECT event_type, n_hours, sc AS n_events,
       CAST(n_hours * sc2 - sc * sc AS DOUBLE)
         / CAST(n_hours * sc AS DOUBLE) AS fano
FROM s
"""

def events_per_user_distribution(sf_dir: str):
    """Frequency-of-frequencies: how many users produced exactly k
    events — the activity-distribution (and skew-diagnosis) table a
    capacity planner reads before choosing a partitioning key. Double
    groupby: per-user counts are combiner-bounded partials through one
    hash(user) exchange; the second key space is bounded by the
    maximum per-user count, so the histogram is a tiny second
    aggregate."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("user_id", sort=False)
            .size()
            .reset_index(name="n")
            .astype({"user_id": np.int64, "n": np.int64})
        )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("user_id", sort=False)["n"].sum().reset_index()
            .astype({"user_id": np.int64, "n": np.int64})
        )

    counts = grouped_aggregate(events, ["user_id"], per_user, partial=partial)

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("n", sort=False)
            .size()
            .reset_index(name="n_users")
            .rename(columns={"n": "n_events"})
            .astype({"n_events": np.int64, "n_users": np.int64})
        )

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("n_events", sort=False)["n_users"].sum().reset_index()
            .astype({"n_events": np.int64, "n_users": np.int64})
        )

    return grouped_aggregate(counts, ["n_events"], hist, partial=hist_partial,
                             num_partitions=4)


EVENTS_PER_USER_DISTRIBUTION_ORACLE = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
SELECT CAST(n AS BIGINT) AS n_events, count(*) AS n_users
FROM c GROUP BY 1
"""

def user_engagement_profile(sf_dir: str, gap_minutes: int = 30):
    """Per-user engagement profile — sessionization, conversion, and
    duration COMPOSED into one user-level feature row (session count,
    converted-session count, conversion rate, total events, total
    session-time µs): the table a churn model trains on. Everything
    derives inside the SAME single hash(user) bucket pass the
    sessionize family shares — session ids by one cumsum, one
    per-session rollup, one per-user rollup; the rate is a single IEEE
    division of exact ints. The oracle chains the sessionize CTE into
    a two-level aggregate."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )
    gap_ns = np.int64(gap_minutes) * 60 * 1_000_000_000

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        users = g["user_id"].to_numpy()
        types = g["event_type"].fillna("").to_numpy(dtype=object)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_sessions": pd.Series([], dtype=np.int64),
                 "n_converted": pd.Series([], dtype=np.int64),
                 "conversion_rate": pd.Series([], dtype=np.float64),
                 "n_events": pd.Series([], dtype=np.int64),
                 "total_session_us": pd.Series([], dtype=np.int64)}
            )
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            new_user = users[1:] != users[:-1]
            brk[1:] = (new_user | (np.diff(ts) > gap_ns)).astype(np.int64)
        sid = np.cumsum(brk)
        per_sess = (
            pd.DataFrame(
                {"user_id": users, "sid": sid,
                 "ts_us": ts // 1_000,
                 "is_click": (types == "click").astype(np.int64),
                 "is_purchase": (types == "purchase").astype(np.int64)}
            )
            .groupby(["user_id", "sid"], sort=False)
            .agg(n_events=("ts_us", "size"), start=("ts_us", "min"),
                 end=("ts_us", "max"), clicks=("is_click", "sum"),
                 purchases=("is_purchase", "sum"))
            .reset_index()
        )
        per_sess["converted"] = (
            (per_sess["clicks"] > 0) & (per_sess["purchases"] > 0)
        ).astype(np.int64)
        per_sess["dur"] = per_sess["end"] - per_sess["start"]
        out = (
            per_sess.groupby("user_id", sort=False)
            .agg(n_sessions=("sid", "size"), n_converted=("converted", "sum"),
                 n_events=("n_events", "sum"), total_session_us=("dur", "sum"))
            .reset_index()
        )
        out["conversion_rate"] = out["n_converted"].to_numpy(
            dtype=np.float64
        ) / out["n_sessions"].to_numpy(dtype=np.float64)
        return out[["user_id", "n_sessions", "n_converted", "conversion_rate",
                    "n_events", "total_session_us"]].astype(
            {c: np.int64 for c in ("user_id", "n_sessions", "n_converted",
                                   "n_events", "total_session_us")}
        )

    return grouped_aggregate(events, ["user_id"], combine)


USER_ENGAGEMENT_PROFILE_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), per_sess AS (
  SELECT user_id, sid, count(*) AS n_events,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur,
         CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
               AND sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
              THEN 1 ELSE 0 END AS converted
  FROM sess GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       CAST(sum(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS conversion_rate,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(sum(dur) AS BIGINT) AS total_session_us
FROM per_sess GROUP BY 1
"""


def orders_status_aging(sf_dir: str):
    """Aging report: OPEN orders bucketed by age bands (≤30 / ≤60 /
    ≤90 / ≤180 / older days) relative to the corpus's latest order
    date — the reference-date-relative banding every receivables or
    backlog dashboard runs. The reference date is ONE tiny max
    aggregate broadcast as a scalar; the banding scan is shuffle-free
    and the band counts collapse over a 5-key space. Bands are
    half-open on exact integer day arithmetic, identical to the
    oracle's CASE ladder against the same scalar subquery."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_orderdate"]
    )

    def day_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if not len(d):
            return pd.DataFrame({"m": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"m": [int(d.max() // 86_400_000_000)]})

    ref = grouped_aggregate(
        orders,
        ["m"],
        lambda b: pd.DataFrame({"m": [int(b["m"].max())]}) if len(b) else b,
        partial=day_partial,
        num_partitions=1,
    ).to_pandas()
    if ref.empty:
        import pyarrow as pa

        return rd.from_arrow(pa.schema(
            [("age_band", pa.string()), ("n_orders", pa.int64())]).empty_table())
    ref_day = int(ref["m"].max())

    def band(batch: pd.DataFrame) -> pd.DataFrame:
        o = batch[batch["o_orderstatus"] == "O"]
        days = ref_day - (
            o["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        labels = np.select(
            [days <= 30, days <= 60, days <= 90, days <= 180],
            ["0-30", "31-60", "61-90", "91-180"],
            default="180+",
        )
        return (
            pd.DataFrame({"age_band": labels})
            .groupby("age_band", sort=False)
            .size()
            .reset_index(name="n_orders")
            .astype({"n_orders": np.int64})
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("age_band", sort=False)["n_orders"]
            .sum()
            .reset_index()
            .astype({"n_orders": np.int64})
        )

    return grouped_aggregate(orders.map_batches(band, batch_format="pandas"),
                             ["age_band"], final, num_partitions=1)


ORDERS_STATUS_AGING_ORACLE = """
WITH ref AS (
  SELECT CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS m
  FROM orders
), aged AS (
  SELECT ref.m - CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS days
  FROM orders o, ref WHERE o.o_orderstatus = 'O'
)
SELECT CASE WHEN days <= 30 THEN '0-30'
            WHEN days <= 60 THEN '31-60'
            WHEN days <= 90 THEN '61-90'
            WHEN days <= 180 THEN '91-180'
            ELSE '180+' END AS age_band,
       count(*) AS n_orders
FROM aged GROUP BY 1
"""

def type_peak_hour(sf_dir: str):
    """Two-level argmax: for each event type, the hour-of-day with the
    most events (earliest hour wins ties) and its count — 'when does
    each stream peak'. The inner aggregate collapses to the tiny
    (type × 24) key space in the scan's combiner; the outer argmax is
    a vectorized sort + drop_duplicates per bucket — the grouped-argmax
    idiom over an AGGREGATE, not a raw row."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(),
             "hour_of_day": (ts_us // 3_600_000_000) % 24}
        )
        df = df[df["event_type"].notna()]
        return (
            df.groupby(["event_type", "hour_of_day"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"hour_of_day": np.int64, "n": np.int64})
        )

    def argmax(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby(["event_type", "hour_of_day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        best = (
            m.sort_values(["event_type", "n", "hour_of_day"],
                          ascending=[True, False, True], kind="stable")
            .drop_duplicates("event_type")
        )
        return best.rename(
            columns={"hour_of_day": "peak_hour", "n": "n_events"}
        ).astype({"peak_hour": np.int64, "n_events": np.int64})

    return grouped_aggregate(events, ["event_type"], argmax, partial=partial,
                             num_partitions=4)


TYPE_PEAK_HOUR_ORACLE = """
WITH h AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT)
           AS hour_of_day,
         count(*) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
), r AS (
  SELECT event_type, hour_of_day, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hour_of_day ASC) AS rn
  FROM h
)
SELECT event_type, hour_of_day AS peak_hour, CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1
"""


ZORDER_BITS = 16
ZORDER_MASK = (1 << ZORDER_BITS) - 1


def lineitem_zorder_keys(sf_dir: str):
    """Z-order (Morton) clustering keys: the bit-interleave of
    (partkey, suppkey) — the multi-dimensional sort key a lakehouse
    layout uses so range scans on EITHER dimension touch few files.
    Row-local and fully vectorized (16 shift/mask/or steps over the
    whole column at once); keys are masked to 16 bits per dimension
    (the documented domain bound — interleaving is only meaningful
    within a fixed bit budget). The oracle replays the identical
    arithmetic via ``range(0,16)`` bit extraction, so the keys
    hash-match; the downstream ``sort(morton_key)`` is the ordinary
    range-partitioned sort every engine already has."""
    import ray.data as rd

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["l_partkey"].to_numpy(dtype=np.int64) & ZORDER_MASK
        b = batch["l_suppkey"].to_numpy(dtype=np.int64) & ZORDER_MASK
        m = np.zeros(len(a), dtype=np.int64)
        for i in range(ZORDER_BITS):
            m |= ((a >> i) & 1) << (2 * i)
            m |= ((b >> i) & 1) << (2 * i + 1)
        return pd.DataFrame(
            {"l_orderkey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "l_linenumber": batch["l_linenumber"].to_numpy(dtype=np.int64),
             "morton_key": m}
        )

    return lines.map_batches(kernel, batch_format="pandas")


LINEITEM_ZORDER_ORACLE = f"""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST((SELECT SUM(
           (((l_partkey % {ZORDER_MASK + 1}) // CAST(pow(2, i) AS BIGINT)) % 2)
             * CAST(pow(4, i) AS BIGINT)
         + (((l_suppkey % {ZORDER_MASK + 1}) // CAST(pow(2, i) AS BIGINT)) % 2)
             * 2 * CAST(pow(4, i) AS BIGINT))
        FROM unnest(range(0, {ZORDER_BITS})) t(i)) AS BIGINT) AS morton_key
FROM lineitem
"""
def events_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of each type's DENSE hourly count series
    (zeros included) — the temporal-persistence statistic ('does a busy
    hour predict the next one') beside :func:`events_burstiness`'s
    dispersion. Zero hours never materialize: over the dense series
    c_lo..c_hi every sufficient statistic reduces to sums over the
    PRESENT entries of the (type, hour) histogram —
    S=Σc, Q=Σc², P=Σ c_h·c_{h+1} (only ADJACENT-present pairs
    contribute; any pair involving a zero adds 0), endpoint counts
    c_lo/c_hi, and the pair count m = span−1. The Pearson closed form
    over the m lagged pairs then runs ONCE per type in double
    precision, hash-identical to the self-join oracle."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(),
             "hour": ts_ns // 3_600_000_000_000}
        )
        df = df[df["event_type"].notna()]
        return (
            df.groupby(["event_type", "hour"], sort=False)
            .size()
            .reset_index(name="c")
            .astype({"hour": np.int64, "c": np.int64})
        )

    def autocorr(bucket: pd.DataFrame) -> pd.DataFrame:
        hist = (
            bucket.groupby(["event_type", "hour"], sort=False)["c"]
            .sum()
            .reset_index()
            .sort_values(["event_type", "hour"], kind="stable")
        )
        rows = []
        for etype, g in hist.groupby("event_type", sort=False):
            h = g["hour"].to_numpy(dtype=np.int64)
            c = g["c"].to_numpy(dtype=np.int64)
            span = int(h[-1] - h[0] + 1)
            m = span - 1
            s = int(c.sum())
            q = int((c * c).sum())
            adj = h[1:] == h[:-1] + 1
            p = int((c[:-1][adj] * c[1:][adj]).sum())
            c_lo = int(c[0])
            c_hi = int(c[-1])
            sx, sy = s - c_hi, s - c_lo
            qx, qy = q - c_hi * c_hi, q - c_lo * c_lo
            if m <= 0:
                r = 0.0
            else:
                num = np.float64(m) * np.float64(p) - np.float64(sx) * np.float64(sy)
                vx = np.float64(m) * np.float64(qx) - np.float64(sx) * np.float64(sx)
                vy = np.float64(m) * np.float64(qy) - np.float64(sy) * np.float64(sy)
                den = np.sqrt(vx) * np.sqrt(vy)
                r = float(num / den) if den > 0.0 else 0.0
            rows.append({"event_type": etype, "n_pairs": m, "autocorr_lag1": r})
        out = pd.DataFrame(rows, columns=["event_type", "n_pairs", "autocorr_lag1"])
        return out.astype({"n_pairs": np.int64})

    return grouped_aggregate(events, ["event_type"], autocorr, partial=partial,
                             num_partitions=4)


EVENTS_HOURLY_AUTOCORR_ORACLE = """
WITH h AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         count(*) AS c
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         CAST(MAX(a.hour) - MIN(a.hour) AS BIGINT) AS m,
         CAST(SUM(a.c) AS BIGINT) AS s,
         CAST(SUM(a.c * a.c) AS BIGINT) AS q
  FROM h a GROUP BY 1
), p AS (
  SELECT a.event_type, CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS p
  FROM h a LEFT JOIN h b
    ON b.event_type = a.event_type AND b.hour = a.hour + 1
  GROUP BY 1
), ends AS (
  SELECT event_type,
         CAST(MAX(CASE WHEN rn_lo = 1 THEN c END) AS BIGINT) AS c_lo,
         CAST(MAX(CASE WHEN rn_hi = 1 THEN c END) AS BIGINT) AS c_hi
  FROM (
    SELECT event_type, c,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour ASC) AS rn_lo,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour DESC) AS rn_hi
    FROM h
  ) t GROUP BY 1
)
SELECT s.event_type, s.m AS n_pairs,
       CASE WHEN s.m <= 0 THEN 0.0
            WHEN sqrt(CAST(s.m AS DOUBLE) * CAST(s.q - ends.c_hi * ends.c_hi AS DOUBLE)
                      - CAST(s.s - ends.c_hi AS DOUBLE) * CAST(s.s - ends.c_hi AS DOUBLE))
                 * sqrt(CAST(s.m AS DOUBLE) * CAST(s.q - ends.c_lo * ends.c_lo AS DOUBLE)
                        - CAST(s.s - ends.c_lo AS DOUBLE) * CAST(s.s - ends.c_lo AS DOUBLE)) > 0
            THEN (CAST(s.m AS DOUBLE) * CAST(p.p AS DOUBLE)
                  - CAST(s.s - ends.c_hi AS DOUBLE) * CAST(s.s - ends.c_lo AS DOUBLE))
                 / (sqrt(CAST(s.m AS DOUBLE) * CAST(s.q - ends.c_hi * ends.c_hi AS DOUBLE)
                         - CAST(s.s - ends.c_hi AS DOUBLE) * CAST(s.s - ends.c_hi AS DOUBLE))
                    * sqrt(CAST(s.m AS DOUBLE) * CAST(s.q - ends.c_lo * ends.c_lo AS DOUBLE)
                           - CAST(s.s - ends.c_lo AS DOUBLE) * CAST(s.s - ends.c_lo AS DOUBLE)))
            ELSE 0.0 END AS autocorr_lag1
FROM s JOIN p ON p.event_type = s.event_type
JOIN ends ON ends.event_type = s.event_type
"""


def q3_unshipped_revenue(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H-Q3-shaped composition: top-k orders by unshipped revenue
    for one market segment — the canonical 3-table analytic join
    (dimension filter → fact semi-join → fact-fact join → grouped
    aggregate → top-k), here in ONE bucketed exchange plus a tiny
    final merge.

    Plan: the filtered customer keys are a DIMENSION-sized side, so
    they broadcast once via ``ray.put`` and prune orders per batch
    (np.isin) — the trade documented at ``orders_customer_join``:
    broadcast while the filtered dim fits worker heap (~GBs at 100 TB
    for one segment), else flip to the bucketed semi-join shape of
    ``customers_with_urgent_orders``. Lineitem pre-aggregates revenue
    per order inside each batch (partial combine) BEFORE the exchange,
    so the shuffle carries one row per (batch, order), not per line
    item. Orders and lineitem partials meet keyed on hash(orderkey);
    each bucket joins, sums, and emits only its LOCAL top-k — the
    final merge sorts ≤ buckets·k rows.

    Revenue is integer-exact: ``Σ cents(extprice) · (100 −
    pct(discount))`` in 10^-4 currency units (both factors 2-decimal
    ⇒ round is exact; int64 bound ~9e18 admits ~10^12 units/order).
    The order date leaves as an ISO string so both engines hash the
    same value."""
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    cut = pd.Timestamp(cutoff)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"c_custkey": b.loc[b["c_mktsegment"] == segment, "c_custkey"]
                .to_numpy(dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    from entity_extractor_linker_ray.ops.shuffle import collect_small

    keys_ref = ray.put(
        np.sort(collect_small(cust, ["c_custkey"])["c_custkey"]
                .to_numpy(dtype=np.int64))
    )

    class TagOrders:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            f = batch[
                (batch["o_orderdate"] < cut)
                & np.isin(batch["o_custkey"].to_numpy(dtype=np.int64), self.keys)
            ]
            return pd.DataFrame(
                {"okey": f["o_orderkey"].to_numpy(dtype=np.int64),
                 "o_orderdate": f["o_orderdate"].dt.strftime("%Y-%m-%d").to_numpy(),
                 "o_orderpriority": f["o_orderpriority"].astype(str).to_numpy(),
                 "revenue_c4": np.zeros(len(f), dtype=np.int64),
                 "side": np.zeros(len(f), dtype=np.int64)}
            )

    def tag_lines(batch: pd.DataFrame) -> pd.DataFrame:
        f = batch[batch["l_shipdate"] > cut]
        cents = np.round(
            f["l_extendedprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        pct = np.round(f["l_discount"].to_numpy(dtype=np.float64) * 100).astype(
            np.int64
        )
        df = pd.DataFrame(
            {"okey": f["l_orderkey"].to_numpy(dtype=np.int64),
             "revenue_c4": cents * (100 - pct)}
        )
        part = df.groupby("okey", sort=False)["revenue_c4"].sum().reset_index()
        return pd.DataFrame(
            {"okey": part["okey"].to_numpy(dtype=np.int64),
             "o_orderdate": np.full(len(part), "", dtype=object),
             "o_orderpriority": np.full(len(part), "", dtype=object),
             "revenue_c4": part["revenue_c4"].to_numpy(dtype=np.int64),
             "side": np.ones(len(part), dtype=np.int64)}
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(TagOrders, batch_format="pandas", concurrency=(1, 8))
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(tag_lines, batch_format="pandas")

    def local_topk(bucket: pd.DataFrame) -> pd.DataFrame:
        o = bucket[bucket["side"] == 0]
        rev = (
            bucket[bucket["side"] == 1]
            .groupby("okey", sort=False)["revenue_c4"].sum().reset_index()
        )
        joined = o[["okey", "o_orderdate", "o_orderpriority"]].merge(
            rev, on="okey", how="inner"
        )
        top = joined.sort_values(
            ["revenue_c4", "okey"], ascending=[False, True], kind="stable"
        ).head(k)
        return pd.DataFrame(
            {"o_orderkey": top["okey"].to_numpy(dtype=np.int64),
             "revenue_c4": top["revenue_c4"].to_numpy(dtype=np.int64),
             "o_orderdate": top["o_orderdate"].to_numpy(),
             "o_orderpriority": top["o_orderpriority"].to_numpy()}
        )

    partials = grouped_aggregate(orders.union(lines), ["okey"], local_topk,
                                 num_partitions=16)

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["revenue_c4", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(k)

    import pyarrow as pa

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("revenue_c4", pa.int64()),
         ("o_orderdate", pa.string()), ("o_orderpriority", pa.string())]
    )
    return partials.repartition(1).map_batches(
        final, batch_format="pandas"
    ).union(rd.from_arrow(out_schema.empty_table()))


def q3_unshipped_revenue_oracle(segment: str = "BUILDING",
                                cutoff: str = "1998-06-01", k: int = 10) -> str:
    return f"""
WITH l AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_c4
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff}'
  GROUP BY 1
)
SELECT o.o_orderkey,
       CAST(l.revenue_c4 AS BIGINT) AS revenue_c4,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{segment}' AND o.o_orderdate < TIMESTAMP '{cutoff}'
ORDER BY revenue_c4 DESC, o.o_orderkey ASC
LIMIT {k}
"""


def orders_below_customer_avg(sf_dir: str):
    """Decorrelated correlated subquery: orders strictly below their
    own customer's average order value — the ``WHERE x < (SELECT
    AVG(...) ... correlated)`` pattern every SQL engine decorrelates
    into a grouped aggregate + self join. Here both roles ride ONE
    bucketed exchange on hash(custkey): each bucket holds a customer's
    complete order set, so the per-customer sum/count and the filter
    happen in one vectorized transform — and the comparison is
    INTEGER-exact (``cents·n < Σcents`` instead of a float average),
    so no rounding mode can flip a boundary row."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderkey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "o_custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "total_cents": np.round(
                 batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64)}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_custkey", sort=False)["total_cents"]
        stats = g.agg(["sum", "size"]).rename(
            columns={"sum": "cust_sum_cents", "size": "cust_n_orders"}
        )
        j = bucket.join(stats, on="o_custkey")
        keep = j[j["total_cents"] * j["cust_n_orders"] < j["cust_sum_cents"]]
        return pd.DataFrame(
            {"o_orderkey": keep["o_orderkey"].to_numpy(dtype=np.int64),
             "o_custkey": keep["o_custkey"].to_numpy(dtype=np.int64),
             "total_cents": keep["total_cents"].to_numpy(dtype=np.int64),
             "cust_n_orders": keep["cust_n_orders"].to_numpy(dtype=np.int64),
             "cust_sum_cents": keep["cust_sum_cents"].to_numpy(dtype=np.int64)}
        )

    prepped = orders.map_batches(prep, batch_format="pandas")
    return grouped_aggregate(prepped, ["o_custkey"], combine, num_partitions=16)


ORDERS_BELOW_CUSTOMER_AVG_ORACLE = """
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders
),
s AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS cust_n_orders,
         SUM(total_cents) AS cust_sum_cents
  FROM c GROUP BY 1
)
SELECT c.o_orderkey, c.o_custkey, c.total_cents,
       s.cust_n_orders, CAST(s.cust_sum_cents AS BIGINT) AS cust_sum_cents
FROM c JOIN s ON s.o_custkey = c.o_custkey
WHERE c.total_cents * s.cust_n_orders < s.cust_sum_cents
"""


def customer_order_counts(sf_dir: str):
    """TPC-H-Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers — the LEFT-JOIN subtlety a naive
    fact-side groupby silently drops (customers who never ordered
    vanish, skewing the c_count=0 bucket that retention analyses care
    about most).

    Both roles ride ONE bucketed exchange on hash(custkey): customer
    markers and per-batch order-count partials meet in the bucket,
    every marker gets its summed count (0 when no order rows arrived),
    and the bucket pre-combines to (c_count, n) partial rows — so the
    second exchange is DOMAIN-bounded (distinct order counts, hundreds
    at any scale), not customer-bounded. All-integer ⇒ hash-exact."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"custkey": b["c_custkey"].to_numpy(dtype=np.int64),
             "cnt": np.zeros(len(b), dtype=np.int64),
             "side": np.zeros(len(b), dtype=np.int64)}
        ),
        batch_format="pandas",
    )

    def order_partial(batch: pd.DataFrame) -> pd.DataFrame:
        part = (
            pd.DataFrame({"custkey": batch["o_custkey"].to_numpy(dtype=np.int64)})
            .groupby("custkey", sort=False).size().reset_index(name="cnt")
        )
        return pd.DataFrame(
            {"custkey": part["custkey"].to_numpy(dtype=np.int64),
             "cnt": part["cnt"].to_numpy(dtype=np.int64),
             "side": np.ones(len(part), dtype=np.int64)}
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(order_partial, batch_format="pandas")

    def per_customer(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("custkey", sort=False)
            .agg(cnt=("cnt", "sum"), has_cust=("side", "min"))
            .reset_index()
        )
        # side: 0=customer marker, 1=order partial; min==0 <=> marker
        # present, i.e. INNER on the customer dimension (orders whose
        # custkey is absent from customer are dropped, like the oracle)
        counts = g.loc[g["has_cust"] == 0, "cnt"].to_numpy(dtype=np.int64)
        out = (
            pd.DataFrame({"c_count": counts})
            .groupby("c_count", sort=False).size().reset_index(name="n")
        )
        return out.astype({"c_count": np.int64, "n": np.int64})

    per_cust = grouped_aggregate(
        cust.union(orders), ["custkey"], per_customer, num_partitions=16,
    )

    def dist(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby("c_count", sort=False)["n"].sum()
            .reset_index(name="n_customers")
        )
        return out.astype({"c_count": np.int64, "n_customers": np.int64})

    return grouped_aggregate(per_cust, ["c_count"], dist, num_partitions=4)


CUSTOMER_ORDER_COUNTS_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust GROUP BY 1
"""


def promo_revenue_share(sf_dir: str):
    """TPC-H-Q14 shape: per ship month, the revenue fraction earned by
    promo-type parts. The part dimension collapses to a sorted promo
    partkey array broadcast ONCE via ``ray.put`` (at 100 TB the fact
    table is the 10^10 side; the filtered dimension stays ~GBs), so
    lineitem needs NO join — one ``np.isin`` per batch splits revenue
    into promo/total partial sums and the exchange is month-bounded
    (hundreds of groups at any scale).

    Revenue uses the exact 10^-4-unit integers of
    :func:`q3_unshipped_revenue`; the share is ONE closed-form double
    expression over two exact int64s, written identically here and in
    the oracle (``100.0 * promo / total``), so the float column
    hash-matches bit-exactly."""
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    promo = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"p_partkey": b.loc[b["p_type"] == "PROMO", "p_partkey"]
                .to_numpy(dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    promo_ref = ray.put(
        np.sort(collect_small(promo, ["p_partkey"])["p_partkey"]
                .to_numpy(dtype=np.int64))
    )

    class MonthPartial:
        def __init__(self):
            self.promo_keys = ray.get(promo_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            cents = np.round(
                batch["l_extendedprice"].to_numpy(dtype=np.float64) * 100
            ).astype(np.int64)
            pct = np.round(
                batch["l_discount"].to_numpy(dtype=np.float64) * 100
            ).astype(np.int64)
            rev = cents * (100 - pct)
            is_promo = np.isin(
                batch["l_partkey"].to_numpy(dtype=np.int64), self.promo_keys
            )
            df = pd.DataFrame(
                {"ship_month": batch["l_shipdate"].dt.strftime("%Y-%m"),
                 "promo_rev_c4": np.where(is_promo, rev, 0),
                 "total_rev_c4": rev}
            )
            return (
                df.groupby("ship_month", sort=False)
                .agg(promo_rev_c4=("promo_rev_c4", "sum"),
                     total_rev_c4=("total_rev_c4", "sum"))
                .reset_index()
            )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(MonthPartial, batch_format="pandas", concurrency=(1, 8))

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby("ship_month", sort=False)
            .agg(promo_rev_c4=("promo_rev_c4", "sum"),
                 total_rev_c4=("total_rev_c4", "sum"))
            .reset_index()
        )
        promo_f = m["promo_rev_c4"].to_numpy(dtype=np.int64)
        total_f = m["total_rev_c4"].to_numpy(dtype=np.int64)
        m["promo_share_pct"] = (
            100.0 * promo_f.astype(np.float64) / total_f.astype(np.float64)
        )
        return m.astype({"promo_rev_c4": np.int64, "total_rev_c4": np.int64})

    return grouped_aggregate(lines, ["ship_month"], combine, num_partitions=4)


PROMO_REVENUE_SHARE_ORACLE = """
WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
l AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4,
         CASE WHEN l_partkey IN (SELECT p_partkey FROM promo)
              THEN 1 ELSE 0 END AS is_promo
  FROM lineitem
)
SELECT ship_month,
       CAST(SUM(CASE WHEN is_promo = 1 THEN rev_c4 ELSE 0 END) AS BIGINT)
         AS promo_rev_c4,
       CAST(SUM(rev_c4) AS BIGINT) AS total_rev_c4,
       100.0 * CAST(SUM(CASE WHEN is_promo = 1 THEN rev_c4 ELSE 0 END)
                    AS DOUBLE)
             / CAST(SUM(rev_c4) AS DOUBLE) AS promo_share_pct
FROM l GROUP BY 1
"""


def q18_large_volume_customers(sf_dir: str, min_qty: int = 250):
    """TPC-H-Q18 shape: orders whose TOTAL line quantity reaches
    ``min_qty`` units, with the owning customer attached — the
    "find the whales" HAVING-on-a-join pattern. Two bucketed
    exchanges, both with per-batch partial combines:

    1. hash(orderkey): lineitem quantity partials (pre-summed per
       batch, so the wire carries one row per (batch, order)) meet
       order rows; the bucket sums and keeps only qualifying orders —
       the HAVING filter runs WHERE the data is, so the second
       exchange carries survivors only (~1% of orders at the default
       threshold);
    2. hash(custkey): survivors meet customer names (tagged union) —
       the scale-safe alternative to broadcasting the customer
       dimension, which unlike a filtered segment grows WITH the
       corpus.

    Quantities compare as exact 10^-2-unit integers
    (``sum_qty_c2 >= min_qty·100``), so no float sum can flip a
    boundary order."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def line_partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = np.round(
            batch["l_quantity"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        part = (
            pd.DataFrame(
                {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64),
                 "qty_c2": q}
            )
            .groupby("okey", sort=False)["qty_c2"].sum().reset_index()
        )
        return pd.DataFrame(
            {"okey": part["okey"].to_numpy(dtype=np.int64),
             "custkey": np.zeros(len(part), dtype=np.int64),
             "total_cents": np.zeros(len(part), dtype=np.int64),
             "qty_c2": part["qty_c2"].to_numpy(dtype=np.int64),
             "side": np.zeros(len(part), dtype=np.int64)}
        )

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"okey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "total_cents": np.round(
                 batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "qty_c2": np.zeros(len(batch), dtype=np.int64),
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(line_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(order_rows, batch_format="pandas")

    cut_c2 = int(min_qty) * 100

    def qualify(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("okey", sort=False)
            .agg(custkey=("custkey", "max"), total_cents=("total_cents", "max"),
                 qty_c2=("qty_c2", "sum"), has_order=("side", "max"))
            .reset_index()
        )
        keep = g[(g["has_order"] == 1) & (g["qty_c2"] >= cut_c2)]
        return pd.DataFrame(
            {"o_orderkey": keep["okey"].to_numpy(dtype=np.int64),
             "o_custkey": keep["custkey"].to_numpy(dtype=np.int64),
             "total_cents": keep["total_cents"].to_numpy(dtype=np.int64),
             "sum_qty_c2": keep["qty_c2"].to_numpy(dtype=np.int64)}
        )

    survivors = grouped_aggregate(
        lines.union(orders), ["okey"], qualify, num_partitions=16,
    )

    def surv_keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "o_orderkey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "total_cents": batch["total_cents"].to_numpy(dtype=np.int64),
             "sum_qty_c2": batch["sum_qty_c2"].to_numpy(dtype=np.int64),
             "c_name": np.full(len(batch), "", dtype=object)}
        )

    def cust_keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": batch["c_custkey"].to_numpy(dtype=np.int64),
             "o_orderkey": np.full(len(batch), -1, dtype=np.int64),
             "total_cents": np.zeros(len(batch), dtype=np.int64),
             "sum_qty_c2": np.zeros(len(batch), dtype=np.int64),
             "c_name": batch["c_name"].astype(str).to_numpy()}
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(cust_keyed, batch_format="pandas")

    def attach_name(bucket: pd.DataFrame) -> pd.DataFrame:
        names = (
            bucket.loc[bucket["o_orderkey"] < 0]
            .drop_duplicates("custkey").set_index("custkey")["c_name"]
        )
        e = bucket[bucket["o_orderkey"] >= 0]
        mapped = e["custkey"].map(names)
        keep = mapped.notna().to_numpy()
        e = e[keep]
        return pd.DataFrame(
            {"o_orderkey": e["o_orderkey"].to_numpy(dtype=np.int64),
             "o_custkey": e["custkey"].to_numpy(dtype=np.int64),
             "c_name": mapped[keep].to_numpy(),
             "total_cents": e["total_cents"].to_numpy(dtype=np.int64),
             "sum_qty_c2": e["sum_qty_c2"].to_numpy(dtype=np.int64)}
        )

    out = grouped_aggregate(
        survivors.map_batches(surv_keyed, batch_format="pandas").union(cust),
        ["custkey"], attach_name, num_partitions=16,
    )
    import pyarrow as pa

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("c_name", pa.string()), ("total_cents", pa.int64()),
         ("sum_qty_c2", pa.int64())]
    )
    return out.union(rd.from_arrow(out_schema.empty_table()))


def q18_large_volume_customers_oracle(min_qty: int = 250) -> str:
    return f"""
WITH s AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c2
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) >= {int(min_qty) * 100}
)
SELECT o.o_orderkey, o.o_custkey, c.c_name,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       s.sum_qty_c2
FROM s
JOIN orders o ON o.o_orderkey = s.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


def top_parts_per_brand(sf_dir: str, n: int = 3):
    """Per-group top-N — the ``ROW_NUMBER() OVER (PARTITION BY ...)
    <= n`` pattern: the n priciest parts per brand, ranked. ONE
    bucketed exchange on hash(brand); each bucket runs a vectorized
    sort + per-group head, emitting ≤ n rows per brand, so output is
    group-bounded regardless of corpus size. Ordering is total —
    (price_c2 desc, partkey asc) on exact integer cents — so the rank
    column and the selected rows match the oracle row-for-row."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"p_brand": batch["p_brand"].astype(str).to_numpy(),
             "p_partkey": batch["p_partkey"].to_numpy(dtype=np.int64),
             "price_c2": np.round(
                 batch["p_retailprice"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64)}
        )

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_brand", "p_partkey", "p_retailprice"],
    ).map_batches(prep, batch_format="pandas")

    def topn(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(
            ["p_brand", "price_c2", "p_partkey"],
            ascending=[True, False, True], kind="stable",
        )
        b = b.groupby("p_brand", sort=False).head(n).copy()
        b["rn"] = b.groupby("p_brand", sort=False).cumcount().to_numpy() + 1
        return b.astype({"rn": np.int64})

    return grouped_aggregate(parts, ["p_brand"], topn, num_partitions=8)


def top_parts_per_brand_oracle(n: int = 3) -> str:
    return f"""
WITH ranked AS (
  SELECT p_brand,
         p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c2,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p_brand
           ORDER BY CAST(round(p_retailprice * 100) AS BIGINT) DESC,
                    p_partkey ASC
         ) AS BIGINT) AS rn
  FROM part
)
SELECT p_brand, p_partkey, price_c2, rn FROM ranked WHERE rn <= {n}
"""


def daily_type_pairs(sf_dir: str):
    """Market-basket co-occurrence: for every pair of event types,
    how many (user, day) baskets contain BOTH, with each type's solo
    basket count and the lift ratio — the association-rule support /
    lift primitive over behavioral logs.

    One row-scale exchange does all the heavy lifting: distinct
    (user, day, type) partials (deduped per batch) meet on
    hash(user, day); each basket-complete bucket emits pre-counted
    PAIR rows (t1 < t2), SINGLE rows, and a basket-count row in one
    tagged frame. The second exchange is DOMAIN-bounded (pairs of
    distinct event types — dozens², at any corpus size), after which
    a single-partition final pivots singles into pairs and computes
    ``lift = n_baskets·n_pairs / (n_t1·n_t2)`` — one closed-form
    double over exact int64 products, identical in the oracle (the
    int64 products bound the domain to ~3·10^9 baskets · max support,
    plenty past any real log)."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def distinct_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(dtype=np.int64),
             "day": batch["ts"].dt.strftime("%Y-%m-%d"),
             "event_type": batch["event_type"].astype(str)}
        ).drop_duplicates()

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(distinct_partial, batch_format="pandas")

    def basket_rows(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates()
        outs = []
        n_baskets = 0
        for _, grp in b.groupby(["user_id", "day"], sort=False):
            n_baskets += 1
            types = np.sort(grp["event_type"].unique())
            outs.append(pd.DataFrame(
                {"t1": types, "t2": "", "kind": np.int64(1)}))
            if len(types) >= 2:
                ia, ib = np.triu_indices(len(types), k=1)
                outs.append(pd.DataFrame(
                    {"t1": types[ia], "t2": types[ib], "kind": np.int64(0)}))
        outs.append(pd.DataFrame(
            {"t1": [""], "t2": [""], "kind": np.int64(2)}))
        allr = pd.concat(outs, ignore_index=True)
        allr.loc[allr["kind"] == 2, "cnt"] = n_baskets
        out = (
            allr.groupby(["t1", "t2", "kind"], sort=False)
            .size().reset_index(name="n")
        )
        out.loc[out["kind"] == 2, "n"] = n_baskets
        return out.astype({"kind": np.int64, "n": np.int64})

    tagged = grouped_aggregate(
        ev, ["user_id", "day"], basket_rows, num_partitions=16,
    )

    def sum_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby(["t1", "t2", "kind"], sort=False)["n"].sum()
            .reset_index()
        )
        return out.astype({"kind": np.int64, "n": np.int64})

    small = grouped_aggregate(tagged, ["t1", "t2", "kind"], sum_counts,
                              num_partitions=4)

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["t1", "t2", "kind"], sort=False)["n"].sum().reset_index()
        n_baskets = int(g.loc[g["kind"] == 2, "n"].sum())
        singles = g[g["kind"] == 1].set_index("t1")["n"]
        pairs = g[g["kind"] == 0]
        if not len(pairs):
            return pd.DataFrame(
                {"t1": pd.Series([], dtype=str), "t2": pd.Series([], dtype=str),
                 "n_pairs": pd.Series([], dtype=np.int64),
                 "n_t1": pd.Series([], dtype=np.int64),
                 "n_t2": pd.Series([], dtype=np.int64),
                 "lift": pd.Series([], dtype=np.float64)}
            )
        c1 = pairs["t1"].map(singles).to_numpy(dtype=np.int64)
        c2 = pairs["t2"].map(singles).to_numpy(dtype=np.int64)
        c12 = pairs["n"].to_numpy(dtype=np.int64)
        lift = (n_baskets * c12).astype(np.float64) / (c1 * c2).astype(np.float64)
        return pd.DataFrame(
            {"t1": pairs["t1"].to_numpy(), "t2": pairs["t2"].to_numpy(),
             "n_pairs": c12, "n_t1": c1, "n_t2": c2, "lift": lift}
        )

    out_schema = pa.schema(
        [("t1", pa.string()), ("t2", pa.string()), ("n_pairs", pa.int64()),
         ("n_t1", pa.int64()), ("n_t2", pa.int64()), ("lift", pa.float64())]
    )
    return small.repartition(1).map_batches(
        finalize, batch_format="pandas"
    ).union(rd.from_arrow(out_schema.empty_table()))


DAILY_TYPE_PAIRS_ORACLE = """
WITH b AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type
  FROM events
),
baskets AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM (
    SELECT DISTINCT user_id, day FROM b
  ) x
),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1
),
pairs AS (
  SELECT b1.event_type AS t1, b2.event_type AS t2,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM b b1
  JOIN b b2 ON b2.user_id = b1.user_id AND b2.day = b1.day
           AND b1.event_type < b2.event_type
  GROUP BY 1, 2
)
SELECT p.t1, p.t2, p.n_pairs,
       s1.c AS n_t1, s2.c AS n_t2,
       CAST((SELECT n FROM baskets) * p.n_pairs AS DOUBLE)
         / CAST(s1.c * s2.c AS DOUBLE) AS lift
FROM pairs p
JOIN singles s1 ON s1.event_type = p.t1
JOIN singles s2 ON s2.event_type = p.t2
"""


def supplier_revenue_rank(sf_dir: str):
    """Suppliers ranked WITHIN their nation by lineitem revenue —
    the RANK() OVER (PARTITION BY) leaderboard where ties share a
    rank (exact integer revenue makes tie-sharing deterministic,
    unlike a float sum whose accumulation order could split a tie).
    Suppliers with no line items stay in the board at revenue 0
    (LEFT semantics, all sharing the bottom rank).

    Two bucketed exchanges: (1) hash(suppkey) — per-batch revenue
    partials meet supplier rows, LEFT-merged so zero-revenue
    suppliers survive; (2) hash(nationkey) — each nation's complete
    roster ranks vectorized (``rank(method='min')`` ≡ SQL RANK()).
    Nation cardinality is domain-bounded but the shape stays bucketed
    — a skewed nation is still one bucket's vectorized sort, not a
    driver collect."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def line_partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            batch["l_extendedprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        pct = np.round(
            batch["l_discount"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {"suppkey": batch["l_suppkey"].to_numpy(dtype=np.int64),
             "revenue_c4": cents * (100 - pct)}
        )
        part = df.groupby("suppkey", sort=False)["revenue_c4"].sum().reset_index()
        return pd.DataFrame(
            {"suppkey": part["suppkey"].to_numpy(dtype=np.int64),
             "nationkey": np.full(len(part), -1, dtype=np.int64),
             "s_name": np.full(len(part), "", dtype=object),
             "revenue_c4": part["revenue_c4"].to_numpy(dtype=np.int64)}
        )

    def supp_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"suppkey": batch["s_suppkey"].to_numpy(dtype=np.int64),
             "nationkey": batch["s_nationkey"].to_numpy(dtype=np.int64),
             "s_name": batch["s_name"].astype(str).to_numpy(),
             "revenue_c4": np.zeros(len(batch), dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pandas")
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).map_batches(supp_rows, batch_format="pandas")

    def per_supplier(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("suppkey", sort=False)
            .agg(nationkey=("nationkey", "max"), s_name=("s_name", "max"),
                 revenue_c4=("revenue_c4", "sum"))
            .reset_index()
        )
        keep = g[g["nationkey"] >= 0]  # only real suppliers (LEFT base)
        return pd.DataFrame(
            {"suppkey": keep["suppkey"].to_numpy(dtype=np.int64),
             "nationkey": keep["nationkey"].to_numpy(dtype=np.int64),
             "s_name": keep["s_name"].to_numpy(),
             "revenue_c4": keep["revenue_c4"].to_numpy(dtype=np.int64)}
        )

    per_supp = grouped_aggregate(
        lines.union(supp), ["suppkey"], per_supplier, num_partitions=16,
    )

    def rank_in_nation(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.copy()
        b["rk"] = (
            b.groupby("nationkey", sort=False)["revenue_c4"]
            .rank(method="min", ascending=False).astype(np.int64)
        )
        return pd.DataFrame(
            {"s_nationkey": b["nationkey"].to_numpy(dtype=np.int64),
             "s_suppkey": b["suppkey"].to_numpy(dtype=np.int64),
             "s_name": b["s_name"].to_numpy(),
             "revenue_c4": b["revenue_c4"].to_numpy(dtype=np.int64),
             "rk": b["rk"].to_numpy(dtype=np.int64)}
        )

    return grouped_aggregate(per_supp, ["nationkey"], rank_in_nation,
                             num_partitions=8)


SUPPLIER_REVENUE_RANK_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_c4
  FROM lineitem GROUP BY 1
),
board AS (
  SELECT s.s_nationkey, s.s_suppkey, s.s_name,
         CAST(COALESCE(r.revenue_c4, 0) AS BIGINT) AS revenue_c4
  FROM supplier s LEFT JOIN rev r ON r.l_suppkey = s.s_suppkey
)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, s_suppkey, s_name,
       revenue_c4,
       CAST(RANK() OVER (
         PARTITION BY s_nationkey ORDER BY revenue_c4 DESC
       ) AS BIGINT) AS rk
FROM board
"""


def revenue_concentration_deciles(sf_dir: str):
    """Revenue concentration (Lorenz-curve points): customers cut
    into VALUE-based deciles of lifetime revenue, with each decile's
    headcount, exact revenue, and cumulative revenue share — the
    "what fraction of revenue do the top X% hold" report behind every
    80/20 analysis, and the tabular form of :func:`lineitem_quantity_gini`'s
    scalar.

    Same three-stage composition as :func:`customer_rfm`: (1) one
    fact-scan combiner to per-customer exact centi-revenue; (2) decile
    cuts p10..p90 as the discrete k = ceil(p·N) walk over the revenue
    value histogram (VALUE cuts, not NTILE positions, so ties land in
    the same decile and the result is order/partitioning-independent);
    (3) a shuffle-free scoring scan, a decile-bounded aggregate, and a
    10-row final that forms cumulative sums in int64 and the share as
    one closed-form double division — bit-exact vs the oracle."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = np.round(
            batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
                 "revenue_centi": rev}
            )
            .groupby("custkey", sort=False)["revenue_centi"].sum().reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("custkey", sort=False)["revenue_centi"].sum()
            .reset_index()
            .astype({"custkey": np.int64, "revenue_centi": np.int64})
        )

    per_cust = grouped_aggregate(orders, ["custkey"], combine,
                                 partial=partial).materialize()

    out_schema = pa.schema(
        [("decile", pa.int64()), ("n_customers", pa.int64()),
         ("revenue_centi", pa.int64()), ("cum_share", pa.float64())]
    )
    if per_cust.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("revenue_centi", sort=False).size().reset_index(name="n")
            .astype({"revenue_centi": np.int64, "n": np.int64})
        )

    def hist_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("revenue_centi", sort=False)["n"].sum().reset_index()
            .astype({"revenue_centi": np.int64, "n": np.int64})
        )

    hist = (
        grouped_aggregate(per_cust, ["revenue_centi"], hist_sum,
                          partial=hist_partial, num_partitions=8)
        .to_pandas()
        .sort_values("revenue_centi", kind="stable")
    )
    cum = hist["n"].to_numpy(dtype=np.int64).cumsum()
    vals = hist["revenue_centi"].to_numpy(dtype=np.int64)
    total_n = int(cum[-1])
    cuts = np.array(
        [int(vals[np.searchsorted(cum, (k * total_n + 9) // 10, side="left")])
         for k in range(1, 10)],
        dtype=np.int64,
    )

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        rev = batch["revenue_centi"].to_numpy(dtype=np.int64)
        dec = (np.searchsorted(cuts, rev, side="left") + 1).astype(np.int64)
        part = (
            pd.DataFrame({"decile": dec, "n_customers": np.int64(1),
                          "revenue_centi": rev})
            .groupby("decile", sort=False)
            .agg(n_customers=("n_customers", "sum"),
                 revenue_centi=("revenue_centi", "sum"))
            .reset_index()
        )
        return part

    per_decile = grouped_aggregate(
        per_cust.map_batches(assign, batch_format="pandas"),
        ["decile"],
        lambda b: b.groupby("decile", sort=False)
        .agg(n_customers=("n_customers", "sum"),
             revenue_centi=("revenue_centi", "sum"))
        .reset_index()
        .astype({"decile": np.int64, "n_customers": np.int64,
                 "revenue_centi": np.int64}),
        num_partitions=4,
    )

    def lorenz(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values("decile", kind="stable").reset_index(drop=True)
        cum_rev = b["revenue_centi"].to_numpy(dtype=np.int64).cumsum()
        total = int(cum_rev[-1]) if len(cum_rev) else 0
        share = (
            cum_rev.astype(np.float64) / np.float64(total)
            if total else np.zeros(len(b))
        )
        b["cum_share"] = share
        return b

    return per_decile.repartition(1).map_batches(
        lorenz, batch_format="pandas"
    ).union(rd.from_arrow(out_schema.empty_table()))


REVENUE_CONCENTRATION_DECILES_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_centi
  FROM orders GROUP BY 1
),
rr AS (SELECT revenue_centi AS v,
              ROW_NUMBER() OVER (ORDER BY revenue_centi) AS rn,
              COUNT(*) OVER () AS n FROM per_cust),
cuts AS (SELECT
  MIN(CASE WHEN rn = (1*n + 9) // 10 THEN v END) AS c1,
  MIN(CASE WHEN rn = (2*n + 9) // 10 THEN v END) AS c2,
  MIN(CASE WHEN rn = (3*n + 9) // 10 THEN v END) AS c3,
  MIN(CASE WHEN rn = (4*n + 9) // 10 THEN v END) AS c4,
  MIN(CASE WHEN rn = (5*n + 9) // 10 THEN v END) AS c5,
  MIN(CASE WHEN rn = (6*n + 9) // 10 THEN v END) AS c6,
  MIN(CASE WHEN rn = (7*n + 9) // 10 THEN v END) AS c7,
  MIN(CASE WHEN rn = (8*n + 9) // 10 THEN v END) AS c8,
  MIN(CASE WHEN rn = (9*n + 9) // 10 THEN v END) AS c9 FROM rr),
scored AS (
  SELECT CAST(CASE
    WHEN p.revenue_centi <= c.c1 THEN 1 WHEN p.revenue_centi <= c.c2 THEN 2
    WHEN p.revenue_centi <= c.c3 THEN 3 WHEN p.revenue_centi <= c.c4 THEN 4
    WHEN p.revenue_centi <= c.c5 THEN 5 WHEN p.revenue_centi <= c.c6 THEN 6
    WHEN p.revenue_centi <= c.c7 THEN 7 WHEN p.revenue_centi <= c.c8 THEN 8
    WHEN p.revenue_centi <= c.c9 THEN 9 ELSE 10 END AS BIGINT) AS decile,
    p.revenue_centi
  FROM per_cust p, cuts c
),
agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(SUM(revenue_centi) AS BIGINT) AS revenue_centi
  FROM scored GROUP BY 1
)
SELECT decile, n_customers, revenue_centi,
       CAST(SUM(revenue_centi) OVER (ORDER BY decile) AS DOUBLE)
         / CAST((SELECT SUM(revenue_centi) FROM agg) AS DOUBLE) AS cum_share
FROM agg
"""


def q6_forecast_revenue(sf_dir: str, year: int = 1997,
                        disc_lo_c2: int = 2, disc_hi_c2: int = 4,
                        max_qty: float = 24.0):
    """TPC-H Q6 shape — the forecasting-revenue-change filter-sum: one
    global SUM over lineitem rows shipped in ``year`` with a discount
    in a small band and quantity under a cutoff. The cheapest possible
    distributed shape: predicate + partial sum inside ``map_batches``
    (one int64 row per block), a driver sum over the block partials.
    No shuffle at all; the driver holds O(#blocks) rows. Revenue is the
    exact integer sum of price_c2 x disc_c2 (10^-4 dollar units).
    Always returns ONE row (zeros on an empty/filtered-away corpus),
    matching COALESCE-guarded SQL."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["l_shipdate"].to_numpy().astype("datetime64[ns]")
        disc_c2 = np.round(
            batch["l_discount"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        qty = batch["l_quantity"].to_numpy(dtype=np.float64)
        m = (
            (ts >= lo) & (ts < hi)
            & (disc_c2 >= disc_lo_c2) & (disc_c2 <= disc_hi_c2)
            & (qty < max_qty)
        )
        price_c2 = np.round(
            batch["l_extendedprice"].to_numpy(dtype=np.float64)[m] * 100
        ).astype(np.int64)
        return pd.DataFrame(
            {"revenue_c4": [np.int64((price_c2 * disc_c2[m]).sum())],
             "n_lines": [np.int64(m.sum())]}
        )

    partials = collect_small(
        lines.map_batches(partial, batch_format="pandas"),
        ["revenue_c4", "n_lines"],
    )
    return pd.DataFrame(
        {"revenue_c4": [np.int64(partials["revenue_c4"].sum())],
         "n_lines": [np.int64(partials["n_lines"].sum())]}
    )


Q6_FORECAST_REVENUE_ORACLE = """
SELECT COALESCE(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)), 0) AS revenue_c4,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 2 AND 4
  AND l_quantity < 24
"""


def q10_returned_items(sf_dir: str, date_lo: str = "1997-01-01",
                       date_hi: str = "1997-04-01", k: int = 20):
    """TPC-H Q10 shape — returned-item reporting: revenue lost to
    returns (l_returnflag = 'R') per customer for orders placed in a
    quarter, top ``k`` customers enriched with name / nation / account
    balance.

    Scale shape: lineitem partial-sums revenue per orderkey INSIDE the
    batch (combiner before the wire), then ONE bucketed exchange on
    hash(orderkey) joins order->customer keys (tagged union, no
    broadcast of either fact table), a second bucketed exchange sums
    per custkey, and a partial-top-k-per-block -> driver merge keeps
    the collect k-bounded. Only the k survivor keys are then used to
    FILTER the customer dim scan (broadcast of a k-element set), so
    the driver never holds more than k + |nation| rows."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    lo = np.datetime64(date_lo)
    hi = np.datetime64(date_hi)
    out_cols = ["c_custkey", "c_name", "n_name", "acctbal_c2",
                "revenue_c4", "rn"]

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["o_orderdate"].to_numpy().astype("datetime64[ns]")
        m = (ts >= lo) & (ts < hi)
        return pd.DataFrame(
            {"okey": batch["o_orderkey"].to_numpy(dtype=np.int64)[m],
             "custkey": batch["o_custkey"].to_numpy(dtype=np.int64)[m],
             "revenue_c4": np.zeros(int(m.sum()), dtype=np.int64),
             "_side": np.full(int(m.sum()), 1, dtype=np.int64)}
        )

    def line_partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["l_returnflag"].astype(str).to_numpy() == "R"
        price_c2 = np.round(
            batch["l_extendedprice"].to_numpy(dtype=np.float64)[m] * 100
        ).astype(np.int64)
        disc_c2 = np.round(
            batch["l_discount"].to_numpy(dtype=np.float64)[m] * 100
        ).astype(np.int64)
        out = pd.DataFrame(
            {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64)[m],
             "revenue_c4": price_c2 * (100 - disc_c2)}
        )
        out = out.groupby("okey", sort=False, as_index=False)["revenue_c4"].sum()
        out["custkey"] = np.int64(0)
        out["_side"] = np.int64(0)
        return out[["okey", "custkey", "revenue_c4", "_side"]].astype(
            {"okey": np.int64, "revenue_c4": np.int64}
        )

    unioned = orders.map_batches(order_rows, batch_format="pandas").union(
        lines.map_batches(line_partial, batch_format="pandas")
    )

    def join_orders(bucket: pd.DataFrame) -> pd.DataFrame:
        ords = bucket[bucket["_side"] == 1][["okey", "custkey"]]
        revs = bucket[bucket["_side"] == 0][["okey", "revenue_c4"]]
        merged = revs.merge(ords, on="okey", how="inner")
        if merged.empty:
            return pd.DataFrame(
                {"custkey": pd.Series([], dtype=np.int64),
                 "revenue_c4": pd.Series([], dtype=np.int64)}
            )
        # combiner: pre-sum per custkey inside the bucket so the second
        # exchange moves <= one row per (bucket, custkey)
        return (
            merged.groupby("custkey", sort=False, as_index=False)["revenue_c4"]
            .sum().astype({"custkey": np.int64, "revenue_c4": np.int64})
        )

    per_cust_partial = grouped_aggregate(
        unioned, ["okey"], join_orders, coalesce=True
    )

    def cust_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("custkey", sort=False, as_index=False)["revenue_c4"]
            .sum().astype({"custkey": np.int64, "revenue_c4": np.int64})
        )

    per_cust = grouped_aggregate(per_cust_partial, ["custkey"], cust_sum)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["revenue_c4", "custkey"], ascending=[False, True], kind="stable"
        ).head(k)

    top = collect_small(
        per_cust.map_batches(local_topk, batch_format="pandas"),
        ["custkey", "revenue_c4"],
    )
    top = top.sort_values(
        ["revenue_c4", "custkey"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    if top.empty:
        return pd.DataFrame(
            {"c_custkey": pd.Series([], dtype=np.int64),
             "c_name": pd.Series([], dtype=str),
             "n_name": pd.Series([], dtype=str),
             "acctbal_c2": pd.Series([], dtype=np.int64),
             "revenue_c4": pd.Series([], dtype=np.int64),
             "rn": pd.Series([], dtype=np.int64)}
        )

    survivor_keys = set(int(x) for x in top["custkey"].tolist())
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )

    def pick_survivors(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["c_custkey"].isin(survivor_keys)]

    cust_rows = collect_small(
        cust.map_batches(pick_survivors, batch_format="pandas"),
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )
    nation = collect_small(
        rd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]),
        ["n_nationkey", "n_name"],
    )
    merged = top.merge(
        cust_rows, left_on="custkey", right_on="c_custkey", how="inner"
    ).merge(nation, left_on="c_nationkey", right_on="n_nationkey", how="inner")
    merged["acctbal_c2"] = np.round(
        merged["c_acctbal"].to_numpy(dtype=np.float64) * 100
    ).astype(np.int64)
    merged = merged.sort_values(
        ["revenue_c4", "custkey"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    merged["rn"] = np.arange(1, len(merged) + 1, dtype=np.int64)
    return merged[out_cols].astype({"c_custkey": np.int64})


Q10_RETURNED_ITEMS_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_c4
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
    AND l_returnflag = 'R'
  GROUP BY 1
)
SELECT c_custkey, c_name, n_name,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c2,
       CAST(revenue_c4 AS BIGINT) AS revenue_c4,
       CAST(ROW_NUMBER() OVER (ORDER BY revenue_c4 DESC, c_custkey ASC)
            AS BIGINT) AS rn
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_c4 DESC, c_custkey ASC
LIMIT 20
"""


def events_ks_stat(sf_dir: str, type_a: str = "click",
                   type_b: str = "purchase"):
    """Exact two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two event types: D = max over the pooled support
    of |F_a(v) - F_b(v)|.

    Distributed shape: per-(value_centi) counts for both types via the
    bucketed two-phase aggregate, then the CDF walk on the driver over
    the DISTINCT-VALUE grid — bounded by the value range (2-decimal
    values in [0, ~500] => <= ~50k grid points no matter the corpus
    size), not by row count. Float parity: cumulative counts are exact
    int64; each CDF point is ONE double division and the |diff| / max
    use identical expression shape to the SQL, so ks_d matches DuckDB
    bit-for-bit (see oracle-float-parity notes)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        et = batch["event_type"].astype(str).to_numpy()
        m = (et == type_a) | (et == type_b)
        v = np.round(
            batch["value"].to_numpy(dtype=np.float64)[m] * 100
        ).astype(np.int64)
        isa = (et[m] == type_a).astype(np.int64)
        out = pd.DataFrame({"v": v, "ca": isa, "cb": 1 - isa})
        return out.groupby("v", sort=False, as_index=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum")
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("v", sort=False, as_index=False)
            .agg(ca=("ca", "sum"), cb=("cb", "sum"))
            .astype({"v": np.int64, "ca": np.int64, "cb": np.int64})
        )

    counts = grouped_aggregate(events, ["v"], combine, partial=partial)
    df = collect_small(counts, ["v", "ca", "cb"])
    if df.empty:
        return pd.DataFrame(
            {"n_a": [np.int64(0)], "n_b": [np.int64(0)], "ks_d": [0.0]}
        )
    if df["ca"].sum() == 0 or df["cb"].sum() == 0:
        # One side absent: report the present side's true count (matching
        # the oracle, whose NULL division coalesces ks_d to 0 but still
        # sums the real marginal) rather than zeroing both.
        return pd.DataFrame(
            {
                "n_a": [np.int64(df["ca"].sum())],
                "n_b": [np.int64(df["cb"].sum())],
                "ks_d": [0.0],
            }
        )
    df = df.sort_values("v", kind="stable")
    n_a = np.int64(df["ca"].sum())
    n_b = np.int64(df["cb"].sum())
    cca = np.cumsum(df["ca"].to_numpy(dtype=np.int64)).astype(np.float64)
    ccb = np.cumsum(df["cb"].to_numpy(dtype=np.int64)).astype(np.float64)
    d = np.abs(cca / n_a - ccb / n_b)
    return pd.DataFrame({"n_a": [n_a], "n_b": [n_b], "ks_d": [float(d.max())]})


EVENTS_KS_STAT_ORACLE = """
WITH vals AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         count(*) FILTER (event_type = 'click') AS ca,
         count(*) FILTER (event_type = 'purchase') AS cb
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
), cum AS (
  SELECT SUM(ca) OVER (ORDER BY v) AS cca,
         SUM(cb) OVER (ORDER BY v) AS ccb,
         SUM(ca) OVER () AS na,
         SUM(cb) OVER () AS nb
  FROM vals
)
SELECT COALESCE(CAST(max(na) AS BIGINT), 0) AS n_a,
       COALESCE(CAST(max(nb) AS BIGINT), 0) AS n_b,
       COALESCE(max(abs(CAST(cca AS DOUBLE) / na - CAST(ccb AS DOUBLE) / nb)),
                0.0) AS ks_d
FROM cum
"""


def chi2_type_dow(sf_dir: str):
    """Pearson chi-square contributions for independence of event_type
    x day-of-week (dow = epoch_days % 7, engine-neutral). Emits one row
    PER CELL rather than a single summed statistic: the per-cell closed
    form ((n - e)^2 / e with e = row*col/N) is bit-exact across engines,
    while a SUM over >1 double would depend on accumulation order.

    Shape: counts via the bucketed two-phase aggregate; the marginal /
    expected math runs on the driver over a |types| x 7 grid — bounded
    by the type vocabulary, not the corpus."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    keys = ["event_type", "dow"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "dow": (ts_ns // 86_400_000_000_000) % 7,
             "n": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["n"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["n"].sum()
            .astype({"dow": np.int64, "n": np.int64})
        )

    cells = grouped_aggregate(events, keys, combine, partial=partial)
    df = collect_small(cells, ["event_type", "dow", "n"])
    if df.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "dow": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64),
             "expected": pd.Series([], dtype=np.float64),
             "chi2_contrib": pd.Series([], dtype=np.float64)}
        )
    row_n = df.groupby("event_type")["n"].transform("sum").to_numpy(dtype=np.int64)
    col_n = df.groupby("dow")["n"].transform("sum").to_numpy(dtype=np.int64)
    big_n = np.int64(df["n"].sum())
    expected = (row_n * col_n).astype(np.float64) / big_n
    n = df["n"].to_numpy(dtype=np.int64)
    diff = n - expected
    return pd.DataFrame(
        {"event_type": df["event_type"].astype(str).to_numpy(),
         "dow": df["dow"].to_numpy(dtype=np.int64),
         "n": n,
         "expected": expected,
         "chi2_contrib": diff * diff / expected}
    )


CHI2_TYPE_DOW_ORACLE = """
WITH cells AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 % 7 AS BIGINT) AS dow,
         count(*) AS n
  FROM events GROUP BY 1, 2
), rowt AS (
  SELECT event_type, SUM(n) AS row_n FROM cells GROUP BY 1
), colt AS (
  SELECT dow, SUM(n) AS col_n FROM cells GROUP BY 1
), grand AS (
  SELECT SUM(n) AS big_n FROM cells
), j AS (
  SELECT c.event_type, c.dow, c.n,
         CAST(row_n * col_n AS DOUBLE) / big_n AS expected
  FROM cells c
  JOIN rowt USING (event_type) JOIN colt USING (dow) CROSS JOIN grand
)
SELECT event_type, dow, CAST(n AS BIGINT) AS n, expected,
       (n - expected) * (n - expected) / expected AS chi2_contrib
FROM j
"""


def trimmed_mean_by_type(sf_dir: str, trim_pct: int = 10):
    """Exact per-type trimmed mean of event value — the robust-mean
    sibling of ``events_mad``: drop the lowest and highest
    ``n * trim_pct // 100`` observations per event type, average the
    rest. Exactness without sorting rows: values are 2-decimal, so the
    per-(type, value_centi) COUNT GRID is bounded by the value range
    (~50k cells/type) regardless of corpus size; the bucketed two-phase
    aggregate builds the grid, and the trim walk runs on the driver
    with vectorized prefix sums — per-cell trimmed counts are
    ``clip(k - cum_before, 0, c)`` from each end, so a cell straddling
    the cut contributes exactly its surviving items. The mean is ONE
    double division of exact int64 sums (bit-exact vs the
    ROW_NUMBER-window SQL)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    keys = ["event_type", "vc"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "vc": np.round(
                 batch["value"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["c"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["c"].sum()
            .astype({"vc": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, keys, combine, partial=partial),
        ["event_type", "vc", "c"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "n_events": pd.Series([], dtype=np.int64),
             "trimmed_each": pd.Series([], dtype=np.int64),
             "trimmed_sum_centi": pd.Series([], dtype=np.int64),
             "trimmed_mean_centi": pd.Series([], dtype=np.float64)}
        )
    grid = grid.sort_values(["event_type", "vc"], kind="stable")
    rows = []
    for et, g in grid.groupby("event_type", sort=False):
        c = g["c"].to_numpy(dtype=np.int64)
        vc = g["vc"].to_numpy(dtype=np.int64)
        n = np.int64(c.sum())
        k = n * trim_pct // 100
        cum_before = np.cumsum(c) - c
        cum_after = n - np.cumsum(c)
        take_low = np.clip(k - cum_before, 0, c)
        take_high = np.clip(k - cum_after, 0, c)
        kept = c - take_low - take_high
        tsum = np.int64((kept * vc).sum())
        tn = np.int64(n - 2 * k)
        rows.append(
            {"event_type": et, "n_events": n, "trimmed_each": np.int64(k),
             "trimmed_sum_centi": tsum,
             "trimmed_mean_centi": np.float64(tsum) / tn}
        )
    out = pd.DataFrame(rows)
    return out.astype(
        {"n_events": np.int64, "trimmed_each": np.int64,
         "trimmed_sum_centi": np.int64, "trimmed_mean_centi": np.float64}
    )


TRIMMED_MEAN_BY_TYPE_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS vc,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(round(value * 100) AS BIGINT)
         ) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(max(n) * 10 // 100 AS BIGINT) AS trimmed_each,
       CAST(SUM(vc) AS BIGINT) AS trimmed_sum_centi,
       CAST(SUM(vc) AS DOUBLE) / count(*) AS trimmed_mean_centi
FROM v
WHERE rn > n * 10 // 100 AND rn <= n - n * 10 // 100
GROUP BY event_type
"""


def trade_matrix_nations(sf_dir: str):
    """TPC-H Q7 shape generalized — the nation-to-nation trade matrix:
    revenue per (customer nation, supplier nation, order year) over the
    full orders x lineitem stream. Q7 restricts to one nation pair; the
    matrix form answers every pair at once from the same single
    exchange.

    Shape mirrors :func:`local_supplier_revenue`: suppkey->nationkey
    and custkey->nationkey collapse to broadcast sorted-array lookups
    (dimension ladder; the documented 100-TB fallback for the customer
    map is tagging custkeys into the exchange), lineitems pre-aggregate
    revenue per (orderkey, supp_nation) INSIDE the batch, orders tag
    (cust_nation, year), and both sides meet in ONE bucketed exchange
    on hash(orderkey); each bucket emits (cust_nation, supp_nation,
    year) partials, and the final aggregate is at most
    25 x 25 x years rows."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_names = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    cust = collect_small(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        ["c_custkey", "c_nationkey"],
    )
    order_c = np.argsort(cust["c_custkey"].to_numpy())
    cust_map = ray.put(
        (cust["c_custkey"].to_numpy(dtype=np.int64)[order_c],
         cust["c_nationkey"].to_numpy(dtype=np.int64)[order_c])
    )
    supp = collect_small(
        rd.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ),
        ["s_suppkey", "s_nationkey"],
    )
    order_s = np.argsort(supp["s_suppkey"].to_numpy())
    supp_map = ray.put(
        (supp["s_suppkey"].to_numpy(dtype=np.int64)[order_s],
         supp["s_nationkey"].to_numpy(dtype=np.int64)[order_s])
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nations = ray.get(cust_map)
        cnat = _np_lookup(keys, nations,
                          batch["o_custkey"].to_numpy(dtype=np.int64))
        kept = batch.loc[cnat >= 0]
        years = (
            kept["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        n = len(kept)
        return pd.DataFrame(
            {"orderkey": kept["o_orderkey"].to_numpy(dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64),
             "nationkey": cnat[cnat >= 0],
             "year": years,
             "revenue_centi": np.zeros(n, dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def tag_lines(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nations = ray.get(supp_map)
        snat = _np_lookup(keys, nations,
                          batch["l_suppkey"].to_numpy(dtype=np.int64))
        rev = _round_half_up(
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy())
            * 100.0
        )
        part = (
            pd.DataFrame(
                {"orderkey": batch["l_orderkey"].to_numpy(dtype=np.int64),
                 "nationkey": snat, "revenue_centi": rev}
            )
            .groupby(["orderkey", "nationkey"], sort=False)["revenue_centi"]
            .sum().reset_index()
        )
        part["side"] = np.int64(1)
        part["year"] = np.int64(0)
        return part[
            ["orderkey", "side", "nationkey", "year", "revenue_centi"]
        ].astype({c: np.int64 for c in
                  ("orderkey", "side", "nationkey", "year", "revenue_centi")})

    unioned = orders.map_batches(tag_orders, batch_format="pandas").union(
        lines.map_batches(tag_lines, batch_format="pandas")
    )
    keys3 = ["cust_nat", "supp_nat", "year"]

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        left = bucket[bucket["side"] == 0][["orderkey", "nationkey", "year"]]
        left = left.rename(columns={"nationkey": "cust_nat"})
        right = bucket[bucket["side"] == 1][
            ["orderkey", "nationkey", "revenue_centi"]
        ].rename(columns={"nationkey": "supp_nat"})
        m = left.merge(right, on="orderkey", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"cust_nat": pd.Series([], dtype=np.int64),
                 "supp_nat": pd.Series([], dtype=np.int64),
                 "year": pd.Series([], dtype=np.int64),
                 "revenue_centi": pd.Series([], dtype=np.int64)}
            )
        return (
            m.groupby(keys3, sort=False, as_index=False)["revenue_centi"].sum()
            .astype({c: np.int64 for c in (*keys3, "revenue_centi")})
        )

    partials = grouped_aggregate(unioned, ["orderkey"], join_bucket,
                                 coalesce=True)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby(keys3, sort=False, as_index=False)["revenue_centi"]
            .sum()
        )
        out["cust_nation"] = out["cust_nat"].astype(int).map(nat_names)
        out["supp_nation"] = out["supp_nat"].astype(int).map(nat_names)
        return out[
            ["cust_nation", "supp_nation", "year", "revenue_centi"]
        ].astype({"year": np.int64, "revenue_centi": np.int64})

    return grouped_aggregate(partials, keys3, final, num_partitions=8)


TRADE_MATRIX_NATIONS_ORACLE = """
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS year,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS revenue_centi
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY 1, 2, 3
"""


def events_percent_rank(sf_dir: str):
    """PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value) for
    every event — the window-function shape where the naive plan
    (shuffle all rows to one reducer per type, 5 hot keys) collapses.
    Scale-correct plan: two passes, ZERO row shuffles. Pass 1 builds
    the bounded (type, value_centi) count grid (bucketed two-phase
    aggregate); the driver turns it into per-type sorted
    (values, items-strictly-below, n) arrays — grid-sized, broadcast
    once via ``ray.put``. Pass 2 tags every event row with
    ``below / (n - 1)`` by vectorized searchsorted — embarrassingly
    parallel, output streams. rank(min) semantics under ties match
    RANK(); the single int/int double division is bit-exact vs the
    explicit (RANK()-1)/(n-1) SQL."""
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    keys = ["event_type", "vc"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "vc": np.round(
                 batch["value"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["c"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["c"].sum()
            .astype({"vc": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, keys, combine, partial=partial),
        ["event_type", "vc", "c"],
    )
    lookup: dict[str, tuple] = {}
    for et, g in grid.groupby("event_type", sort=False):
        g = g.sort_values("vc", kind="stable")
        c = g["c"].to_numpy(dtype=np.int64)
        below = np.cumsum(c) - c
        lookup[str(et)] = (g["vc"].to_numpy(dtype=np.int64), below,
                           np.int64(c.sum()))
    lookup_ref = ray.put(lookup)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        et = batch["event_type"].astype(str).to_numpy()
        vc = np.round(
            batch["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        pct = np.zeros(len(batch), dtype=np.float64)
        for t in pd.unique(et):
            m = et == t
            values, below, n = lk[str(t)]
            idx = np.searchsorted(values, vc[m])
            pct[m] = 0.0 if n == 1 else below[idx].astype(np.float64) / (n - 1)
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(dtype=np.int64),
             "event_type": et, "value_centi": vc, "pct_rank": pct}
        )

    return events.map_batches(tag, batch_format="pandas")


EVENTS_PERCENT_RANK_ORACLE = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_centi,
         RANK() OVER (
           PARTITION BY event_type
           ORDER BY CAST(round(value * 100) AS BIGINT)
         ) AS rnk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_id, event_type, value_centi,
       CASE WHEN n = 1 THEN 0.0
            ELSE CAST(rnk - 1 AS DOUBLE) / (n - 1) END AS pct_rank
FROM v
"""


def segment_priority_mix(sf_dir: str):
    """Customer-segment x order-priority contingency with within-
    segment shares — the marketing-mix crosstab. customer is a FACT
    table at scale, so the attach is a bucketed tagged-union join on
    hash(custkey) (no broadcast); each bucket emits pre-counted
    (segment, priority) partials, the final grid is |segments| x
    |priorities| (~25 rows) and each share is ONE double division of
    exact int64 counts."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "label": batch["o_orderpriority"].astype(str).to_numpy(),
             "_side": np.zeros(len(batch), dtype=np.int64)}
        )

    def cust_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": batch["c_custkey"].to_numpy(dtype=np.int64),
             "label": batch["c_mktsegment"].astype(str).to_numpy(),
             "_side": np.ones(len(batch), dtype=np.int64)}
        )

    unioned = orders.map_batches(order_rows, batch_format="pandas").union(
        cust.map_batches(cust_rows, batch_format="pandas")
    )

    def join_count(bucket: pd.DataFrame) -> pd.DataFrame:
        o = bucket[bucket["_side"] == 0][["custkey", "label"]]
        o = o.rename(columns={"label": "priority"})
        c = bucket[bucket["_side"] == 1][["custkey", "label"]]
        c = c.rename(columns={"label": "segment"})
        m = o.merge(c, on="custkey", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"segment": pd.Series([], dtype=str),
                 "priority": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype=np.int64)}
            )
        m["n"] = np.int64(1)
        return (
            m.groupby(["segment", "priority"], sort=False, as_index=False)["n"]
            .sum().astype({"n": np.int64})
        )

    partials = grouped_aggregate(unioned, ["custkey"], join_count,
                                 coalesce=True)
    grid = collect_small(partials, ["segment", "priority", "n"])
    if grid.empty:
        return pd.DataFrame(
            {"segment": pd.Series([], dtype=str),
             "priority": pd.Series([], dtype=str),
             "n": pd.Series([], dtype=np.int64),
             "seg_share": pd.Series([], dtype=np.float64)}
        )
    grid = (
        grid.groupby(["segment", "priority"], sort=False, as_index=False)["n"]
        .sum()
    )
    seg_tot = grid.groupby("segment")["n"].transform("sum").to_numpy(dtype=np.int64)
    n = grid["n"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {"segment": grid["segment"].astype(str).to_numpy(),
         "priority": grid["priority"].astype(str).to_numpy(),
         "n": n,
         "seg_share": n.astype(np.float64) / seg_tot}
    )


SEGMENT_PRIORITY_MIX_ORACLE = """
WITH g AS (
  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
         count(*) AS n
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1, 2
)
SELECT segment, priority, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY segment) AS seg_share
FROM g
"""


LATE_WINDOW_US = 300_000_000   # 5-minute tumbling event-time windows
LATENESS_US = 60_000_000       # allowed lateness: 60 s behind watermark


def events_late_arrivals(sf_dir: str):
    """Streaming watermark semantics on a batch corpus: events arrive
    in ``event_id`` order; the WATERMARK before event i is the max
    event-time seen so far (exclusive prefix max) minus an allowed
    lateness; an event whose own timestamp trails the watermark is
    LATE and excluded from its window's on-time count — the
    Beam/Flink late-data accounting, reproduced exactly.

    The prefix max uses the same three bounded steps as the
    :func:`events_running_total` prefix scan, keyed by a RANGE prefix
    of the arrival key (``event_id // 2^14``): per-block max (one row
    per block — bounded, driver-safe), exclusive driver scan over the
    block maxes, then one bucketed pass where each block sorts by
    arrival and takes a shifted ``np.maximum.accumulate`` seeded with
    its block offset. The per-window on-time/late counts are a final
    bounded two-phase aggregate."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    BLOCK = np.int64(1) << np.int64(14)
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )

    def rows_of(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        eid = batch["event_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"event_id": eid, "ts_us": ts_us, "block": eid // BLOCK}
        )

    rows = events.map_batches(rows_of, batch_format="pandas")

    def block_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("block", sort=False)["ts_us"].max().reset_index(
            name="mx"
        )
        return out.astype({"block": np.int64, "mx": np.int64})

    def block_final(bucket: pd.DataFrame) -> pd.DataFrame:
        return block_partial(bucket.rename(columns={"mx": "ts_us"}))

    block_max = collect_small(
        grouped_aggregate(rows.select_columns(["block", "ts_us"]), ["block"],
                          block_final, partial=block_partial,
                          num_partitions=8),
        ["block", "mx"],
    ).sort_values("block")
    if block_max.empty:
        return pd.DataFrame(
            {"win": pd.Series([], dtype=np.int64),
             "n_on_time": pd.Series([], dtype=np.int64),
             "n_late": pd.Series([], dtype=np.int64)}
        )
    mx = block_max["mx"].to_numpy(dtype=np.int64)
    # exclusive prefix max of block maxes; first block has no prior
    excl = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(mx)[:-1])
    )
    offsets = dict(zip(block_max["block"].tolist(), excl.tolist()))

    def flag_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.sort_values(["block", "event_id"], kind="stable")
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        blocks = df["block"].to_numpy(dtype=np.int64)
        seed = df["block"].map(offsets).to_numpy(dtype=np.int64)
        # per-block exclusive running max: shift the inclusive cummax
        # right by one within each block segment, seed with the offset
        start = np.ones(len(df), dtype=bool)
        start[1:] = blocks[1:] != blocks[:-1]
        # segmented exclusive cummax: an O(rows) pass per segment —
        # the loop is over block segments per bucket (bounded), and
        # each segment's body is a single vectorized accumulate
        out_excl = np.empty(len(df), dtype=np.int64)
        seg_bounds = np.append(np.where(start)[0], len(df))
        for s, e in zip(seg_bounds[:-1], seg_bounds[1:]):
            seg_inc = np.maximum.accumulate(ts[s:e])
            out_excl[s] = seed[s]
            if e - s > 1:
                out_excl[s + 1:e] = np.maximum(seed[s], seg_inc[:-1])
        # ts + L < wm, not ts < wm - L: the first-ever event's sentinel
        # watermark is int64.min and subtracting would underflow
        late = ts + LATENESS_US < out_excl
        win = ts // LATE_WINDOW_US
        agg = pd.DataFrame(
            {"win": win,
             "n_on_time": (~late).astype(np.int64),
             "n_late": late.astype(np.int64)}
        )
        return (
            agg.groupby("win", sort=False, as_index=False)[
                ["n_on_time", "n_late"]
            ].sum().astype({"win": np.int64})
        )

    flagged = grouped_aggregate(rows, ["block"], flag_bucket)

    def win_final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("win", sort=False, as_index=False)[
                ["n_on_time", "n_late"]
            ].sum().astype(
                {"win": np.int64, "n_on_time": np.int64, "n_late": np.int64}
            )
        )

    return grouped_aggregate(flagged, ["win"], win_final, num_partitions=8)


EVENTS_LATE_ARRIVALS_ORACLE = """
WITH w AS (
  SELECT CAST(epoch_us(ts) // 300000000 AS BIGINT) AS win,
         epoch_us(ts) AS ts_us,
         MAX(epoch_us(ts)) OVER (
           ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS wm
  FROM events
)
SELECT win,
       CAST(count(*) FILTER (wm IS NULL OR ts_us >= wm - 60000000)
            AS BIGINT) AS n_on_time,
       CAST(count(*) FILTER (wm IS NOT NULL AND ts_us < wm - 60000000)
            AS BIGINT) AS n_late
FROM w GROUP BY 1
"""


def revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(region, nation) over order revenue — the OLAP
    grouping-sets shape on the TPC-H side (the documents table has its
    CUBE twin in ``ops/textstats.corpus_rollup/cube``): per-(region,
    nation) revenue plus per-region and grand-total rows labeled
    'ALL'. custkey→(region, nation) collapses to a broadcast lookup
    (dimension ladder); revenue comes straight off orders
    (o_totalprice — no lineitem join needed for this rollup); the
    cell grid is ≤ 25 rows so the rollup itself is driver math."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nat = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nat_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    nat_region = dict(zip(nat["n_nationkey"].astype(int), nat["r_name"]))

    cust = collect_small(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        ["c_custkey", "c_nationkey"],
    )
    order_c = np.argsort(cust["c_custkey"].to_numpy())
    cust_map = ray.put(
        (cust["c_custkey"].to_numpy(dtype=np.int64)[order_c],
         cust["c_nationkey"].to_numpy(dtype=np.int64)[order_c])
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nations = ray.get(cust_map)
        cnat = _np_lookup(keys, nations,
                          batch["o_custkey"].to_numpy(dtype=np.int64))
        kept = cnat >= 0
        out = pd.DataFrame(
            {"nationkey": cnat[kept],
             "revenue_centi": np.round(
                 batch["o_totalprice"].to_numpy(dtype=np.float64)[kept] * 100
             ).astype(np.int64)}
        )
        return out.groupby("nationkey", sort=False, as_index=False)[
            "revenue_centi"
        ].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("nationkey", sort=False, as_index=False)[
                "revenue_centi"
            ].sum().astype({"nationkey": np.int64, "revenue_centi": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(orders, ["nationkey"], combine, partial=partial,
                          num_partitions=8),
        ["nationkey", "revenue_centi"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"region": pd.Series([], dtype=str),
             "nation": pd.Series([], dtype=str),
             "revenue_centi": pd.Series([], dtype=np.int64)}
        )
    grid["region"] = grid["nationkey"].astype(int).map(nat_region)
    grid["nation"] = grid["nationkey"].astype(int).map(nat_name)
    base = (
        grid.groupby(["region", "nation"], sort=False, as_index=False)[
            "revenue_centi"
        ].sum()
    )
    per_region = (
        base.groupby("region", sort=False, as_index=False)["revenue_centi"]
        .sum().assign(nation="ALL")
    )
    grand = pd.DataFrame(
        {"region": ["ALL"], "nation": ["ALL"],
         "revenue_centi": [np.int64(base["revenue_centi"].sum())]}
    )
    out = pd.concat(
        [base[["region", "nation", "revenue_centi"]],
         per_region[["region", "nation", "revenue_centi"]], grand],
        ignore_index=True,
    )
    return out.astype({"revenue_centi": np.int64})


REVENUE_ROLLUP_ORACLE = """
WITH base AS (
  SELECT r_name AS region, n_name AS nation,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_centi
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, CAST(revenue_centi AS BIGINT) AS revenue_centi
FROM base
UNION ALL
SELECT region, 'ALL', CAST(SUM(revenue_centi) AS BIGINT) FROM base GROUP BY 1
UNION ALL
SELECT 'ALL', 'ALL', CAST(SUM(revenue_centi) AS BIGINT) FROM base
"""


def order_price_median_by_priority(sf_dir: str):
    """EXACT grouped median of order price by priority — distributed
    SELECTION, not a sort: o_totalprice spans ~10^7 distinct centi
    values, so the bounded-grid trick behind ``events_type_percentiles``
    does not apply. Two-pass histogram refinement instead:

    1. per-(priority, coarse bucket) counts with bucket =
       price_centi >> 12 (4096-centi bins; grid ≤ |priorities| x
       price_range/4096 — bounded by the VALUE RANGE, not rows);
       the driver walks each priority's histogram to locate the
       bucket holding the k-th element (k = (n+1)//2, lower median)
       and the residual rank inside it;
    2. a second scan emits exact centi counts ONLY for rows inside
       their priority's candidate bucket (a broadcast dict of one
       bucket id per priority — each pass-2 partial is ≤ 4096 cells
       per priority); the driver walks those to the residual rank.

    log2(range/4096) more passes would be needed only if a single
    bin exceeded driver memory — at 4096 distinct values per bin it
    cannot. All counts int64; the median is an exact data value."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    SHIFT = np.int64(12)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def coarse_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pc = np.round(
            batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        out = pd.DataFrame(
            {"priority": batch["o_orderpriority"].astype(str).to_numpy(),
             "bucket": pc >> SHIFT,
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(["priority", "bucket"], sort=False,
                           as_index=False)["c"].sum()

    def coarse_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["priority", "bucket"], sort=False,
                           as_index=False)["c"].sum()
            .astype({"bucket": np.int64, "c": np.int64})
        )

    hist = collect_small(
        grouped_aggregate(orders, ["priority", "bucket"], coarse_combine,
                          partial=coarse_partial, num_partitions=8),
        ["priority", "bucket", "c"],
    )
    if hist.empty:
        return pd.DataFrame(
            {"priority": pd.Series([], dtype=str),
             "n_orders": pd.Series([], dtype=np.int64),
             "median_centi": pd.Series([], dtype=np.int64)}
        )
    # locate each priority's candidate bucket + residual rank
    target: dict[str, tuple[int, int]] = {}
    n_by_p: dict[str, int] = {}
    for p, g in hist.groupby("priority", sort=False):
        g = g.sort_values("bucket", kind="stable")
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        k = (n + 1) // 2
        cum = np.cumsum(c)
        i = int(np.searchsorted(cum, k))
        residual = k - (int(cum[i - 1]) if i else 0)
        target[str(p)] = (int(g["bucket"].to_numpy()[i]), residual)
        n_by_p[str(p)] = n

    def fine_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pr = batch["o_orderpriority"].astype(str).to_numpy()
        pc = np.round(
            batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        want = np.array([target[p][0] for p in pr], dtype=np.int64)
        m = (pc >> SHIFT) == want
        out = pd.DataFrame(
            {"priority": pr[m], "pc": pc[m],
             "c": np.ones(int(m.sum()), dtype=np.int64)}
        )
        return out.groupby(["priority", "pc"], sort=False,
                           as_index=False)["c"].sum()

    def fine_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["priority", "pc"], sort=False,
                           as_index=False)["c"].sum()
            .astype({"pc": np.int64, "c": np.int64})
        )

    fine = collect_small(
        grouped_aggregate(orders, ["priority", "pc"], fine_combine,
                          partial=fine_partial, num_partitions=8),
        ["priority", "pc", "c"],
    )
    rows = []
    for p, g in fine.groupby("priority", sort=False):
        g = g.sort_values("pc", kind="stable")
        cum = np.cumsum(g["c"].to_numpy(dtype=np.int64))
        residual = target[str(p)][1]
        i = int(np.searchsorted(cum, residual))
        rows.append({"priority": str(p),
                     "n_orders": np.int64(n_by_p[str(p)]),
                     "median_centi": np.int64(g["pc"].to_numpy()[i])})
    return pd.DataFrame(rows).astype(
        {"n_orders": np.int64, "median_centi": np.int64}
    )


ORDER_PRICE_MEDIAN_ORACLE = """
WITH p AS (
  SELECT o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS pc
  FROM orders
), r AS (
  SELECT priority, pc,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY pc) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM p
)
SELECT priority,
       CAST(max(n) AS BIGINT) AS n_orders,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN pc END) AS BIGINT)
         AS median_centi
FROM r GROUP BY priority
"""


def events_gap_interpolate(sf_dir: str):
    """Dense hourly value series per event type with missing hours
    LINEARLY INTERPOLATED between the neighboring present hours (the
    time-series imputation sibling of :func:`events_gap_fill`'s
    zero-fill). Present hours carry their exact int64 milli sum; a
    missing hour h between present (h0, v0) and (h1, v1) gets
    ``v0 + (v1-v0)*(h-h0)/(h1-h0)`` — integer products with ONE double
    division, the same expression the SQL computes, so filled values
    hash bit-exactly. Same bounded (type x hours) grid as gap_fill:
    the interpolation runs vectorized inside each type's bucket via
    searchsorted over the present hours."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    US_PER_HOUR = 3_600_000_000
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "hour": ts_us // US_PER_HOUR,
             "milli": milli_round(batch["value"].to_numpy(dtype=np.float64))}
        )
        return out.groupby(["event_type", "hour"], sort=False,
                           as_index=False)["milli"].sum()

    def interpolate(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["event_type", "hour"], sort=False,
                           as_index=False)["milli"].sum()
        )
        frames = []
        for et, t in g.groupby("event_type", sort=False):
            t = t.sort_values("hour", kind="stable")
            hours = t["hour"].to_numpy(dtype=np.int64)
            vals = t["milli"].to_numpy(dtype=np.int64)
            full = np.arange(hours[0], hours[-1] + 1, dtype=np.int64)
            # index of the present hour at or before each full hour
            idx = np.searchsorted(hours, full, side="right") - 1
            h0, v0 = hours[idx], vals[idx]
            nxt = np.minimum(idx + 1, len(hours) - 1)
            h1, v1 = hours[nxt], vals[nxt]
            present = h0 == full
            span = np.where(h1 > h0, h1 - h0, 1)
            interp = v0 + ((v1 - v0) * (full - h0)).astype(np.float64) / span
            value = np.where(present, vals[idx].astype(np.float64), interp)
            frames.append(pd.DataFrame(
                {"event_type": np.full(len(full), et, dtype=object),
                 "hour": full,
                 "value_milli": value,
                 "is_interpolated": (~present).astype(np.int64)}
            ))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "hour": pd.Series([], dtype=np.int64),
             "value_milli": pd.Series([], dtype=np.float64),
             "is_interpolated": pd.Series([], dtype=np.int64)}
        )

    return grouped_aggregate(events, ["event_type"], interpolate,
                             partial=partial, num_partitions=8)


EVENTS_GAP_INTERPOLATE_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         SUM(CAST(round(value * 1000) AS BIGINT)) AS milli
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(hour) AS h_lo, max(hour) AS h_hi
  FROM hourly GROUP BY 1
), dense AS (
  SELECT event_type, CAST(unnest(range(h_lo, h_hi + 1)) AS BIGINT) AS hour
  FROM spans
), j AS (
  SELECT d.event_type, d.hour, h.milli,
         LAST_VALUE(h.milli IGNORE NULLS) OVER (
           PARTITION BY d.event_type ORDER BY d.hour) AS v0,
         LAST_VALUE(CASE WHEN h.milli IS NOT NULL THEN d.hour END
                    IGNORE NULLS) OVER (
           PARTITION BY d.event_type ORDER BY d.hour) AS h0,
         FIRST_VALUE(h.milli IGNORE NULLS) OVER (
           PARTITION BY d.event_type ORDER BY d.hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
         FIRST_VALUE(CASE WHEN h.milli IS NOT NULL THEN d.hour END
                     IGNORE NULLS) OVER (
           PARTITION BY d.event_type ORDER BY d.hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS h1
  FROM dense d
  LEFT JOIN hourly h ON h.event_type = d.event_type AND h.hour = d.hour
)
SELECT event_type, hour,
       CASE WHEN milli IS NOT NULL THEN CAST(milli AS DOUBLE)
            ELSE v0 + CAST((v1 - v0) * (hour - h0) AS DOUBLE) / (h1 - h0)
       END AS value_milli,
       CAST(CASE WHEN milli IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_interpolated
FROM j
"""


REPEAT_WINDOW_US = np.int64(30) * 86_400_000_000  # 30 days


def repeat_purchase_rate(sf_dir: str):
    """New-customer repeat rate by acquisition cohort: for each
    first-order month, how many new customers placed a SECOND order
    within 30 days. The per-customer state is the classic mergeable
    'two smallest' partial — each batch keeps at most the 2 earliest
    (date, orderkey) rows per customer, partials merge by re-taking
    the 2 smallest — so the exchange moves ≤ 2 rows per customer per
    block regardless of order count (a whale customer with 10^6
    orders costs the same as one with 2). The cohort grid is months ×
    1, driver-finalized with one double division per cohort."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )

    def two_smallest(frame: pd.DataFrame) -> pd.DataFrame:
        g = frame.sort_values(["custkey", "ts_us", "okey"], kind="stable")
        return g.groupby("custkey", sort=False).head(2).reset_index(drop=True)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "okey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "ts_us": batch["o_orderdate"].to_numpy(
                 dtype="datetime64[us]").astype(np.int64)}
        )
        return two_smallest(out)

    def per_customer(bucket: pd.DataFrame) -> pd.DataFrame:
        g = two_smallest(bucket)
        firsts = g.groupby("custkey", sort=False).nth(0)
        seconds = g.groupby("custkey", sort=False).nth(1)
        f_ts = firsts["ts_us"].to_numpy(dtype=np.int64)
        months = f_ts.astype("datetime64[us]").astype("datetime64[M]")
        m_int = months.astype(np.int64)  # months since 1970
        first_month = (1970 + m_int // 12) * 100 + (m_int % 12 + 1)
        sec = seconds.set_index(seconds["custkey"].to_numpy())["ts_us"]
        sec_ts = (
            sec.reindex(firsts["custkey"].to_numpy()).to_numpy(dtype=np.float64)
        )
        rep = (
            np.isfinite(sec_ts)
            & (sec_ts.astype(np.int64, copy=False) - f_ts <= REPEAT_WINDOW_US)
        ).astype(np.int64)
        out = pd.DataFrame(
            {"first_month": first_month.astype(np.int64),
             "n_customers": np.ones(len(firsts), dtype=np.int64),
             "n_repeat_30d": rep}
        )
        return out.groupby("first_month", sort=False, as_index=False)[
            ["n_customers", "n_repeat_30d"]
        ].sum()

    grid = collect_small(
        grouped_aggregate(
            orders.map_batches(prep, batch_format="pandas"),
            ["custkey"], per_customer, coalesce=True,
        ),
        ["first_month", "n_customers", "n_repeat_30d"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"first_month": pd.Series([], dtype=np.int64),
             "n_customers": pd.Series([], dtype=np.int64),
             "n_repeat_30d": pd.Series([], dtype=np.int64),
             "repeat_share": pd.Series([], dtype=np.float64)}
        )
    g = grid.groupby("first_month", sort=False, as_index=False)[
        ["n_customers", "n_repeat_30d"]
    ].sum()
    n = g["n_customers"].to_numpy(dtype=np.int64)
    r = g["n_repeat_30d"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {"first_month": g["first_month"].to_numpy(dtype=np.int64),
         "n_customers": n, "n_repeat_30d": r,
         "repeat_share": r.astype(np.float64) / n}
    )


REPEAT_PURCHASE_RATE_ORACLE = """
WITH r AS (
  SELECT o_custkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
), firsts AS (
  SELECT o_custkey, o_orderdate AS d1 FROM r WHERE rn = 1
), seconds AS (
  SELECT o_custkey, o_orderdate AS d2 FROM r WHERE rn = 2
), per_cust AS (
  SELECT f.o_custkey,
         CAST(year(f.d1) * 100 + month(f.d1) AS BIGINT) AS first_month,
         CASE WHEN s.d2 IS NOT NULL
                   AND epoch_us(s.d2) - epoch_us(f.d1) <= 2592000000000
              THEN 1 ELSE 0 END AS rep
  FROM firsts f LEFT JOIN seconds s USING (o_custkey)
)
SELECT first_month,
       count(*) AS n_customers,
       CAST(SUM(rep) AS BIGINT) AS n_repeat_30d,
       CAST(SUM(rep) AS DOUBLE) / count(*) AS repeat_share
FROM per_cust GROUP BY 1
"""


def events_cusum_changepoint(sf_dir: str):
    """Largest mean-shift change point per event type: the split of the
    hourly timeline that maximizes |mean(value) before − after| — the
    screening statistic behind CUSUM change detection. Sufficient
    statistics are the bounded per-(type, hour) grid of exact int64
    (Σmilli, n); the driver walks each type's prefix sums, evaluating
    one closed-form double per candidate split (identical expression in
    the window SQL, so the chosen split AND the shift value hash-match;
    the argmax tie-break is (shift desc, hour asc))."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round
    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    US_PER_HOUR = 3_600_000_000
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    keys = ["event_type", "hour"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "hour": ts_us // US_PER_HOUR,
             "s": milli_round(batch["value"].to_numpy(dtype=np.float64)),
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)[["s", "c"]].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)[["s", "c"]].sum()
            .astype({"hour": np.int64, "s": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, keys, combine, partial=partial,
                          num_partitions=8),
        ["event_type", "hour", "s", "c"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "split_hour": pd.Series([], dtype=np.int64),
             "n_before": pd.Series([], dtype=np.int64),
             "n_after": pd.Series([], dtype=np.int64),
             "mean_shift": pd.Series([], dtype=np.float64)}
        )
    rows = []
    for et, g in grid.groupby("event_type", sort=False):
        g = g.sort_values("hour", kind="stable")
        if len(g) < 2:
            continue
        s = g["s"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        hours = g["hour"].to_numpy(dtype=np.int64)
        cs, cc = np.cumsum(s), np.cumsum(c)
        ts, tc = np.int64(cs[-1]), np.int64(cc[-1])
        # candidate split AFTER hour i (exclude the final, empty-after)
        cs_, cc_, h_ = cs[:-1], cc[:-1], hours[:-1]
        shift = np.abs(
            cs_.astype(np.float64) / cc_
            - (ts - cs_).astype(np.float64) / (tc - cc_)
        )
        order = np.lexsort((h_, -shift))  # shift desc, hour asc
        i = order[0]
        rows.append(
            {"event_type": str(et), "split_hour": np.int64(h_[i]),
             "n_before": np.int64(cc_[i]), "n_after": np.int64(tc - cc_[i]),
             "mean_shift": np.float64(shift[i])}
        )
    return pd.DataFrame(rows).astype(
        {"split_hour": np.int64, "n_before": np.int64, "n_after": np.int64,
         "mean_shift": np.float64}
    )


EVENTS_CUSUM_CHANGEPOINT_ORACLE = """
WITH h AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         SUM(CAST(round(value * 1000) AS BIGINT)) AS s,
         count(*) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, hour,
         SUM(s) OVER w AS cs, SUM(c) OVER w AS cc,
         SUM(s) OVER (PARTITION BY event_type) AS ts,
         SUM(c) OVER (PARTITION BY event_type) AS tc
  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour)
), cand AS (
  SELECT event_type, hour, cc, tc,
         abs(CAST(cs AS DOUBLE) / cc
             - CAST(ts - cs AS DOUBLE) / (tc - cc)) AS shift
  FROM cum WHERE tc - cc > 0
), best AS (
  SELECT event_type, hour, cc, tc, shift,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY shift DESC, hour ASC) AS rn
  FROM cand
)
SELECT event_type, hour AS split_hour,
       CAST(cc AS BIGINT) AS n_before,
       CAST(tc - cc AS BIGINT) AS n_after,
       shift AS mean_shift
FROM best WHERE rn = 1
"""


ZPRUNE_DIM_BITS = 8  # each dimension rank-normalized to 8 bits


def zorder_prune_stats(sf_dir: str):
    """WHY Z-order, measured: zone-map pruning effectiveness of the
    Morton layout vs a single-key (partkey-sorted) layout under two box
    predicates — a partkey range (where the single-key layout is
    optimal) and a suppkey range (where it prunes nothing, while
    Z-order still prunes to ~the box fraction). Each dimension is
    normalized to 8 bits via exact integer scaling over its observed
    [min, max] (domain-proportional at EVERY corpus size — a fixed bit
    shift would collapse to one zone on a small domain), the Morton
    key interleaves the two bytes, and zones are the top 4+4
    interleaved bits (256 zones) vs the normalized partkey byte (256
    zones). A row's zone is row-local — no global rank or sort — so
    the whole statistic is one bounded two-phase distinct. Output: one
    row per (scenario, layout) with matched rows, zone totals, zones
    touched, touch share (single double division)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def minmax_partial(batch: pd.DataFrame) -> pd.DataFrame:
        p = batch["l_partkey"].to_numpy(dtype=np.int64)
        s = batch["l_suppkey"].to_numpy(dtype=np.int64)
        if not len(p):
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ("plo", "phi", "slo", "shi")}
            )
        return pd.DataFrame(
            {"plo": [p.min()], "phi": [p.max()],
             "slo": [s.min()], "shi": [s.max()]}
        )

    mm = collect_small(
        lines.map_batches(minmax_partial, batch_format="pandas"),
        ["plo", "phi", "slo", "shi"],
    )
    if mm.empty:
        return pd.DataFrame(
            {"scenario": pd.Series([], dtype=str),
             "layout": pd.Series([], dtype=str),
             "n_match": pd.Series([], dtype=np.int64),
             "zones_total": pd.Series([], dtype=np.int64),
             "zones_touched": pd.Series([], dtype=np.int64),
             "touch_share": pd.Series([], dtype=np.float64)}
        )
    pmin, pmax = np.int64(mm["plo"].min()), np.int64(mm["phi"].max())
    smin, smax = np.int64(mm["slo"].min()), np.int64(mm["shi"].max())
    p_lo, p_hi = pmin + (pmax - pmin) * 3 // 8, pmin + (pmax - pmin) * 5 // 8
    s_lo, s_hi = smin + (smax - smin) * 3 // 8, smin + (smax - smin) * 5 // 8
    DIM = np.int64(1) << np.int64(ZPRUNE_DIM_BITS)

    def zone_rows(batch: pd.DataFrame) -> pd.DataFrame:
        p = batch["l_partkey"].to_numpy(dtype=np.int64)
        s = batch["l_suppkey"].to_numpy(dtype=np.int64)
        p8 = (p - pmin) * DIM // (pmax - pmin + 1)
        s8 = (s - smin) * DIM // (smax - smin + 1)
        m = np.zeros(len(p), dtype=np.int64)
        for i in range(ZPRUNE_DIM_BITS):
            m |= ((p8 >> i) & 1) << (2 * i)
            m |= ((s8 >> i) & 1) << (2 * i + 1)
        zones = {"zorder": m >> ZPRUNE_DIM_BITS,  # top 4+4 bits: 256 zones
                 "partkey_sorted": p8}            # 256 zones
        masks = {"partkey_box": (p >= p_lo) & (p <= p_hi),
                 "suppkey_box": (s >= s_lo) & (s <= s_hi),
                 "ALL": np.ones(len(p), dtype=bool)}
        frames = []
        for lay, z in zones.items():
            for scen, msk in masks.items():
                zz = np.unique(z[msk])
                n = np.int64(msk.sum())
                frames.append(pd.DataFrame(
                    {"scenario": np.full(len(zz), scen, dtype=object),
                     "layout": np.full(len(zz), lay, dtype=object),
                     "zone": zz,
                     "n_match": np.full(len(zz), 0, dtype=np.int64)}
                ))
                # one sentinel row per (scenario, layout) carries the
                # batch's matched-row count (zone -1 never occurs)
                frames.append(pd.DataFrame(
                    {"scenario": [scen], "layout": [lay],
                     "zone": [np.int64(-1)], "n_match": [n]}
                ))
        return pd.concat(frames, ignore_index=True)

    def zone_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["scenario", "layout", "zone"], sort=False,
                           as_index=False)["n_match"].sum()
            .astype({"zone": np.int64, "n_match": np.int64})
        )

    zones = collect_small(
        grouped_aggregate(
            lines.map_batches(zone_rows, batch_format="pandas"),
            ["scenario", "layout", "zone"], zone_combine, coalesce=True,
        ),
        ["scenario", "layout", "zone", "n_match"],
    )
    zones = zones.groupby(
        ["scenario", "layout", "zone"], sort=False, as_index=False
    )["n_match"].sum()
    rows = []
    totals = {}
    for (scen, lay), g in zones.groupby(["scenario", "layout"], sort=False):
        touched = np.int64((g["zone"].to_numpy(dtype=np.int64) >= 0).sum())
        n = np.int64(g.loc[g["zone"] == -1, "n_match"].sum())
        if scen == "ALL":
            totals[lay] = touched
        rows.append({"scenario": scen, "layout": lay,
                     "n_match": n, "zones_touched": touched})
    out = pd.DataFrame(rows)
    out = out[out["scenario"] != "ALL"].copy()
    out["zones_total"] = out["layout"].map(totals).astype(np.int64)
    t = out["zones_touched"].to_numpy(dtype=np.int64)
    tot = out["zones_total"].to_numpy(dtype=np.int64)
    out["touch_share"] = t.astype(np.float64) / tot
    return out[
        ["scenario", "layout", "n_match", "zones_total", "zones_touched",
         "touch_share"]
    ].reset_index(drop=True).astype(
        {"n_match": np.int64, "zones_total": np.int64,
         "zones_touched": np.int64}
    )


ZORDER_PRUNE_STATS_ORACLE = f"""
WITH bounds AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax
  FROM lineitem
), scaled AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         (l_partkey - pmin) * {1 << ZPRUNE_DIM_BITS} // (pmax - pmin + 1)
           AS p8,
         (l_suppkey - smin) * {1 << ZPRUNE_DIM_BITS} // (smax - smin + 1)
           AS s8,
         pmin + (pmax - pmin) * 3 // 8 AS p_lo,
         pmin + (pmax - pmin) * 5 // 8 AS p_hi,
         smin + (smax - smin) * 3 // 8 AS s_lo,
         smin + (smax - smin) * 5 // 8 AS s_hi
  FROM lineitem CROSS JOIN bounds
), z AS (
  SELECT p, s, p_lo, p_hi, s_lo, s_hi, p8,
         (SELECT SUM(
             ((p8 // CAST(pow(2, i) AS BIGINT)) % 2)
               * CAST(pow(4, i) AS BIGINT)
           + ((s8 // CAST(pow(2, i) AS BIGINT)) % 2)
               * 2 * CAST(pow(4, i) AS BIGINT))
          FROM range(0, {ZPRUNE_DIM_BITS}) t(i))
           // {1 << ZPRUNE_DIM_BITS} AS zone_z
  FROM scaled
), scen AS (
  SELECT 'partkey_box' AS scenario, zone_z, p8 AS zone_p,
         (p >= p_lo AND p <= p_hi) AS hit FROM z
  UNION ALL
  SELECT 'suppkey_box', zone_z, p8,
         (s >= s_lo AND s <= s_hi) AS hit FROM z
), lay AS (
  SELECT scenario, 'zorder' AS layout, zone_z AS zone, hit FROM scen
  UNION ALL
  SELECT scenario, 'partkey_sorted', zone_p, hit FROM scen
)
SELECT scenario, layout,
       CAST(count(*) FILTER (hit) AS BIGINT) AS n_match,
       CAST(count(DISTINCT zone) AS BIGINT) AS zones_total,
       CAST(count(DISTINCT zone) FILTER (hit) AS BIGINT) AS zones_touched,
       CAST(count(DISTINCT zone) FILTER (hit) AS DOUBLE)
         / count(DISTINCT zone) AS touch_share
FROM lay GROUP BY 1, 2
"""


def events_transition_dwell(sf_dir: str):
    """Dwell-time-aware Markov transitions: for every consecutive
    within-user (type → next_type) pair, the count, exact µs gap sum,
    and mean dwell — the timing signal :func:`events_transitions`'
    count matrix lacks (how LONG users linger before each move). Same
    one-exchange segment-kernel shape; gap sums ride as int64 next to
    the counts, the mean is one double division per (type × type)
    cell."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def pair_stats(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.copy()
        df["ts_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        types = df["event_type"].to_numpy(dtype=object)
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        if len(df) < 2:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "next_type": pd.Series([], dtype=object),
                 "n_pairs": pd.Series([], dtype=np.int64),
                 "gap_us_sum": pd.Series([], dtype=np.int64)}
            )
        same_user = users[1:] == users[:-1]
        out = pd.DataFrame(
            {"event_type": types[:-1][same_user],
             "next_type": types[1:][same_user],
             "n_pairs": np.ones(int(same_user.sum()), dtype=np.int64),
             "gap_us_sum": (ts[1:] - ts[:-1])[same_user]}
        )
        return (
            out.groupby(["event_type", "next_type"], sort=False,
                        as_index=False)[["n_pairs", "gap_us_sum"]].sum()
            .astype({"n_pairs": np.int64, "gap_us_sum": np.int64})
        )

    partials = grouped_aggregate(events, ["user_id"], pair_stats)
    grid = collect_small(
        partials, ["event_type", "next_type", "n_pairs", "gap_us_sum"]
    )
    if grid.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "next_type": pd.Series([], dtype=str),
             "n_pairs": pd.Series([], dtype=np.int64),
             "gap_us_sum": pd.Series([], dtype=np.int64),
             "mean_gap_us": pd.Series([], dtype=np.float64)}
        )
    g = grid.groupby(["event_type", "next_type"], sort=False,
                     as_index=False)[["n_pairs", "gap_us_sum"]].sum()
    n = g["n_pairs"].to_numpy(dtype=np.int64)
    s = g["gap_us_sum"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {"event_type": g["event_type"].astype(str).to_numpy(),
         "next_type": g["next_type"].astype(str).to_numpy(),
         "n_pairs": n, "gap_us_sum": s,
         "mean_gap_us": s.astype(np.float64) / n}
    )


EVENTS_TRANSITION_DWELL_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         LEAD(event_type) OVER w AS next_type,
         LEAD(epoch_us(ts)) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pairs AS (
  SELECT event_type, next_type, next_ts - ts_us AS gap
  FROM seq WHERE next_type IS NOT NULL
)
SELECT event_type, next_type,
       count(*) AS n_pairs,
       CAST(SUM(gap) AS BIGINT) AS gap_us_sum,
       CAST(SUM(gap) AS DOUBLE) / count(*) AS mean_gap_us
FROM pairs GROUP BY 1, 2
"""


def customer_top2_order_gap(sf_dir: str):
    """Per-customer gap between the two LARGEST order prices — the
    'is the top order an outlier for this account' feature. Mirror of
    the :func:`repeat_purchase_rate` two-smallest partial: each batch
    keeps at most the 2 priciest (price desc, orderkey asc) rows per
    customer, partials merge by re-taking the two priciest, so a whale
    account ships ≤ 2 rows per block. Single-order customers emit
    gap 0 with ``n_orders_seen = 1`` (matching the COALESCE SQL)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )

    def two_largest(frame: pd.DataFrame) -> pd.DataFrame:
        g = frame.sort_values(["custkey", "price_c2", "okey"],
                              ascending=[True, False, True], kind="stable")
        return g.groupby("custkey", sort=False).head(2).reset_index(drop=True)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "okey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "price_c2": np.round(
                 batch["o_totalprice"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64)}
        )
        return two_largest(out)

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        g = two_largest(bucket)
        firsts = g.groupby("custkey", sort=False).nth(0)
        seconds = g.groupby("custkey", sort=False).nth(1)
        top1 = firsts["price_c2"].to_numpy(dtype=np.int64)
        sec = seconds.set_index(seconds["custkey"].to_numpy())["price_c2"]
        sec_v = sec.reindex(firsts["custkey"].to_numpy()).to_numpy(
            dtype=np.float64)
        has2 = np.isfinite(sec_v)
        top2 = np.where(has2, sec_v, 0).astype(np.int64)
        return pd.DataFrame(
            {"c_custkey": firsts["custkey"].to_numpy(dtype=np.int64),
             "top1_centi": top1,
             "top2_centi": top2,
             "gap_centi": np.where(has2, top1 - top2, 0).astype(np.int64),
             "n_orders_seen": (has2.astype(np.int64) + 1)}
        )

    return grouped_aggregate(
        orders.map_batches(prep, batch_format="pandas"),
        ["custkey"], finalize, coalesce=True,
    )


CUSTOMER_TOP2_ORDER_GAP_ORACLE = """
WITH r AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                    o_orderkey ASC) AS rn
  FROM orders
), t1 AS (
  SELECT o_custkey, pc AS top1 FROM r WHERE rn = 1
), t2 AS (
  SELECT o_custkey, pc AS top2 FROM r WHERE rn = 2
)
SELECT t1.o_custkey AS c_custkey,
       top1 AS top1_centi,
       COALESCE(top2, 0) AS top2_centi,
       CASE WHEN top2 IS NULL THEN 0 ELSE top1 - top2 END AS gap_centi,
       CASE WHEN top2 IS NULL THEN 1 ELSE 2 END AS n_orders_seen
FROM t1 LEFT JOIN t2 USING (o_custkey)
"""


def events_dow_anova_components(sf_dir: str):
    """One-way ANOVA sufficient statistics for event value by
    day-of-week (dow = epoch_days % 7) — per-GROUP rows, because the
    F statistic itself sums doubles across groups (accumulation-order-
    dependent, hence never hash-gateable): per dow the exact int64
    (n, Σcenti, Σcenti²) plus the two closed-form doubles any consumer
    needs — the group mean and the within-group sum of squares
    Σx² − (Σx)²/n. Centi scaling keeps Σx² under int64 at 10^9-row
    scale (documented bound); the grid is 7 rows."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        vc = np.round(
            batch["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        out = pd.DataFrame(
            {"dow": (ts_ns // 86_400_000_000_000) % 7,
             "n": np.ones(len(batch), dtype=np.int64),
             "s": vc, "ss": vc * vc}
        )
        return out.groupby("dow", sort=False, as_index=False)[
            ["n", "s", "ss"]
        ].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("dow", sort=False, as_index=False)[
                ["n", "s", "ss"]
            ].sum().astype({"dow": np.int64, "n": np.int64,
                            "s": np.int64, "ss": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, ["dow"], combine, partial=partial,
                          num_partitions=8),
        ["dow", "n", "s", "ss"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"dow": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64),
             "sum_centi": pd.Series([], dtype=np.int64),
             "sumsq_centi2": pd.Series([], dtype=np.int64),
             "mean_centi": pd.Series([], dtype=np.float64),
             "ss_within": pd.Series([], dtype=np.float64)}
        )
    g = grid.groupby("dow", sort=False, as_index=False)[["n", "s", "ss"]].sum()
    n = g["n"].to_numpy(dtype=np.int64)
    s = g["s"].to_numpy(dtype=np.int64)
    ss = g["ss"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {"dow": g["dow"].to_numpy(dtype=np.int64),
         "n": n, "sum_centi": s, "sumsq_centi2": ss,
         "mean_centi": s.astype(np.float64) / n,
         "ss_within": ss.astype(np.float64)
         - s.astype(np.float64) * s / n}
    )


EVENTS_DOW_ANOVA_ORACLE = """
WITH v AS (
  SELECT CAST(epoch_us(ts) // 86400000000 % 7 AS BIGINT) AS dow,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), g AS (
  SELECT dow, count(*) AS n, SUM(vc) AS s, SUM(vc * vc) AS ss
  FROM v GROUP BY 1
)
SELECT dow, CAST(n AS BIGINT) AS n,
       CAST(s AS BIGINT) AS sum_centi,
       CAST(ss AS BIGINT) AS sumsq_centi2,
       CAST(s AS DOUBLE) / n AS mean_centi,
       CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n AS ss_within
FROM g
"""


def supplier_nation_reach(sf_dir: str):
    """Market reach per supplier: how many distinct CUSTOMER nations a
    supplier's lineitems were sold into, plus the order count — the
    'export footprint' rollup over the lineitem⋈orders⋈customer chain.
    The custkey→nationkey ladder broadcasts (as in Q5/Q7); lineitems
    pre-dedup (orderkey, suppkey) per batch, ONE bucketed exchange on
    hash(orderkey) tags each order's customer nation, and the final
    distinct runs per (suppkey, nation) — a grid bounded by suppliers
    × 25, never by lineitem count."""
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    cust = collect_small(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        ["c_custkey", "c_nationkey"],
    )
    order_c = np.argsort(cust["c_custkey"].to_numpy())
    cust_map = ray.put(
        (cust["c_custkey"].to_numpy(dtype=np.int64)[order_c],
         cust["c_nationkey"].to_numpy(dtype=np.int64)[order_c])
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nations = ray.get(cust_map)
        cnat = _np_lookup(keys, nations,
                          batch["o_custkey"].to_numpy(dtype=np.int64))
        kept = cnat >= 0
        return pd.DataFrame(
            {"okey": batch["o_orderkey"].to_numpy(dtype=np.int64)[kept],
             "suppkey": np.zeros(int(kept.sum()), dtype=np.int64),
             "nat": cnat[kept],
             "_side": np.ones(int(kept.sum()), dtype=np.int64)}
        )

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "suppkey": batch["l_suppkey"].to_numpy(dtype=np.int64)}
        ).drop_duplicates()
        out["nat"] = np.int64(0)
        out["_side"] = np.int64(0)
        return out.astype({c: np.int64 for c in out.columns})

    unioned = orders.map_batches(order_rows, batch_format="pandas").union(
        lines.map_batches(line_rows, batch_format="pandas")
    )

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        o = bucket[bucket["_side"] == 1][["okey", "nat"]]
        ln = bucket[bucket["_side"] == 0][["okey", "suppkey"]].drop_duplicates()
        m = ln.merge(o, on="okey", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"suppkey": pd.Series([], dtype=np.int64),
                 "nat": pd.Series([], dtype=np.int64),
                 "n_orders": pd.Series([], dtype=np.int64)}
            )
        return (
            m.groupby(["suppkey", "nat"], sort=False, as_index=False)
            .agg(n_orders=("okey", "nunique"))
            .astype({"suppkey": np.int64, "nat": np.int64,
                     "n_orders": np.int64})
        )

    partials = grouped_aggregate(unioned, ["okey"], join_bucket, coalesce=True)

    def per_supplier(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["suppkey", "nat"], sort=False, as_index=False)[
            "n_orders"
        ].sum()
        out = g.groupby("suppkey", sort=False).agg(
            n_nations=("nat", "nunique"), n_orders=("n_orders", "sum")
        ).reset_index()
        return out.astype({"suppkey": np.int64, "n_nations": np.int64,
                           "n_orders": np.int64})

    return grouped_aggregate(partials, ["suppkey"], per_supplier,
                             num_partitions=8)


SUPPLIER_NATION_REACH_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT l.l_suppkey AS suppkey, o.o_orderkey, c.c_nationkey AS nat
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT suppkey,
       CAST(count(DISTINCT nat) AS BIGINT) AS n_nations,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM pairs GROUP BY 1
"""


def orders_interarrival_stats(sf_dir: str):
    """Inter-order gap statistics per customer — the purchase-cadence
    feature (how often does this account come back): count of gaps,
    exact µs sum/min/max, and the mean (one double division). Same
    one-exchange segment kernel as :func:`events_lag_gaps`: bucket on
    hash(custkey), one stable sort per bucket, vectorized consecutive
    diffs masked at customer boundaries, vectorized per-customer
    rollup. Single-order customers have no gap and are absent (the
    SQL's WHERE rn > 1 semantics)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "okey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "ts_us": batch["o_orderdate"].to_numpy(
                 dtype="datetime64[us]").astype(np.int64)}
        )

    def gaps(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.sort_values(["custkey", "ts_us", "okey"], kind="stable")
        cust = df["custkey"].to_numpy(dtype=np.int64)
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        if len(df) < 2:
            return pd.DataFrame(
                {"c_custkey": pd.Series([], dtype=np.int64),
                 "n_gaps": pd.Series([], dtype=np.int64),
                 "gap_us_sum": pd.Series([], dtype=np.int64),
                 "gap_us_min": pd.Series([], dtype=np.int64),
                 "gap_us_max": pd.Series([], dtype=np.int64),
                 "mean_gap_us": pd.Series([], dtype=np.float64)}
            )
        same = cust[1:] == cust[:-1]
        g = pd.DataFrame(
            {"c_custkey": cust[1:][same], "gap": (ts[1:] - ts[:-1])[same]}
        )
        if g.empty:
            return pd.DataFrame(
                {"c_custkey": pd.Series([], dtype=np.int64),
                 "n_gaps": pd.Series([], dtype=np.int64),
                 "gap_us_sum": pd.Series([], dtype=np.int64),
                 "gap_us_min": pd.Series([], dtype=np.int64),
                 "gap_us_max": pd.Series([], dtype=np.int64),
                 "mean_gap_us": pd.Series([], dtype=np.float64)}
            )
        out = g.groupby("c_custkey", sort=False).agg(
            n_gaps=("gap", "size"), gap_us_sum=("gap", "sum"),
            gap_us_min=("gap", "min"), gap_us_max=("gap", "max"),
        ).reset_index()
        n = out["n_gaps"].to_numpy(dtype=np.int64)
        s = out["gap_us_sum"].to_numpy(dtype=np.int64)
        out["mean_gap_us"] = s.astype(np.float64) / n
        return out.astype(
            {"c_custkey": np.int64, "n_gaps": np.int64,
             "gap_us_sum": np.int64, "gap_us_min": np.int64,
             "gap_us_max": np.int64}
        )

    return grouped_aggregate(
        orders.map_batches(prep, batch_format="pandas"), ["custkey"], gaps
    )


ORDERS_INTERARRIVAL_ORACLE = """
WITH seq AS (
  SELECT o_custkey,
         epoch_us(o_orderdate)
           - LAG(epoch_us(o_orderdate)) OVER w AS gap
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey AS c_custkey,
       count(*) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS gap_us_sum,
       CAST(MIN(gap) AS BIGINT) AS gap_us_min,
       CAST(MAX(gap) AS BIGINT) AS gap_us_max,
       CAST(SUM(gap) AS DOUBLE) / count(*) AS mean_gap_us
FROM seq WHERE gap IS NOT NULL GROUP BY 1
"""


def order_size_distribution(sf_dir: str):
    """Distribution of order SIZES (lineitems per order) — the
    lineitem-side sibling of the Q13 order-count distribution: first a
    bucketed per-orderkey count (combiner-bounded partials), then the
    histogram over counts — a grid bounded by the max basket size,
    never by order count."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "n": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby("okey", sort=False, as_index=False)["n"].sum()

    def per_order(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("okey", sort=False, as_index=False)["n"].sum()
        # combiner: within this bucket, collapse to (n_items, count)
        h = g.groupby("n", sort=False).size().reset_index(name="n_orders")
        return h.rename(columns={"n": "n_items"}).astype(
            {"n_items": np.int64, "n_orders": np.int64}
        )

    partials = grouped_aggregate(lines, ["okey"], per_order, partial=partial)

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("n_items", sort=False, as_index=False)[
                "n_orders"
            ].sum().astype({"n_items": np.int64, "n_orders": np.int64})
        )

    return grouped_aggregate(partials, ["n_items"], hist, num_partitions=8)


ORDER_SIZE_DISTRIBUTION_ORACLE = """
WITH c AS (
  SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1
)
SELECT CAST(n_items AS BIGINT) AS n_items, count(*) AS n_orders
FROM c GROUP BY 1
"""


SEASONAL_LAG_HOURS = 168  # one week


def events_seasonal_naive_mae(sf_dir: str, lag: int = SEASONAL_LAG_HOURS):
    """Backtest of the SEASONAL-NAIVE forecaster (predict this hour's
    event count with the count from the same hour last week) per event
    type: pairs are formed over the DENSE hourly grid between each
    type's first and last hour (missing hours are real zeros — a
    forecaster scores against them too), the error is the exact int
    |actual − predicted| summed over all hours ≥ lag past the start,
    and MAE is one double division. Grid-bounded like gap_fill; the
    shifted self-join is a vectorized array shift inside each type's
    bucket."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    US_PER_HOUR = 3_600_000_000
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    keys = ["event_type", "hour"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "hour": ts_us // US_PER_HOUR,
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["c"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["c"].sum()
            .astype({"hour": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, keys, combine, partial=partial,
                          num_partitions=8),
        ["event_type", "hour", "c"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "n_hours": pd.Series([], dtype=np.int64),
             "abs_err_sum": pd.Series([], dtype=np.int64),
             "mae": pd.Series([], dtype=np.float64)}
        )
    rows = []
    for et, g in grid.groupby("event_type", sort=False):
        g = g.sort_values("hour", kind="stable")
        hours = g["hour"].to_numpy(dtype=np.int64)
        lo, hi = hours[0], hours[-1]
        span = int(hi - lo + 1)
        if span <= lag:
            continue
        dense = np.zeros(span, dtype=np.int64)
        dense[hours - lo] = g["c"].to_numpy(dtype=np.int64)
        err = np.abs(dense[lag:] - dense[:-lag])
        rows.append(
            {"event_type": str(et),
             "n_hours": np.int64(len(err)),
             "abs_err_sum": np.int64(err.sum()),
             "mae": np.float64(err.sum()) / len(err)}
        )
    if not rows:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "n_hours": pd.Series([], dtype=np.int64),
             "abs_err_sum": pd.Series([], dtype=np.int64),
             "mae": pd.Series([], dtype=np.float64)}
        )
    return pd.DataFrame(rows).astype(
        {"n_hours": np.int64, "abs_err_sum": np.int64, "mae": np.float64}
    )


EVENTS_SEASONAL_NAIVE_MAE_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(hour) AS lo, max(hour) AS hi FROM c GROUP BY 1
), dense AS (
  SELECT event_type, CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS hour
  FROM spans
), d AS (
  SELECT dense.event_type, dense.hour, COALESCE(c.n, 0) AS n
  FROM dense LEFT JOIN c
    ON c.event_type = dense.event_type AND c.hour = dense.hour
), pairs AS (
  SELECT a.event_type, abs(a.n - b.n) AS err
  FROM d a JOIN d b
    ON b.event_type = a.event_type AND b.hour = a.hour - 168
)
SELECT event_type,
       count(*) AS n_hours,
       CAST(SUM(err) AS BIGINT) AS abs_err_sum,
       CAST(SUM(err) AS DOUBLE) / count(*) AS mae
FROM pairs GROUP BY 1
"""


def events_type_trigrams(sf_dir: str, k: int = 25):
    """Sequence mining over per-user event streams: the top-k most
    frequent consecutive TYPE TRIGRAMS (a → b → c within one user,
    (ts, event_id) order) — one step up from the Markov pair matrix
    toward behavioral motif discovery. Same one-exchange segment
    kernel as :func:`events_transitions` with a double shift; the
    trigram key space is |types|³ (bounded), so the final top-k is a
    tiny sort with the total (count desc, a, b, c) tie-break mirrored
    in the oracle."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def trigram_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.copy()
        df["ts_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        users = df["user_id"].to_numpy(dtype=np.int64)
        types = df["event_type"].to_numpy(dtype=object)
        if len(df) < 3:
            return pd.DataFrame(
                {"t1": pd.Series([], dtype=object),
                 "t2": pd.Series([], dtype=object),
                 "t3": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        same = (users[2:] == users[1:-1]) & (users[1:-1] == users[:-2])
        out = pd.DataFrame(
            {"t1": types[:-2][same], "t2": types[1:-1][same],
             "t3": types[2:][same]}
        )
        out["n"] = np.int64(1)
        return out.groupby(["t1", "t2", "t3"], sort=False,
                           as_index=False)["n"].sum()

    partials = grouped_aggregate(events, ["user_id"], trigram_counts)
    grid = collect_small(partials, ["t1", "t2", "t3", "n"])
    if grid.empty:
        return pd.DataFrame(
            {"t1": pd.Series([], dtype=str), "t2": pd.Series([], dtype=str),
             "t3": pd.Series([], dtype=str),
             "n": pd.Series([], dtype=np.int64),
             "rank": pd.Series([], dtype=np.int64)}
        )
    g = grid.groupby(["t1", "t2", "t3"], sort=False, as_index=False)["n"].sum()
    g = g.sort_values(["n", "t1", "t2", "t3"],
                      ascending=[False, True, True, True],
                      kind="stable").head(k).reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g.astype({"n": np.int64, "rank": np.int64})


EVENTS_TYPE_TRIGRAMS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT t1, t2, t3, count(*) AS n
  FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT t1, t2, t3, CAST(n AS BIGINT) AS n,
       CAST(row_number() OVER (
         ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC) AS BIGINT) AS rank
FROM g
ORDER BY rank LIMIT 25
"""


def tail_value_share(sf_dir: str, pct: int = 99):
    """Heavy-tail accounting per event type: the exact p99 value
    cutoff (quantile_disc — the smallest value with cumulative count
    ≥ ceil(0.99·n), from the bounded value-centi grid), how many
    events sit at-or-above it, and what share of the type's TOTAL
    value they carry — 'does the top 1% of events dominate the
    volume'. All counts/sums exact int64; the share is one double
    division; the cutoff selection replays DuckDB's quantile_disc
    convention bit-for-bit."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    keys = ["event_type", "vc"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "vc": np.round(
                 batch["value"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["c"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["c"].sum()
            .astype({"vc": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, keys, combine, partial=partial,
                          num_partitions=8),
        ["event_type", "vc", "c"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "n_events": pd.Series([], dtype=np.int64),
             "cutoff_centi": pd.Series([], dtype=np.int64),
             "n_tail": pd.Series([], dtype=np.int64),
             "tail_sum_centi": pd.Series([], dtype=np.int64),
             "tail_share": pd.Series([], dtype=np.float64)}
        )
    rows = []
    for et, g in grid.groupby("event_type", sort=False):
        g = g.sort_values("vc", kind="stable")
        vc = g["vc"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        n = np.int64(c.sum())
        cum = np.cumsum(c)
        # quantile_disc(pct/100): smallest value with cum >= ceil(p*n)
        target = -((-pct * n) // 100)  # ceil(pct*n/100) in ints
        i = int(np.searchsorted(cum, target))
        cutoff = np.int64(vc[i])
        tail_mask = vc >= cutoff
        n_tail = np.int64(c[tail_mask].sum())
        tail_sum = np.int64((vc[tail_mask] * c[tail_mask]).sum())
        total = np.int64((vc * c).sum())
        rows.append(
            {"event_type": str(et), "n_events": n,
             "cutoff_centi": cutoff, "n_tail": n_tail,
             "tail_sum_centi": tail_sum,
             "tail_share": np.float64(tail_sum) / total}
        )
    return pd.DataFrame(rows).astype(
        {"n_events": np.int64, "cutoff_centi": np.int64,
         "n_tail": np.int64, "tail_sum_centi": np.int64,
         "tail_share": np.float64}
    )


TAIL_VALUE_SHARE_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), cut AS (
  SELECT event_type,
         count(*) AS n,
         CAST(quantile_disc(vc, 0.99) AS BIGINT) AS cutoff
  FROM v GROUP BY 1
)
SELECT v.event_type,
       CAST(max(cut.n) AS BIGINT) AS n_events,
       CAST(max(cut.cutoff) AS BIGINT) AS cutoff_centi,
       CAST(count(*) FILTER (vc >= cutoff) AS BIGINT) AS n_tail,
       CAST(SUM(vc) FILTER (vc >= cutoff) AS BIGINT) AS tail_sum_centi,
       CAST(SUM(vc) FILTER (vc >= cutoff) AS DOUBLE) / SUM(vc)
         AS tail_share
FROM v JOIN cut USING (event_type)
GROUP BY 1
"""


def events_value_scaled(sf_dir: str):
    """Min-max feature scaling of event value WITHIN its type — the
    standard ML-feature normalization step, as a two-pass enrichment:
    per-type exact int (min, max) via one bounded aggregate, broadcast
    as a tiny dict, then an embarrassingly-parallel tag pass computing
    ``(v − min) / (max − min)`` — integer subtractions, ONE double
    division per row, bit-exact vs the window SQL. Constant-valued
    types scale to 0.0 (the 0/0 guard, mirrored in the CASE)."""
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "vc": np.round(
                 batch["value"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64)}
        )
        return out.groupby("event_type", sort=False, as_index=False).agg(
            lo=("vc", "min"), hi=("vc", "max")
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("event_type", sort=False, as_index=False).agg(
                lo=("lo", "min"), hi=("hi", "max")
            ).astype({"lo": np.int64, "hi": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(
            events.map_batches(partial, batch_format="pandas"),
            ["event_type"], combine, num_partitions=4,
        ),
        ["event_type", "lo", "hi"],
    )
    bounds = {
        str(r.event_type): (np.int64(r.lo), np.int64(r.hi))
        for r in grid.itertuples()
    }
    bounds_ref = ray.put(bounds)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        bd = ray.get(bounds_ref)
        et = batch["event_type"].astype(str).to_numpy()
        vc = np.round(
            batch["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        scaled = np.zeros(len(batch), dtype=np.float64)
        for t in pd.unique(et):
            m = et == t
            lo, hi = bd[str(t)]
            if hi > lo:
                scaled[m] = (vc[m] - lo).astype(np.float64) / (hi - lo)
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(dtype=np.int64),
             "event_type": et, "value_centi": vc, "scaled": scaled}
        )

    return events.map_batches(tag, batch_format="pandas")


EVENTS_VALUE_SCALED_ORACLE = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc,
         MIN(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY event_type) AS lo,
         MAX(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY event_type) AS hi
  FROM events
)
SELECT event_id, event_type, vc AS value_centi,
       CASE WHEN hi > lo
            THEN CAST(vc - lo AS DOUBLE) / (hi - lo)
            ELSE 0.0 END AS scaled
FROM v
"""


def supplier_balance_outliers(sf_dir: str, z_centi: int = 150):
    """Account-balance outliers: suppliers whose balance sits more
    than ``z_centi/100`` standard deviations from the corpus mean —
    the z-score screen every ingest-quality gate runs. Sufficient
    statistics are the exact int64 (n, Σcenti, Σcenti²) three-int
    all-reduce (per-batch partials, one tiny driver combine); the
    flag pass recomputes z = (v − s/n) / sqrt(ss/n − (s/n)²) per row
    with the SAME expression shape as the SQL, so the flagged set and
    the z doubles both hash-match. Degenerate corpora (n < 2 or zero
    variance) flag nothing."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = np.round(
            batch["s_acctbal"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        return pd.DataFrame(
            {"n": [np.int64(len(batch))],
             "s": [np.int64(vc.sum())],
             "ss": [np.int64((vc * vc).sum())]}
        )

    tot = collect_small(
        supp.map_batches(partial, batch_format="pandas"), ["n", "s", "ss"]
    )
    n = np.int64(tot["n"].sum())
    empty = pd.DataFrame(
        {"s_suppkey": pd.Series([], dtype=np.int64),
         "s_nationkey": pd.Series([], dtype=np.int64),
         "balance_centi": pd.Series([], dtype=np.int64),
         "z_score": pd.Series([], dtype=np.float64)}
    )
    if n < 2:
        return empty
    s_sum = np.int64(tot["s"].sum())
    ss = np.int64(tot["ss"].sum())
    mean = np.float64(s_sum) / n
    var = np.float64(ss) / n - mean * mean
    if var <= 0:
        return empty
    sd = np.sqrt(var)
    thresh = np.float64(z_centi) / 100

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        vc = np.round(
            batch["s_acctbal"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        z = (vc - mean) / sd
        keep = np.abs(z) > thresh
        return pd.DataFrame(
            {"s_suppkey": batch["s_suppkey"].to_numpy(dtype=np.int64)[keep],
             "s_nationkey": batch["s_nationkey"].to_numpy(
                 dtype=np.int64)[keep],
             "balance_centi": vc[keep],
             "z_score": z[keep]}
        )

    return supp.map_batches(flag, batch_format="pandas")


SUPPLIER_BALANCE_OUTLIERS_ORACLE = """
WITH g AS (
  SELECT count(*) AS n,
         SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS s,
         SUM(CAST(round(s_acctbal * 100) AS BIGINT)
             * CAST(round(s_acctbal * 100) AS BIGINT)) AS ss
  FROM supplier
), z AS (
  SELECT sp.s_suppkey, sp.s_nationkey,
         CAST(round(sp.s_acctbal * 100) AS BIGINT) AS balance_centi,
         (CAST(round(sp.s_acctbal * 100) AS BIGINT)
          - CAST(g.s AS DOUBLE) / g.n)
         / sqrt(CAST(g.ss AS DOUBLE) / g.n
                - (CAST(g.s AS DOUBLE) / g.n)
                  * (CAST(g.s AS DOUBLE) / g.n)) AS z_score
  FROM supplier sp CROSS JOIN g
  WHERE g.n >= 2
    AND CAST(g.ss AS DOUBLE) / g.n
        - (CAST(g.s AS DOUBLE) / g.n) * (CAST(g.s AS DOUBLE) / g.n) > 0
)
SELECT s_suppkey, s_nationkey, balance_centi, z_score
FROM z WHERE abs(z_score) > CAST(1.5 AS DOUBLE)
"""


def events_zero_hour_share(sf_dir: str):
    """Coverage gaps per type: over the dense hourly grid between a
    type's first and last event, how many hours saw ZERO events and
    what share of the span that is — the liveness/telemetry-health
    number behind alerting ("this stream goes dark 30% of hours").
    Same bounded grid as :func:`events_gap_fill`; one closed-form
    double per type."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    US_PER_HOUR = 3_600_000_000
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    keys = ["event_type", "hour"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "hour": ts_us // US_PER_HOUR,
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["c"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["c"].sum()
            .astype({"hour": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, keys, combine, partial=partial,
                          num_partitions=8),
        ["event_type", "hour", "c"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "span_hours": pd.Series([], dtype=np.int64),
             "present_hours": pd.Series([], dtype=np.int64),
             "zero_hours": pd.Series([], dtype=np.int64),
             "zero_share": pd.Series([], dtype=np.float64)}
        )
    rows = []
    for et, g in grid.groupby("event_type", sort=False):
        hours = g["hour"].to_numpy(dtype=np.int64)
        span = np.int64(hours.max() - hours.min() + 1)
        present = np.int64(len(np.unique(hours)))
        zero = np.int64(span - present)
        rows.append(
            {"event_type": str(et), "span_hours": span,
             "present_hours": present, "zero_hours": zero,
             "zero_share": np.float64(zero) / span}
        )
    return pd.DataFrame(rows).astype(
        {"span_hours": np.int64, "present_hours": np.int64,
         "zero_hours": np.int64, "zero_share": np.float64}
    )


EVENTS_ZERO_HOUR_SHARE_ORACLE = """
WITH h AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour
  FROM events
), g AS (
  SELECT event_type,
         max(hour) - min(hour) + 1 AS span_hours,
         count(DISTINCT hour) AS present_hours
  FROM h GROUP BY 1
)
SELECT event_type,
       CAST(span_hours AS BIGINT) AS span_hours,
       CAST(present_hours AS BIGINT) AS present_hours,
       CAST(span_hours - present_hours AS BIGINT) AS zero_hours,
       CAST(span_hours - present_hours AS DOUBLE) / span_hours
         AS zero_share
FROM g
"""


def customer_value_corr(sf_dir: str):
    """Exact Pearson correlation between a customer's account balance
    and their total order revenue — the 'does stated balance predict
    spend' check, and the cross-TABLE sibling of ``lineitem_corr``:
    per-customer revenue comes from ONE bucketed aggregate over
    orders, the balance attaches in the same bucket (tagged union on
    hash(custkey) — customer is a fact table, no broadcast), and the
    per-bucket partials are the five exact int64 sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) that any split merges losslessly. The
    closed form evaluates ONCE in double (same expression as the SQL:
    see oracle-float-parity), so even corr hash-matches. Balance in
    centi, revenue in DOLLARS (floor) to keep Σxy under int64 at
    10^9-customer scale."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def cust_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": batch["c_custkey"].to_numpy(dtype=np.int64),
             "v": np.round(
                 batch["c_acctbal"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "_side": np.zeros(len(batch), dtype=np.int64)}
        )

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
             "v": np.floor(
                 batch["o_totalprice"].to_numpy(dtype=np.float64)
             ).astype(np.int64)}
        )
        out = out.groupby("custkey", sort=False, as_index=False)["v"].sum()
        out["_side"] = np.int64(1)
        return out

    unioned = cust.map_batches(cust_rows, batch_format="pandas").union(
        orders.map_batches(order_rows, batch_format="pandas")
    )

    def moments(bucket: pd.DataFrame) -> pd.DataFrame:
        bal = bucket[bucket["_side"] == 0][["custkey", "v"]].rename(
            columns={"v": "x"}
        )
        rev = bucket[bucket["_side"] == 1].groupby(
            "custkey", sort=False, as_index=False)["v"].sum().rename(
            columns={"v": "y"}
        )
        m = bal.merge(rev, on="custkey", how="inner")
        if m.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ("n", "sx", "sy", "sxy", "sxx", "syy")}
            )
        x = m["x"].to_numpy(dtype=np.int64)
        y = m["y"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"n": [np.int64(len(m))], "sx": [np.int64(x.sum())],
             "sy": [np.int64(y.sum())], "sxy": [np.int64((x * y).sum())],
             "sxx": [np.int64((x * x).sum())],
             "syy": [np.int64((y * y).sum())]}
        )

    parts = collect_small(
        grouped_aggregate(unioned, ["custkey"], moments, coalesce=True),
        ["n", "sx", "sy", "sxy", "sxx", "syy"],
    )
    n = np.int64(parts["n"].sum())
    if n < 2:
        return pd.DataFrame(
            {"n_customers": pd.Series([], dtype=np.int64),
             "corr": pd.Series([], dtype=np.float64)}
        )
    sx = np.int64(parts["sx"].sum())
    sy = np.int64(parts["sy"].sum())
    sxy = np.int64(parts["sxy"].sum())
    sxx = np.int64(parts["sxx"].sum())
    syy = np.int64(parts["syy"].sum())
    num = np.float64(n) * sxy - np.float64(sx) * sy
    den = np.sqrt(np.float64(n) * sxx - np.float64(sx) * sx) * np.sqrt(
        np.float64(n) * syy - np.float64(sy) * sy
    )
    return pd.DataFrame(
        {"n_customers": [n], "corr": [num / den]}
    )


CUSTOMER_VALUE_CORR_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(floor(o_totalprice) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), j AS (
  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS x, rev.y
  FROM customer JOIN rev ON rev.o_custkey = c_custkey
), m AS (
  SELECT count(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_customers,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
          * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         AS corr
FROM m
"""


def part_brand_return_rate(sf_dir: str):
    """Return rate per part brand — the merchandising-quality rollup:
    lineitems attach their brand via the broadcast partkey→brand
    lookup (dimension ladder, as Q5/Q7 do for nations) and the counts
    collapse two-phase to a |brands|-row grid with one double division
    per brand."""
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    part = collect_small(
        rd.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        ),
        ["p_partkey", "p_brand"],
    )
    order_p = np.argsort(part["p_partkey"].to_numpy())
    keys_sorted = part["p_partkey"].to_numpy(dtype=np.int64)[order_p]
    brands_sorted = part["p_brand"].astype(str).to_numpy()[order_p]
    part_map = ray.put((keys_sorted, brands_sorted))

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_returnflag"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys, brands = ray.get(part_map)
        pk = batch["l_partkey"].to_numpy(dtype=np.int64)
        idx = np.searchsorted(keys, pk)
        idx = np.clip(idx, 0, len(keys) - 1)
        hit = keys[idx] == pk
        out = pd.DataFrame(
            {"brand": brands[idx][hit],
             "n_lines": np.ones(int(hit.sum()), dtype=np.int64),
             "n_returns": (
                 batch["l_returnflag"].astype(str).to_numpy()[hit] == "R"
             ).astype(np.int64)}
        )
        return out.groupby("brand", sort=False, as_index=False)[
            ["n_lines", "n_returns"]
        ].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("brand", sort=False, as_index=False)[
                ["n_lines", "n_returns"]
            ].sum().astype({"n_lines": np.int64, "n_returns": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(lines, ["brand"], combine, partial=partial,
                          num_partitions=8),
        ["brand", "n_lines", "n_returns"],
    )
    if grid.empty:
        return pd.DataFrame(
            {"p_brand": pd.Series([], dtype=str),
             "n_lines": pd.Series([], dtype=np.int64),
             "n_returns": pd.Series([], dtype=np.int64),
             "return_share": pd.Series([], dtype=np.float64)}
        )
    g = grid.groupby("brand", sort=False, as_index=False)[
        ["n_lines", "n_returns"]
    ].sum()
    n = g["n_lines"].to_numpy(dtype=np.int64)
    r = g["n_returns"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {"p_brand": g["brand"].astype(str).to_numpy(),
         "n_lines": n, "n_returns": r,
         "return_share": r.astype(np.float64) / n}
    )


PART_BRAND_RETURN_RATE_ORACLE = """
SELECT p_brand,
       count(*) AS n_lines,
       CAST(count(*) FILTER (l_returnflag = 'R') AS BIGINT) AS n_returns,
       CAST(count(*) FILTER (l_returnflag = 'R') AS DOUBLE) / count(*)
         AS return_share
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1
"""


QTY_BAND = 10          # quantity band width
PRICE_BAND_C2 = 1_000_000  # price band width: $10,000 in centi


def lineitem_qty_price_histogram2d(sf_dir: str):
    """2-D banded histogram of (quantity, extended price) — the
    numeric×numeric contingency a pricing dashboard heatmaps (the 1-D
    sibling is ``events_value_histogram``): fixed-width integer bands
    (qty // 10, price_centi // 10^6), counts plus exact revenue per
    cell, all through one bounded two-phase aggregate (the grid is
    value-domain-bounded)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )
    keys = ["qty_band", "price_band"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # floor, not truncate-vs-round: np truncation and DuckDB's
        # half-away CAST only agree on integral data; floor() is the
        # same function in both engines for any input.
        qty = np.floor(
            batch["l_quantity"].to_numpy(dtype=np.float64)
        ).astype(np.int64)
        pc = np.round(
            batch["l_extendedprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        out = pd.DataFrame(
            {"qty_band": qty // QTY_BAND,
             "price_band": pc // PRICE_BAND_C2,
             "n_lines": np.ones(len(batch), dtype=np.int64),
             "revenue_centi": pc}
        )
        return out.groupby(keys, sort=False, as_index=False)[
            ["n_lines", "revenue_centi"]
        ].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)[
                ["n_lines", "revenue_centi"]
            ].sum().astype({"qty_band": np.int64, "price_band": np.int64,
                            "n_lines": np.int64, "revenue_centi": np.int64})
        )

    return grouped_aggregate(lines, keys, combine, partial=partial,
                             num_partitions=8)


LINEITEM_QTY_PRICE_HIST2D_ORACLE = """
SELECT CAST(CAST(floor(l_quantity) AS BIGINT) // 10 AS BIGINT) AS qty_band,
       CAST(CAST(round(l_extendedprice * 100) AS BIGINT) // 1000000
            AS BIGINT) AS price_band,
       count(*) AS n_lines,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_centi
FROM lineitem GROUP BY 1, 2
"""


def q21_suppliers_kept_waiting(sf_dir: str, late_days: int = 60):
    """TPC-H-Q21 shape adapted to this schema (lineitem has no
    commit/receipt dates — "late" is ``l_shipdate > o_orderdate +
    late_days``): for finished ('F') multi-supplier orders where
    EXACTLY ONE supplier shipped late, blame that supplier; count
    blames per supplier. The reference query's EXISTS/NOT-EXISTS pair
    collapses to per-order distinct-supplier counting, which runs
    WHERE the order's lines already meet its header.

    Shape: ONE bucketed exchange on hash(orderkey) — order headers
    (date + status) and lineitem (suppkey, shipdate) rows meet in the
    bucket; each bucket computes per-order ``nunique`` supplier /
    late-supplier counts vectorized and emits at most one blamed
    suppkey per order. The second exchange is the tiny supplier-name
    attach (suppliers are dimension-bounded), done driver-side via
    ``collect_small`` exactly like the other dimension ladders.
    Output is every blamed supplier (no LIMIT ambiguity), sorted
    numwait desc / s_name asc.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    late_us = int(late_days) * 86_400_000_000

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ship_us = (
            batch["l_shipdate"].to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        return pd.DataFrame(
            {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "suppkey": batch["l_suppkey"].to_numpy(dtype=np.int64),
             "ship_us": ship_us,
             "odate_us": np.zeros(len(batch), dtype=np.int64),
             "side": np.zeros(len(batch), dtype=np.int64)}
        )

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["o_orderstatus"] == "F"]
        odate_us = (
            keep["o_orderdate"].to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        return pd.DataFrame(
            {"okey": keep["o_orderkey"].to_numpy(dtype=np.int64),
             "suppkey": np.zeros(len(keep), dtype=np.int64),
             "ship_us": np.zeros(len(keep), dtype=np.int64),
             "odate_us": odate_us,
             "side": np.ones(len(keep), dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(line_rows, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(order_rows, batch_format="pandas")

    def blame(bucket: pd.DataFrame) -> pd.DataFrame:
        heads = bucket[bucket["side"] == 1]
        if heads.empty:
            return pd.DataFrame({"suppkey": np.array([], dtype=np.int64),
                                 "numwait": np.array([], dtype=np.int64)})
        odate = heads.drop_duplicates("okey").set_index("okey")["odate_us"]
        li = bucket[bucket["side"] == 0].copy()
        li["odate_us"] = li["okey"].map(odate)
        li = li[li["odate_us"].notna()]  # 'F' orders only
        li["late"] = (
            li["ship_us"] > li["odate_us"].astype(np.int64) + late_us
        )
        g = li.groupby("okey", sort=False).agg(n_supp=("suppkey", "nunique"))
        lg = (
            li[li["late"]].groupby("okey", sort=False)["suppkey"]
            .agg(["nunique", "max"])
        )
        g["n_late_supp"] = lg["nunique"].reindex(g.index).fillna(0).astype(int)
        g["late_one"] = lg["max"].reindex(g.index)
        blamed = g[(g["n_supp"] > 1) & (g["n_late_supp"] == 1)]
        out = (
            blamed.groupby("late_one", sort=False).size().reset_index()
        )
        return pd.DataFrame(
            {"suppkey": out["late_one"].to_numpy(dtype=np.int64),
             "numwait": out[0].to_numpy(dtype=np.int64)}
        )

    partials = grouped_aggregate(
        lines.union(orders), ["okey"], blame, num_partitions=16,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("suppkey", sort=False)["numwait"].sum().reset_index()
        return g.astype({"suppkey": np.int64, "numwait": np.int64})

    agg = grouped_aggregate(partials, ["suppkey"], final, num_partitions=4)
    small = collect_small(agg, ["suppkey", "numwait"])

    names = collect_small(
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]),
        ["s_suppkey", "s_name"],
    )
    out = small.merge(names, left_on="suppkey", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "numwait"]].sort_values(
        ["numwait", "s_name"], ascending=[False, True]
    ).reset_index(drop=True)
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["numwait"] = out["numwait"].astype(np.int64)
    return out


def q21_suppliers_kept_waiting_oracle(late_days: int = 60) -> str:
    return f"""
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate
                   + INTERVAL {int(late_days)} DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
           AS n_late_supp,
         max(CASE WHEN late = 1 THEN l_suppkey END) AS late_one
  FROM li GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order p JOIN supplier s ON s.s_suppkey = p.late_one
WHERE p.n_supp > 1 AND p.n_late_supp = 1
GROUP BY 1, 2
"""


def q22_idle_customer_balance(sf_dir: str,
                              segments: tuple = ("AUTOMOBILE", "FURNITURE",
                                                 "MACHINERY")):
    """TPC-H-Q22 shape adapted to this schema (customers have no phone
    — the country-prefix set becomes a market-segment set; every
    synthetic customer has at least one order, so Q22's "no orders"
    becomes "no URGENT orders" to keep the anti-join non-vacuous):
    customers in the segment set whose balance exceeds the average
    POSITIVE balance of that same population and who have placed no
    1-URGENT order, summarized per segment. The classic
    broadcast-scalar + anti-join pattern.

    The above-average cut is integer-exact: instead of comparing
    against a float mean, qualify with ``bal_c * cnt > sum_c`` (both
    sides int64; cnt/sum_c are the two-int global all-reduce over the
    positive-balance population), so no float can flip a boundary
    customer — the oracle replays the identical integer inequality.
    The anti join is ONE bucketed exchange on hash(custkey): order
    custkeys arrive per-batch-deduped, qualifying customers keep only
    rows whose custkey saw no order row; the exchange output is
    per-segment partial sums, so the final aggregate is
    segment-bounded."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    seg_set = set(segments)

    cust_cols = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )

    def bal_partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["c_mktsegment"].isin(seg_set)]
        bal_c = np.round(
            keep["c_acctbal"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        pos = bal_c[bal_c > 0]
        return pd.DataFrame({"sum_c": [int(pos.sum())],
                             "cnt": [int(len(pos))]})

    totals = collect_small(
        cust_cols.map_batches(bal_partial, batch_format="pandas"),
        ["sum_c", "cnt"],
    )
    sum_c = int(totals["sum_c"].sum())
    cnt = int(totals["cnt"].sum())

    def qualifying(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["c_mktsegment"].isin(seg_set)]
        bal_c = np.round(
            keep["c_acctbal"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        m = bal_c * cnt > sum_c
        keep = keep[m]
        return pd.DataFrame(
            {"custkey": keep["c_custkey"].to_numpy(dtype=np.int64),
             "segment": keep["c_mktsegment"].astype(str).to_numpy(),
             "bal_c": bal_c[m],
             "side": np.zeros(m.sum(), dtype=np.int64)}
        )

    def order_keys(batch: pd.DataFrame) -> pd.DataFrame:
        urgent = batch[batch["o_orderpriority"] == "1-URGENT"]
        keys = np.unique(urgent["o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"custkey": keys,
             "segment": np.full(len(keys), "", dtype=object),
             "bal_c": np.zeros(len(keys), dtype=np.int64),
             "side": np.ones(len(keys), dtype=np.int64)}
        )

    cands = cust_cols.map_batches(qualifying, batch_format="pandas")
    okeys = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(order_keys, batch_format="pandas")

    def anti(bucket: pd.DataFrame) -> pd.DataFrame:
        has_order = set(
            bucket.loc[bucket["side"] == 1, "custkey"].tolist()
        )
        c = bucket[bucket["side"] == 0]
        c = c[~c["custkey"].isin(has_order)]
        g = c.groupby("segment", sort=False).agg(
            numcust=("custkey", "size"), totacctbal_cents=("bal_c", "sum")
        ).reset_index()
        return g.astype({"numcust": np.int64, "totacctbal_cents": np.int64})

    partials = grouped_aggregate(
        cands.union(okeys), ["custkey"], anti, num_partitions=16,
    )
    small = collect_small(partials, ["segment", "numcust", "totacctbal_cents"])
    out = small.groupby("segment", sort=False, as_index=False)[
        ["numcust", "totacctbal_cents"]
    ].sum().sort_values("segment").reset_index(drop=True)
    out["numcust"] = out["numcust"].astype(np.int64)
    out["totacctbal_cents"] = out["totacctbal_cents"].astype(np.int64)
    return out


def q22_idle_customer_balance_oracle(
        segments: tuple = ("AUTOMOBILE", "FURNITURE", "MACHINERY")) -> str:
    seg_list = ", ".join(f"'{s}'" for s in segments)
    return f"""
WITH pop AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_mktsegment IN ({seg_list})
), tot AS (
  SELECT CAST(SUM(CASE WHEN bal_c > 0 THEN bal_c ELSE 0 END) AS BIGINT)
           AS sum_c,
         CAST(SUM(CASE WHEN bal_c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt
  FROM pop
)
SELECT p.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(p.bal_c) AS BIGINT) AS totacctbal_cents
FROM pop p, tot t
WHERE p.bal_c * t.cnt > t.sum_c
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = p.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def nation_market_share(sf_dir: str, region: str = "ASIA"):
    """TPC-H-Q8 shape generalized: per order year, each supplier
    nation's share of the revenue billed to customers of one REGION.
    Q8 fixes a single focus nation; the matrix form answers every
    supplier nation at once from the same single fact exchange.

    Shape: the dimension ladder (supplier→nation, customer→nation→
    region) collapses to sorted-array broadcast lookups via
    ``ray.put`` (dimensions are ~10^-4 of fact bytes at TPC-H ratios;
    the 100-TB fallback is tagging custkeys into the exchange as in
    :func:`trade_matrix_nations`). Lineitems pre-aggregate exact c4
    revenue per (orderkey, supp_nation) INSIDE each batch; orders keep
    only in-region customers and tag the year; both meet in ONE
    bucketed exchange on hash(orderkey). The final table is at most
    |nations| x |years| rows, so the per-year total + share divide is
    a driver-side closed form over exact int64s (``100.0 * rev /
    total``), written identically in the oracle."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    region_keys = set(
        reg.loc[reg["r_name"] == region, "r_regionkey"].astype(int)
    )
    in_region_nations = set(
        nation.loc[nation["n_regionkey"].astype(int).isin(region_keys),
                   "n_nationkey"].astype(int)
    )
    nat_names = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    cust = collect_small(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        ["c_custkey", "c_nationkey"],
    )
    cust = cust[cust["c_nationkey"].astype(int).isin(in_region_nations)]
    ck = np.sort(cust["c_custkey"].to_numpy(dtype=np.int64))
    cust_ref = ray.put(ck)

    supp = collect_small(
        rd.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ),
        ["s_suppkey", "s_nationkey"],
    )
    order_s = np.argsort(supp["s_suppkey"].to_numpy())
    supp_ref = ray.put(
        (supp["s_suppkey"].to_numpy(dtype=np.int64)[order_s],
         supp["s_nationkey"].to_numpy(dtype=np.int64)[order_s])
    )

    class LinePartial:
        def __init__(self):
            self.sk, self.sn = ray.get(supp_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            cents = np.round(
                batch["l_extendedprice"].to_numpy(dtype=np.float64) * 100
            ).astype(np.int64)
            pct = np.round(
                batch["l_discount"].to_numpy(dtype=np.float64) * 100
            ).astype(np.int64)
            rev = cents * (100 - pct)
            sup = batch["l_suppkey"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(self.sk, sup)
            idx = np.clip(idx, 0, len(self.sk) - 1)
            nkey = np.where(self.sk[idx] == sup, self.sn[idx], -1)
            part = (
                pd.DataFrame(
                    {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64),
                     "supp_nkey": nkey, "rev_c4": rev}
                )
                .groupby(["okey", "supp_nkey"], sort=False)["rev_c4"]
                .sum().reset_index()
            )
            part["year"] = np.zeros(len(part), dtype=np.int64)
            part["side"] = np.zeros(len(part), dtype=np.int64)
            return part.astype({"okey": np.int64, "supp_nkey": np.int64,
                                "rev_c4": np.int64})

    class OrderRows:
        def __init__(self):
            self.ck = ray.get(cust_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            cust_k = batch["o_custkey"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(self.ck, cust_k)
            idx = np.clip(idx, 0, max(len(self.ck) - 1, 0))
            in_reg = (
                (self.ck[idx] == cust_k) if len(self.ck) else
                np.zeros(len(batch), dtype=bool)
            )
            keep = batch[in_reg]
            years = (
                keep["o_orderdate"].to_numpy().astype("datetime64[Y]")
                .astype(np.int64) + 1970
            )
            return pd.DataFrame(
                {"okey": keep["o_orderkey"].to_numpy(dtype=np.int64),
                 "supp_nkey": np.full(len(keep), -1, dtype=np.int64),
                 "rev_c4": np.zeros(len(keep), dtype=np.int64),
                 "year": years, "side": np.ones(len(keep), dtype=np.int64)}
            )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(LinePartial, batch_format="pandas", concurrency=(1, 8))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(OrderRows, batch_format="pandas", concurrency=(1, 4))

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        heads = bucket[bucket["side"] == 1]
        if heads.empty:
            return pd.DataFrame(
                {"o_year": np.array([], dtype=np.int64),
                 "supp_nkey": np.array([], dtype=np.int64),
                 "rev_c4": np.array([], dtype=np.int64)}
            )
        yr = heads.drop_duplicates("okey").set_index("okey")["year"]
        li = bucket[bucket["side"] == 0].copy()
        li["o_year"] = li["okey"].map(yr)
        li = li[li["o_year"].notna()]
        g = (
            li.groupby([li["o_year"].astype(np.int64), "supp_nkey"],
                       sort=False)["rev_c4"].sum().reset_index()
        )
        return g.astype({"o_year": np.int64, "supp_nkey": np.int64,
                         "rev_c4": np.int64})

    partials = grouped_aggregate(
        lines.union(orders), ["okey"], per_bucket, num_partitions=16,
    )
    small = collect_small(partials, ["o_year", "supp_nkey", "rev_c4"])
    agg = small.groupby(["o_year", "supp_nkey"], as_index=False)["rev_c4"].sum()
    agg["year_rev_c4"] = agg.groupby("o_year")["rev_c4"].transform("sum")
    agg["supp_nation"] = agg["supp_nkey"].map(nat_names).fillna("UNKNOWN")
    agg["share_pct"] = 100.0 * agg["rev_c4"] / agg["year_rev_c4"]
    out = agg[["o_year", "supp_nation", "rev_c4", "year_rev_c4",
               "share_pct"]].sort_values(["o_year", "supp_nation"])
    out = out.reset_index(drop=True)
    out["o_year"] = out["o_year"].astype(np.int64)
    out["rev_c4"] = out["rev_c4"].astype(np.int64)
    out["year_rev_c4"] = out["year_rev_c4"].astype(np.int64)
    return out


def nation_market_share_oracle(region: str = "ASIA") -> str:
    return f"""
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         n_s.n_name AS supp_nation,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_c4
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n_c ON n_c.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n_c.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n_s ON n_s.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{region}'
), agg AS (
  SELECT o_year, supp_nation, CAST(SUM(rev_c4) AS BIGINT) AS rev_c4
  FROM base GROUP BY 1, 2
)
SELECT o_year, supp_nation, rev_c4,
       CAST(SUM(rev_c4) OVER (PARTITION BY o_year) AS BIGINT)
         AS year_rev_c4,
       100.0 * CAST(rev_c4 AS DOUBLE)
             / CAST(SUM(rev_c4) OVER (PARTITION BY o_year) AS DOUBLE)
         AS share_pct
FROM agg
"""


def q13_order_count_distribution(sf_dir: str):
    """TPC-H-Q13 shape: the distribution of customers by order count,
    INCLUDING the zero-order customers the LEFT JOIN exists for.

    Shape: orders pre-aggregate per-batch counts per custkey, one
    bucketed exchange sums them (customer-cardinality groups), a
    second tiny exchange rolls counts into the distribution (the
    domain is at most max-orders-per-customer values). The zero row
    never touches the join: it is ``total customers − customers with
    ≥1 order``, a driver-side subtraction of two scalars — the
    100-TB-safe replacement for materializing a customer×orders LEFT
    JOIN. Reference shape: TPC-H Q13 (no comment filter; the schema
    has no o_comment)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby("o_custkey", sort=False).size()
            .reset_index(name="c_count")
        )
        return g.astype({"o_custkey": np.int64, "c_count": np.int64})

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("o_custkey", sort=False)["c_count"].sum()
            .reset_index()
        )
        return g.astype({"o_custkey": np.int64, "c_count": np.int64})

    per_cust = grouped_aggregate(orders, ["o_custkey"], partial=partial,
                                 combine=combine)

    def dist(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("c_count", sort=False).size()
            .reset_index(name="custdist")
        )
        return g.astype({"c_count": np.int64, "custdist": np.int64})

    out = collect_small(
        grouped_aggregate(per_cust, ["c_count"], dist),
        ["c_count", "custdist"],
    )
    out = (
        out.groupby("c_count", sort=False)["custdist"].sum().reset_index()
        .astype({"c_count": np.int64, "custdist": np.int64})
    )
    total_customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    zero = int(total_customers) - int(out["custdist"].sum())
    if zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [np.int64(0)],
                                "custdist": [np.int64(zero)]})],
            ignore_index=True,
        )
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


Q13_ORDER_COUNT_DISTRIBUTION_ORACLE = """
WITH per AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
FROM per GROUP BY 1
"""


def q15_top_supplier(sf_dir: str,
                     start: str = "1996-01-01", end: str = "1996-04-01"):
    """TPC-H-Q15 shape: the supplier(s) with the maximum revenue over a
    three-month ship window — Q15's view + WHERE total = max(total),
    ties kept. Revenue is the exact integer c4 form (cents ×
    (100 − discount%)) summed as int64, so the max comparison can never
    flip on float association order; the single displayed double is the
    closed form c4/10⁴.

    Shape: one two-phase aggregate over suppkey (supplier-bounded
    groups), then the max + name attach on the supplier-cardinality
    result driver-side."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ship = (
            batch["l_shipdate"].to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        keep = (ship >= lo) & (ship < hi)
        b = batch[keep]
        cents = np.round(
            b["l_extendedprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        pct = np.round(
            b["l_discount"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {"suppkey": b["l_suppkey"].to_numpy(dtype=np.int64),
             "rev_c4": cents * (100 - pct)}
        )
        return (
            df.groupby("suppkey", sort=False)["rev_c4"].sum().reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("suppkey", sort=False)["rev_c4"].sum().reset_index()
        return g.astype({"suppkey": np.int64, "rev_c4": np.int64})

    rev = collect_small(
        grouped_aggregate(lines, ["suppkey"], combine, partial=partial),
        ["suppkey", "rev_c4"],
    )
    rev = (
        rev.groupby("suppkey", sort=False)["rev_c4"].sum().reset_index()
    )
    if rev.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype=np.int64),
             "s_name": pd.Series([], dtype=str),
             "total_rev_c4": pd.Series([], dtype=np.int64),
             "total_revenue": pd.Series([], dtype=np.float64)}
        )
    top = rev[rev["rev_c4"] == rev["rev_c4"].max()]

    names = collect_small(
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]),
        ["s_suppkey", "s_name"],
    )
    out = top.merge(names, left_on="suppkey", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name"]].assign(
        total_rev_c4=top["rev_c4"].to_numpy(dtype=np.int64),
        total_revenue=top["rev_c4"].to_numpy(dtype=np.float64) / 10000.0,
    )
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q15_top_supplier_oracle(start: str = "1996-01-01",
                            end: str = "1996-04-01") -> str:
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS rev_c4
  FROM lineitem
  WHERE l_shipdate >= DATE '{start}' AND l_shipdate < DATE '{end}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.rev_c4 AS total_rev_c4,
       CAST(r.rev_c4 AS DOUBLE) / 10000 AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_c4 = (SELECT max(rev_c4) FROM rev)
"""


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#13"):
    """TPC-H-Q17 shape: average yearly revenue lost if small-quantity
    orders (qty < 20% of the part's average order quantity) for one
    brand were no longer taken. The correlated ``avg(l_quantity)``
    subquery needs no second pass: the per-part average comes from the
    SAME lineitem rows, so brand-filtered part keys and lineitem rows
    meet in ONE bucketed exchange on hash(partkey) and each bucket
    both computes the per-part mean and applies the cut. The cut is
    the cross-multiplied integer inequality ``5·qty_c·cnt < Σqty_c``
    (qty < avg/5 with no float division anywhere); the one double is
    the closed form Σprice_c/100/7."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    def part_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["p_brand"] == brand]
        return pd.DataFrame(
            {"pkey": keep["p_partkey"].to_numpy(dtype=np.int64),
             "qty_c": np.zeros(len(keep), dtype=np.int64),
             "price_c": np.zeros(len(keep), dtype=np.int64),
             "side": np.ones(len(keep), dtype=np.int64)}
        )

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pkey": batch["l_partkey"].to_numpy(dtype=np.int64),
             "qty_c": np.round(
                 batch["l_quantity"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "price_c": np.round(
                 batch["l_extendedprice"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "side": np.zeros(len(batch), dtype=np.int64)}
        )

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(part_rows, batch_format="pandas")
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(line_rows, batch_format="pandas")

    def cut(bucket: pd.DataFrame) -> pd.DataFrame:
        keys = set(bucket.loc[bucket["side"] == 1, "pkey"].tolist())
        li = bucket[(bucket["side"] == 0) & bucket["pkey"].isin(keys)]
        if li.empty:
            return pd.DataFrame({"n_rows": np.array([], dtype=np.int64),
                                 "revenue_c": np.array([], dtype=np.int64)})
        st = li.groupby("pkey", sort=False)["qty_c"].agg(["sum", "count"])
        sum_qty = li["pkey"].map(st["sum"]).to_numpy(dtype=np.int64)
        cnt = li["pkey"].map(st["count"]).to_numpy(dtype=np.int64)
        small = 5 * li["qty_c"].to_numpy(dtype=np.int64) * cnt < sum_qty
        return pd.DataFrame(
            {"n_rows": [np.int64(small.sum())],
             "revenue_c": [np.int64(li["price_c"].to_numpy()[small].sum())]}
        )

    partials = collect_small(
        grouped_aggregate(lines.union(parts), ["pkey"], cut,
                          num_partitions=16, coalesce=True),
        ["n_rows", "revenue_c"],
    )
    n = int(partials["n_rows"].sum()) if len(partials) else 0
    rev_c = int(partials["revenue_c"].sum()) if len(partials) else 0
    return pd.DataFrame(
        {"n_rows": [np.int64(n)], "revenue_c": [np.int64(rev_c)],
         "avg_yearly": [rev_c / 100.0 / 7.0]}
    )


def q17_small_quantity_revenue_oracle(brand: str = "Brand#13") -> str:
    return f"""
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{brand}'
), st AS (
  SELECT *,
         sum(qty_c) OVER (PARTITION BY l_partkey) AS sum_qty,
         count(*) OVER (PARTITION BY l_partkey) AS cnt
  FROM li
)
SELECT count(*) AS n_rows,
       CAST(COALESCE(sum(price_c), 0) AS BIGINT) AS revenue_c,
       CAST(COALESCE(sum(price_c), 0) AS DOUBLE) / 100 / 7 AS avg_yearly
FROM st WHERE 5 * qty_c * cnt < sum_qty
"""


_Q19_DISJUNCTS = (
    ("Brand#11", 1, 15, 100, 1100),
    ("Brand#12", 1, 25, 1000, 2000),
    ("Brand#13", 1, 50, 2000, 3000),
)


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H-Q19 shape: discounted revenue under an OR of three
    (brand, size range, quantity range) predicates — the classic
    disjunctive join predicate that defeats naive pushdown. Part
    attributes (brand, size) and lineitem rows meet in ONE bucketed
    exchange on hash(partkey); each bucket evaluates all three
    disjuncts vectorized and emits a single partial (count, Σc4).
    Quantity bounds are in integer cents so the band edges are
    convention-pinned (no float BETWEEN)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    brands = sorted({d[0] for d in _Q19_DISJUNCTS})

    def part_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["p_brand"].isin(brands)]
        return pd.DataFrame(
            {"pkey": keep["p_partkey"].to_numpy(dtype=np.int64),
             # fixed-width unicode, not object: Ray's block size
             # estimator can't size empty object arrays
             "brand": keep["p_brand"].to_numpy(dtype="U16"),
             "size": keep["p_size"].to_numpy(dtype=np.int64),
             "qty_c": np.zeros(len(keep), dtype=np.int64),
             "rev_c4": np.zeros(len(keep), dtype=np.int64),
             "side": np.ones(len(keep), dtype=np.int64)}
        )

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            batch["l_extendedprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        pct = np.round(
            batch["l_discount"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        return pd.DataFrame(
            {"pkey": batch["l_partkey"].to_numpy(dtype=np.int64),
             "brand": np.full(len(batch), "", dtype="U16"),
             "size": np.zeros(len(batch), dtype=np.int64),
             "qty_c": np.round(
                 batch["l_quantity"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "rev_c4": cents * (100 - pct),
             "side": np.zeros(len(batch), dtype=np.int64)}
        )

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(part_rows, batch_format="pandas")
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(line_rows, batch_format="pandas")

    def evaluate(bucket: pd.DataFrame) -> pd.DataFrame:
        p = bucket[bucket["side"] == 1].drop_duplicates("pkey").set_index("pkey")
        li = bucket[(bucket["side"] == 0) & bucket["pkey"].isin(p.index)]
        if li.empty:
            return pd.DataFrame({"n_rows": np.array([], dtype=np.int64),
                                 "revenue_c4": np.array([], dtype=np.int64)})
        brand = li["pkey"].map(p["brand"]).to_numpy()
        size = li["pkey"].map(p["size"]).to_numpy(dtype=np.int64)
        qty = li["qty_c"].to_numpy(dtype=np.int64)
        keep = np.zeros(len(li), dtype=bool)
        for b, slo, shi, qlo, qhi in _Q19_DISJUNCTS:
            keep |= ((brand == b) & (size >= slo) & (size <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        return pd.DataFrame(
            {"n_rows": [np.int64(keep.sum())],
             "revenue_c4": [np.int64(li["rev_c4"].to_numpy()[keep].sum())]}
        )

    partials = collect_small(
        grouped_aggregate(lines.union(parts), ["pkey"], evaluate,
                          num_partitions=16, coalesce=True),
        ["n_rows", "revenue_c4"],
    )
    n = int(partials["n_rows"].sum()) if len(partials) else 0
    rev = int(partials["revenue_c4"].sum()) if len(partials) else 0
    return pd.DataFrame(
        {"n_rows": [np.int64(n)], "revenue_c4": [np.int64(rev)],
         "revenue": [rev / 10000.0]}
    )


def q19_disjunctive_revenue_oracle() -> str:
    ors = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
        f"AND CAST(round(l.l_quantity * 100) AS BIGINT) "
        f"BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _Q19_DISJUNCTS
    )
    return f"""
SELECT count(*) AS n_rows,
       CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 0)
            AS BIGINT) AS revenue_c4,
       CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 0)
            AS DOUBLE) / 10000 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {ors}
"""


def q9_profit_by_nation_year(sf_dir: str, token: str = "widget"):
    """TPC-H-Q9 shape adapted (no partsupp table, so profit =
    discounted revenue): per (supplier nation, order year) revenue for
    parts whose name contains ``token``. Dimension ladder (part-name
    filter → partkey set, supplier → nationkey, nation → name) rides
    broadcast sorted arrays exactly like
    :func:`nation_market_share`; lineitems pre-aggregate exact c4 per
    (orderkey, nationkey) inside each batch; ONE fact exchange on
    hash(orderkey) attaches the order year. Final is |nations|×|years|
    rows. Reference shape: TPC-H Q9."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_names = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    part = collect_small(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_name"]),
        ["p_partkey", "p_name"],
    )
    pk = np.sort(
        part.loc[part["p_name"].str.contains(token, regex=False),
                 "p_partkey"].to_numpy(dtype=np.int64)
    )
    part_ref = ray.put(pk)

    supp = collect_small(
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]),
        ["s_suppkey", "s_nationkey"],
    )
    order_s = np.argsort(supp["s_suppkey"].to_numpy())
    supp_ref = ray.put(
        (supp["s_suppkey"].to_numpy(dtype=np.int64)[order_s],
         supp["s_nationkey"].to_numpy(dtype=np.int64)[order_s])
    )

    class LinePartial:
        def __init__(self):
            self.pk = ray.get(part_ref)
            self.sk, self.sn = ray.get(supp_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            pkey = batch["l_partkey"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(self.pk, pkey)
            idx = np.clip(idx, 0, max(len(self.pk) - 1, 0))
            in_tok = (
                (self.pk[idx] == pkey) if len(self.pk)
                else np.zeros(len(batch), dtype=bool)
            )
            b = batch[in_tok]
            cents = np.round(
                b["l_extendedprice"].to_numpy(dtype=np.float64) * 100
            ).astype(np.int64)
            pct = np.round(
                b["l_discount"].to_numpy(dtype=np.float64) * 100
            ).astype(np.int64)
            sup = b["l_suppkey"].to_numpy(dtype=np.int64)
            sidx = np.clip(np.searchsorted(self.sk, sup), 0,
                           max(len(self.sk) - 1, 0))
            nkey = np.where(self.sk[sidx] == sup, self.sn[sidx], -1)
            out = (
                pd.DataFrame(
                    {"okey": b["l_orderkey"].to_numpy(dtype=np.int64),
                     "nkey": nkey,
                     "rev_c4": cents * (100 - pct)}
                )
                .groupby(["okey", "nkey"], sort=False)["rev_c4"]
                .sum().reset_index()
            )
            out["year"] = np.zeros(len(out), dtype=np.int64)
            out["side"] = np.zeros(len(out), dtype=np.int64)
            return out.astype({"okey": np.int64, "nkey": np.int64,
                               "rev_c4": np.int64})

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        years = (
            batch["o_orderdate"].to_numpy().astype("datetime64[Y]")
            .astype(np.int64) + 1970
        )
        return pd.DataFrame(
            {"okey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "nkey": np.full(len(batch), -1, dtype=np.int64),
             "rev_c4": np.zeros(len(batch), dtype=np.int64),
             "year": years,
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(LinePartial, batch_format="pandas", concurrency=(1, 8))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pandas")

    def attach_year(bucket: pd.DataFrame) -> pd.DataFrame:
        heads = bucket[bucket["side"] == 1]
        years = heads.drop_duplicates("okey").set_index("okey")["year"]
        li = bucket[bucket["side"] == 0].copy()
        li["year"] = li["okey"].map(years)
        li = li[li["year"].notna()]
        g = (
            li.groupby(["nkey", "year"], sort=False)["rev_c4"]
            .sum().reset_index()
        )
        return g.astype({"nkey": np.int64, "year": np.int64,
                         "rev_c4": np.int64})

    partials = grouped_aggregate(
        lines.union(orders), ["okey"], attach_year, num_partitions=16,
    )
    small = collect_small(partials, ["nkey", "year", "rev_c4"])
    if small.empty:
        return pd.DataFrame(
            {"nation": pd.Series([], dtype=str),
             "o_year": pd.Series([], dtype=np.int64),
             "profit_c4": pd.Series([], dtype=np.int64),
             "profit": pd.Series([], dtype=np.float64)}
        )
    g = (
        small.groupby(["nkey", "year"], sort=False)["rev_c4"]
        .sum().reset_index()
    )
    g["nation"] = g["nkey"].map(nat_names).astype(str)
    return pd.DataFrame(
        {"nation": g["nation"],
         "o_year": g["year"].astype(np.int64),
         "profit_c4": g["rev_c4"].astype(np.int64),
         "profit": g["rev_c4"].to_numpy(dtype=np.float64) / 10000.0}
    ).sort_values(["nation", "o_year"]).reset_index(drop=True)


def q9_profit_by_nation_year_oracle(token: str = "widget") -> str:
    return f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS profit_c4,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000 AS profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE '%{token}%'
GROUP BY 1, 2
"""


def events_cume_dist(sf_dir: str):
    """CUME_DIST() OVER (PARTITION BY event_type ORDER BY value) for
    every event — the companion to :func:`events_percent_rank` with
    ≤-tie semantics instead of <. Same zero-row-shuffle plan: pass 1
    builds the bounded (type, value_centi) count grid; the driver
    broadcasts per-type sorted (values, cumulative-at-or-below, n)
    arrays; pass 2 tags rows by vectorized ``searchsorted(side=
    'right')``. The single double is the exact int/int division
    ``at_or_below / n`` — identical to SQL's CUME_DIST rational."""
    import ray
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    keys = ["event_type", "vc"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": batch["event_type"].astype(str).to_numpy(),
             "vc": np.round(
                 batch["value"].to_numpy(dtype=np.float64) * 100
             ).astype(np.int64),
             "c": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby(keys, sort=False, as_index=False)["c"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, as_index=False)["c"].sum()
            .astype({"vc": np.int64, "c": np.int64})
        )

    grid = collect_small(
        grouped_aggregate(events, keys, combine, partial=partial),
        ["event_type", "vc", "c"],
    )
    lookup: dict[str, tuple] = {}
    for et, g in grid.groupby("event_type", sort=False):
        g = g.sort_values("vc", kind="stable")
        c = g["c"].to_numpy(dtype=np.int64)
        lookup[str(et)] = (g["vc"].to_numpy(dtype=np.int64),
                           np.cumsum(c), np.int64(c.sum()))
    lookup_ref = ray.put(lookup)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        et = batch["event_type"].astype(str).to_numpy()
        vc = np.round(
            batch["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        cume = np.empty(len(batch), dtype=np.float64)
        for t in np.unique(et):
            vals, at_or_below, n = lk[str(t)]
            m = et == t
            idx = np.searchsorted(vals, vc[m], side="right")
            cume[m] = at_or_below[idx - 1] / n
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(dtype=np.int64),
             "event_type": et,
             "value": batch["value"].to_numpy(dtype=np.float64),
             "cume_dist": cume}
        )

    return events.map_batches(tag, batch_format="pandas")


EVENTS_CUME_DIST_ORACLE = """
SELECT event_id, event_type, value,
       CUME_DIST() OVER (PARTITION BY event_type ORDER BY value)
         AS cume_dist
FROM events
"""


def q4_order_priority_check(sf_dir: str, late_days: int = 30,
                            lo: str = "1996-01-01", hi: str = "1996-04-01"):
    """TPC-H-Q4 shape (order-priority checking): count orders per
    ``o_orderpriority`` placed in one quarter where EXISTS at least one
    lineitem shipped more than ``late_days`` after the order date (the
    schema has no commitdate/receiptdate — reference Q4's
    ``l_commitdate < l_receiptdate`` becomes the same late-shipment
    predicate :func:`q21_suppliers_kept_waiting` uses).

    Shape: the quarter filter prunes the orders scan FIRST (only ~4%
    of headers enter the exchange); lineitem collapses per batch to a
    mergeable per-orderkey ``max(l_shipdate)`` partial — EXISTS over a
    monotone predicate needs only the maximum, so one int64 per
    (batch, orderkey) crosses the wire, never the lines. Both sides
    meet in ONE bucketed hash(orderkey) exchange; the bucket emits
    per-priority partial counts and the final exchange is bounded by
    the 5-value priority domain.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    late_us = int(late_days) * 86_400_000_000
    lo_us = int(np.datetime64(lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(hi, "us").astype(np.int64))

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ship_us = (
            batch["l_shipdate"].to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "max_ship_us": ship_us}
        )
        out = (
            df.groupby("okey", sort=False)
            .agg(max_ship_us=("max_ship_us", "max"))
            .reset_index()
        )
        out["odate_us"] = np.int64(0)
        out["priority"] = ""
        out["side"] = np.int64(0)
        return out

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        odate_us = (
            batch["o_orderdate"].to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        keep = (odate_us >= lo_us) & (odate_us < hi_us)
        return pd.DataFrame(
            {"okey": batch["o_orderkey"].to_numpy(dtype=np.int64)[keep],
             "max_ship_us": np.zeros(int(keep.sum()), dtype=np.int64),
             "odate_us": odate_us[keep],
             "priority": batch["o_orderpriority"].astype(str).to_numpy()[keep],
             "side": np.ones(int(keep.sum()), dtype=np.int64)}
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(line_rows, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pandas")

    def exists_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"o_orderpriority": pd.Series([], dtype=str),
             "order_count": pd.Series([], dtype=np.int64)}
        )
        heads = bucket[bucket["side"] == 1]
        if heads.empty:
            return empty
        ship = (
            bucket[bucket["side"] == 0]
            .groupby("okey", sort=False)["max_ship_us"].max()
        )
        hs = heads["okey"].map(ship)
        late = hs.notna().to_numpy() & (
            hs.fillna(np.int64(0)).to_numpy(dtype=np.int64)
            > heads["odate_us"].to_numpy(dtype=np.int64) + late_us
        )
        kept = heads[late]
        if kept.empty:
            return empty
        return (
            kept.groupby("priority", sort=False).size()
            .rename("order_count").reset_index()
            .rename(columns={"priority": "o_orderpriority"})
            .astype({"order_count": np.int64})
        )

    partials = grouped_aggregate(
        lines.union(orders), ["okey"], exists_counts, num_partitions=16
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("o_orderpriority", sort=False)
            .agg(order_count=("order_count", "sum"))
            .reset_index()
            .astype({"order_count": np.int64})
        )

    return grouped_aggregate(partials, ["o_orderpriority"], final,
                             num_partitions=2)


def q4_order_priority_check_oracle(late_days: int = 30,
                                   lo: str = "1996-01-01",
                                   hi: str = "1996-04-01") -> str:
    return f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{lo}'
  AND o.o_orderdate < TIMESTAMP '{hi}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {int(late_days)} DAY
  )
GROUP BY 1
"""


def events_hopping_window(sf_dir: str, width_us: int = 3_600_000_000,
                          hop_us: int = 1_800_000_000):
    """Hopping-window aggregate (the overlapping-window streaming shape
    the tumbling :func:`events_hourly` and sliding :func:`events_sliding`
    ops don't cover): per (event_type, window_start) with 1-hour
    windows advancing every 30 minutes, event count and exact
    value-centi sum. With ``width = 2·hop`` every event belongs to
    EXACTLY two windows — ``floor_hop(ts)`` and ``floor_hop(ts) − hop``
    — so the per-batch partial double-emits each row into its two
    window keys (a bounded ×2 fan-out, not a cross join) and
    pre-aggregates; the single exchange is bounded by the
    types × windows key domain, independent of event count. The oracle
    replays the same two-window expansion with ``unnest``.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    assert width_us == 2 * hop_us, "exact-2-windows expansion needs width=2*hop"
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        anchor = ts_us - ts_us % hop_us
        win = np.concatenate((anchor, anchor - hop_us))
        et = batch["event_type"].astype(str).to_numpy()
        vc = np.round(
            batch["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": np.concatenate((et, et)),
             "win_start_us": win,
             "n_events": np.int64(1),
             "sum_value_centi": np.concatenate((vc, vc))}
        )
        return (
            df.groupby(["event_type", "win_start_us"], sort=False)
            .agg(n_events=("n_events", "sum"),
                 sum_value_centi=("sum_value_centi", "sum"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["event_type", "win_start_us"], sort=False)
            .agg(n_events=("n_events", "sum"),
                 sum_value_centi=("sum_value_centi", "sum"))
            .reset_index()
            .astype({"win_start_us": np.int64, "n_events": np.int64,
                     "sum_value_centi": np.int64})
        )

    return grouped_aggregate(events, ["event_type", "win_start_us"], combine,
                             partial=partial, num_partitions=8)


EVENTS_HOPPING_WINDOW_ORACLE = """
WITH e AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(ts) % 1800000000 AS anchor,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), w AS (
  SELECT event_type, vc,
         unnest([anchor, anchor - 1800000000]) AS win_start_us
  FROM e
)
SELECT event_type, CAST(win_start_us AS BIGINT) AS win_start_us,
       count(*) AS n_events,
       CAST(sum(vc) AS BIGINT) AS sum_value_centi
FROM w GROUP BY 1, 2
"""


def compaction_plan(sf_dir: str, target_bytes: int = 2_000):
    """Small-file compaction planner — the lakehouse maintenance op
    that bins a source's files (here: documents standing in as files,
    ``n_chars`` as file size) into sequential compaction groups of
    ~``target_bytes``: walking a source's files in doc_id order, a file
    joins the current group while the group's size BEFORE it is under
    the target (first-fit-sequential, the rule real compactors use so
    groups stay contiguous and the plan is a pure prefix scan — group
    index = floor(running-size-before / target)). Output per (source,
    group): file count, total bytes, and the covered doc_id range, so a
    resumable compactor can execute groups independently.

    Shape: narrow (source, doc_id, n_chars) rows off a pruned read, one
    source-cardinality bucketed exchange, vectorized sorted cumsum per
    bucket. The prefix scan is sequential BY DESIGN (groups must be
    contiguous in file order), so the parallel unit is the source —
    the same partitioning a per-table compactor has in production."""
    from entity_extractor_linker_ray.ops.readers import read_split
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = read_split(f"{sf_dir}/documents.parquet",
                      columns=["source", "doc_id", "n_chars"])

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=str),
                 "group_id": pd.Series([], dtype=np.int64),
                 "n_files": pd.Series([], dtype=np.int64),
                 "total_bytes": pd.Series([], dtype=np.int64),
                 "min_doc_id": pd.Series([], dtype=np.int64),
                 "max_doc_id": pd.Series([], dtype=np.int64)}
            )
        b = bucket.sort_values(["source", "doc_id"], kind="stable")
        size = b["n_chars"].to_numpy(dtype=np.int64)
        csum = b.groupby("source", sort=False)["n_chars"].cumsum().to_numpy(
            dtype=np.int64
        )
        b = b.assign(group_id=(csum - size) // np.int64(target_bytes))
        return (
            b.groupby(["source", "group_id"], sort=False)
            .agg(n_files=("doc_id", "size"),
                 total_bytes=("n_chars", "sum"),
                 min_doc_id=("doc_id", "min"),
                 max_doc_id=("doc_id", "max"))
            .reset_index()
            .astype({c: np.int64 for c in
                     ("group_id", "n_files", "total_bytes",
                      "min_doc_id", "max_doc_id")})
        )

    return grouped_aggregate(docs, ["source"], combine)


def compaction_plan_oracle(target_bytes: int = 2_000) -> str:
    return f"""
WITH scan AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars
           AS before_bytes
  FROM documents
)
SELECT source,
       CAST(before_bytes // {target_bytes} AS BIGINT) AS group_id,
       count(*) AS n_files,
       CAST(sum(n_chars) AS BIGINT) AS total_bytes,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM scan GROUP BY 1, 2
"""


def orders_open_backlog(sf_dir: str, horizon_days: int = 30):
    """Open-order backlog over time — the interval-stabbing aggregate
    (how many orders are 'open' on each day, an order being open for
    ``horizon_days`` from its order date) computed as a sweep line:
    each order contributes a +1 delta at its start day and a -1 at its
    end day, the deltas collapse to one row per distinct day, and the
    running sum of deltas IS the backlog step function. Output is one
    row per change-point day (day as integer days since epoch, the
    day's net delta, and the backlog level from that day on) — never a
    row per (order × day) materialization.

    Shape: delta generation and per-day pre-aggregation are scan-local;
    the exchange is day-cardinality (two change points per distinct
    order date — a few thousand rows for years of data), so the ordered
    prefix sum runs vectorized in ONE bucket. A day domain too large
    for one bucket would switch to the 3-step distributed scan of
    :func:`events_running_total`; the domain bound is the documented
    assumption."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    US_PER_DAY = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def deltas(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["o_orderdate"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            // US_PER_DAY
        )
        df = pd.DataFrame(
            {
                "day": np.concatenate([day, day + np.int64(horizon_days)]),
                "delta": np.concatenate(
                    [np.ones(len(day), dtype=np.int64),
                     -np.ones(len(day), dtype=np.int64)]
                ),
            }
        )
        return df.groupby("day", sort=False, as_index=False)["delta"].sum()

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"day": pd.Series([], dtype=np.int64),
                 "day_delta": pd.Series([], dtype=np.int64),
                 "open_orders": pd.Series([], dtype=np.int64)}
            )
        d = (
            bucket.groupby("day", sort=False, as_index=False)["delta"]
            .sum()
            .sort_values("day", kind="stable")
        )
        return pd.DataFrame(
            {"day": d["day"].to_numpy(dtype=np.int64),
             "day_delta": d["delta"].to_numpy(dtype=np.int64),
             "open_orders": d["delta"].cumsum().to_numpy(dtype=np.int64)}
        )

    # ONE bucket (num_partitions=1 ≡ hash % 1 = 0): the prefix sum is
    # global, and the day domain is bounded (see docstring)
    return grouped_aggregate(
        orders.map_batches(deltas, batch_format="pandas"),
        ["day"], combine, num_partitions=1,
    )


def orders_open_backlog_oracle(horizon_days: int = 30) -> str:
    return f"""
WITH pts AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day, 1 AS delta
  FROM orders
  UNION ALL
  SELECT epoch_us(o_orderdate) // 86400000000 + {horizon_days}, -1
  FROM orders
), d AS (
  SELECT day, SUM(delta) AS delta FROM pts GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(delta AS BIGINT) AS day_delta,
       CAST(SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS open_orders
FROM d
"""


def events_winsorized_mean(sf_dir: str):
    """Winsorized mean of event value per type — the robust-mean
    variant that CAPS outliers at the exact p10/p90 instead of
    dropping them (`trimmed_mean_by_type` is the dropping variant; a
    telemetry pipeline usually wants both). Exact at any scale via the
    same (type, milli-value) histogram as `events_type_percentiles`:
    the caps come from an integer ceil(p·N) walk of cumulative counts,
    the winsorized sum is Σ count(v)·clip(v, lo, hi) over the
    histogram — all int64, with the mean as the single IEEE division
    of two exact integers, so the double hash-matches the oracle."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_numpy(),
                 "milli": milli_round(batch["value"].to_numpy(dtype=np.float64))}
            )
            .groupby(["event_type", "milli"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"milli": np.int64, "n": np.int64})
        )

    def walk(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "lo_milli": pd.Series([], dtype=np.int64),
             "hi_milli": pd.Series([], dtype=np.int64),
             "n_events": pd.Series([], dtype=np.int64),
             "winsorized_sum_milli": pd.Series([], dtype=np.int64),
             "winsorized_mean_milli": pd.Series([], dtype=np.float64)}
        )
        if bucket.empty:
            return empty
        hist = (
            bucket.groupby(["event_type", "milli"], sort=False)["n"]
            .sum()
            .reset_index()
            .sort_values(["event_type", "milli"], kind="stable")
        )
        rows = []
        for etype, h in hist.groupby("event_type", sort=False):
            vals = h["milli"].to_numpy(dtype=np.int64)
            cnts = h["n"].to_numpy(dtype=np.int64)
            csum = np.cumsum(cnts)
            n = int(csum[-1])
            k_lo = (n + 9) // 10          # ceil(0.1 n)
            k_hi = (9 * n + 9) // 10      # ceil(0.9 n)
            lo = int(vals[np.searchsorted(csum, k_lo)])
            hi = int(vals[np.searchsorted(csum, k_hi)])
            wsum = int(np.sum(np.clip(vals, lo, hi) * cnts))
            rows.append(
                {"event_type": etype, "lo_milli": lo, "hi_milli": hi,
                 "n_events": n, "winsorized_sum_milli": wsum,
                 "winsorized_mean_milli": float(wsum) / n}
            )
        return pd.DataFrame(rows).astype(
            {"lo_milli": np.int64, "hi_milli": np.int64,
             "n_events": np.int64, "winsorized_sum_milli": np.int64}
        )

    return grouped_aggregate(events.map_batches(partial, batch_format="pandas"),
                             ["event_type"], walk)


EVENTS_WINSORIZED_MEAN_ORACLE = """
WITH m AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS milli
  FROM events
),
r AS (
  SELECT event_type, milli,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY milli) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM m
),
b AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 9) // 10 THEN milli END) AS lo,
         MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN milli END) AS hi,
         MAX(n) AS n_events
  FROM r GROUP BY 1
)
SELECT m.event_type,
       CAST(MAX(b.lo) AS BIGINT) AS lo_milli,
       CAST(MAX(b.hi) AS BIGINT) AS hi_milli,
       CAST(MAX(b.n_events) AS BIGINT) AS n_events,
       CAST(SUM(GREATEST(b.lo, LEAST(b.hi, m.milli))) AS BIGINT)
         AS winsorized_sum_milli,
       CAST(SUM(GREATEST(b.lo, LEAST(b.hi, m.milli))) AS DOUBLE)
         / MAX(b.n_events) AS winsorized_mean_milli
FROM m JOIN b USING (event_type)
GROUP BY 1
"""


def events_theilsen_trend(sf_dir: str):
    """Theil-Sen robust trend of daily event volume per type: the
    MEDIAN over all day pairs of (count_j - count_i) / (day_j - day_i)
    — the slope estimator that shrugs off outlier days where OLS
    (`events_value_trend`) gets dragged. Exact and grid-bounded: the
    corpus collapses to per-(type, day) counts via the bucketed
    two-phase sum (the only exchange; wire rows are day-grid partials,
    never events), and each type's pair walk runs vectorized inside
    its bucket over the <= |days|^2 slope array. Float parity: every
    slope is ONE IEEE division of two exact int64s and the median is
    DuckDB's ``quantile_disc`` index pick (max(ceil(q*n),1)-1) over
    the identical multiset, so the double hash-matches the oracle."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            // 86_400_000_000
        ).astype(np.int64)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_numpy(),
                          "d": day})
            .groupby(["event_type", "d"], sort=False)
            .size()
            .reset_index(name="c")
            .astype({"d": np.int64, "c": np.int64})
        )

    def walk(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "n_days": pd.Series([], dtype=np.int64),
             "n_pairs": pd.Series([], dtype=np.int64),
             "slope_per_day": pd.Series([], dtype=np.float64)}
        )
        if bucket.empty:
            return empty
        daily = (
            bucket.groupby(["event_type", "d"], sort=False)["c"]
            .sum()
            .reset_index()
            .sort_values(["event_type", "d"], kind="stable")
        )
        rows = []
        for etype, g in daily.groupby("event_type", sort=False):
            d = g["d"].to_numpy(dtype=np.int64)
            c = g["c"].to_numpy(dtype=np.int64)
            n = len(d)
            if n < 2:
                continue
            ii, jj = np.triu_indices(n, 1)
            slopes = (c[jj] - c[ii]).astype(np.float64) / (d[jj] - d[ii])
            slopes.sort()
            pick = max(int(np.ceil(0.5 * len(slopes))), 1) - 1
            rows.append((etype, np.int64(n), np.int64(len(slopes)),
                         float(slopes[pick])))
        if not rows:
            return empty
        return pd.DataFrame(
            rows, columns=["event_type", "n_days", "n_pairs", "slope_per_day"]
        ).astype({"n_days": np.int64, "n_pairs": np.int64})

    return grouped_aggregate(events, ["event_type"], walk, partial=partial)


EVENTS_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
         count(*) AS c
  FROM events GROUP BY 1, 2
), nd AS (
  SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1
), pairs AS (
  SELECT a.event_type,
         CAST(b.c - a.c AS DOUBLE) / (b.d - a.d) AS slope
  FROM daily a JOIN daily b USING (event_type)
  WHERE b.d > a.d
)
SELECT p.event_type, CAST(MAX(nd.n_days) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       quantile_disc(p.slope, 0.5) AS slope_per_day
FROM pairs p JOIN nd USING (event_type)
GROUP BY 1
"""


def events_daily_ewma(sf_dir: str):
    """Integer exponential smoothing of daily event volume per type —
    the streaming-telemetry baseline (``s_d = (c_d + 3·s_{d-1}) // 4``,
    i.e. α = 1/4 in pure int64 with floor division, seeded at the first
    day's count) over the CONTIGUOUS day span of each type with gap
    days counted as zero. The first genuinely RECURSIVE per-step oracle
    shape in the repo: the smoother cannot be unrolled like the
    fixed-round kmeans/pagerank CTEs because its depth is data-driven
    (the day span), so the DuckDB twin is a ``WITH RECURSIVE`` walking
    ``rn → rn+1`` over the same grid.

    Scale shape: the corpus collapses to per-(type, day) counts via the
    bucketed two-phase sum (the `events_theilsen_trend` exchange; wire
    rows are day-grid partials, never events); the recursion itself is
    inherently serial PER TYPE but runs over the domain-bounded daily
    grid (~366 rows/type/year) inside the type's bucket — types smooth
    in parallel, days sequentially, exactly the dependency structure
    of the operator."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            // 86_400_000_000
        ).astype(np.int64)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_numpy(),
                          "d": day})
            .groupby(["event_type", "d"], sort=False)
            .size()
            .reset_index(name="c")
            .astype({"d": np.int64, "c": np.int64})
        )

    def smooth(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "d": pd.Series([], dtype=np.int64),
             "c": pd.Series([], dtype=np.int64),
             "ewma": pd.Series([], dtype=np.int64)}
        )
        if bucket.empty:
            return empty
        daily = (
            bucket.groupby(["event_type", "d"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        frames = []
        for etype, g in daily.groupby("event_type", sort=False):
            d = g["d"].to_numpy(dtype=np.int64)
            c_sparse = g["c"].to_numpy(dtype=np.int64)
            d0, d1 = int(d.min()), int(d.max())
            grid = np.arange(d0, d1 + 1, dtype=np.int64)
            c = np.zeros(len(grid), dtype=np.int64)
            c[d - d0] = c_sparse
            s = np.empty(len(grid), dtype=np.int64)
            s[0] = c[0]
            for i in range(1, len(grid)):  # domain-bounded serial walk
                s[i] = (c[i] + 3 * s[i - 1]) // 4
            frames.append(pd.DataFrame(
                {"event_type": etype, "d": grid, "c": c, "ewma": s}
            ))
        return pd.concat(frames, ignore_index=True) if frames else empty

    return grouped_aggregate(events, ["event_type"], smooth, partial=partial)


EVENTS_DAILY_EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT span.event_type, span.d0 + x AS d,
         CAST(x + 1 AS BIGINT) AS rn
  FROM span, UNNEST(range(0, d1 - d0 + 1)) AS t(x)
), g AS (
  SELECT grid.event_type, grid.d, grid.rn,
         COALESCE(daily.c, 0) AS c
  FROM grid LEFT JOIN daily USING (event_type, d)
), ewma(event_type, d, rn, c, s) AS (
  SELECT event_type, d, rn, c, c FROM g WHERE rn = 1
  UNION ALL
  SELECT g.event_type, g.d, g.rn, g.c, (g.c + 3 * e.s) // 4
  FROM ewma e JOIN g ON g.event_type = e.event_type AND g.rn = e.rn + 1
)
SELECT event_type, d, c, CAST(s AS BIGINT) AS ewma FROM ewma
"""
