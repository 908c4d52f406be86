"""Bucketed high-cardinality groupby.

``ray.data.Dataset.groupby(...).aggregate(...)`` does per-group Python
work in the reduce, which collapses when the group count approaches the
row count (e.g. (user, type, hour) windows: ~1 group/row). The
scale-correct shape is the classic two-phase hash aggregation:

1. per-batch **partial combine** (vectorized pandas groupby) so the
   shuffle moves pre-aggregated partials, not raw rows;
2. assign each key a bucket ``hash(keys) % P`` and shuffle on that
   small int key only (P distinct values — boundary computation and
   sort are trivial);
3. inside each bucket, one **vectorized** pandas groupby over all
   groups at once (C speed, no per-group Python).

The same helper backs every high-cardinality aggregate in the repo
(windowed event counts, edge weights, node stats). Correctness does
not depend on P; P controls shuffle width — size it so one bucket's
groups fit in a worker's heap (at 100 TB: P in the thousands).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd

DEFAULT_PARTITIONS = 64


def _with_bucket(batch: pd.DataFrame, keys: Sequence[str], num_partitions: int) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(batch[list(keys)], index=False).to_numpy()
    out = batch.copy()
    out["_bucket"] = (h % np.uint64(num_partitions)).astype(np.int64)
    return out


def exchange_blocks() -> int:
    """Target block count for an all-to-all exchange over ALREADY
    COMBINED partials: half a block per cluster CPU. The sort-based
    shuffle's wall is dominated by per-task coordination (#input
    blocks x #output blocks tasks, ~10-30 ms each on this object
    store), not bytes, once partials are combiner-bounded — so a
    union of wide reads (2 x 64 blocks of short partial rows) pays
    2-4x the sort wall of the same bytes in 16 blocks. Scaling with
    cluster CPUs keeps it cluster-proportional: a 256-node x 64-core
    cluster coalesces to ~8k blocks, never to a fixed constant."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, cpus // 2)


def grouped_aggregate(
    ds,
    keys: Sequence[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    partial: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    num_partitions: int = DEFAULT_PARTITIONS,
    coalesce: bool | None = None,
):
    """Two-phase hash aggregation over ``keys``.

    ``combine``: pandas kernel applied once per bucket — must group by
    ``keys`` itself (vectorized ``df.groupby(keys).agg(...)``) and
    return the final rows for every group in the bucket. It sees either
    raw rows or, when ``partial`` is given, the concatenated partials.

    ``partial``: optional per-batch pre-aggregation producing rows that
    ``combine`` knows how to merge (sum of counts, min of mins, ...).
    Always worth it when groups repeat within a batch; skip it when
    groups are near-unique per row (it would only burn CPU).

    ``coalesce``: repartition the (small, combiner-bounded) partials
    down to :func:`exchange_blocks` blocks before the exchange. The
    sort-based shuffle's wall is per-task coordination, not bytes, so
    an inflated upstream block count (a UNION of wide reads, or a
    64-block read feeding short combined rows) pays 2-4x the sort wall
    of the same bytes in cpus/2 blocks (measured: Q3 join chain
    15->4-7 s at sf0.1/32). Default ``None`` = auto: coalesce exactly
    when a ``partial`` combiner exists, because then wire rows are
    key-bounded per batch and merging blocks keeps them key-bounded —
    never coalesce row-proportional exchanges (window/scan shapes,
    no ``partial``), where it would funnel full-size data through few
    tasks. Pass an explicit bool to override either way (tagged-union
    joins do their combining inside ``combine`` and pass True).
    """
    keys = list(keys)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        if partial is not None:
            batch = partial(batch)
        if batch.empty:
            return batch.assign(_bucket=np.array([], dtype=np.int64))
        return _with_bucket(batch, keys, num_partitions)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return combine(group.drop(columns=["_bucket"]))

    # the groupby sorts blocks on the one small-int bucket key; the
    # polars sort path is ~3x faster than the pandas default for these
    # blocks (measured on the assembly shuffle) and is a pure backend
    # swap — set here so EVERY consumer session benefits, not only the
    # bench harness that used to set it
    from ray.data import DataContext

    DataContext.get_current().use_polars_sort = True

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    if coalesce or (coalesce is None and partial is not None):
        bucketed = bucketed.repartition(exchange_blocks())
    return bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def salted_join(
    left_ds,
    right_ds,
    key: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    *,
    defaults: dict | None = None,
    num_salts: int = 8,
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """Skew-resilient INNER equi-join for ENRICHMENT shapes — output is
    one row per left row, so the combiner-before-shuffle trick that
    protects the aggregation joins can't absorb a hot key here: every
    probe row must physically reach a reducer.

    Mitigation is classic salting: the build side (``right_ds``,
    expected unique on ``key``) is REPLICATED ``num_salts`` times, once
    per salt; each probe row draws a deterministic salt from its own
    batch position, so a key with millions of probe rows spreads over
    ``num_salts`` buckets instead of melting one reducer. The exchange
    shuffles on hash(key, salt); within each bucket one vectorized
    merge emits the enriched rows. Replication cost is
    ``num_salts × |right|`` — size ``num_salts`` to the observed skew
    (hot-key rows / target bucket size), not to taste; for uniform keys
    use 1 (plain bucketed join) and this degrades to zero overhead.

    ``defaults`` maps each column to the value used to pad the side
    that lacks it (keeps the union's per-column dtype consistent —
    "" for strings, 0 for numerics).
    """
    keys = [key, "_salt"]

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[list(dict.fromkeys([key, *left_cols]))].copy()
        # per-row deterministic salt: position within the batch cycles
        # through the salt space, so a hot key's rows split evenly
        out["_salt"] = (np.arange(len(batch)) % num_salts).astype(np.int64)
        out["_side"] = np.int64(0)
        return out

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch[list(dict.fromkeys([key, *right_cols]))]
        reps = pd.concat([base] * num_salts, ignore_index=True)
        reps["_salt"] = np.repeat(
            np.arange(num_salts, dtype=np.int64), len(base)
        )
        reps["_side"] = np.int64(1)
        return reps

    left_tagged = left_ds.map_batches(tag_left, batch_format="pandas")
    right_tagged = right_ds.map_batches(tag_right, batch_format="pandas")

    out_cols = list(dict.fromkeys([key, *left_cols, *right_cols]))

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        probe = bucket[bucket["_side"] == 0]
        build = bucket[bucket["_side"] == 1][
            list(dict.fromkeys([key, *right_cols]))
        ].drop_duplicates(key)
        merged = probe.merge(build, on=key, how="inner",
                             suffixes=("_probe", ""))
        return merged[out_cols]

    fills = defaults or {}

    # union schemas must line up: fill the columns each side lacks
    # with a TYPE-CORRECT default so the union's dtypes are stable
    def widen(df: pd.DataFrame) -> pd.DataFrame:
        for col in out_cols + ["_salt", "_side"]:
            if col not in df.columns:
                df[col] = fills.get(col, np.int64(0))
        return df[out_cols + ["_salt", "_side"]]

    unioned = left_tagged.map_batches(widen, batch_format="pandas").union(
        right_tagged.map_batches(widen, batch_format="pandas")
    )
    return grouped_aggregate(unioned, keys, join_bucket,
                             num_partitions=num_partitions)


def collect_small(ds, columns: Sequence[str]) -> pd.DataFrame:
    """Driver-side collection of a SMALL dataset with a schema
    guarantee: Ray 2.49's ``to_pandas()`` on an empty dataset returns a
    COLUMN-LESS frame, so the caller's column access crashes on legal
    empty inputs (empty partition, filtered-away corpus). Always
    returns a frame with ``columns``."""
    df = ds.to_pandas()
    missing = [c for c in columns if c not in df.columns]
    if missing:
        if not df.empty:  # non-empty + missing column = a real bug
            raise KeyError(f"columns {missing} absent in non-empty collect")
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in columns})
    return df
