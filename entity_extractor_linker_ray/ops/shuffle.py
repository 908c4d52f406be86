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


def grouped_aggregate(
    ds,
    keys: Sequence[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    partial: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    num_partitions: int = DEFAULT_PARTITIONS,
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

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
