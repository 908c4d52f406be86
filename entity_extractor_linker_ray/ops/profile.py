"""Table profiling (ANALYZE): one streaming pass computing per-column
row/null counts, min/max, and exact distinct cardinalities — the
statistics block a query planner or data-quality gate runs before
anything else touches a new corpus.

Shape: scalar stats (counts, min, max) are classic mergeable partials —
5 rows per batch, one tiny bucketed combine. Distinct counts are the
expensive part: the exact path hashes each value once per batch
(vectorized SipHash), dedups (column, hash) WITHIN the batch, and
two-phase-counts the survivors — shuffle volume is the number of
distinct (column, value) pairs, never rows × columns. For heavy unique
columns at 100 TB that is still a full-cardinality exchange; the
HLL-register variant (``relational.events_daily_users_approx``) is the
documented scale path when ±2% suffices. 64-bit hashing makes a silent
distinct-count collision ~n²/2⁶⁵ — negligible below ~10⁸ distincts per
column, stated rather than discovered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def table_profile(sf_dir: str, table: str = "documents",
                  columns: list[str] | None = None):
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    colnames = columns or ds.schema().names

    # ---- scalar stats: (column, n_rows, n_nulls, min, max) ----------
    # min/max partials stay TYPED through the combine (numeric extremes
    # in int64 columns, string extremes in object columns) — a
    # stringified "95" would sort above "499" and corrupt the merge;
    # stringification happens exactly once, at the final emit, to match
    # the oracle's CAST(... AS VARCHAR)
    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for col in colnames:
            s = batch[col]
            nn = s.dropna()
            numeric = pd.api.types.is_numeric_dtype(s)
            rows.append(
                {"column": col,
                 "n_rows": np.int64(len(s)),
                 "n_nulls": np.int64(s.isna().sum()),
                 "is_num": np.int64(1 if numeric else 0),
                 "min_num": np.int64(nn.min()) if numeric and not nn.empty else np.int64(2**62),
                 "max_num": np.int64(nn.max()) if numeric and not nn.empty else np.int64(-(2**62)),
                 "min_str": "" if numeric or nn.empty else str(nn.min()),
                 "max_str": "" if numeric or nn.empty else str(nn.max())}
            )
        return pd.DataFrame(rows)

    def stats_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        def merge(grp: pd.DataFrame) -> pd.Series:
            present = grp[grp["max_str"] != ""]
            return pd.Series(
                {"n_rows": np.int64(grp["n_rows"].sum()),
                 "n_nulls": np.int64(grp["n_nulls"].sum()),
                 "is_num": np.int64(grp["is_num"].max()),
                 "min_num": np.int64(grp["min_num"].min()),
                 "max_num": np.int64(grp["max_num"].max()),
                 "min_str": "" if present.empty else present["min_str"].min(),
                 "max_str": "" if present.empty else present["max_str"].max()}
            )

        return (
            bucket.groupby("column", sort=False)
            .apply(merge, include_groups=False)
            .reset_index()
        )

    stats = grouped_aggregate(
        ds.map_batches(stats_partial, batch_format="pandas"),
        ["column"], stats_combine, num_partitions=4,
    )

    # ---- exact distinct: two-phase over (column, value-hash) --------
    def hash_partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in colnames:
            vals = batch[col].dropna().astype(str).to_numpy(dtype=object)
            h = np.unique(pd.util.hash_array(vals))
            frames.append(pd.DataFrame({"column": col, "h": h.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    pairs = grouped_aggregate(
        ds.map_batches(hash_partial, batch_format="pandas"),
        ["column", "h"],
        lambda b: b[["column", "h"]].drop_duplicates(),
        num_partitions=16,
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("column", sort=False)
            .size()
            .reset_index(name="n_distinct")
            .astype({"n_distinct": np.int64})
        )

    distinct = grouped_aggregate(
        pairs.map_batches(count_partial, batch_format="pandas"),
        ["column"],
        lambda b: b.groupby("column", sort=False)["n_distinct"].sum().reset_index()
        .astype({"n_distinct": np.int64}),
        num_partitions=4,
    )

    # ---- merge the two tiny finals (≤ columns rows each) ------------
    def tag_stats(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["n_distinct"] = np.int64(-1)
        return out[["column", "n_rows", "n_nulls", "is_num", "min_num",
                    "max_num", "min_str", "max_str", "n_distinct"]]

    def tag_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        return pd.DataFrame(
            {"column": batch["column"],
             "n_rows": np.full(n, -1, dtype=np.int64),
             "n_nulls": np.full(n, -1, dtype=np.int64),
             "is_num": np.zeros(n, dtype=np.int64),
             "min_num": np.zeros(n, dtype=np.int64),
             "max_num": np.zeros(n, dtype=np.int64),
             "min_str": np.full(n, "", dtype=object),
             "max_str": np.full(n, "", dtype=object),
             "n_distinct": batch["n_distinct"].to_numpy(dtype=np.int64)}
        )

    def merge_final(bucket: pd.DataFrame) -> pd.DataFrame:
        def one(grp: pd.DataFrame) -> pd.Series:
            s = grp[grp["n_rows"] >= 0].iloc[0]
            d = grp[grp["n_distinct"] >= 0].iloc[0]
            if int(s["is_num"]):
                lo, hi = str(int(s["min_num"])), str(int(s["max_num"]))
            else:
                lo, hi = s["min_str"], s["max_str"]
            return pd.Series(
                {"n_rows": np.int64(s["n_rows"]),
                 "n_nulls": np.int64(s["n_nulls"]),
                 "n_distinct": np.int64(d["n_distinct"]),
                 "min_val": lo, "max_val": hi}
            )

        return (
            bucket.groupby("column", sort=False)
            .apply(one, include_groups=False)
            .reset_index()
        )

    return grouped_aggregate(
        stats.map_batches(tag_stats, batch_format="pandas").union(
            distinct.map_batches(tag_distinct, batch_format="pandas")
        ),
        ["column"], merge_final, num_partitions=4,
    )


def table_profile_oracle(table: str = "documents",
                         columns: list[str] | None = None) -> str:
    cols = columns or {
        "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    }[table]
    selects = []
    for col in cols:
        selects.append(
            f"""SELECT '{col}' AS "column",
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({col}) AS n_nulls,
       COUNT(DISTINCT {col}) AS n_distinct,
       CAST(MIN({col}) AS VARCHAR) AS min_val,
       CAST(MAX({col}) AS VARCHAR) AS max_val
FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects)
