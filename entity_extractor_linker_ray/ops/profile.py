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

    # ---- ONE pass over the data: each batch emits, per column, one
    # typed scalar-stats row (kind=0, h=-1) AND its deduped value
    # hashes (kind=1) in a shared schema, so the table is read once and
    # both stat families ride the same exchange. min/max partials stay
    # TYPED through the combine (a stringified "95" would sort above
    # "499"); stringification happens once, at the final emit, matching
    # the oracle's CAST(... AS VARCHAR).
    _defaults = {"n_rows": np.int64(-1), "n_nulls": np.int64(-1),
                 "is_num": np.int64(0), "min_num": np.int64(2**62),
                 "max_num": np.int64(-(2**62)), "min_str": "", "max_str": ""}
    _order = ["column", "h", "kind", "n_rows", "n_nulls", "is_num",
              "min_num", "max_num", "min_str", "max_str", "n_distinct"]

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in colnames:
            s = batch[col]
            nn = s.dropna()
            numeric = pd.api.types.is_numeric_dtype(s)
            frames.append(pd.DataFrame(
                [{"column": col, "h": np.int64(-1), "kind": np.int64(0),
                  "n_rows": np.int64(len(s)),
                  "n_nulls": np.int64(s.isna().sum()),
                  "is_num": np.int64(1 if numeric else 0),
                  "min_num": np.int64(nn.min()) if numeric and not nn.empty else np.int64(2**62),
                  "max_num": np.int64(nn.max()) if numeric and not nn.empty else np.int64(-(2**62)),
                  "min_str": "" if numeric or nn.empty else str(nn.min()),
                  "max_str": "" if numeric or nn.empty else str(nn.max()),
                  "n_distinct": np.int64(-1)}]
            ))
            vals = nn.astype(str).to_numpy(dtype=object)
            h = np.unique(pd.util.hash_array(vals)).astype(np.int64)
            hf = pd.DataFrame({"column": col, "h": h})
            for k, v in [("kind", np.int64(1)), ("n_distinct", np.int64(-1)),
                         *_defaults.items()]:
                hf[k] = v
            frames.append(hf)
        return pd.concat(frames, ignore_index=True)[_order]

    # first exchange on (column, h): a column's stat partials all carry
    # h=-1 so they meet in one bucket; each distinct value hash meets
    # its duplicates in its own bucket. The kernel merges stats and
    # counts surviving hashes -> at most two short rows per (bucket,
    # column) reach the final exchange.
    def bucket_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        stats = bucket[bucket["kind"] == 0]
        if len(stats):
            merged = stats.groupby("column", sort=False).agg(
                n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum"),
                is_num=("is_num", "max"), min_num=("min_num", "min"),
                max_num=("max_num", "max"),
            ).reset_index()
            present = stats[stats["max_str"] != ""]
            sext = present.groupby("column", sort=False).agg(
                min_str=("min_str", "min"), max_str=("max_str", "max")
            )
            merged["min_str"] = merged["column"].map(sext["min_str"]).fillna("")
            merged["max_str"] = merged["column"].map(sext["max_str"]).fillna("")
            merged["kind"] = np.int64(0)
            merged["n_distinct"] = np.int64(-1)
            out.append(merged)
        hashes = bucket[bucket["kind"] == 1]
        if len(hashes):
            counts = (
                hashes[["column", "h"]].drop_duplicates()
                .groupby("column", sort=False).size()
                .reset_index(name="n_distinct")
                .astype({"n_distinct": np.int64})
            )
            counts["kind"] = np.int64(1)
            for k, v in _defaults.items():
                counts[k] = v
            out.append(counts)
        if not out:
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in _order if c != "h"})
        res = pd.concat(out, ignore_index=True)
        return res[[c for c in _order if c != "h"]]

    per_bucket = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["column", "h"], bucket_combine, num_partitions=16,
    )

    def merge_final(bucket: pd.DataFrame) -> pd.DataFrame:
        def one(grp: pd.DataFrame) -> pd.Series:
            s = grp[grp["kind"] == 0]
            if int(s["is_num"].max()):
                lo = str(int(s["min_num"].min()))
                hi = str(int(s["max_num"].max()))
            else:
                present = s[s["max_str"] != ""]
                lo, hi = present["min_str"].min(), present["max_str"].max()
            return pd.Series(
                {"n_rows": np.int64(s["n_rows"].sum()),
                 "n_nulls": np.int64(s["n_nulls"].sum()),
                 "n_distinct": np.int64(
                     grp.loc[grp["kind"] == 1, "n_distinct"].sum()),
                 "min_val": lo, "max_val": hi}
            )

        return (
            bucket.groupby("column", sort=False)
            .apply(one, include_groups=False)
            .reset_index()
        )

    return grouped_aggregate(per_bucket, ["column"], merge_final,
                             num_partitions=4)


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

def table_checksums(sf_dir: str, num_buckets: int = 64):
    """Cross-engine reconciliation checksums: per ``doc_id % buckets``
    bucket, the row count and the XOR of a 60-bit md5-derived hash of
    each row's canonical string — the content certificate two
    independent engines (or two snapshots of the same table) compare
    to prove byte-equality without moving the data. XOR, not SUM, so
    the aggregate is order-independent AND cannot overflow, and a
    single differing row flips the bucket's checksum.

    The canonical string is ``doc_id || '|' || text`` exactly as the
    oracle builds it with VARCHAR casts; md5's first 15 hex chars
    parse to the same int64 in Python and DuckDB. Partials are ≤
    ``num_buckets`` rows per batch, so the exchange is constant-size
    regardless of corpus size. At 100 TB the per-row md5 is the cost —
    embarrassingly parallel, no shuffle beyond the bucket partials."""
    import hashlib

    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        texts = batch["text"].fillna("")
        hs = np.fromiter(
            (int(hashlib.md5(f"{i}|{t}".encode("utf-8")).hexdigest()[:15], 16)
             for i, t in zip(ids, texts)),
            dtype=np.int64, count=len(ids),
        )
        df = pd.DataFrame({"bucket": ids % num_buckets, "h": hs})
        rows = []
        for b, g in df.groupby("bucket", sort=False):
            rows.append((b, len(g), int(np.bitwise_xor.reduce(g["h"].to_numpy()))))
        return pd.DataFrame(rows, columns=["bucket", "n_rows", "checksum"]).astype(
            {"bucket": np.int64, "n_rows": np.int64, "checksum": np.int64}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, g in bucket.groupby("bucket", sort=False):
            rows.append(
                (b, int(g["n_rows"].sum()),
                 int(np.bitwise_xor.reduce(g["checksum"].to_numpy(dtype=np.int64))))
            )
        return pd.DataFrame(rows, columns=["bucket", "n_rows", "checksum"]).astype(
            {"bucket": np.int64, "n_rows": np.int64, "checksum": np.int64}
        )

    return grouped_aggregate(docs, ["bucket"], combine, partial=partial,
                             num_partitions=8)


def table_checksums_oracle(num_buckets: int = 64) -> str:
    return f"""
SELECT CAST(doc_id % {num_buckets} AS BIGINT) AS bucket,
       count(*) AS n_rows,
       CAST(bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
                                        || COALESCE(text, '')), 1, 15))::BIGINT)
            AS BIGINT) AS checksum
FROM documents GROUP BY 1
"""
