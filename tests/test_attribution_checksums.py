"""Batch-2 additions: last-touch purchase attribution, cross-engine
table checksums, month-over-month growth, and share-of-total — each
value-exact against its DuckDB oracle plus the boundary semantics SQL
can't isolate (tie ordering, cross-user carry, single-row-change
detection, year rollover)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _oracle(views: dict[str, str], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, path in views.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(np.float64).round(9)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestPurchaseAttribution:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            PURCHASE_ATTRIBUTION_ORACLE,
            purchase_attribution,
        )

        got = _canon(purchase_attribution(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             PURCHASE_ATTRIBUTION_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_tie_ordering_and_user_isolation(self, ray_session, tmp_path):
        """A click sharing the purchase's timestamp but with a SMALLER
        event_id is a valid last touch ((ts, event_id) row order); a
        click belonging to another user is never a candidate even when
        it is globally the latest; a purchase with no prior click gets
        the -1 sentinel."""
        from entity_extractor_linker_ray.pipelines.relational import (
            purchase_attribution,
        )

        t0 = pd.Timestamp("2024-01-01 12:00:00")
        rows = pd.DataFrame(
            {
                "event_id": np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
                "user_id": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
                "ts": [
                    t0,                                # 1: u1 click
                    t0 + pd.Timedelta(minutes=5),      # 2: u1 click (later)
                    t0 + pd.Timedelta(minutes=5),      # 3: u1 purchase — same ts as 2
                    t0 + pd.Timedelta(minutes=4),      # 4: u2 click (u2's own)
                    t0 + pd.Timedelta(minutes=6),      # 5: u2 purchase
                    t0 + pd.Timedelta(minutes=7),      # 6: u3 purchase, no click ever
                ],
                "event_type": ["click", "click", "purchase", "click",
                               "purchase", "purchase"],
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = (
            purchase_attribution(str(tmp_path))
            .to_pandas()
            .set_index("purchase_id")
        )
        # purchase 3: click 2 shares its ts but precedes by event_id
        assert got.loc[3, "click_event_id"] == 2
        assert got.loc[3, "gap_us"] == 0
        # purchase 5: u2's own click 4, NOT u1's later click 2
        assert got.loc[5, "click_event_id"] == 4
        assert got.loc[5, "gap_us"] == 2 * 60 * 1_000_000
        # purchase 6: no prior click for u3 anywhere
        assert got.loc[6, "click_event_id"] == -1
        assert got.loc[6, "gap_us"] == -1


class TestMonthlyGrowth:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDERS_MONTHLY_GROWTH_ORACLE,
            orders_monthly_growth,
        )

        got = _canon(orders_monthly_growth(SF).to_pandas())
        exp = _canon(_oracle({"orders": f"{SF}/orders.parquet"},
                             ORDERS_MONTHLY_GROWTH_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_year_rollover_and_first_month_excluded(self, ray_session, tmp_path):
        """Dec→Jan are adjacent month indexes (no 12-month gap bug);
        the first month has no predecessor and is absent; growth is the
        exact ratio of centi-int revenues."""
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_monthly_growth,
        )

        rows = pd.DataFrame(
            {
                "o_orderkey": np.arange(1, 5, dtype=np.int64),
                "o_orderdate": pd.to_datetime(
                    ["2023-12-10", "2023-12-20", "2024-01-05", "2024-01-25"]
                ),
                "o_totalprice": [100.0, 100.0, 300.0, 100.0],
            }
        )
        rows.to_parquet(tmp_path / "orders.parquet")

        got = orders_monthly_growth(str(tmp_path)).to_pandas()
        assert len(got) == 1  # only January (December has no predecessor)
        jan = got.iloc[0]
        assert jan["month_idx"] == 2024 * 12 + 0
        assert jan["revenue_centi"] == 40000
        assert jan["prev_revenue_centi"] == 20000
        assert jan["growth"] == 1.0  # exactly doubled


class TestSharesAndChecksums:
    def test_shares_match_and_sum_to_one(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENT_TYPE_SHARES_ORACLE,
            event_type_shares,
        )

        got = event_type_shares(SF).to_pandas()
        exp = _oracle({"events": f"{SF}/events.parquet"}, EVENT_TYPE_SHARES_ORACLE)
        g = got.sort_values("event_type").reset_index(drop=True)
        e = exp.sort_values("event_type").reset_index(drop=True)
        assert (g["n_events"].to_numpy() == e["n_events"].to_numpy()).all()
        # bit-exact float parity: one IEEE division of identical ints
        assert (g["share"].to_numpy() == e["share"].to_numpy()).all()
        assert abs(g["share"].sum() - 1.0) < 1e-12

    def test_checksums_match_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.profile import (
            table_checksums,
            table_checksums_oracle,
        )

        got = _canon(table_checksums(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             table_checksums_oracle()))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_single_row_change_flips_exactly_one_bucket(self, ray_session, tmp_path):
        """The point of a reconciliation checksum: identical tables
        agree on every bucket; editing ONE row's text changes that
        row's bucket checksum and nothing else."""
        from entity_extractor_linker_ray.ops.profile import table_checksums

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(0, 130, dtype=np.int64),  # >1 row per bucket
                "text": [f"document number {i}" for i in range(130)],
            }
        )
        a_dir = tmp_path / "a"; a_dir.mkdir()
        b_dir = tmp_path / "b"; b_dir.mkdir()
        docs.to_parquet(a_dir / "documents.parquet")
        docs2 = docs.copy()
        docs2.loc[docs2["doc_id"] == 7, "text"] = "document number 7 EDITED"
        docs2.to_parquet(b_dir / "documents.parquet")

        a = table_checksums(str(a_dir)).to_pandas().set_index("bucket").sort_index()
        b = table_checksums(str(b_dir)).to_pandas().set_index("bucket").sort_index()
        assert (a["n_rows"] == b["n_rows"]).all()
        diff = a.index[a["checksum"] != b["checksum"]].tolist()
        assert diff == [7 % 64]
