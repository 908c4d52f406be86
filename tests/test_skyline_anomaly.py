"""Fifth-session additions: Pareto-frontier (skyline) selection,
grouped volume z-scores, per-session rollups, and cross-document
repeated n-grams — each value-exact against its DuckDB oracle plus the
edge cases SQL can't isolate (brute-force dominance, zero variance,
planted boilerplate spans, block-count invariance of the distributive
skyline)."""

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
    """Sort columns+rows; ints to int64, floats rounded to 9 places
    (the new ops' floats are designed bit-identical — the rounding only
    stabilizes the sort key)."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(np.float64).round(9)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestParetoOrders:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            PARETO_ORDERS_ORACLE,
            pareto_orders,
        )

        got = _canon(pareto_orders(SF).to_pandas())
        exp = _canon(_oracle({"orders": f"{SF}/orders.parquet"},
                             PARETO_ORDERS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_brute_force_dominance(self, ray_session, tmp_path):
        """Hand-checkable corpus with duplicate pairs, price ties and a
        strictly-dominated interior: result == brute-force O(n²)
        non-dominated set, duplicates of a frontier pair all kept."""
        from entity_extractor_linker_ray.pipelines.relational import pareto_orders

        rows = pd.DataFrame(
            {
                "o_orderkey": np.arange(1, 9, dtype=np.int64),
                "o_totalprice": [10.0, 10.0, 9.0, 9.0, 8.0, 10.0, 7.0, 9.0],
                "o_orderdate": pd.to_datetime(
                    [
                        "2021-01-05",  # 1: frontier (max price, max date @10)
                        "2021-01-05",  # 2: duplicate of 1 — kept
                        "2021-01-06",  # 3: frontier (later than every 10)
                        "2021-01-02",  # 4: dominated by 3
                        "2021-01-07",  # 5: frontier (latest overall)
                        "2021-01-01",  # 6: dominated by 1 (same price, earlier)
                        "2021-01-07",  # 7: dominated by 5 (same date, cheaper)
                        "2021-01-06",  # 8: duplicate of 3 — kept
                    ]
                ),
            }
        )
        path = tmp_path / "orders.parquet"
        rows.to_parquet(path)

        got = pareto_orders(str(tmp_path)).to_pandas()
        assert sorted(got["o_orderkey"]) == [1, 2, 3, 5, 8]

        # brute force agrees
        p = rows["o_totalprice"].to_numpy()
        d = rows["o_orderdate"].to_numpy()
        keep = []
        for i in range(len(rows)):
            dominated = np.any(
                (p >= p[i]) & (d >= d[i]) & ((p > p[i]) | (d > d[i]))
            )
            if not dominated:
                keep.append(int(rows["o_orderkey"][i]))
        assert sorted(got["o_orderkey"]) == sorted(keep)

    def test_block_count_invariant(self, ray_session):
        """The skyline is distributive: the result is identical no
        matter how the partial pass partitions the table."""
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.relational import (
            _skyline,
            pareto_orders,
        )

        base = _canon(pareto_orders(SF).to_pandas())

        orders = rd.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_totalprice", "o_orderdate"],
        ).repartition(13)

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

        rewired = (
            orders.map_batches(partial, batch_format="pandas", batch_size=64)
            .repartition(1)
            .map_batches(_skyline, batch_format="pandas")
        )
        pd.testing.assert_frame_equal(_canon(rewired.to_pandas()), base)


class TestEventsHourlyZscores:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_HOURLY_ZSCORES_ORACLE,
            events_hourly_zscores,
        )

        got = events_hourly_zscores(SF).to_pandas()
        exp = _oracle({"events": f"{SF}/events.parquet"},
                      EVENTS_HOURLY_ZSCORES_ORACLE)
        g = got.sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)
        e = exp.sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)
        assert len(g) == len(e) and len(g) > 0
        assert (g["n_events"].to_numpy(dtype=np.int64)
                == e["n_events"].to_numpy(dtype=np.int64)).all()
        # closed-form from exact ints ⇒ the doubles are BIT-identical
        assert np.array_equal(g["z"].to_numpy(), e["z"].to_numpy())

    def test_zero_variance_and_mean_zero(self, ray_session, tmp_path):
        """A type with identical hourly counts has z = 0 everywhere
        (zero variance guard), and every type's z-scores sum to ~0."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_hourly_zscores,
        )

        ts = pd.to_datetime(
            ["2021-01-01 00:10", "2021-01-01 01:10", "2021-01-01 02:10",
             "2021-01-01 00:20", "2021-01-01 00:40", "2021-01-01 01:20"]
        )
        rows = pd.DataFrame(
            {
                "event_id": np.arange(6, dtype=np.int64),
                "ts": ts,
                "user_id": np.int64(1),
                "event_type": ["flat", "flat", "flat", "spiky", "spiky", "spiky"],
                "value": 1.0,
                "props": "{}",
            }
        )
        rows.to_parquet(tmp_path / "events.parquet")
        got = events_hourly_zscores(str(tmp_path)).to_pandas()
        flat = got[got["event_type"] == "flat"]
        assert (flat["z"] == 0.0).all() and len(flat) == 3
        spiky = got[got["event_type"] == "spiky"].sort_values("hour_bucket")
        # counts 2,1 → z = ±1/sqrt(2)·... exact: n=2,c=[2,1],S=3,Q=5 →
        # den=2·5−9=1, z = (2c−3)/1 = [1,−1]
        assert spiky["z"].tolist() == [1.0, -1.0]
        assert abs(got.groupby("event_type")["z"].sum()).max() < 1e-9


class TestSessionStats:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            SESSION_STATS_ORACLE,
            session_stats,
        )

        got = _canon(session_stats(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             SESSION_STATS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_consistent_with_sessionize(self, ray_session):
        """Same session boundaries as events_sessionize: identical
        (user, session_idx, n_events) triples."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_sessionize,
            session_stats,
        )

        cols = ["user_id", "session_idx", "n_events"]
        a = (session_stats(SF).to_pandas()[cols]
             .sort_values(cols).reset_index(drop=True))
        b = (events_sessionize(SF).to_pandas()[cols]
             .sort_values(cols).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestDupNgrams:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            DUP_NGRAMS_ORACLE,
            dup_ngrams,
        )

        got = _canon(dup_ngrams(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             DUP_NGRAMS_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_boilerplate(self, ray_session, tmp_path):
        """A verbatim span planted into several otherwise-unique docs
        surfaces with exactly its document frequency; within-doc
        repetition does NOT inflate df; short docs are ignored."""
        from entity_extractor_linker_ray.ops.textstats import dup_ngrams

        span = "all rights reserved contact us today"
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(1, 6, dtype=np.int64),
                "text": [
                    f"alpha beta gamma delta {span}",
                    f"{span} zeta eta theta iota kappa",
                    f"unique one two three four five six {span} {span}",
                    "nothing shared here at all whatsoever really",
                    "tiny doc",
                ],
                "lang": "en",
                "source": "t",
                "n_chars": np.int64(1),
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        got = dup_ngrams(str(tmp_path)).to_pandas()
        gram6 = " ".join(span.split()[:5])
        row = got[got["gram"] == gram6]
        # docs 1,2,3 all contain the 5-gram; doc 3 twice but counted once
        assert len(row) == 1
        assert int(row["df"].iloc[0]) == 3
        assert int(row["first_doc"].iloc[0]) == 1
        assert int(row["last_doc"].iloc[0]) == 3
        # nothing from the unique docs leaks in
        assert not got["gram"].str.contains("nothing shared").any()
