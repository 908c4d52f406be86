"""Round-2 additions: three-table join chain (Q3 shape), set operations
(EXCEPT / INTERSECT), ROWS-frame moving window, fixed-size uniform
sample, and the PageRank SQL oracle — each value-exact against DuckDB
plus the edge cases SQL can't isolate (segment boundaries, inner-join
drop semantics, parallelism invariance of the sample)."""

from __future__ import annotations

import duckdb
import os
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
        if pd.api.types.is_integer_dtype(df[col]) or pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestTopRevenueOrders:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            TOP_REVENUE_ORDERS_ORACLE,
            top_revenue_orders,
        )

        got = _canon(top_revenue_orders(SF).to_pandas())
        exp = _canon(
            _oracle(
                {t: f"{SF}/{t}.parquet" for t in ("customer", "orders", "lineitem")},
                TOP_REVENUE_ORDERS_ORACLE,
            )
        )
        assert len(got) == 10
        pd.testing.assert_frame_equal(got, exp)

    def test_inner_join_semantics(self, ray_session, tmp_path):
        """Orders with no post-cutoff lineitems are DROPPED (inner
        join), customers outside the segment never contribute, and the
        top-k tie-break is ascending orderkey."""
        from entity_extractor_linker_ray.pipelines.relational import (
            Q3_SEGMENT,
            top_revenue_orders,
        )

        pd.DataFrame(
            {"c_custkey": [1, 2], "c_mktsegment": [Q3_SEGMENT, "OTHER"]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {
                "o_orderkey": [10, 11, 12, 13],
                # 13: right segment but no qualifying lines; 12: wrong cust
                "o_custkey": [1, 1, 2, 1],
                "o_orderdate": pd.to_datetime(["1997-01-01"] * 3 + ["1997-06-01"]),
                "o_orderpriority": ["1-URGENT"] * 4,
            }
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {
                "l_orderkey": [10, 11, 12, 13],
                "l_extendedprice": [100.0, 100.0, 999.0, 50.0],
                "l_discount": [0.0, 0.0, 0.0, 0.0],
                # 13 ships BEFORE the cutoff -> excluded -> order dropped
                "l_shipdate": pd.to_datetime(
                    ["1999-01-01", "1999-01-01", "1999-01-01", "1997-01-01"]
                ),
            }
        ).to_parquet(tmp_path / "lineitem.parquet")

        got = top_revenue_orders(str(tmp_path)).to_pandas()
        # equal revenue 10000 centi for orders 10 and 11 -> orderkey asc
        assert got["orderkey"].tolist() == [10, 11]
        assert got["revenue_centi"].tolist() == [10000, 10000]


class TestSetOps:
    def test_lapsed_matches_except(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USERS_LAPSED_ORACLE,
            users_lapsed,
        )

        got = _canon(users_lapsed(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"}, USERS_LAPSED_ORACLE))
        pd.testing.assert_frame_equal(got, exp)

    def test_retained_matches_intersect(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USERS_RETAINED_ORACLE,
            users_retained,
        )

        got = _canon(users_retained(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"}, USERS_RETAINED_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_planted_membership(self, ray_session, tmp_path):
        """user 1: day1 only (lapsed); user 2: both (retained);
        user 3: day2 only (neither); user 4: outside both windows."""
        from entity_extractor_linker_ray.pipelines.relational import (
            users_lapsed,
            users_retained,
        )

        pd.DataFrame(
            {
                "user_id": [1, 2, 2, 3, 4],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 10:00",
                        "2024-01-01 11:00",
                        "2024-01-02 09:00",
                        "2024-01-02 12:00",
                        "2024-01-20 12:00",
                    ]
                ),
            }
        ).to_parquet(tmp_path / "events.parquet")

        assert users_lapsed(str(tmp_path)).to_pandas()["user_id"].tolist() == [1]
        assert users_retained(str(tmp_path)).to_pandas()["user_id"].tolist() == [2]

    def test_empty_result_keeps_schema(self, ray_session, tmp_path):
        """A lapsed-set that is legitimately empty still declares its
        column/type at the Dataset level (the typed-empty-batch trick;
        ``to_pandas`` itself drops columns on 0-row datasets in this
        Ray version, so the assertion is on ``ds.schema()``)."""
        from entity_extractor_linker_ray.pipelines.relational import users_lapsed

        pd.DataFrame(
            {"user_id": [7, 7],
             "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-02 10:00"])}
        ).to_parquet(tmp_path / "events.parquet")
        ds = users_lapsed(str(tmp_path))
        schema = ds.schema()
        assert schema.names == ["user_id"]
        assert ds.count() == 0


class TestMovingWindow:
    def test_matches_duckdb_window(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_MOVING_WINDOW_ORACLE,
            events_moving_window,
        )

        got = _canon(events_moving_window(SF).to_pandas())
        exp = _canon(
            _oracle({"events": f"{SF}/events.parquet"}, EVENTS_MOVING_WINDOW_ORACLE)
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_segment_boundary_clamp(self, ray_session, tmp_path):
        """The frame never reaches across users: user 2's first event
        must not include user 1's values even when both land in one
        bucket and are adjacent after the sort."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_moving_window,
        )

        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6],
                "user_id": [1, 1, 1, 1, 1, 2],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00"] * 0
                    + [f"2024-01-01 00:0{i}" for i in range(6)]
                ),
                "value": [1.0, 2.0, 3.0, 4.0, 5.0, 100.0],
            }
        ).to_parquet(tmp_path / "events.parquet")

        out = (
            events_moving_window(str(tmp_path))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # user 1: 100, 300, 600, 1000 (full), then window slides: 2+3+4+5
        assert out["w_sum_centi"].tolist() == [100, 300, 600, 1000, 1400, 10000]


class TestUniformFixedSample:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.sampling import (
            UNIFORM_FIXED_SAMPLE_ORACLE,
            uniform_fixed_sample,
        )

        got = _canon(uniform_fixed_sample(SF).to_pandas())
        exp = _canon(
            _oracle(
                {"documents": f"{SF}/documents.parquet"},
                UNIFORM_FIXED_SAMPLE_ORACLE.format(n=100),
            )
        )
        assert len(got) == 100
        pd.testing.assert_frame_equal(got, exp)

    def test_parallelism_invariant(self, ray_session, tmp_path):
        """The sample is a pure function of doc_id — rewriting the
        input as many small files (more read blocks, different batch
        boundaries) must not change the selected set."""
        import pyarrow.parquet as pq

        from entity_extractor_linker_ray.ops.sampling import uniform_fixed_sample

        import os

        base = uniform_fixed_sample(SF, n=50).to_pandas()
        t = pq.read_table(f"{SF}/documents.parquet")
        # exact 8-way partition of the same rows, as a parquet directory
        os.mkdir(tmp_path / "documents.parquet")
        bounds = [len(t) * i // 8 for i in range(9)]
        for i in range(8):
            pq.write_table(
                t.slice(bounds[i], bounds[i + 1] - bounds[i]),
                tmp_path / "documents.parquet" / f"part_{i}.parquet",
            )
        split = uniform_fixed_sample(str(tmp_path), n=50).to_pandas()
        pd.testing.assert_frame_equal(_canon(base), _canon(split))


class TestPagerankOracle:
    def test_sql_mirror_equals_reference_replica(self):
        """Validate the unrolled fixed-point SQL against the local
        integer replica (no Ray): same edges in, bit-identical ranks
        out. The distributed pipeline is already asserted equal to the
        replica elsewhere, so equality here closes the triangle."""
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_pagerank_oracle,
            pagerank_reference,
        )
        from entity_extractor_linker_ray.pipelines import simple_kg

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        edges = con.execute(simple_kg.oracle_sql()["kg_edges"]).df()
        edges = edges.rename(columns={"subject": "src", "object": "dst"})[
            ["src", "dst", "weight"]
        ]
        exp = pagerank_reference(edges, iters=5).sort_values("node").reset_index(drop=True)
        got = (
            con.execute(kg_pagerank_oracle(iters=5))
            .df()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"rank": np.int64}), exp.astype({"rank": np.int64})
        )


class TestLocalSupplierRevenue:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LOCAL_SUPPLIER_REVENUE_ORACLE,
            local_supplier_revenue,
        )

        got = _canon(local_supplier_revenue(SF).to_pandas())
        exp = _canon(
            _oracle(
                {t: f"{SF}/{t}.parquet"
                 for t in ("region", "nation", "customer", "supplier",
                           "orders", "lineitem")},
                LOCAL_SUPPLIER_REVENUE_ORACLE,
            )
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_local_condition_and_region_filter(self, ray_session, tmp_path):
        """Only lineitems whose supplier nation equals the order
        customer's nation count, and only customers in the filtered
        region participate at all."""
        from entity_extractor_linker_ray.pipelines.relational import (
            Q5_REGION,
            local_supplier_revenue,
        )

        pd.DataFrame({"r_regionkey": [0, 1],
                      "r_name": [Q5_REGION, "ELSEWHERE"]}).to_parquet(
            tmp_path / "region.parquet")
        pd.DataFrame({"n_nationkey": [10, 11, 20],
                      "n_name": ["A", "B", "OUT"],
                      "n_regionkey": [0, 0, 1]}).to_parquet(
            tmp_path / "nation.parquet")
        pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [10, 20]}).to_parquet(
            tmp_path / "customer.parquet")
        pd.DataFrame({"s_suppkey": [5, 6], "s_nationkey": [10, 11]}).to_parquet(
            tmp_path / "supplier.parquet")
        pd.DataFrame(
            {"o_orderkey": [100, 101],
             "o_custkey": [1, 2],
             "o_orderdate": pd.to_datetime(["1996-06-01", "1996-06-01"])}
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {  # 100/s5: local (nation 10); 100/s6: non-local (11 != 10);
               # 101: customer outside the region entirely
                "l_orderkey": [100, 100, 101],
                "l_suppkey": [5, 6, 5],
                "l_extendedprice": [10.0, 99.0, 77.0],
                "l_discount": [0.0, 0.0, 0.0],
            }
        ).to_parquet(tmp_path / "lineitem.parquet")

        got = local_supplier_revenue(str(tmp_path)).to_pandas()
        assert got["n_name"].tolist() == ["A"]
        assert got["revenue_centi"].tolist() == [1000]


class TestCube:
    def test_matches_duckdb_cube(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            CORPUS_CUBE_ORACLE,
            corpus_cube,
        )

        got = _canon(corpus_cube(SF).to_pandas())
        exp = _canon(
            _oracle({"documents": f"{SF}/documents.parquet"}, CORPUS_CUBE_ORACLE)
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_cube_is_rollup_plus_source_level(self, ray_session):
        """CUBE = ROLLUP ∪ the (source)-only grouping set — the lattice
        relationship, asserted on actual results."""
        from entity_extractor_linker_ray.ops.textstats import (
            ROLLUP_ALL,
            corpus_cube,
            corpus_rollup,
        )

        cube = _canon(corpus_cube(SF).to_pandas())
        rollup = _canon(corpus_rollup(SF).to_pandas())
        only_in_cube = (
            cube.merge(rollup, how="left", indicator=True)
            .query("_merge == 'left_only'")
            .drop(columns="_merge")
        )
        assert (only_in_cube["lang"] == ROLLUP_ALL).all()
        assert (only_in_cube["source"] != ROLLUP_ALL).all()
        assert len(cube) == len(rollup) + len(only_in_cube)


class TestApproxQuantiles:
    def test_within_one_log_step_of_exact(self, ray_session):
        """The histogram sketch's p50/p90/p99 land within one log-bin
        width (~1%, plus the integer ceil) of the exact distributed
        quantiles, per language."""
        from entity_extractor_linker_ray.ops.textstats import (
            doc_length_quantiles,
            doc_length_quantiles_approx,
        )

        approx = (
            doc_length_quantiles_approx(SF).to_pandas().set_index("lang").sort_index()
        )
        exact = doc_length_quantiles(SF).to_pandas().set_index("lang").sort_index()
        assert list(approx.index) == list(exact.index)
        for col in ("p50_n_chars", "p90_n_chars", "p99_n_chars"):
            rel = (approx[col] - exact[col]).abs() / exact[col]
            assert rel.max() <= 0.02, (col, rel.max())
            # the sketch reports the bin's UPPER edge: never below exact
            assert (approx[col] >= exact[col]).all()


class TestSaltedJoin:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LINEITEM_ENRICHED_ORACLE,
            lineitem_enriched,
        )

        got = _canon(lineitem_enriched(SF).to_pandas())
        exp = _canon(
            _oracle(
                {t: f"{SF}/{t}.parquet" for t in ("orders", "lineitem")},
                LINEITEM_ENRICHED_ORACLE,
            )
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_exact_under_forced_hot_key(self, ray_session, tmp_path):
        """90% of probe rows share ONE orderkey; the salted exchange
        must still produce the exact pandas-merge result (row
        multiplicity included), and an orphan lineitem whose order is
        missing is dropped (inner join)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            lineitem_enriched,
        )

        rng = np.random.default_rng(7)
        n = 5000
        hot = rng.random(n) < 0.9
        orderkeys = np.where(hot, 1, rng.integers(2, 50, n))
        lines = pd.DataFrame(
            {"l_orderkey": orderkeys,
             "l_linenumber": np.arange(n, dtype=np.int32),
             "l_extendedprice": np.round(rng.random(n) * 100, 2)}
        )
        # orphan rows: orderkey 999 has no order
        lines.loc[:4, "l_orderkey"] = 999
        lines.to_parquet(tmp_path / "lineitem.parquet")
        orders = pd.DataFrame(
            {"o_orderkey": np.arange(1, 50),
             "o_orderpriority": [f"P{i % 5}" for i in range(1, 50)]}
        )
        orders.to_parquet(tmp_path / "orders.parquet")

        got = (
            lineitem_enriched(str(tmp_path), num_salts=8)
            .to_pandas()
            .sort_values(["orderkey", "linenumber"], kind="stable")
            .reset_index(drop=True)
        )
        exp = (
            lines.rename(columns={"l_orderkey": "orderkey",
                                  "l_linenumber": "linenumber"})
            .assign(price_centi=lambda d: np.floor(
                d["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64))
            .merge(orders.rename(columns={"o_orderkey": "orderkey",
                                          "o_orderpriority": "orderpriority"}),
                   on="orderkey", how="inner")
            [["orderkey", "linenumber", "price_centi", "orderpriority"]]
            .sort_values(["orderkey", "linenumber"], kind="stable")
            .reset_index(drop=True)
        )
        exp["orderkey"] = exp["orderkey"].astype(np.int64)
        exp["linenumber"] = exp["linenumber"].astype(np.int64)
        assert (got["orderkey"] == 1).sum() >= 0.85 * len(got)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestLatestPerUser:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LATEST_EVENT_PER_USER_ORACLE,
            latest_event_per_user,
        )

        got = _canon(latest_event_per_user(SF).to_pandas())
        exp = _canon(
            _oracle({"events": f"{SF}/events.parquet"},
                    LATEST_EVENT_PER_USER_ORACLE)
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_tiebreak_on_event_id(self, ray_session, tmp_path):
        """Two events at the identical timestamp: the greater event_id
        wins, including when the rows arrive in separate batches (the
        partial argmax must not pre-commit to batch order)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            latest_event_per_user,
        )

        ts = pd.to_datetime(["2024-01-05 12:00"] * 2 + ["2024-01-04 00:00"])
        pd.DataFrame(
            {"event_id": [20, 21, 99], "user_id": [1, 1, 1], "ts": ts,
             "event_type": ["a", "b", "c"]}
        ).to_parquet(tmp_path / "events.parquet")
        out = latest_event_per_user(str(tmp_path)).to_pandas()
        assert out["event_id"].tolist() == [21]
        assert out["event_type"].tolist() == ["b"]


class TestNtile:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_NTILE_ORACLE,
            events_ntile,
        )

        got = _canon(events_ntile(SF).to_pandas())
        exp = _canon(
            _oracle({"events": f"{SF}/events.parquet"}, EVENTS_NTILE_ORACLE)
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_uneven_and_tiny_groups(self, ray_session, tmp_path):
        """SQL NTILE split semantics on the awkward sizes: 6 rows into
        4 tiles -> (2,2,1,1); 2 rows into 4 tiles -> tiles 1 and 2."""
        from entity_extractor_linker_ray.pipelines.relational import events_ntile

        pd.DataFrame(
            {"event_id": list(range(1, 9)),
             "user_id": [1] * 6 + [2] * 2,
             "value": [float(i) for i in range(1, 9)]}
        ).to_parquet(tmp_path / "events.parquet")
        out = (
            events_ntile(str(tmp_path))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out[out["user_id"] == 1]["tile"].tolist() == [1, 1, 2, 2, 3, 4]
        assert out[out["user_id"] == 2]["tile"].tolist() == [1, 2]


class TestValueStats:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_VALUE_STATS_ORACLE,
            events_value_stats,
        )

        got = _canon(events_value_stats(SF).to_pandas())
        exp = _canon(
            _oracle({"events": f"{SF}/events.parquet"}, EVENTS_VALUE_STATS_ORACLE)
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_variance_reconstructs(self, ray_session):
        """The integer partials must reproduce numpy's population
        variance of the rounded centi values exactly."""
        import pyarrow.parquet as pq

        from entity_extractor_linker_ray.pipelines.relational import (
            events_value_stats,
        )

        got = events_value_stats(SF).to_pandas().set_index("user_id")
        t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
        df = t.to_pandas()
        df["centi"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        for user, grp in list(df.groupby("user_id"))[:5]:
            row = got.loc[user]
            n, s, ss = int(row["n_events"]), int(row["sum_centi"]), int(row["sumsq_centi2"])
            var = (n * ss - s * s) / (n * n)
            assert abs(var - grp["centi"].to_numpy().var()) < 1e-6


class TestTriangles:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_triangles,
            kg_triangles_oracle,
        )

        got = kg_triangles(SF).to_pandas()["n_triangles"].tolist()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = con.execute(kg_triangles_oracle()).df()["n_triangles"].tolist()
        assert got == exp
        assert got[0] > 0

    def test_counts_exactly_once(self, ray_session, tmp_path, monkeypatch):
        """A hand-built graph with known motifs: K4 has 4 triangles, a
        square (4-cycle) has none, and direction/duplication of the raw
        edge list must not change the count."""
        import ray.data as rd

        from entity_extractor_linker_ray.ops import graph_algos

        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
              ("c", "d")]
        square = [("p", "q"), ("q", "r"), ("r", "s"), ("s", "p")]
        # duplicates + reversed directions on purpose
        raw = k4 + square + [(v, u) for u, v in k4] + k4[:2]
        edges = pd.DataFrame(raw, columns=["subject", "object"])
        monkeypatch.setattr(
            graph_algos, "kg_edges",
            lambda sf_dir: rd.from_pandas(edges),
            raising=False,
        )
        # kg_triangles imports kg_edges from simple_kg inside the call
        from entity_extractor_linker_ray.pipelines import simple_kg

        monkeypatch.setattr(simple_kg, "kg_edges",
                            lambda sf_dir: rd.from_pandas(edges))
        # the memoized edge cache must not serve a stale graph
        graph_algos._KG_EDGES_CACHE.clear()
        out = graph_algos.kg_triangles("unused").to_pandas()
        assert out["n_triangles"].tolist() == [4]


class TestInvariances:
    def test_salted_join_salt_count_invariant(self, ray_session):
        """num_salts is a pure performance knob: 1 (plain bucketed
        join) and 8 must produce identical enriched rows."""
        from entity_extractor_linker_ray.pipelines.relational import (
            lineitem_enriched,
        )

        a = _canon(lineitem_enriched(SF, num_salts=1).to_pandas())
        b = _canon(lineitem_enriched(SF, num_salts=8).to_pandas())
        pd.testing.assert_frame_equal(a, b)

    def test_moving_window_block_count_invariant(self, ray_session, tmp_path):
        """Splitting the input into many small files (different batch
        boundaries inside the bucketed shuffle) must not change any
        window sum — the segment kernel may only depend on the sorted
        bucket contents."""
        import pyarrow.parquet as pq

        from entity_extractor_linker_ray.pipelines.relational import (
            events_moving_window,
        )

        base = _canon(events_moving_window(SF).to_pandas())
        t = pq.read_table(f"{SF}/events.parquet")
        os.mkdir(tmp_path / "events.parquet")
        bounds = [len(t) * i // 7 for i in range(8)]
        for i in range(7):
            pq.write_table(
                t.slice(bounds[i], bounds[i + 1] - bounds[i]),
                tmp_path / "events.parquet" / f"part_{i}.parquet",
            )
        split = _canon(events_moving_window(str(tmp_path)).to_pandas())
        pd.testing.assert_frame_equal(base, split)


class TestTableProfile:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.profile import (
            table_profile,
            table_profile_oracle,
        )

        got = _canon(table_profile(SF).to_pandas())
        exp = _canon(
            _oracle({"documents": f"{SF}/documents.parquet"},
                    table_profile_oracle())
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_nulls_and_typed_extremes(self, ray_session, tmp_path):
        """Nulls are excluded from min/max/distinct but counted in
        n_nulls; integer extremes compare numerically (95 < 499 even
        though '95' > '499' lexicographically), string extremes
        lexicographically."""
        from entity_extractor_linker_ray.ops.profile import table_profile

        pd.DataFrame(
            {"doc_id": [95, 499, 7, None],
             "text": ["b", None, "a", "a"],
             "lang": ["en", "en", "de", "de"],
             "source": ["s", "s", "s", "s"],
             "n_chars": [1, 2, 3, 4]}
        ).to_parquet(tmp_path / "documents.parquet")
        out = (
            table_profile(str(tmp_path))
            .to_pandas()
            .set_index("column")
        )
        assert out.loc["doc_id", "n_nulls"] == 1
        assert out.loc["doc_id", "min_val"] == "7"
        assert out.loc["doc_id", "max_val"] == "499"
        assert out.loc["doc_id", "n_distinct"] == 3
        assert out.loc["text", "n_nulls"] == 1
        assert out.loc["text", "n_distinct"] == 2
        assert out.loc["text", "min_val"] == "a"
        assert out.loc["lang", "n_distinct"] == 2


class TestUnpivotAndJourneys:
    def test_unpivot_matches_duckdb_and_inverts_pivot(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_UNPIVOT_ORACLE,
            events_unpivot,
        )

        got = _canon(events_unpivot(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             EVENTS_UNPIVOT_ORACLE))
        pd.testing.assert_frame_equal(got, exp)
        # long form re-aggregates to the raw counts (zeros included)
        raw = _oracle(
            {"events": f"{SF}/events.parquet"},
            "SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1, 2",
        )
        merged = got.merge(
            raw, on=["event_type", "user_id"], how="left", suffixes=("", "_raw")
        )
        merged["n_raw"] = merged["n_raw"].fillna(0).astype(np.int64)
        assert (merged["n"] == merged["n_raw"]).all()

    def test_journeys_match_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            USER_JOURNEYS_ORACLE,
            user_journeys,
        )

        got = user_journeys(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
        exp = (
            _oracle({"events": f"{SF}/events.parquet"}, USER_JOURNEYS_ORACLE)
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert list(got["journey"]) == list(exp["journey"])
        assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
        assert (got["journey"].str.len() == got["n_events"]).all()


class TestWeightedSample:
    def test_matches_duckdb_and_biases_long_docs(self, ray_session):
        from entity_extractor_linker_ray.ops.sampling import (
            WEIGHTED_SAMPLE_ORACLE,
            weighted_sample,
        )

        got = weighted_sample(SF, n=100).to_pandas()
        exp = _oracle({"documents": f"{SF}/documents.parquet"},
                      WEIGHTED_SAMPLE_ORACLE.format(n=100))
        pd.testing.assert_frame_equal(
            _canon(got.drop(columns=["priority"])),
            _canon(exp.drop(columns=["priority"])),
        )
        # PPS property: the length-weighted sample must skew longer
        # than the corpus mean
        corpus = _oracle({"documents": f"{SF}/documents.parquet"},
                         "SELECT avg(n_chars) AS m FROM documents")["m"][0]
        assert got["n_chars"].mean() > corpus
