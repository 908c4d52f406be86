"""Distributed k-means and incremental graph maintenance.

k-means: the integer fixed-point rules make the three execution paths
bit-identical — distributed (Ray, any block layout) ≡ single-machine
replica ≡ DuckDB unrolled-CTE oracle (the SQL corner is gated by the
driver; here we close the distributed ≡ local edge and check the
clustering actually separates planted clusters).

incremental: build(A) ⊕ build(B) ⊕ build(C) == build(A ∪ B ∪ C), both
in-memory and through a parquet checkpoint round trip — the property
that lets a 100 TB graph absorb new document batches without
re-reading the processed corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


class TestKMeans:
    def test_distributed_equals_local_replica(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            kmeans_clusters,
            kmeans_local,
        )

        dist = _canon(kmeans_clusters(SF).to_pandas())
        local = _canon(kmeans_local(SF))
        pd.testing.assert_frame_equal(dist, local, check_dtype=False)

    def test_separates_planted_clusters(self, ray_session, tmp_path):
        # 3 well-separated blobs; after Lloyd's, members of one blob
        # must share a cluster and different blobs must not merge.
        rng = np.random.default_rng(5)
        dim, per = 16, 40
        centers = rng.standard_normal((3, dim)) * 10
        vecs, truth = [], []
        for c in range(3):
            vecs.extend(centers[c] + 0.2 * rng.standard_normal((per, dim)))
            truth.extend([c] * per)
        # seed rows: vec_id 0..k-1 are the first member of each blob
        order = [c * per for c in range(3)] + [
            i for i in range(3 * per) if i % per != 0
        ]
        vecs = np.stack(vecs)[order]
        truth = np.asarray(truth)[order]
        pd.DataFrame(
            {
                "vec_id": np.arange(len(vecs), dtype=np.int64),
                "embedding": list(np.asarray(vecs, dtype=np.float32)),
            }
        ).to_parquet(tmp_path / "embeddings.parquet")

        from entity_extractor_linker_ray.ops.cluster import kmeans_clusters

        out = kmeans_clusters(str(tmp_path), k=3, iters=3).to_pandas()
        out = out.sort_values("vec_id").reset_index(drop=True)
        for blob in range(3):
            assigned = set(out.loc[truth == blob, "cluster"])
            assert len(assigned) == 1, (blob, assigned)
        assert out["cluster"].nunique() == 3
        assert (out["dist2"] >= 0).all()


class TestSemanticDupPairs:
    def test_planted_pair_found_and_oracle_matches(self, ray_session, tmp_path):
        import duckdb

        rng = np.random.default_rng(11)
        dim, per = 16, 20
        centers = rng.standard_normal((2, dim)) * 10
        vecs = []
        for c in range(2):
            vecs.extend(centers[c] + 0.5 * rng.standard_normal((per, dim)))
        vecs = np.stack(vecs)
        # plant a near-duplicate of vector 5 deep inside blob 0
        vecs[7] = vecs[5] + 0.001 * rng.standard_normal(dim)
        # seed rows for k=2: vec_id 0 (blob 0) and 1 -> move one blob-1
        # member to position 1
        vecs[[1, per]] = vecs[[per, 1]]
        pd.DataFrame(
            {
                "vec_id": np.arange(len(vecs), dtype=np.int64),
                "embedding": list(np.asarray(vecs, dtype=np.float32)),
            }
        ).to_parquet(tmp_path / "embeddings.parquet")

        from entity_extractor_linker_ray.ops.cluster import (
            semantic_dup_oracle,
            semantic_dup_pairs,
        )

        thresh = 10_000  # milli^2 — catches only the planted near-pair
        got = _canon(
            semantic_dup_pairs(str(tmp_path), k=2, iters=2, threshold=thresh)
            .to_pandas()
        )
        assert (5, 7) in set(zip(got["a_id"], got["b_id"]))

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{tmp_path}/embeddings.parquet')"
        )
        want = _canon(
            con.execute(semantic_dup_oracle(k=2, iters=2, threshold=thresh)).fetchdf()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestEventsFunnel:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_FUNNEL_ORACLE,
            events_funnel,
        )

        sf = "/root/testdata/sf0.01"  # sf0.001 has zero conversions
        got = _canon(events_funnel(sf).to_pandas())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = _canon(con.execute(EVENTS_FUNNEL_ORACLE).fetchdf())
        assert len(got) > 0 and got["converted"].sum() > 0  # non-degenerate
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestIncrementalGraph:
    def test_three_way_merge_equals_direct(self, ray_session):
        from entity_extractor_linker_ray.pipelines.incremental import (
            kg_edges_incremental,
            kg_nodes_incremental,
        )
        from entity_extractor_linker_ray.pipelines.simple_kg import (
            kg_edges,
            kg_nodes,
        )

        inc_n = _canon(kg_nodes_incremental(SF, partitions=3).to_pandas())
        full_n = _canon(kg_nodes(SF).to_pandas())
        pd.testing.assert_frame_equal(inc_n, full_n, check_dtype=False)

        inc_e = _canon(kg_edges_incremental(SF, partitions=3).to_pandas())
        full_e = _canon(kg_edges(SF).to_pandas())
        pd.testing.assert_frame_equal(inc_e, full_e, check_dtype=False)

    def test_checkpoint_round_trip(self, ray_session, tmp_path):
        # persist each partition's partial state as parquet (the
        # checkpoint a production run would leave behind), reload, and
        # merge — must equal the from-scratch build exactly.
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.incremental import (
            merge_node_partials,
            node_partials,
            partition_documents,
        )
        from entity_extractor_linker_ray.pipelines.simple_kg import kg_nodes

        reloaded = []
        for r in range(2):
            out = tmp_path / f"state_{r}"
            node_partials(partition_documents(SF, 2, r)).write_parquet(str(out))
            reloaded.append(rd.read_parquet(str(out)))
        merged = _canon(merge_node_partials(reloaded).to_pandas())
        full = _canon(kg_nodes(SF).to_pandas())
        pd.testing.assert_frame_equal(merged, full, check_dtype=False)


class TestEventsRank:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_RANK_ORACLE,
            events_rank,
        )

        got = _canon(events_rank(SF).to_pandas())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = _canon(con.execute(EVENTS_RANK_ORACLE).fetchdf())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_tie_semantics(self):
        # RANK leaves gaps after ties, DENSE_RANK does not — checked on
        # a handcrafted tied segment via the same kernel path DuckDB
        # replays (values -> centi half-up).
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT * FROM (VALUES "
            "(1, 7, 5.0), (2, 7, 5.0), (3, 7, 3.0), (4, 8, 1.0)"
            ") t(event_id, user_id, value)"
        )
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_RANK_ORACLE,
        )

        df = con.execute(EVENTS_RANK_ORACLE).fetchdf().sort_values("event_id")
        assert list(df["rnk"]) == [1, 1, 3, 1]
        assert list(df["rnk_dense"]) == [1, 1, 2, 1]


class TestDedupSurvivors:
    def test_matches_duckdb_and_policy(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.ops.graph_algos import (
            dedup_survivors,
            dedup_survivors_oracle,
            duplicate_clusters,
        )

        sf = "/root/testdata/sf0.01"  # sf0.001 may have no dup pairs
        got = _canon(dedup_survivors(sf).to_pandas())
        assert len(got) > 0 and (got["n_members"] >= 2).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = _canon(con.execute(dedup_survivors_oracle()).fetchdf())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # every survivor is a member of its own cluster
        clus = duplicate_clusters(sf).to_pandas()
        members = set(zip(clus["cluster_id"], clus["doc_id"]))
        assert all(
            (c, s) in members
            for c, s in zip(got["cluster_id"], got["survivor_id"])
        )


class TestKgramFingerprints:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.ops.textstats import (
            kgram_fingerprints,
            kgram_fingerprints_oracle,
        )

        got = _canon(kgram_fingerprints(SF).to_pandas())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = _canon(con.execute(kgram_fingerprints_oracle()).fetchdf())
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_shared_substring_shares_fingerprints(self, ray_session, tmp_path):
        # alignment-independence: the same long substring embedded at
        # different offsets must contribute identical fingerprints
        shared = "the quick brown fox jumps over the lazy dog again and again"
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["AAAA " + shared + " BBBB",
                      "completely different prefix words here " + shared,
                      "nothing in common with the others at all zzz qqq"]}
        ).to_parquet(tmp_path / "documents.parquet")
        from entity_extractor_linker_ray.ops.textstats import kgram_fingerprints

        df = kgram_fingerprints(str(tmp_path)).to_pandas()
        fps = {d: set(g["fp"]) for d, g in df.groupby("doc_id")}
        common12 = fps[1] & fps[2]
        assert common12, "shared substring must produce shared fingerprints"
        # docs 1 and 3 share no 8-gram; overlap should be empty
        assert not (fps[1] & fps.get(3, set()))


class TestFpContainment:
    def test_contained_doc_scores_100(self, ray_session, tmp_path):
        import duckdb

        # doc 2 is a verbatim excerpt of doc 1 (plus nothing else):
        # containment must be 100 even though Jaccard vs the long doc
        # is far below any dedup threshold.
        rng = np.random.default_rng(3)
        words = ["w%04d" % i for i in rng.integers(0, 9999, size=400)]
        big = " ".join(words)
        excerpt = " ".join(words[100:140])
        other = " ".join("q%04d" % i for i in rng.integers(0, 9999, size=200))
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [big, excerpt, other]}
        ).to_parquet(tmp_path / "documents.parquet")

        from entity_extractor_linker_ray.ops.dedupe import (
            fp_containment,
            fp_containment_oracle,
        )

        got = _canon(fp_containment(str(tmp_path)).to_pandas())
        row = got[(got["doc_a"] == 1) & (got["doc_b"] == 2)]
        assert len(row) == 1 and int(row["containment_pct"].iloc[0]) == 100
        assert not ((got["doc_a"] == 3) | (got["doc_b"] == 3)).any()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        want = _canon(con.execute(fp_containment_oracle()).fetchdf())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestKmeansExemplars:
    def test_exemplar_is_closest_member(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            kmeans_clusters,
            kmeans_exemplars,
        )

        assigned = kmeans_clusters(SF).to_pandas()
        ex = kmeans_exemplars(SF).to_pandas().sort_values("cluster")
        for _, row in ex.iterrows():
            members = assigned[assigned["cluster"] == row["cluster"]]
            assert row["n_members"] == len(members)
            best = members.sort_values(["dist2", "vec_id"]).iloc[0]
            assert row["exemplar_id"] == best["vec_id"]
            assert row["dist2"] == best["dist2"]
        assert ex["n_members"].sum() == len(assigned)


class TestKMeansSeedValidation:
    def test_sparse_ids_fail_loudly_on_every_path(self, tmp_path):
        # vec_ids 2..7 with k=4: silently seeding from the wrong rows
        # would break distributed ≡ local ≡ SQL — all paths must raise.
        rng = np.random.default_rng(0)
        pd.DataFrame(
            {"vec_id": np.arange(2, 8, dtype=np.int64),
             "embedding": list(rng.standard_normal((6, 4)).astype(np.float32))}
        ).to_parquet(tmp_path / "embeddings.parquet")
        from entity_extractor_linker_ray.ops.cluster import (
            _init_centroids,
            kmeans_local,
        )

        with pytest.raises(ValueError, match="vec_ids 0..3"):
            kmeans_local(str(tmp_path), k=4)
        with pytest.raises(ValueError, match="vec_ids 0..3"):
            _init_centroids(str(tmp_path), 4)


class TestKgTwoHop:
    def test_planted_graphs(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import kg_two_hop

        # path a-b-c-d: strict two-hop of a={c}, b={d}, c={a}, d={b}
        path = rd.from_pandas(pd.DataFrame(
            {"subject": ["a", "b", "c"], "object": ["b", "c", "d"]}
        ))
        got = (
            kg_two_hop("unused", edges_ds=path)
            .to_pandas()
            .set_index("entity")
            .sort_index()
        )
        assert got["n_direct"].to_dict() == {"a": 1, "b": 2, "c": 2, "d": 1}
        assert got["n_two_hop"].to_dict() == {"a": 1, "b": 1, "c": 1, "d": 1}

        # triangle a-b-c: dense — every 2-hop neighbor is direct
        tri = rd.from_pandas(pd.DataFrame(
            {"subject": ["a", "b", "c"], "object": ["b", "c", "a"]}
        ))
        got = kg_two_hop("unused", edges_ds=tri).to_pandas()
        assert (got["n_two_hop"] == 0).all() and (got["n_direct"] == 2).all()

    def test_matches_duckdb_on_corpus(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_two_hop,
            kg_two_hop_oracle,
        )

        got = _canon(kg_two_hop(SF).to_pandas())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = _canon(con.execute(kg_two_hop_oracle()).fetchdf())
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestEventsPercentiles:
    def test_matches_duckdb_bit_exact(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_PERCENTILES_ORACLE,
            events_percentiles,
        )

        got = (
            events_percentiles(SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = (
            con.execute(EVENTS_PERCENTILES_ORACLE)
            .fetchdf()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # bit-exact float equality, not approx — same int ratios
        assert (got["pct_rank"].to_numpy() == want["pct_rank"].to_numpy()).all()
        assert (got["cume"].to_numpy() == want["cume"].to_numpy()).all()

    def test_tie_and_single_row_semantics(self):
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT * FROM (VALUES "
            "(1, 7, 5.0), (2, 7, 5.0), (3, 7, 3.0), (4, 8, 1.0)"
            ") t(event_id, user_id, value)"
        )
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_PERCENTILES_ORACLE,
        )

        df = con.execute(EVENTS_PERCENTILES_ORACLE).fetchdf().sort_values("event_id")
        assert list(df["pct_rank"]) == [0.0, 0.0, 1.0, 0.0]
        assert list(df["cume"]) == [2 / 3, 2 / 3, 1.0, 1.0]


class TestIncrementalEdgeTimespan:
    def test_merge_equals_direct(self, ray_session):
        from entity_extractor_linker_ray.pipelines.incremental import (
            kg_edge_timespan_incremental,
        )
        from entity_extractor_linker_ray.pipelines.simple_kg import kg_edge_timespan

        inc = _canon(kg_edge_timespan_incremental(SF, partitions=3).to_pandas())
        full = _canon(kg_edge_timespan(SF).to_pandas())
        pd.testing.assert_frame_equal(inc, full, check_dtype=False)

    def test_checkpoint_round_trip(self, ray_session, tmp_path):
        import ray.data as rd

        from entity_extractor_linker_ray.pipelines.incremental import (
            partition_documents,
        )
        from entity_extractor_linker_ray.pipelines.simple_kg import (
            edge_timespan_partial,
            kg_edge_timespan,
            merge_edge_timespan_partials,
        )

        reloaded = []
        for r in range(2):
            out = tmp_path / f"span_state_{r}"
            partition_documents(SF, 2, r).map_batches(
                edge_timespan_partial, batch_format="pandas"
            ).write_parquet(str(out))
            reloaded.append(rd.read_parquet(str(out)))
        merged = _canon(merge_edge_timespan_partials(reloaded).to_pandas())
        full = _canon(kg_edge_timespan(SF).to_pandas())
        pd.testing.assert_frame_equal(merged, full, check_dtype=False)
