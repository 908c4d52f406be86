"""Planted-duplicate tests for the dedup family: the driver corpus has
no near-dups (embedding_neardup legitimately returns 0 rows there), so
these build a tiny corpus with KNOWN duplicates and assert they — and
only they — are found."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Fake sf_dir: documents with planted near/exact dups + embeddings
    with planted cosine near-dups."""
    root = tmp_path_factory.mktemp("planted")
    rng = np.random.default_rng(11)

    words = [f"w{i}" for i in range(400)]
    base_a = " ".join(rng.choice(words, size=120))
    base_b = " ".join(rng.choice(words, size=120))
    docs = []
    # 0/1: exact duplicates; 2/3: near-dup (one token changed);
    # 4/5: unrelated randoms; 6: empty
    docs.append((0, base_a))
    docs.append((1, base_a))
    near = base_b.split()
    near[5] = "CHANGED"
    docs.append((2, base_b))
    docs.append((3, " ".join(near)))
    docs.append((4, " ".join(rng.choice(words, size=120))))
    docs.append((5, " ".join(rng.choice(words, size=120))))
    docs.append((6, ""))
    pd.DataFrame(docs, columns=["doc_id", "text"]).assign(
        source="planted"
    ).to_parquet(root / "documents.parquet")

    dim = 32
    vecs = rng.standard_normal((10, dim))
    vecs[1] = vecs[0] + 0.001 * rng.standard_normal(dim)  # planted pair (0, 1)
    vecs[5] = vecs[4] + 0.001 * rng.standard_normal(dim)  # planted pair (4, 5)
    # planted BOUNDARY pair (8, 9): cosine just above 0.95, chosen so
    # the first 8-plane band signature DIFFERS (the old single-probe
    # 8-plane LSH would bucket them apart and miss the pair) while some
    # other band still matches — the case banding exists to catch.
    from entity_extractor_linker_ray.ops.dedupe import EMB_BANDS, EMB_ROWS, _emb_planes

    planes = _emb_planes(dim)
    boundary = None
    for trial in range(500):
        a = rng.standard_normal(dim)
        noise = rng.standard_normal(dim)
        noise -= noise @ a / (a @ a) * a  # orthogonal component
        noise *= np.linalg.norm(a) * 0.30 / np.linalg.norm(noise)
        b = a + noise  # cos(a, b) ~ 1/sqrt(1+0.30^2) ~ 0.958
        signs_a = (np.stack([a, b]) @ planes) >= 0
        bands = signs_a.reshape(2, EMB_BANDS, EMB_ROWS)
        band_match = (bands[0] == bands[1]).all(axis=1)
        if not band_match[0] and band_match.any():
            boundary = (a, b)
            break
    assert boundary is not None, "no boundary pair found in 500 trials"
    vecs[8], vecs[9] = boundary
    pd.DataFrame(
        {"vec_id": np.arange(10, dtype=np.int64), "embedding": list(vecs)}
    ).to_parquet(root / "embeddings.parquet")
    return str(root)


class TestPlantedDedup:
    def test_exact_dedup_groups_identical_texts(self, ray_session, planted_dir):
        from entity_extractor_linker_ray.ops.dedupe import exact_dedup

        df = exact_dedup(planted_dir).to_pandas()
        assert len(df) == 6  # 7 docs, one exact-dup pair collapsed
        dup = df[df["n_dups"] == 2]
        assert list(dup["doc_id"]) == [0]  # min doc_id survives

    def test_minhash_finds_planted_neardup(self, ray_session, planted_dir):
        from entity_extractor_linker_ray.ops.dedupe import minhash_candidates

        pairs = minhash_candidates(planted_dir).to_pandas()
        found = set(zip(pairs["doc_a"], pairs["doc_b"]))
        assert (0, 1) in found  # exact dup always a candidate
        assert (2, 3) in found  # planted near-dup
        assert (4, 5) not in found  # unrelated randoms

    def test_jaccard_verifies_and_scores(self, ray_session, planted_dir):
        from entity_extractor_linker_ray.ops.dedupe import jaccard_verified_pairs

        df = jaccard_verified_pairs(planted_dir, threshold=0.8).to_pandas()
        scores = {(a, b): j for a, b, j in df.itertuples(index=False)}
        assert scores[(0, 1)] == 100
        assert 80 <= scores[(2, 3)] < 100

    def test_simhash_distance_tracks_similarity(self, ray_session, planted_dir):
        from entity_extractor_linker_ray.ops.dedupe import simhash

        df = simhash(planted_dir).to_pandas().set_index("doc_id")["simhash"]

        def hamming(a, b):
            return bin(int(a) ^ int(b)).count("1")

        assert hamming(df[0], df[1]) == 0  # identical text
        # near-dup: 1 of 120 tokens changed flips only bits whose
        # ±1-sum is within 2 of zero (expected ~6 of 64); unrelated
        # docs flip ~half (32 ± 4)
        assert hamming(df[2], df[3]) <= 16
        assert hamming(df[4], df[5]) > 16

    def test_embedding_neardup_finds_planted_pairs_only(
        self, ray_session, planted_dir
    ):
        from entity_extractor_linker_ray.ops.dedupe import embedding_neardup

        df = embedding_neardup(planted_dir, threshold=0.95).to_pandas()
        found = set(zip(df["vec_a"], df["vec_b"]))
        assert (0, 1) in found
        assert (4, 5) in found
        # the boundary pair's FIRST band differs (single-probe LSH
        # would miss it) but another band matches — banding finds it
        assert (8, 9) in found
        assert all(pair in {(0, 1), (4, 5), (8, 9)} for pair in found)


class TestEmptyCandidates:
    @pytest.fixture(scope="class")
    def distinct_dir(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("distinct")
        rng = np.random.default_rng(23)
        words = [f"u{i}" for i in range(500)]
        docs = [
            (i, " ".join(rng.choice(words, size=60, replace=False)))
            for i in range(6)
        ]
        pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
            root / "documents.parquet"
        )
        return str(root)

    def test_jaccard_empty_keeps_output_schema(self, ray_session, distinct_dir):
        """A candidate-free corpus must still yield the verified output
        columns (not the intermediate join schema)."""
        from entity_extractor_linker_ray.ops.dedupe import (
            jaccard_verified_pairs,
            minhash_candidates,
        )

        assert minhash_candidates(distinct_dir).count() == 0
        verified = jaccard_verified_pairs(distinct_dir)
        # Dataset.to_pandas() drops columns on 0-row datasets in this
        # Ray version, so assert on the Dataset schema itself
        assert verified.schema().names == ["doc_a", "doc_b", "jaccard_pct"]
        assert verified.count() == 0


class TestWriterEdgeCases:
    def test_writer_handles_batches_with_no_records(self, ray_session, tmp_path):
        """A batch whose documents yield zero entities/triples must emit
        an empty manifest, not crash on mismatched column lengths
        (partitioned mode included)."""
        import pyarrow as pa

        from entity_extractor_linker_ray.stages.kg_stage import KGWriterActor

        batch = pa.table(
            {
                "conv_id": ["c-empty-1", "c-empty-2"],
                "doc_text": ["nothing relevant here", ""],
            }
        )
        for buckets in (0, 8):
            actor = KGWriterActor(
                {"RELATION_EXTRACTION": True},
                out_dir=str(tmp_path / f"w{buckets}"),
                partition_buckets=buckets,
            )
            manifest = actor(batch)
            assert manifest.num_rows == 0
            assert manifest.schema.names == ["path", "n_rows", "n_triples", "n_docs"]

    def test_writer_filenames_stable_across_retries(self, ray_session, tmp_path):
        """The same batch written twice (a Ray task retry) overwrites the
        same file instead of leaving duplicates."""
        import os

        import pyarrow as pa

        from entity_extractor_linker_ray.stages.kg_stage import KGWriterActor

        batch = pa.table(
            {
                "conv_id": ["c1", "c2"],
                "doc_text": ["Spark feeds the Table.", "Query uses Window."],
            }
        )
        out = str(tmp_path / "retry")
        first = KGWriterActor({}, out_dir=out)(batch)
        second = KGWriterActor({}, out_dir=out)(batch)  # fresh actor = retry
        assert first.column("path").to_pylist() == second.column("path").to_pylist()
        files = [f for _, _, fs in os.walk(out) for f in fs]
        assert len(files) == 1


class TestNgramJaccard:
    def test_finds_planted_pairs_with_exact_scores(self, ray_session, planted_dir):
        from entity_extractor_linker_ray.ops.dedupe import ngram_jaccard_pairs

        df = (
            ngram_jaccard_pairs(planted_dir, threshold_pct=60)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        pairs = set(zip(df["doc_a"], df["doc_b"]))
        assert (0, 1) in pairs  # exact dup
        assert (2, 3) in pairs  # one-token near-dup
        assert pairs == {(0, 1), (2, 3)}
        exact = df[(df["doc_a"] == 0)].iloc[0]
        assert exact["jaccard_pct"] == 100 and exact["n_common"] == exact["n_union"]
        # the changed token's grams have document frequency 1 on each
        # side, so the df>=2 restriction removes them from the kept-gram
        # universe symmetrically: over KEPT grams the pair is identical
        # (pct 100) but with a smaller union than the exact-dup pair.
        near = df[(df["doc_a"] == 2)].iloc[0]
        assert near["jaccard_pct"] >= 60
        assert near["n_union"] < exact["n_union"] or near["n_common"] != exact["n_common"]

    def test_matches_duckdb_oracle(self, ray_session, planted_dir):
        import duckdb

        from entity_extractor_linker_ray.ops.dedupe import (
            NGRAM_JACCARD_ORACLE,
            ngram_jaccard_pairs,
        )

        got = (
            ngram_jaccard_pairs(planted_dir)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{planted_dir}/documents.parquet'"
        )
        want = (
            con.execute(NGRAM_JACCARD_ORACLE + " ORDER BY doc_a, doc_b")
            .df()
            .astype("int64")
        )
        pd.testing.assert_frame_equal(got[list(want.columns)], want)


class TestDuplicateClusters:
    def test_matches_recursive_oracle_with_multihop_cluster(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.ops.graph_algos import (
            duplicate_clusters,
            duplicate_clusters_oracle,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            duplicate_clusters(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = (
            con.execute(duplicate_clusters_oracle() + " ORDER BY doc_id")
            .df()
            .astype("int64")
        )
        pd.testing.assert_frame_equal(got[["doc_id", "cluster_id"]], want)
        # sf0.001 contains a >2-node component (8-12-120-360): label
        # propagation must run multiple rounds, not just copy pairs
        sizes = got.groupby("cluster_id").size()
        assert sizes.max() >= 3

    def test_empty_corpus_keeps_schema(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.graph_algos import duplicate_clusters

        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object")}).to_parquet(
            tmp_path / "documents.parquet"
        )
        out = duplicate_clusters(str(tmp_path))
        # Dataset.to_pandas() drops columns on 0-row datasets in this
        # Ray version, so assert on the Dataset schema itself
        assert out.schema().names == ["doc_id", "cluster_id"]
        assert out.count() == 0


class TestPageRank:
    def test_distributed_matches_local_integer_replica(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            pagerank,
            pagerank_reference,
        )

        rng = np.random.default_rng(7)
        n = 60
        src = rng.integers(0, n, 300)
        dst = rng.integers(0, n, 300)
        keep = src != dst
        edges = pd.DataFrame(
            {"src": [f"n{i}" for i in src[keep]],
             "dst": [f"n{i}" for i in dst[keep]],
             "weight": rng.integers(1, 5, keep.sum())}
        ).groupby(["src", "dst"], as_index=False)["weight"].sum()
        got = (
            pagerank(rd.from_pandas(edges), iters=4, num_partitions=8)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = pagerank_reference(edges, iters=4).sort_values("node").reset_index(
            drop=True
        )
        pd.testing.assert_frame_equal(got, want)

    def test_sink_node_gets_floor_and_hub_exceeds_it(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import PR_BASE, pagerank

        # star: a,b,c -> hub; 'src_only' has no in-edges -> floor rank
        edges = pd.DataFrame(
            {"src": ["a", "b", "c", "src_only"],
             "dst": ["hub", "hub", "hub", "a"],
             "weight": [1, 1, 1, 1]}
        )
        ranks = pagerank(rd.from_pandas(edges), iters=8, num_partitions=4).to_pandas()
        r = ranks.set_index("node")["rank"]
        assert r["src_only"] == PR_BASE
        assert r["hub"] > r["a"] > r["src_only"]
