"""ANN recall: the multi-probe LSH variant must dominate single-probe,
measured against exact brute force. Uses a CLUSTERED embedding table —
on isotropic random vectors every similarity is ~0 and LSH recall is
undefined by construction; real ANN workloads (and the near-dup path)
operate on clustered data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("clustered")
    rng = np.random.default_rng(17)
    dim, n_clusters, per_cluster = 32, 4, 30
    centers = rng.standard_normal((n_clusters, dim)) * 4
    vecs = []
    for c in range(n_clusters):
        vecs.extend(centers[c] + 0.3 * rng.standard_normal((per_cluster, dim)))
    # queries (vec_id 0..3) are the first member of each cluster
    order = [c * per_cluster for c in range(n_clusters)] + [
        i for i in range(n_clusters * per_cluster)
        if i % per_cluster != 0
    ]
    vecs = np.stack(vecs)[order]
    pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)}
    ).to_parquet(root / "embeddings.parquet")
    return str(root)


def _pairs(df):
    return set(zip(df["query_id"], df["neighbor_id"]))


class TestAnnRecall:
    def test_multiprobe_recall_dominates_single_probe(
        self, ray_session, clustered_dir
    ):
        from entity_extractor_linker_ray.ops.ann import knn_brute, knn_lsh

        brute = _pairs(knn_brute(clustered_dir).to_pandas())
        assert brute
        multi = _pairs(knn_lsh(clustered_dir, probe_bits=1).to_pandas())
        single = _pairs(knn_lsh(clustered_dir, probe_bits=0).to_pandas())
        recall_multi = len(multi & brute) / len(brute)
        recall_single = len(single & brute) / len(brute)
        assert recall_multi >= recall_single
        assert recall_multi >= 0.8, (recall_multi, recall_single)

    def test_lsh_results_are_ranked_and_self_free(self, ray_session):
        from entity_extractor_linker_ray.ops.ann import knn_lsh

        df = knn_lsh(SF).to_pandas()
        for _, group in df.groupby("query_id"):
            assert list(group.sort_values("rank")["rank"]) == list(
                range(1, len(group) + 1)
            )
        assert (df["query_id"] != df["neighbor_id"]).all()


class TestIvf:
    def test_ivf_recall_on_clusters(self, ray_session, clustered_dir):
        from entity_extractor_linker_ray.ops.ann import knn_brute, knn_ivf

        brute = _pairs(knn_brute(clustered_dir).to_pandas())
        ivf = _pairs(knn_ivf(clustered_dir, n_lists=8, n_probe=2).to_pandas())
        recall = len(ivf & brute) / len(brute)
        assert recall >= 0.8, recall

    def test_ivf_more_probes_higher_recall(self, ray_session, clustered_dir):
        from entity_extractor_linker_ray.ops.ann import knn_brute, knn_ivf

        brute = _pairs(knn_brute(clustered_dir).to_pandas())
        r1 = len(_pairs(knn_ivf(clustered_dir, n_lists=8, n_probe=1).to_pandas()) & brute)
        r2 = len(_pairs(knn_ivf(clustered_dir, n_lists=8, n_probe=4).to_pandas()) & brute)
        assert r2 >= r1

    def test_ivf_runs_on_driver_table(self, ray_session):
        from entity_extractor_linker_ray.ops.ann import knn_ivf

        df = knn_ivf(SF).to_pandas()
        assert len(df) > 0
        assert set(df.columns) == {"query_id", "neighbor_id", "rank"}


class TestLabelCentroids:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from entity_extractor_linker_ray.ops.ann import (
            LABEL_CENTROIDS_ORACLE,
            label_centroids,
        )

        sf = "/root/testdata/sf0.001"
        got = label_centroids(sf).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
        )
        exp = con.execute(LABEL_CENTROIDS_ORACLE).df()
        key = ["label", "pos"]

        def canon(df):
            cols = sorted(df.columns)
            return (
                df[cols].astype(np.int64).sort_values(key).reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(canon(got), canon(exp), check_dtype=False)

    def test_partials_reconstruct_mean(self, ray_session):
        """sum_milli / n_vecs must reproduce the per-label mean vector
        computed locally with numpy (within milli-unit rounding)."""
        import pyarrow.parquet as pq

        from entity_extractor_linker_ray.ops.ann import label_centroids

        sf = "/root/testdata/sf0.001"
        got = label_centroids(sf).to_pandas()
        t = pq.read_table(f"{sf}/embeddings.parquet")
        emb = np.vstack(t.column("embedding").to_pylist())
        labels = t.column("label").to_numpy(zero_copy_only=False)
        for label in np.unique(labels)[:3]:
            mean = emb[labels == label].mean(axis=0)
            rows = got[got["label"] == label].sort_values("pos")
            approx = rows["sum_milli"].to_numpy() / 1000.0 / rows["n_vecs"].to_numpy()
            assert np.allclose(approx, mean, atol=6e-4)
