"""Seventh-session batch: grouped OLS regression, per-edge
neighborhood Jaccard, and product-quantization ANN."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    """Clustered embeddings (as in test_ann.py): isotropic random
    vectors give ~0 similarity everywhere, so ANN recall is undefined
    by construction — recall is measured where it means something."""
    root = tmp_path_factory.mktemp("clustered_pq")
    rng = np.random.default_rng(23)
    dim, n_clusters, per_cluster = 32, 4, 30
    centers = rng.standard_normal((n_clusters, dim)) * 4
    vecs = []
    for c in range(n_clusters):
        vecs.extend(centers[c] + 0.3 * rng.standard_normal((per_cluster, dim)))
    order = [c * per_cluster for c in range(n_clusters)] + [
        i for i in range(n_clusters * per_cluster) if i % per_cluster != 0
    ]
    vecs = np.stack(vecs)[order]
    pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)}
    ).to_parquet(root / "embeddings.parquet")
    return str(root)


class TestLineitemRegr:
    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LINEITEM_REGR_ORACLE,
            lineitem_regr,
        )

        got = (
            lineitem_regr(SF).to_pandas()
            .sort_values("l_returnflag").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
        )
        exp = (
            con.execute(LINEITEM_REGR_ORACLE).df()
            .sort_values("l_returnflag").reset_index(drop=True)
        )
        cols = sorted(got.columns)
        assert cols == sorted(exp.columns)
        # bit-exact float parity is the contract, not approximate
        for c in ("slope", "intercept", "r2"):
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
        pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)

    def test_matches_direct_ols(self, ray_session):
        """slope/intercept agree with a straight lstsq fit on the same
        integer-unit data (closed form vs factorization, so approx)."""
        import pyarrow.parquet as pq

        from entity_extractor_linker_ray.pipelines.relational import lineitem_regr

        got = lineitem_regr(SF).to_pandas().set_index("l_returnflag")
        t = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        ).to_pandas()
        for flag, grp in t.groupby("l_returnflag"):
            x = np.round(grp["l_quantity"].to_numpy(dtype=np.float64) * 100)
            y = np.floor(grp["l_extendedprice"].to_numpy(dtype=np.float64))
            slope, intercept = np.polyfit(x, y, 1)
            assert got.loc[flag, "slope"] == pytest.approx(slope, rel=1e-9)
            assert got.loc[flag, "intercept"] == pytest.approx(intercept, rel=1e-6)
            assert 0.0 <= got.loc[flag, "r2"] <= 1.0


def _planted_edges():
    """Square a-b-c-d (+diagonal a-c) with a pendant e on a:
      N(a)={b,c,d,e} N(b)={a,c} N(c)={a,b,d} N(d)={a,c} N(e)={a}."""
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {"subject": ["a", "b", "c", "a", "a", "e"],
             "object": ["b", "c", "d", "d", "c", "a"]}
        )
    )


class TestKgEdgeJaccard:
    def test_planted_graph_values(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import kg_edge_jaccard

        df = (
            kg_edge_jaccard("unused", edges_ds=_planted_edges())
            .to_pandas().set_index(["u", "v"]).sort_index()
        )
        # edge (a,b): common {c}; union {a,b,c,d,e} -> 1/5
        assert df.loc[("a", "b"), "n_common"] == 1
        assert df.loc[("a", "b"), "n_union"] == 5
        assert df.loc[("a", "b"), "jaccard"] == 1 / 5
        # edge (a,c): common {b,d}; union 4+3-2=5
        assert df.loc[("a", "c"), "n_common"] == 2
        assert df.loc[("a", "c"), "n_union"] == 5
        # pendant edge (a,e): no common neighbor, union 4+1-0=5
        assert df.loc[("a", "e"), "n_common"] == 0
        assert df.loc[("a", "e"), "jaccard"] == 0.0
        assert len(df) == 6

    def test_matches_duckdb_on_corpus(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_edge_jaccard,
            kg_edge_jaccard_oracle,
        )

        got = (
            kg_edge_jaccard(SF).to_pandas()
            .sort_values(["u", "v"]).reset_index(drop=True)
        )
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        exp = (
            con.execute(kg_edge_jaccard_oracle()).df()
            .sort_values(["u", "v"]).reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["jaccard"].to_numpy() == exp["jaccard"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
        )


class TestKnnPq:
    def test_pq_recall_on_clusters(self, ray_session, clustered_dir):
        from entity_extractor_linker_ray.ops.ann import knn_brute, knn_pq

        brute = set(
            map(tuple, knn_brute(clustered_dir).to_pandas()
                [["query_id", "neighbor_id"]].to_numpy())
        )
        pq_pairs = set(
            map(tuple, knn_pq(clustered_dir, n_sub=8, n_codes=16).to_pandas()
                [["query_id", "neighbor_id"]].to_numpy())
        )
        recall = len(pq_pairs & brute) / len(brute)
        assert recall >= 0.8, recall

    def test_pq_ranked_and_self_free(self, ray_session):
        from entity_extractor_linker_ray.ops.ann import knn_pq

        df = knn_pq(SF).to_pandas()
        assert len(df) > 0
        assert set(df.columns) == {"query_id", "neighbor_id", "rank"}
        assert (df["query_id"] != df["neighbor_id"]).all()
        for _, group in df.groupby("query_id"):
            assert list(group.sort_values("rank")["rank"]) == list(
                range(1, len(group) + 1)
            )
