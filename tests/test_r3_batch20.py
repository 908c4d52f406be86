"""Round-3 batch 20: integer fixed-point power-iteration PCA,
deterministic synchronous label-propagation communities, and BPE
tokenizer application — DuckDB value parity for the PCA op (unrolled
CTE), distributed ≡ local replica for LPA (plus a planted two-clique
fixture), and distributed ≡ pure-python encoding for the BPE stats."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _as_df(result) -> pd.DataFrame:
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


class TestPcaPowerComponent:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.cluster import (
            pca_power_component,
            pca_power_component_oracle,
        )

        got = _as_df(pca_power_component(SF)).sort_values("d").reset_index(
            drop=True
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
        )
        exp = (
            con.execute(pca_power_component_oracle())
            .df()
            .astype({"d": np.int64, "component": np.int64})
            .sort_values("d")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)
        # the rescale keeps the vector in milli range and non-trivial
        assert got["component"].abs().max() <= 1000
        assert got["component"].abs().max() > 0

    def test_recovers_planted_direction(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.cluster import pca_power_component

        # 40 vectors = ±(2, 0.01, 0.01, ...) plus tiny deterministic
        # noise: the top principal direction is e0 by construction.
        rng = np.random.default_rng(3)
        d = 8
        base = np.zeros(d)
        base[0] = 2.0
        X = np.array(
            [(1 if i % 2 else -1) * base + 0.01 * rng.standard_normal(d)
             for i in range(40)],
            dtype=np.float32,
        )
        pd.DataFrame(
            {"vec_id": np.arange(40, dtype=np.int64),
             "embedding": [row.tolist() for row in X],
             "label": np.zeros(40, dtype=np.int32)}
        ).to_parquet(tmp_path / "embeddings.parquet")
        got = _as_df(pca_power_component(str(tmp_path), d=d)).set_index("d")
        comp = got["component"].to_numpy(dtype=np.int64)
        assert np.abs(comp[0]) == np.abs(comp).max()
        assert np.abs(comp[0]) > 10 * np.abs(comp[1:]).max()


class TestLabelPropagation:
    @staticmethod
    def _both_dirs(pairs: list[tuple[int, int]]) -> pd.DataFrame:
        a = np.array([p[0] for p in pairs], dtype=np.int64)
        b = np.array([p[1] for p in pairs], dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([a, b]), "d": np.concatenate([b, a])}
        )

    def test_two_cliques_with_bridge(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            label_propagation,
        )

        # cliques {0..3} and {10..13} joined by the single bridge 3-10:
        # each clique converges to its min id; the bridge cannot flip
        # either side (1 vote vs 3).
        clique = lambda nodes: [(a, b) for a in nodes for b in nodes if a < b]
        edges = self._both_dirs(
            clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
        )
        labels = (
            label_propagation(rd.from_pandas(edges), rounds=4,
                              num_partitions=4)
            .to_pandas()
            .set_index("node")["label"]
        )
        assert set(labels[[0, 1, 2, 3]]) == {0}
        assert set(labels[[10, 11, 12, 13]]) == {10}

    def test_matches_replica_on_synthetic_graph(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            label_propagation,
            label_propagation_replica,
        )
        from entity_extractor_linker_ray.ops.synthetic_graph import (
            power_law_edges,
        )

        edges = power_law_edges(n_nodes=3000, avg_deg=8, seed=11,
                                num_blocks=8).to_pandas()
        msg = pd.DataFrame(
            {"s": np.concatenate([edges["src"], edges["dst"]]).astype(np.int64),
             "d": np.concatenate([edges["dst"], edges["src"]]).astype(np.int64)}
        )
        import ray.data as rd

        got = (
            label_propagation(rd.from_pandas(msg), rounds=3,
                              num_partitions=8)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        exp = label_propagation_replica(msg, rounds=3)
        pd.testing.assert_frame_equal(got, exp)
        # on this hub-centric graph synchronous LPA legitimately
        # collapses toward the giant community at odd rounds (it
        # oscillates — the reason the round budget is FIXED, see the
        # kernel docstring); non-trivial structure at the default
        # rounds=4 is asserted by test_biggraph_lpa_bands.
        assert got["label"].nunique() >= 1

    def test_biggraph_lpa_recovers_planted_blocks(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            label_propagation,
        )
        from entity_extractor_linker_ray.ops.synthetic_graph import (
            biggraph_lpa,
            planted_partition_edges,
        )

        n, blocks = 3000, 15
        bands = _as_df(biggraph_lpa(n_nodes=n, avg_deg=12, seed=11))
        assert (bands["n_nodes"] > 0).all()
        # LPA must find real structure: within 3x of the planted count
        n_comms = int(bands["n_communities"].sum())
        assert blocks // 3 <= n_comms <= blocks * 3

        # and the communities must BE the planted blocks (high purity)
        edges = planted_partition_edges(n, blocks, 12, seed=11).to_pandas()
        msg = pd.DataFrame(
            {"s": np.concatenate([edges["src"], edges["dst"]]).astype(np.int64),
             "d": np.concatenate([edges["dst"], edges["src"]]).astype(np.int64)}
        )
        labels = label_propagation(
            rd.from_pandas(msg), rounds=8, num_partitions=8
        ).to_pandas()
        labels["block"] = labels["node"] % blocks
        purity = (
            labels.groupby("block")["label"]
            .agg(lambda s: s.value_counts().iloc[0] / len(s))
            .min()
        )
        assert purity > 0.95


class TestBpeEncodeStats:
    def test_matches_local_encoding(self, ray_session):
        import re

        import pyarrow.parquet as pq

        from entity_extractor_linker_ray.ops.textstats import (
            _bpe_apply,
            bpe_encode_stats,
            bpe_merges_cached,
        )

        got = (
            _as_df(bpe_encode_stats(SF))
            .sort_values("source")
            .reset_index(drop=True)
        )
        merges = bpe_merges_cached(SF, 8)
        ranks = {
            (l, r): int(k)
            for k, l, r in zip(merges["rank"], merges["left"],
                               merges["right"])
        }
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        word_re = re.compile(r"[a-z]+")
        rows: dict = {}
        for source, text in zip(docs["source"], docs["text"]):
            acc = rows.setdefault(str(source), [0, 0, 0])
            for w in word_re.findall((text or "").lower()):
                acc[0] += 1
                acc[1] += len(w)
                acc[2] += len(_bpe_apply(w, ranks))
        exp = pd.DataFrame(
            [(s, a, b, c, (b * 1000) // c if c else 0)
             for s, (a, b, c) in sorted(rows.items())],
            columns=["source", "n_words", "n_chars", "n_tokens",
                     "chars_per_token_milli"],
        ).astype({c: np.int64 for c in ("n_words", "n_chars", "n_tokens",
                                        "chars_per_token_milli")})
        pd.testing.assert_frame_equal(got, exp)
        # merges actually compress: strictly fewer tokens than chars
        assert (got["n_tokens"] < got["n_chars"]).all()
        assert (got["chars_per_token_milli"] > 1000).all()
