"""Fourteenth-session batch, part 11: chat-template conversation export
and deterministic graph-walk corpus generation."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _connect(sf=SF):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


class TestConvChatmlExport:
    def test_planted_rendering(self, ray_session, tmp_path):
        """A 25-word doc becomes 3 turns (12/12/1 words) with roles
        cycling user/assistant/tool, rendered as newline-joined
        <|role|> lines."""
        from entity_extractor_linker_ray.pipelines.conversations import (
            conv_chatml_export,
        )

        words = [f"w{i}" for i in range(25)]
        pd.DataFrame(
            {"doc_id": np.array([7], dtype=np.int64),
             "text": [" ".join(words)]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = conv_chatml_export(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert r["conv_id"] == "doc-0000000007"
        assert r["n_turns"] == 3
        expect = "\n".join([
            "<|user|>" + " ".join(words[:12]),
            "<|assistant|>" + " ".join(words[12:24]),
            "<|tool|>" + words[24],
        ])
        assert r["chatml"] == expect
        assert r["n_chars"] == len(expect)

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.conversations import (
            CONV_CHATML_EXPORT_ORACLE,
            conv_chatml_export,
        )

        got = (
            conv_chatml_export(SF).to_pandas()
            .sort_values("conv_id").reset_index(drop=True)
        )
        exp = (
            _connect().execute(CONV_CHATML_EXPORT_ORACLE).df()
            .sort_values("conv_id").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestKgRandomWalks:
    def test_walk_structure_and_oracle(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_random_walks,
            kg_random_walks_oracle,
        )
        from entity_extractor_linker_ray.pipelines import simple_kg

        got = (
            kg_random_walks(SF).to_pandas()
            .sort_values(["start_node", "step", "node"])
            .reset_index(drop=True)
        )
        exp = (
            _connect().execute(kg_random_walks_oracle()).df()
            .sort_values(["start_node", "step", "node"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
        # structure: exactly one walk row per (start, step)
        counts = got.groupby(["start_node", "step"]).size()
        assert (counts == 1).all()
        n_nodes = got["start_node"].nunique()
        assert len(got) == n_nodes * 4  # steps 0..3
        # step-0 node is the start itself
        s0 = got[got["step"] == 0]
        assert (s0["start_node"] == s0["node"]).all()
        # every consecutive hop is a real undirected edge
        edges = simple_kg.kg_edges(SF).to_pandas()
        eset = set(map(tuple, edges[["subject", "object"]].values))
        eset |= {(b, a) for a, b in eset}
        walk = got.sort_values(["start_node", "step"])
        for _, g in walk.groupby("start_node"):
            nodes = g.sort_values("step")["node"].tolist()
            for a, b in zip(nodes, nodes[1:]):
                assert (a, b) in eset, f"hop {a}->{b} is not an edge"
