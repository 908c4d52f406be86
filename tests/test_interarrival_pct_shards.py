"""Fourteenth-session batch, part 13: inter-order cadence stats,
within-language length percentiles, binary payload sharding."""

from __future__ import annotations

import hashlib

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


class TestOrdersInterarrival:
    def test_planted_gaps(self, ray_session, tmp_path):
        """cust 1 orders at day 0, 10, 40 -> gaps 10 d and 30 d;
        single-order cust 2 is absent."""
        from entity_extractor_linker_ray.pipelines.relational import (
            orders_interarrival_stats,
        )

        day_us = 86_400_000_000
        pd.DataFrame(
            {"o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
             "o_orderkey": np.arange(4, dtype=np.int64),
             "o_orderdate": pd.to_datetime(
                 np.array([0, 10, 40, 5], dtype=np.int64) * day_us,
                 unit="us")}
        ).to_parquet(tmp_path / "orders.parquet")
        got = orders_interarrival_stats(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert r["c_custkey"] == 1 and r["n_gaps"] == 2
        assert r["gap_us_min"] == 10 * day_us
        assert r["gap_us_max"] == 30 * day_us
        assert r["mean_gap_us"] == 20 * day_us

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            ORDERS_INTERARRIVAL_ORACLE,
            orders_interarrival_stats,
        )

        got = (
            orders_interarrival_stats(SF).to_pandas()
            .sort_values("c_custkey").reset_index(drop=True)
        )
        exp = (
            _connect().execute(ORDERS_INTERARRIVAL_ORACLE).df()
            .sort_values("c_custkey").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["mean_gap_us"].to_numpy() == exp["mean_gap_us"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestDocLengthPctByLang:
    def test_planted_ranks(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.ops.textstats import (
            doc_length_pct_by_lang,
        )

        pd.DataFrame(
            {"doc_id": np.arange(1, 6, dtype=np.int64),
             "lang": ["en", "en", "en", "en", "solo"],
             "n_chars": np.array([10, 20, 20, 40, 99], dtype=np.int64),
             "text": [""] * 5, "source": ["s"] * 5}
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            doc_length_pct_by_lang(str(tmp_path)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert got["pct_rank"].tolist() == [0.0, 1 / 3, 1 / 3, 1.0, 0.0]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import (
            DOC_LENGTH_PCT_BY_LANG_ORACLE,
            doc_length_pct_by_lang,
        )

        got = (
            doc_length_pct_by_lang(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        exp = (
            _connect().execute(DOC_LENGTH_PCT_BY_LANG_ORACLE).df()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["pct_rank"].to_numpy() == exp["pct_rank"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestPayloadShards:
    def test_planted_boundaries(self, ray_session, tmp_path):
        """600-byte payload at 256-byte shards -> 256/256/88; an empty
        payload still emits one empty shard."""
        from entity_extractor_linker_ray.ops.multimodal import payload_shards

        text600 = "a" * 600
        pd.DataFrame(
            {"doc_id": np.array([1, 2], dtype=np.int64),
             "text": [text600, ""]}
        ).to_parquet(tmp_path / "documents.parquet")
        got = (
            payload_shards(str(tmp_path)).to_pandas()
            .sort_values(["doc_id", "shard_idx"]).reset_index(drop=True)
        )
        d1 = got[got["doc_id"] == 1]
        assert d1["n_bytes"].tolist() == [256, 256, 88]
        assert d1["shard_idx"].tolist() == [0, 1, 2]
        assert d1.iloc[0]["sha256"] == hashlib.sha256(b"a" * 256).hexdigest()
        assert bytes(d1.iloc[2]["shard"]) == b"a" * 88
        d2 = got[got["doc_id"] == 2]
        assert len(d2) == 1 and d2.iloc[0]["n_bytes"] == 0

    def test_reassembly_roundtrip(self, ray_session, tmp_path):
        """Concatenating a doc's shards in shard_idx order reproduces
        the original payload bytes."""
        from entity_extractor_linker_ray.ops.multimodal import payload_shards

        texts = ["hello world " * 40, "short", "x" * 257]
        pd.DataFrame(
            {"doc_id": np.arange(3, dtype=np.int64), "text": texts}
        ).to_parquet(tmp_path / "documents.parquet")
        got = payload_shards(str(tmp_path)).to_pandas()
        for doc_id, t in enumerate(texts):
            g = got[got["doc_id"] == doc_id].sort_values("shard_idx")
            joined = b"".join(bytes(b) for b in g["shard"])
            assert joined == t.encode("utf-8")
