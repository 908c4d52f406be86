"""Blocked fuzzy matching + entity-lift association: oracle parity at
sf0.001 plus the edge semantics the oracle can't isolate — byte-level
(not codepoint) distances, tie-breaking, singleton blocks, known lift
arithmetic — and a property test of the batched Levenshtein kernel
against a scalar reference DP."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _scalar_levenshtein(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[len(b)]


class TestBatchedLevenshtein:
    def test_random_property_vs_scalar_dp(self):
        from entity_extractor_linker_ray.ops.fuzzy import batched_levenshtein

        rng = np.random.default_rng(42)
        alphabet = list("abcdé ")
        a = np.array(
            ["".join(rng.choice(alphabet, rng.integers(0, 12))) for _ in range(200)],
            dtype=object,
        )
        b = np.array(
            ["".join(rng.choice(alphabet, rng.integers(0, 12))) for _ in range(200)],
            dtype=object,
        )
        got = batched_levenshtein(a, b)
        exp = [
            _scalar_levenshtein(x.encode("utf-8"), y.encode("utf-8"))
            for x, y in zip(a, b)
        ]
        assert got.tolist() == exp

    def test_byte_semantics_match_duckdb(self):
        """DuckDB levenshtein counts BYTES: é (2 UTF-8 bytes) → 2."""
        from entity_extractor_linker_ray.ops.fuzzy import batched_levenshtein

        got = batched_levenshtein(
            np.array(["héllo", "", "kitten"], dtype=object),
            np.array(["hello", "abc", "sitting"], dtype=object),
        )
        con = duckdb.connect()
        exp = [
            con.execute("SELECT levenshtein(?, ?)", [x, y]).fetchone()[0]
            for x, y in [("héllo", "hello"), ("", "abc"), ("kitten", "sitting")]
        ]
        assert got.tolist() == exp == [2, 3, 3]


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


class TestFuzzyNeighbors:
    def test_oracle_parity(self, ray_session):
        from entity_extractor_linker_ray.ops.fuzzy import (
            fuzzy_neighbors,
            fuzzy_neighbors_oracle,
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.execute(fuzzy_neighbors_oracle())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = (
            fuzzy_neighbors(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({"doc_id": np.int64, "other_id": np.int64, "dist": np.int64})
        )
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

    def test_blocking_ties_and_singletons(self, ray_session, tmp_path):
        """Neighbors only within (lang, source); exact ties go to the
        smaller other_id; a singleton block emits nothing."""
        from entity_extractor_linker_ray.ops.fuzzy import fuzzy_neighbors

        sf = _write_docs(
            tmp_path,
            [
                (0, "abcdef", "en", "s0"),
                (1, "abcdxf", "en", "s0"),   # dist 1 to doc 0
                (2, "abcdyf", "en", "s0"),   # dist 1 to 0, dist 1 to 1
                (9, "abcdef", "en", "s1"),   # other block: identical text
                (5, "zzzzzz", "de", "s0"),   # singleton block
            ],
        )
        out = fuzzy_neighbors(sf).to_pandas().set_index("doc_id").sort_index()
        assert 5 not in out.index and 9 not in out.index
        assert out.loc[0, "other_id"] == 1 and out.loc[0, "dist"] == 1
        # doc 2 ties between 0 and 1 at dist 1 -> smallest other_id
        assert out.loc[2, "other_id"] == 0 and out.loc[2, "dist"] == 1


class TestEntityLift:
    def test_oracle_parity_bit_exact_floats(self, ray_session):
        from entity_extractor_linker_ray.pipelines.simple_kg import (
            kg_entity_lift,
            oracle_sql,
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.execute(oracle_sql()["kg_entity_lift"])
            .df()
            .sort_values(["entity_a", "entity_b"])
            .reset_index(drop=True)
        )
        got = (
            kg_entity_lift(SF)
            .to_pandas()
            .sort_values(["entity_a", "entity_b"])
            .reset_index(drop=True)
        )
        assert got["entity_a"].tolist() == exp["entity_a"].tolist()
        assert got["n_ab"].astype(np.int64).tolist() == exp["n_ab"].astype(
            np.int64
        ).tolist()
        # single int/int IEEE division -> exact equality, not approx
        assert (got["lift"].to_numpy() == exp["lift"].to_numpy()).all()

    def test_known_arithmetic(self, ray_session, tmp_path):
        """4 docs; 'spark' in 2, 'hash' in 2, together in 1 →
        lift = 1·4 / (2·2) = 1.0 (independent). 'spark'+'stream'
        always together in 2 of 4 docs → lift = 2·4/(2·2) = 2.0."""
        from entity_extractor_linker_ray.pipelines.simple_kg import kg_entity_lift

        rows = [
            (0, "spark zzz stream zzz hash", "en", "s0"),
            (1, "spark zzz stream", "en", "s0"),
            (2, "hash zzz table", "en", "s0"),
            (3, "filler words only", "en", "s0"),
        ]
        sf = _write_docs(tmp_path, rows)
        out = (
            kg_entity_lift(sf)
            .to_pandas()
            .set_index(["entity_a", "entity_b"])["lift"]
        )
        assert out[("Hash", "Spark")] == pytest.approx(1.0)
        assert out[("Spark", "Stream")] == pytest.approx(2.0)
        assert out[("Hash", "Table")] == pytest.approx(2.0)
