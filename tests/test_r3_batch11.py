"""Round-3 batch 11: schema induction over the constructed KG —
predicate cardinality profile, type-signature induction, and inverse-
predicate mining. Value parity against the reference-produced golden
triples via the same SQL the driver gates on, plus planted fixtures for
the join semantics SQL obscures (both-direction emission, distinct-
triple dedup, self-loop exclusion)."""

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
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(np.float64).round(9)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _driver_pair(name: str):
    import __ray_entry__ as entry

    got = entry.queries()[name](SF)
    sql = entry.oracle_sql()[name]
    exp = _oracle({"documents": f"{SF}/documents.parquet"}, sql)
    return _canon(got.to_pandas()), _canon(exp)


class TestPredicateProfile:
    def test_matches_golden(self, ray_session):
        got, exp = _driver_pair("kg_predicate_profile")
        assert len(got) > 3  # the stub pipeline emits many predicates
        pd.testing.assert_frame_equal(got, exp)
        # sanity: distinct counts can never exceed the triple count
        assert (got["n_subjects"] <= got["n_triples"]).all()
        assert (got["n_objects"] <= got["n_triples"]).all()


class TestSchemaSignatures:
    def test_matches_golden(self, ray_session):
        got, exp = _driver_pair("kg_schema_signatures")
        assert len(got) > 3
        pd.testing.assert_frame_equal(got, exp)
        assert (got["n_entity_pairs"] <= got["n_triples"]).all()


class TestInversePredicates:
    def test_matches_golden(self, ray_session):
        got, exp = _driver_pair("kg_inverse_predicates")
        pd.testing.assert_frame_equal(got, exp)
        # the co-occurrence stub emits reciprocal edges -> nonempty
        assert len(got) > 0

    def test_planted_semantics(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.stages.graph import (
            inverse_predicate_candidates,
        )

        # (A uses B) + (B feeds A): one inverse match -> both ordered
        #   visits (uses, feeds) and (feeds, uses).
        # (A uses B) duplicated across conversations: deduped, still 1.
        # (C likes C): self-loop, excluded entirely.
        # (A part_of B) also reversed by (B feeds A): cross-count means
        #   feeds pairs with BOTH uses and part_of.
        tri = pd.DataFrame(
            {
                "subject": ["A", "A", "B", "C", "A"],
                "predicate": ["uses", "uses", "feeds", "likes", "part_of"],
                "object": ["B", "B", "A", "C", "B"],
                "inferred": ["explicit"] * 5,
                "subject_type": ["T"] * 5,
                "object_type": ["T"] * 5,
            }
        )
        got = (
            inverse_predicate_candidates(rd.from_pandas(tri))
            .to_pandas()
            .set_index(["pred_a", "pred_b"])["n_pairs"]
            .to_dict()
        )
        assert got == {
            ("uses", "feeds"): 1,
            ("feeds", "uses"): 1,
            ("part_of", "feeds"): 1,
            ("feeds", "part_of"): 1,
        }


class TestNegativeSamples:
    def test_matches_golden(self, ray_session):
        got, exp = _driver_pair("kg_negative_samples")
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)
        # the filter must actually fire both ways on this corpus
        assert set(got["is_true_negative"].unique()) <= {0, 1}

    def test_deterministic_draw(self, ray_session):
        """The draw is a pure function of the corpus: two runs agree."""
        import __ray_entry__ as entry

        a = _canon(entry.queries()["kg_negative_samples"](SF).to_pandas())
        b = _canon(entry.queries()["kg_negative_samples"](SF).to_pandas())
        pd.testing.assert_frame_equal(a, b)

    def test_planted_filter_flag(self, ray_session):
        import ray.data as rd

        from entity_extractor_linker_ray.stages.graph import negative_samples

        # two entities, one predicate: every draw lands in {A, B}, and
        # any draw equal to a true object must be flagged 0
        tri = pd.DataFrame(
            {
                "subject": ["A", "B"],
                "predicate": ["p", "p"],
                "object": ["B", "A"],
                "inferred": ["explicit"] * 2,
                "subject_type": ["T"] * 2,
                "object_type": ["T"] * 2,
            }
        )
        got = negative_samples(rd.from_pandas(tri)).to_pandas()
        assert len(got) == 2
        assert set(got["neg_object"]) <= {"A", "B"}
        for _, row in got.iterrows():
            truth = {"B"} if row["subject"] == "A" else {"A"}
            expected_flag = 0 if row["neg_object"] in truth else 1
            assert row["is_true_negative"] == expected_flag
