"""Fourteenth-session batch, part 16: mergeable quantile states and
within-type min-max feature scaling."""

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


class TestDocQuantilesIncremental:
    def test_identical_to_from_scratch(self, ray_session):
        """The defining invariant: merged partial states give the SAME
        quantiles as the one-shot build, at any partition count."""
        from entity_extractor_linker_ray.ops.textstats import (
            doc_length_quantiles,
        )
        from entity_extractor_linker_ray.pipelines.incremental import (
            doc_quantiles_incremental,
        )

        scratch = (
            doc_length_quantiles(SF).to_pandas()
            .sort_values("lang").reset_index(drop=True)
        )
        for parts in (2, 5):
            inc = (
                doc_quantiles_incremental(SF, partitions=parts).to_pandas()
                .sort_values("lang").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                inc[sorted(inc.columns)], scratch[sorted(scratch.columns)],
                check_dtype=False,
            )

    def test_planted_state_merge(self, ray_session, tmp_path):
        """Slices {even ids} and {odd ids} each miss half the values;
        the merged state recovers the exact global median."""
        from entity_extractor_linker_ray.pipelines.incremental import (
            doc_quantiles_incremental,
        )

        pd.DataFrame(
            {"doc_id": np.arange(1, 10, dtype=np.int64),
             "lang": ["en"] * 9,
             "n_chars": np.arange(10, 100, 10, dtype=np.int64)}
        ).to_parquet(tmp_path / "documents.parquet")
        got = doc_quantiles_incremental(str(tmp_path)).to_pandas()
        r = got.iloc[0]
        assert r["n_docs"] == 9
        assert r["p50_n_chars"] == 50  # ceil(0.5*9)=5th smallest
        assert r["p99_n_chars"] == 90

    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.textstats import TEXT_ORACLES
        from entity_extractor_linker_ray.pipelines.incremental import (
            doc_quantiles_incremental,
        )

        got = (
            doc_quantiles_incremental(SF).to_pandas()
            .sort_values("lang").reset_index(drop=True)
        )
        exp = (
            _connect().execute(TEXT_ORACLES["doc_length_quantiles"]).df()
            .sort_values("lang").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )


class TestEventsValueScaled:
    def test_planted_scaling(self, ray_session, tmp_path):
        """type a values 1/2/3 scale to 0, .5, 1; the constant type
        scales to 0.0 (the 0/0 guard)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_value_scaled,
        )

        pd.DataFrame(
            {"event_id": np.arange(5, dtype=np.int64),
             "event_type": ["a", "a", "a", "flat", "flat"],
             "value": [1.0, 2.0, 3.0, 7.0, 7.0]}
        ).to_parquet(tmp_path / "events.parquet")
        got = (
            events_value_scaled(str(tmp_path)).to_pandas()
            .sort_values("event_id").reset_index(drop=True)
        )
        assert got["scaled"].tolist() == [0.0, 0.5, 1.0, 0.0, 0.0]

    def test_matches_duckdb_bit_exactly(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_VALUE_SCALED_ORACLE,
            events_value_scaled,
        )

        got = (
            events_value_scaled(SF).to_pandas()
            .sort_values("event_id").reset_index(drop=True)
        )
        exp = (
            _connect().execute(EVENTS_VALUE_SCALED_ORACLE).df()
            .sort_values("event_id").reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        assert (got["scaled"].to_numpy() == exp["scaled"].to_numpy()).all()
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )
