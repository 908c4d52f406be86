"""Batch-10 additions: bipartite type-affinity projection, exact Gini
with ties, and hourly burstiness (Fano factor) — each value-exact
against its DuckDB oracle plus the semantics SQL can't isolate
(distinct-user counting, tie-correct inequality, zero-hour spans)."""

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


def _events(ids, users, ts, types, values=None):
    n = len(ids)
    return pd.DataFrame(
        {
            "event_id": np.asarray(ids, dtype=np.int64),
            "user_id": np.asarray(users, dtype=np.int64),
            "ts": pd.to_datetime(ts),
            "event_type": types,
            "value": np.zeros(n) if values is None else np.asarray(values),
            "props": ["{}"] * n,
        }
    )


class TestTypeAffinity:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            TYPE_AFFINITY_ORACLE,
            type_affinity,
        )

        got = _canon(type_affinity(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             TYPE_AFFINITY_ORACLE))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp)

    def test_distinct_user_counting(self, ray_session, tmp_path):
        """A user doing (click, view) ten times counts ONCE for the
        pair; single-type users contribute nothing; the pair key is
        unordered (always alphabetical)."""
        from entity_extractor_linker_ray.pipelines.relational import type_affinity

        rows = _events(
            list(range(1, 12)),
            [1] * 10 + [2],
            ["2024-01-01 00:00"] * 11,
            (["click", "view"] * 5) + ["click"],
        )
        rows.to_parquet(tmp_path / "events.parquet")

        got = type_affinity(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["type_a"], r["type_b"], r["n_users"]) == ("click", "view", 1)


class TestQuantityGini:
    def test_matches_duckdb_bitexact(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            LINEITEM_QUANTITY_GINI_ORACLE,
            lineitem_quantity_gini,
        )

        got = (
            lineitem_quantity_gini(SF).to_pandas()
            .sort_values("l_returnflag").reset_index(drop=True)
        )
        exp = (
            _oracle({"lineitem": f"{SF}/lineitem.parquet"},
                    LINEITEM_QUANTITY_GINI_ORACLE)
            .sort_values("l_returnflag").reset_index(drop=True)
        )
        assert len(got) > 0
        assert (got["gini"].to_numpy() == exp["gini"].to_numpy()).all()

    def test_extremes_and_ties(self, ray_session, tmp_path):
        """All-equal values → Gini 0 (the tie case the rank formula
        botches); a maximally concentrated [0,0,0,X] → 0.75 (the exact
        (n−1)/n bound); hand-checked mixed case."""
        from entity_extractor_linker_ray.pipelines.relational import (
            lineitem_quantity_gini,
        )

        rows = pd.DataFrame(
            {
                "l_orderkey": np.arange(1, 11, dtype=np.int64),
                "l_returnflag": ["E"] * 3 + ["C"] * 4 + ["M"] * 3,
                "l_quantity": [7.0, 7.0, 7.0,          # equal -> 0
                               0.0, 0.0, 0.0, 8.0,     # concentrated -> 0.75
                               1.0, 2.0, 3.0],         # mixed
            }
        )
        rows.to_parquet(tmp_path / "lineitem.parquet")

        got = (
            lineitem_quantity_gini(str(tmp_path))
            .to_pandas().set_index("l_returnflag")["gini"]
        )
        assert got["E"] == 0.0
        assert got["C"] == 0.75
        # mixed: mean abs diff = (1+2+1)*2/9 ... Δ/(2 n S) with
        # v=[100,200,300]: Δ = 2*(100+200+100)... hand value: 2/9
        assert abs(got["M"] - 2 / 9) < 1e-12


class TestBurstiness:
    def test_matches_duckdb_bitexact(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_BURSTINESS_ORACLE,
            events_burstiness,
        )

        got = (
            events_burstiness(SF).to_pandas()
            .sort_values("event_type").reset_index(drop=True)
        )
        exp = (
            _oracle({"events": f"{SF}/events.parquet"},
                    EVENTS_BURSTINESS_ORACLE)
            .sort_values("event_type").reset_index(drop=True)
        )
        assert len(got) > 0
        assert (got["fano"].to_numpy() == exp["fano"].to_numpy()).all()

    def test_zero_hours_raise_dispersion(self, ray_session, tmp_path):
        """Four events in one hour of a 4-hour span: counts [4,0,0,0]
        → mean 1, variance 3 → Fano exactly 3; the same four events in
        four consecutive hours → Fano 0. Zero hours matter."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_burstiness,
        )

        rows = _events(
            list(range(1, 9)),
            [1] * 8,
            ["2024-01-01 00:01", "2024-01-01 00:02",
             "2024-01-01 00:03", "2024-01-01 00:04",   # bursty: all hour 0
             "2024-01-02 00:30", "2024-01-02 01:30",
             "2024-01-02 02:30", "2024-01-02 03:30"],  # smooth: 1/hour
            ["bursty"] * 4 + ["smooth"] * 4,
        )
        # give 'bursty' a 4-hour span via one extra event at hour 3
        extra = _events([9], [1], ["2024-01-01 03:59"], ["bursty"])
        pd.concat([rows, extra], ignore_index=True).to_parquet(
            tmp_path / "events.parquet"
        )

        got = (
            events_burstiness(str(tmp_path))
            .to_pandas().set_index("event_type")
        )
        # bursty: counts [4,0,0,1] over 4 hours: n=4, sc=5, sc2=17
        # fano = (4*17 - 25) / (4*5) = 43/20
        assert got.loc["bursty", "fano"] == 43 / 20
        assert got.loc["smooth", "fano"] == 0.0


class TestReciprocityPeakZorder:
    def test_reciprocity_matches(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_reciprocity,
            kg_reciprocity_oracle,
        )

        got = kg_reciprocity(SF).to_pandas().iloc[0]
        exp = _oracle({"documents": f"{SF}/documents.parquet"},
                      kg_reciprocity_oracle()).iloc[0]
        assert int(got["n_edges"]) == int(exp["n_edges"])
        assert int(got["n_reciprocal"]) == int(exp["n_reciprocal"])
        assert float(got["reciprocity"]) == float(exp["reciprocity"])

    def test_reciprocity_planted(self, ray_session, tmp_path):
        """spark→hash and hash→spark (from two mirrored docs) are
        reciprocal; hash→vector one-way: 3 directed edges, 2
        reciprocal → ratio 2/3. The 'zzz' spacer is not a corpus
        token, so no bigram/trigram KB surface can match between the
        planted singles (the round-4 grown vocabulary would otherwise
        add 'Spark Hash'-style entities to adjacent pairs)."""
        from entity_extractor_linker_ray.ops.graph_algos import (
            _KG_EDGES_CACHE,
            kg_reciprocity,
        )

        docs = pd.DataFrame(
            {"doc_id": np.array([1, 2, 3], dtype=np.int64),
             "text": ["spark zzz hash", "hash zzz spark", "hash zzz vector"],
             "lang": ["en"] * 3, "source": ["s"] * 3,
             "n_chars": np.zeros(3, dtype=np.int64)}
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        _KG_EDGES_CACHE.pop(str(tmp_path), None)

        got = kg_reciprocity(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_edges"] == 3
        assert got["n_reciprocal"] == 2
        assert got["reciprocity"] == 2 / 3

    def test_peak_hour_matches_and_ties(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.pipelines.relational import (
            TYPE_PEAK_HOUR_ORACLE,
            type_peak_hour,
        )

        got = _canon(type_peak_hour(SF).to_pandas())
        exp = _canon(_oracle({"events": f"{SF}/events.parquet"},
                             TYPE_PEAK_HOUR_ORACLE))
        pd.testing.assert_frame_equal(got, exp)

        # tie: hours 2 and 5 both have 2 events -> earliest (2) wins
        rows = pd.DataFrame(
            {"event_id": np.arange(1, 6, dtype=np.int64),
             "user_id": np.ones(5, dtype=np.int64),
             "ts": pd.to_datetime(
                 ["2024-01-01 02:00", "2024-01-01 02:30",
                  "2024-01-01 05:00", "2024-01-01 05:30",
                  "2024-01-01 07:00"]),
             "event_type": ["x"] * 5,
             "value": np.zeros(5), "props": ["{}"] * 5}
        )
        rows.to_parquet(tmp_path / "events.parquet")
        t = type_peak_hour(str(tmp_path)).to_pandas().iloc[0]
        assert t["peak_hour"] == 2 and t["n_events"] == 2

    def test_zorder_interleave(self, ray_session, tmp_path):
        """Hand-checked Morton values: (5, 3) interleaves to 27; a
        key above 16 bits is masked; z-locality holds (nearby pairs
        get nearby keys relative to far pairs)."""
        from entity_extractor_linker_ray.pipelines.relational import (
            lineitem_zorder_keys,
        )

        rows = pd.DataFrame(
            {"l_orderkey": np.array([1, 2, 3], dtype=np.int64),
             "l_linenumber": np.array([1, 1, 1], dtype=np.int32),
             "l_partkey": np.array([5, 5 + (1 << 16), 1000], dtype=np.int64),
             "l_suppkey": np.array([3, 3, 1000], dtype=np.int64),
             "l_quantity": np.ones(3), "l_extendedprice": np.ones(3),
             "l_discount": np.zeros(3), "l_tax": np.zeros(3),
             "l_returnflag": ["N"] * 3, "l_linestatus": ["O"] * 3,
             "l_shipdate": pd.to_datetime(["2024-01-01"] * 3)}
        )
        rows.to_parquet(tmp_path / "lineitem.parquet")

        got = (
            lineitem_zorder_keys(str(tmp_path))
            .to_pandas().set_index("l_orderkey")["morton_key"]
        )
        assert got.loc[1] == 27
        assert got.loc[2] == 27  # masked to 16 bits
        assert got.loc[3] != 27


class TestHourlyAutocorr:
    def test_matches_duckdb_bitexact(self, ray_session):
        from entity_extractor_linker_ray.pipelines.relational import (
            EVENTS_HOURLY_AUTOCORR_ORACLE,
            events_hourly_autocorr,
        )

        got = (
            events_hourly_autocorr(SF).to_pandas()
            .sort_values("event_type").reset_index(drop=True)
        )
        exp = (
            _oracle({"events": f"{SF}/events.parquet"},
                    EVENTS_HOURLY_AUTOCORR_ORACLE)
            .sort_values("event_type").reset_index(drop=True)
        )
        assert len(got) > 0
        assert (got["n_pairs"].to_numpy(dtype=np.int64)
                == exp["n_pairs"].to_numpy(dtype=np.int64)).all()
        assert (got["autocorr_lag1"].to_numpy()
                == exp["autocorr_lag1"].to_numpy()).all()

    def test_alternating_vs_persistent(self, ray_session, tmp_path):
        """A strictly alternating hourly series (2,0,2,0,2) has lag-1
        autocorrelation exactly −1 — including the IMPLICIT zero hours
        the dense-series semantics must count; a constant series has
        zero variance → the 0.0 guard; a single-hour type has no pairs
        → 0.0."""
        from entity_extractor_linker_ray.pipelines.relational import (
            events_hourly_autocorr,
        )

        alternating = _events(
            list(range(1, 7)),
            [1] * 6,
            ["2024-01-01 00:01", "2024-01-01 00:02",   # hour 0: 2
             "2024-01-01 02:01", "2024-01-01 02:02",   # hour 2: 2 (1 is 0)
             "2024-01-01 04:01", "2024-01-01 04:02"],  # hour 4: 2 (3 is 0)
            ["alt"] * 6,
        )
        single = _events([7], [1], ["2024-01-01 09:30"], ["solo"])
        const = _events(
            [8, 9, 10], [1] * 3,
            ["2024-01-02 00:30", "2024-01-02 01:30", "2024-01-02 02:30"],
            ["flat"] * 3,
        )
        pd.concat([alternating, single, const], ignore_index=True).to_parquet(
            tmp_path / "events.parquet"
        )

        got = (
            events_hourly_autocorr(str(tmp_path))
            .to_pandas().set_index("event_type")
        )
        assert got.loc["alt", "autocorr_lag1"] == -1.0
        assert got.loc["solo", "n_pairs"] == 0
        assert got.loc["solo", "autocorr_lag1"] == 0.0
        assert got.loc["flat", "autocorr_lag1"] == 0.0  # zero variance


class TestAssortativity:
    def test_matches_duckdb(self, ray_session):
        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_assortativity,
            kg_assortativity_oracle,
        )

        got = kg_assortativity(SF).to_pandas().iloc[0]
        exp = _oracle({"documents": f"{SF}/documents.parquet"},
                      kg_assortativity_oracle()).iloc[0]
        assert int(got["n_stubs"]) == int(exp["n_stubs"])
        assert float(got["assortativity"]) == float(exp["assortativity"])

    def test_star_is_disassortative(self, ray_session, tmp_path):
        """A star (hub co-occurring with three leaves) is maximally
        DISASSORTATIVE: every edge pairs degree 3 with degree 1 →
        r = −1; and the stub count is 2E = 6."""
        from entity_extractor_linker_ray.ops.graph_algos import (
            _KG_EDGES_CACHE,
            kg_assortativity,
        )

        docs = pd.DataFrame(
            {"doc_id": np.array([1, 2, 3], dtype=np.int64),
             "text": ["hash zzz spark", "hash zzz vector", "hash zzz window"],
             "lang": ["en"] * 3, "source": ["s"] * 3,
             "n_chars": np.zeros(3, dtype=np.int64)}
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        _KG_EDGES_CACHE.pop(str(tmp_path), None)

        got = kg_assortativity(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_stubs"] == 6
        assert got["assortativity"] == -1.0
