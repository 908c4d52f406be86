"""Format-dispatching transcript sources (S1) and corpus sinks (S3):
the same synthetic corpus written as Parquet, JSONL, and CSV must read
back value-identical through ``read_transcripts``, and the CLI corpus
mode must run end-to-end on non-Parquet inputs/outputs."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq


def _write_all_formats(tmp_path):
    import ray.data as rd

    from entity_extractor_linker_ray.synthetic import generate_transcripts

    t = generate_transcripts(8, seed=11)
    pq.write_table(t, tmp_path / "tr.parquet")
    rd.from_arrow(t).write_json(str(tmp_path / "tr_jsonl"))
    t.to_pandas().to_csv(tmp_path / "tr.csv", index=False)
    return t


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


class TestReadTranscripts:
    def test_formats_round_trip(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.schemas import TRANSCRIPTS_SCHEMA
        from entity_extractor_linker_ray.sources import read_transcripts

        base_table = _write_all_formats(tmp_path)
        base = _canon(base_table.to_pandas())
        for path in ("tr.parquet", "tr_jsonl", "tr.csv"):
            ds = read_transcripts(str(tmp_path / path))
            assert ds.schema().names == [f.name for f in TRANSCRIPTS_SCHEMA]
            got = _canon(ds.to_pandas())
            # the JSON writer truncates timestamps to whole seconds;
            # the synthetic corpus is second-granular so equality holds
            pd.testing.assert_frame_equal(got, base, check_dtype=False)

    def test_detect_format(self, tmp_path):
        from entity_extractor_linker_ray.sources import detect_format

        assert detect_format("x/y.parquet") == "parquet"
        assert detect_format("x/y.jsonl") == "jsonl"
        assert detect_format("x/y.csv") == "csv"
        os.mkdir(tmp_path / "d")
        open(tmp_path / "d" / "part_0.jsonl", "w").close()
        assert detect_format(str(tmp_path / "d")) == "jsonl"

    def test_missing_tool_column_filled(self, ray_session, tmp_path):
        from entity_extractor_linker_ray.sources import read_transcripts

        pd.DataFrame(
            {
                "conv_id": ["c1"],
                "turn_idx": [0],
                "role": ["user"],
                "text": ["hello spark"],
                "ts": pd.to_datetime(["2024-01-01"]),
            }
        ).to_csv(tmp_path / "t.csv", index=False)
        df = read_transcripts(str(tmp_path / "t.csv")).to_pandas()
        assert df["tool"].tolist() == [""]

    def test_epoch_seconds_and_micros_agree(self, ray_session, tmp_path):
        """An integer ts column means epoch SECONDS at JSON magnitude
        and epoch MICROSECONDS at Arrow magnitude — both must land on
        the same wall-clock instant."""
        from entity_extractor_linker_ray.sources import read_transcripts

        base = {
            "conv_id": ["c1"], "turn_idx": [0], "role": ["user"],
            "text": ["x"], "tool": [""],
        }
        secs = 1_704_099_608
        pd.DataFrame({**base, "ts": [secs]}).to_json(
            tmp_path / "s.jsonl", orient="records", lines=True
        )
        pd.DataFrame({**base, "ts": [secs * 1_000_000]}).to_json(
            tmp_path / "u.jsonl", orient="records", lines=True
        )
        a = read_transcripts(str(tmp_path / "s.jsonl")).to_pandas()["ts"][0]
        b = read_transcripts(str(tmp_path / "u.jsonl")).to_pandas()["ts"][0]
        assert a == b
        assert a.year == 2024


class TestCliFormats:
    def test_corpus_jsonl_in_jsonl_out(self, ray_session, tmp_path):
        """CLI corpus mode over a JSONL transcripts dir writing JSONL
        outputs; the triples count must match the parquet-path run."""
        from entity_extractor_linker_ray.cli import _corpus_run

        _write_all_formats(tmp_path)
        cfg = {"RELATION_EXTRACTION": True, "SHOW_STATUS": False,
               "RAY_KG_CONCURRENCY": 2, "RAY_DOC_BLOCKS": 2}
        got_j = _corpus_run(
            str(tmp_path / "tr_jsonl"), str(tmp_path / "out_j"), dict(cfg),
            input_format="jsonl", output_format="jsonl",
        )
        got_p = _corpus_run(
            str(tmp_path / "tr.parquet"), str(tmp_path / "out_p"), dict(cfg),
        )
        assert got_j == got_p
        assert got_j["triples"] > 0
        files = os.listdir(tmp_path / "out_j" / "triples")
        assert files and all(f.endswith(".json") for f in files)


class TestPartitionedSink:
    def test_hive_layout_and_pruned_read(self, ray_session, tmp_path):
        """Documents written partitioned by lang land in one directory
        per language, and a pruned read of a single partition returns
        exactly the filtered full-read rows without touching the other
        directories."""
        import ray.data as rd

        from entity_extractor_linker_ray.sources import (
            read_partition,
            write_partitioned,
        )

        src = "/root/testdata/sf0.001/documents.parquet"
        ds = rd.read_parquet(src)
        out = str(tmp_path / "by_lang")
        write_partitioned(ds, out, ["lang"])

        langs = sorted(
            d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("lang=")
        )
        full = rd.read_parquet(src).to_pandas()
        assert langs == sorted(full["lang"].unique())

        one = read_partition(out, lang=langs[0]).to_pandas()
        exp = full[full["lang"] == langs[0]]
        assert len(one) == len(exp)
        assert sorted(one["doc_id"]) == sorted(exp["doc_id"])
        # the partition column survives the round trip (hive-encoded)
        assert set(one["lang"].astype(str)) == {langs[0]}
