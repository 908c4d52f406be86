"""CLI smoke tests (S1 — reference ``main.py:19-158`` surface) via
subprocess, exactly as a user would invoke it."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


def _run_cli(args: list[str], timeout: int = 240) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "entity_extractor_linker_ray.cli", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )


@pytest.mark.slow
class TestCli:
    def test_text_mode_json_output(self, tmp_path):
        out_file = tmp_path / "result.json"
        proc = _run_cli(
            [
                "--text", "Spark streams data into the Table.",
                "--use-wikidata", "--relation-extraction",
                "--output", str(out_file), "--quiet", "--num-cpus", "2",
            ]
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        result = json.loads(out_file.read_text())
        names = {e["entity"] for e in result["entities"]}
        assert {"Spark", "Table"} <= names
        assert all("subject" in r for r in result["relationships"])

    def test_corpus_mode_writes_parquet(self, tmp_path):
        from entity_extractor_linker_ray.synthetic import generate_transcripts

        src = tmp_path / "transcripts.parquet"
        pq.write_table(generate_transcripts(6, seed=3), src)
        out_dir = tmp_path / "kg"
        proc = _run_cli(
            [
                "--transcripts", str(src), "--output-dir", str(out_dir),
                "--use-wikidata", "--relation-extraction",
                "--num-cpus", "2", "--concurrency", "2",
            ]
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout[proc.stdout.index("{"):])
        assert summary["rows"]["entities"] > 0
        assert summary["rows"]["triples"] > 0
        assert (out_dir / "nodes").exists() and (out_dir / "edges").exists()

    def test_corpus_mode_without_relations_writes_empty_triples(self, tmp_path):
        """With relation extraction off, the triples dataset is empty —
        the corpus run must report 0 (not crash reading a directory
        write_parquet never created)."""
        from entity_extractor_linker_ray.synthetic import generate_transcripts

        src = tmp_path / "transcripts.parquet"
        pq.write_table(generate_transcripts(6, seed=3), src)
        out_dir = tmp_path / "kg"
        proc = _run_cli(
            [
                "--transcripts", str(src), "--output-dir", str(out_dir),
                "--num-cpus", "2", "--concurrency", "2",
            ]
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout[proc.stdout.index("{"):])
        assert summary["rows"]["entities"] > 0
        assert summary["rows"]["triples"] == 0
        assert summary["rows"]["edges"] == 0

    def test_no_input_errors(self):
        proc = _run_cli(["--quiet"])
        assert proc.returncode == 1
        assert "No input" in proc.stdout
