"""Command-line interface (S1) — the reference's ``main.py:19-158``
argparse surface re-expressed for the Ray engine.

Two input modes:

* ``--text`` / ``--file`` — single-document mode, mirroring the
  reference CLI: the text becomes a one-conversation transcript, runs
  through the full pipeline, and the packaged
  ``{"entities": [...], "relationships": [...]}`` JSON goes to
  ``--output`` or stdout.
* ``--transcripts`` — corpus mode (the scale path the reference lacks):
  a Parquet file/dir of (conv_id, turn_idx, role, text, tool, ts) rows;
  triples/entities/nodes/edges land as partitioned Parquet under
  ``--output-dir``.

The CLI owns the Ray session (guarded init; the library never calls
``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="entity-extractor-linker-ray",
        description="Extract and link entities from text or transcript Parquet.",
    )
    src = parser.add_argument_group("input")
    src.add_argument("--text", "-t", help="Text to extract entities from")
    src.add_argument("--file", "-f", help="File containing text to process")
    src.add_argument(
        "--transcripts",
        help="File/dir of conversation transcripts (Parquet, JSONL or CSV)",
    )
    src.add_argument(
        "--input-format", choices=["auto", "parquet", "jsonl", "csv"],
        default="auto", help="Transcripts format (default: by extension)",
    )
    out = parser.add_argument_group("output")
    out.add_argument("--output", "-o", help="Output file for results (JSON)")
    out.add_argument(
        "--output-dir", help="Directory for corpus-mode outputs"
    )
    out.add_argument(
        "--output-format", choices=["parquet", "jsonl"], default="parquet",
        help="Corpus output format (partitioned parquet or JSONL)",
    )
    parser.add_argument("--language", "-l", choices=["de", "en"], default="en")
    parser.add_argument("--model", "-m", default="stub", help="LLM model to use")
    parser.add_argument("--max-entities", type=int, default=15)
    parser.add_argument("--max-relations", type=int, default=15)
    parser.add_argument("--mode", choices=["extract", "generate"], default="extract")
    parser.add_argument("--use-wikidata", action="store_true")
    parser.add_argument("--use-dbpedia", action="store_true")
    parser.add_argument("--dbpedia-use-de", action="store_true")
    parser.add_argument("--additional-details", action="store_true")
    parser.add_argument("--enable-entity-inference", action="store_true")
    parser.add_argument("--relation-extraction", action="store_true")
    parser.add_argument("--enable-relations-inference", action="store_true")
    parser.add_argument("--enable-kgc", action="store_true")
    parser.add_argument("--kgc-rounds", type=int, default=3)
    parser.add_argument("--enable-compendium", action="store_true")
    parser.add_argument("--compendium-length", type=int, default=8000)
    parser.add_argument("--collect-training-data", action="store_true")
    parser.add_argument("--text-chunking", action="store_true")
    parser.add_argument("--chunk-size", type=int, default=1000)
    parser.add_argument("--chunk-overlap", type=int, default=50)
    parser.add_argument("--allowed-entity-types", default="auto")
    parser.add_argument("--quiet", "-q", action="store_true")
    parser.add_argument(
        "--num-cpus", type=int, default=None,
        help="CPUs for the local Ray session (default: Ray's choice)",
    )
    parser.add_argument(
        "--concurrency", type=int, default=8,
        help="KG actor-pool size cap",
    )
    return parser


def config_from_args(args: argparse.Namespace) -> dict:
    return {
        "LANGUAGE": args.language,
        "MODEL": args.model,
        "MAX_ENTITIES": args.max_entities,
        "MAX_RELATIONS": args.max_relations,
        "MODE": args.mode,
        "USE_WIKIPEDIA": True,
        "USE_WIKIDATA": args.use_wikidata,
        "USE_DBPEDIA": args.use_dbpedia,
        "DBPEDIA_USE_DE": args.dbpedia_use_de,
        "ADDITIONAL_DETAILS": args.additional_details,
        "ENABLE_ENTITY_INFERENCE": args.enable_entity_inference,
        "RELATION_EXTRACTION": args.relation_extraction,
        "ENABLE_RELATIONS_INFERENCE": args.enable_relations_inference,
        "ENABLE_KGC": args.enable_kgc,
        "KGC_ROUNDS": args.kgc_rounds,
        "ENABLE_COMPENDIUM": args.enable_compendium,
        "COMPENDIUM_LENGTH": args.compendium_length,
        "COLLECT_TRAINING_DATA": args.collect_training_data,
        "TEXT_CHUNKING": args.text_chunking,
        "TEXT_CHUNK_SIZE": args.chunk_size,
        "TEXT_CHUNK_OVERLAP": args.chunk_overlap,
        "ALLOWED_ENTITY_TYPES": args.allowed_entity_types,
        "SHOW_STATUS": not args.quiet,
        "RAY_KG_CONCURRENCY": args.concurrency,
    }


def _init_ray(num_cpus: int | None) -> None:
    import logging

    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _single_text_result(text: str, cfg: dict) -> dict:
    """Reference-CLI-shaped result for one document: run the pipeline
    over a single synthetic conversation, return entities/relationships
    as row dicts."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets
    from entity_extractor_linker_ray.schemas import TRANSCRIPTS_SCHEMA

    lines = [ln for ln in text.split("\n") if ln.strip()] or [""]
    table = pa.Table.from_pydict(
        {
            "conv_id": ["cli-0"] * len(lines),
            "turn_idx": list(range(len(lines))),
            "role": ["user"] * len(lines),
            "text": lines,
            "tool": [""] * len(lines),
            "ts": [0] * len(lines),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    out = build_kg_datasets(
        rd.from_arrow(table), {**cfg, "RAY_DOC_BLOCKS": 1}
    )

    def records(df) -> list[dict]:
        import math

        import numpy as np

        rows = df.to_dict("records")
        for row in rows:
            for key, value in row.items():
                if isinstance(value, np.ndarray):
                    row[key] = value.tolist()
                elif isinstance(value, float) and math.isnan(value):
                    row[key] = None  # null floats must stay valid JSON
        return rows

    result = {
        "entities": records(out["entities"].to_pandas()),
        "relationships": records(out["triples"].to_pandas()),
    }
    if "compendium" in out:
        comp = out["compendium"].to_pandas()
        if len(comp):
            result["compendium"] = comp.iloc[0]["compendium"]
            result["references"] = list(comp.iloc[0]["references"])
    return result


def _corpus_run(transcripts_path: str, output_dir: str, cfg: dict,
                input_format: str = "auto", output_format: str = "parquet") -> dict:
    import os
    import shutil

    import ray.data as rd

    from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets
    from entity_extractor_linker_ray.sources import read_transcripts, write_output
    from entity_extractor_linker_ray.stages.graph import build_edges, build_nodes

    fmt = None if input_format == "auto" else input_format
    ds = read_transcripts(transcripts_path, fmt)
    out = build_kg_datasets(ds, cfg)
    counts = {}
    suffix = ".parquet" if output_format == "parquet" else ".json"
    for name, sub_ds in (
        ("entities", out["entities"]),
        ("triples", out["triples"]),
        ("nodes", build_nodes(out["entities"])),
        ("edges", build_edges(out["triples"])),
    ):
        target = f"{output_dir.rstrip('/')}/{name}"
        # a rerun must not mix this run's part files with a previous
        # run's (the writers only ever add files)
        shutil.rmtree(target, ignore_errors=True)
        write_output(sub_ds, target, output_format)
        # an empty dataset (e.g. triples with relation extraction off)
        # writes no files and may not even create the directory
        wrote = os.path.isdir(target) and any(
            f.endswith(suffix) for f in os.listdir(target)
        )
        if not wrote:
            counts[name] = 0
        elif output_format == "parquet":
            counts[name] = rd.read_parquet(target).count()
        else:
            counts[name] = rd.read_json(target).count()
    return counts


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not (args.text or args.file or args.transcripts):
        print("No input provided. Use --text, --file or --transcripts.")
        return 1
    cfg = config_from_args(args)

    text = args.text
    if args.file and not text:
        try:
            with open(args.file, encoding="utf-8") as f:
                text = f.read()
        except OSError as exc:
            print(f"Error reading file: {exc}")
            return 1

    _init_ray(args.num_cpus)
    try:
        if args.transcripts:
            if not args.output_dir:
                print("Corpus mode needs --output-dir.")
                return 1
            counts = _corpus_run(args.transcripts, args.output_dir, cfg,
                                 args.input_format, args.output_format)
            summary = json.dumps(
                {"output_dir": args.output_dir, "rows": counts}, indent=2
            )
            print(summary)
            return 0
        result = _single_text_result(text or "", cfg)
        payload = json.dumps(result, ensure_ascii=False, indent=2, default=str)
        if args.output:
            try:
                with open(args.output, "w", encoding="utf-8") as f:
                    f.write(payload)
                if not args.quiet:
                    print(f"Results written to {args.output}")
            except OSError as exc:
                print(f"Error writing output file: {exc}")
                return 1
        else:
            print(payload)
        return 0
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
