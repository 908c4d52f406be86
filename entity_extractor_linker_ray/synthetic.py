"""Deterministic synthetic inputs.

Two sources, both seeded and reproducible:

* :func:`generate_transcripts` — a multi-turn conversation/agent
  transcript table exactly per ``BASELINE.json`` ``input_hint``
  (``conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string, ts:timestamp[us]``), with Zipf-ish conversation lengths,
  intentionally shuffled row order (the engine must restore stable turn
  ordering), a hot entity appearing in a large fraction of
  conversations (skew realism), and sentence templates over the closed
  KB vocabulary (FIXTURES.md §1).

* :func:`transcripts_dataset_from_documents` — derives the same
  transcript shape from the driver-generated ``documents`` parquet
  tables (TESTDATA.md) by deterministically splitting each document
  into turns, so benchmarks at sf0.1 run the full KG pipeline over
  driver data without inventing new corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from entity_extractor_linker_ray.state.kb import build_kb

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_TEMPLATES = [
    "{a} uses {b} to process the data.",
    "The team connected {a} with {b} yesterday.",
    "{a} and {b} were deployed together.",
    "Nothing interesting happened in this turn.",
    "{a} reported a problem while scanning {b}.",
    "We compared {a} against {b} and {c}.",
    "Status update without any entity mention.",
    "{a} now powers the {b} rollout near {c}.",
]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "", "search", "", "calculator", ""]


def generate_transcripts(
    n_convs: int = 50, seed: int = 7, hot_fraction: float = 0.10
) -> pa.Table:
    """Build the transcripts table (schema per ``input_hint``).

    Deterministic in (n_convs, seed). Turn rows are emitted in a
    shuffled order so downstream code must sort by ``turn_idx`` within
    ``conv_id`` (the per-turn text-equality invariant).
    """
    rng = np.random.default_rng(seed)
    kb_labels = [r["label"] for r in build_kb()]
    hot = kb_labels[0]  # "Spark" — the planted hot key
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci in range(n_convs):
        conv_id = f"conv-{ci:08d}"
        n_turns = 1 + min(int(rng.zipf(1.6)), 24)
        labels = list(rng.choice(kb_labels, size=min(6, len(kb_labels)), replace=False))
        if rng.random() < hot_fraction and hot not in labels:
            labels[0] = hot
        for ti in range(n_turns):
            tmpl = _TEMPLATES[int(rng.integers(len(_TEMPLATES)))]
            picks = {
                "a": labels[ti % len(labels)],
                "b": labels[(ti + 1) % len(labels)],
                "c": labels[(ti + 2) % len(labels)],
            }
            text = tmpl.format(**picks)
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(_ROLES[ti % len(_ROLES)])
            texts.append(text)
            tools.append(_TOOLS[ti % len(_TOOLS)])
            tss.append(EPOCH_US + ci * 3_600_000_000 + ti * 1_000_000)
    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    # shuffle row order deterministically — the engine must restore it
    perm = rng.permutation(table.num_rows)
    return table.take(pa.array(perm))


def turns_from_document(
    doc_id: int, text: str, words_per_turn: int = 12, rep: int = 0
) -> list[dict]:
    """Deterministically split one document into transcript turns."""
    words = text.split()
    rows = []
    conv_id = f"doc-{doc_id:010d}" if rep == 0 else f"doc-r{rep:02d}-{doc_id:010d}"
    n_turns = max(1, (len(words) + words_per_turn - 1) // words_per_turn)
    for ti in range(n_turns):
        chunk = " ".join(words[ti * words_per_turn : (ti + 1) * words_per_turn])
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": np.int32(ti),
                "role": _ROLES[ti % len(_ROLES)],
                "text": chunk,
                "tool": _TOOLS[ti % len(_TOOLS)],
                "ts": EPOCH_US + int(doc_id) * 3_600_000_000 + ti * 1_000_000,
            }
        )
    return rows


def documents_to_transcripts_batch(batch: pa.Table, rep: int = 0) -> pa.Table:
    """``map_batches`` kernel: documents rows → transcript rows.

    Vectorized enough for the synthesis step (string split per doc,
    not per token); used by bench/entry to derive transcripts from
    ``/root/testdata/*/documents.parquet`` without materializing
    anything driver-side.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out: dict[str, list] = {
        "conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": []
    }
    for doc_id, text in zip(doc_ids, texts):
        for row in turns_from_document(doc_id, text or "", rep=rep):
            for key in out:
                out[key].append(row[key])
    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "role": pa.array(out["role"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "tool": pa.array(out["tool"], pa.string()),
            "ts": pa.array(out["ts"], pa.timestamp("us")),
        }
    )


def transcripts_dataset_from_documents(
    sf_dir: str, repeat: int = 1, num_blocks: int | None = None
):
    """documents.parquet → transcripts Dataset (streaming, column-pruned
    read; no driver-side materialization).

    ``repeat > 1`` emits ``repeat`` deterministic copies of each
    document with distinct ``conv_id`` prefixes — used by the scaling
    benchmark to make the job compute-bound (same logical input at both
    parallelism levels). Replication happens inside the map kernel so
    the block count stays that of ONE read — a union of ``repeat``
    datasets would multiply shuffle-block count (and with it the
    sort's O(blocks × partitions) object explosion)."""
    import ray.data as rd
    import pyarrow.compute as pc

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=num_blocks,
    )

    def kernel(batch: pa.Table) -> pa.Table:
        base = documents_to_transcripts_batch(batch)
        if repeat == 1:
            return base
        # turn derivation runs ONCE; replicas only re-stamp conv_id
        # (vectorized string concat), so kernel cost is O(turns), not
        # O(turns × repeat)
        parts = [base]
        for rep in range(1, repeat):
            conv = pc.binary_join_element_wise(
                pa.scalar(f"rep{rep:03d}-"), base.column("conv_id"), ""
            )
            parts.append(base.set_column(0, "conv_id", conv))
        return pa.concat_tables(parts)

    return docs.map_batches(kernel, batch_format="pyarrow")
