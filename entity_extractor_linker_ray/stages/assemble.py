"""Document assembly: transcripts → per-conversation documents.

The reference consumes one ``input_text`` string per run
(``core/orchestrator.py:26``); for transcript tables one *conversation*
is one document. This stage is SHUFFLE 1 of the pipeline
(SURVEY.md §3.4): ``groupby(conv_id)`` co-locates a conversation's
turns, then each group is sorted by ``turn_idx`` (restoring the stable
turn ordering the input intentionally scrambles — per-turn text
equality invariant from ``BASELINE.json`` ``input_hint``) and the turn
texts are concatenated with ``"\\n"``.

Scale notes: the groupby hash-partitions on ``conv_id`` — the uniform
key (conversation lengths are bounded); doc assembly is where the
10^12-turn input collapses to ~10^10 documents, so every later stage
moves far fewer rows. Only ``conv_id/turn_idx/text`` are carried into
the shuffle (columns pruned at the read).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _assemble_bucket(part: pd.DataFrame) -> pd.DataFrame:
    g = part.sort_values(["conv_id", "turn_idx"], kind="stable")
    texts = g["text"].astype(str)
    agg = (
        texts.groupby(g["conv_id"].to_numpy(), sort=False)
        .agg(["\n".join, "size"])
        .reset_index()
    )
    agg.columns = ["conv_id", "doc_text", "n_turns"]
    return agg.astype({"n_turns": np.int32})


def assemble_documents(transcripts_ds, num_partitions: int = 64):
    """transcripts Dataset → documents Dataset
    (``conv_id, doc_text, n_turns``).

    Shuffles on ``hash(conv_id) % num_partitions`` (a small int key)
    rather than on raw ``conv_id`` — one conversation per group would
    mean per-group Python overhead at 10^10-conversation cardinality;
    one *bucket* per group keeps the in-group sort + concat fully
    vectorized (`ops/shuffle.py` rationale). ``num_partitions`` is also
    the output block count feeding the actor pool."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    pruned = transcripts_ds.select_columns(["conv_id", "turn_idx", "text"])
    return grouped_aggregate(
        pruned, ["conv_id"], _assemble_bucket, num_partitions=num_partitions
    )


def sort_transcripts(transcripts_ds):
    """Globally stable (conv_id, turn_idx) ordering — used by the
    per-turn text-equality invariant checks."""
    return transcripts_ds.sort(["conv_id", "turn_idx"])
