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


def _assemble_group(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("turn_idx", kind="stable")
    return pd.DataFrame(
        {
            "conv_id": [group["conv_id"].iloc[0]],
            "doc_text": ["\n".join(group["text"].astype(str))],
            "n_turns": np.array([len(group)], dtype=np.int32),
        }
    )


def assemble_documents(transcripts_ds):
    """transcripts Dataset → documents Dataset
    (``conv_id, doc_text, n_turns``)."""
    pruned = transcripts_ds.select_columns(["conv_id", "turn_idx", "text"])
    return pruned.groupby("conv_id").map_groups(_assemble_group, batch_format="pandas")


def sort_transcripts(transcripts_ds):
    """Globally stable (conv_id, turn_idx) ordering — used by the
    per-turn text-equality invariant checks."""
    return transcripts_ds.sort(["conv_id", "turn_idx"])
