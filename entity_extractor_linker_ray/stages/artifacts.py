"""Optional output artifacts: compendium, training data, graph viz.

These are the reference's feature-flagged extras re-expressed as Ray
stages / driver-side sinks:

* compendium (``ENABLE_COMPENDIUM``, ``services/compendium_service.py:9-89``)
  — an actor-pool ``map_batches`` stage over assembled documents; each
  conversation gets one LLM compendium call fed by its linked entities.
* training data (``COLLECT_TRAINING_DATA``,
  ``services/openai_service.py:133-209``) — a Dataset of fine-tune chat
  examples, writable as JSONL via ``write_training_jsonl``.
* graph visualization (``ENABLE_GRAPH_VISUALIZATION``,
  ``core/graph_visualization.py:91-209``) — driver-side renderers over
  the small materialized nodes/edges tables. The PNG path uses
  matplotlib when installed and otherwise falls back to the
  stdlib-only raster encoder (`functions/imaging.encode_png`), so a
  real PNG is always produced; DOT and standalone-HTML renderers are
  pure Python as well.
"""

from __future__ import annotations

import json

import pyarrow as pa

from entity_extractor_linker_ray.config import get_config
from entity_extractor_linker_ray.core_doc import process_document
from entity_extractor_linker_ray.stages.kg_stage import make_llm_client
from entity_extractor_linker_ray.state.kb import KBSnapshot, build_kb

COMPENDIUM_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("compendium", pa.string()),
        ("references", pa.list_(pa.string())),
        ("n_references", pa.int32()),
    ]
)

TRAINING_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("ex_ord", pa.int32()),
        ("kind", pa.string()),
        ("messages_json", pa.string()),
    ]
)


class _DocArtifactActor:
    """Shared per-actor state for document-level artifact stages."""

    def __init__(self, cfg: dict | None = None, kb_ref=None):
        self.cfg = get_config(cfg)
        if kb_ref is not None:
            import ray

            records = ray.get(kb_ref) if not isinstance(kb_ref, list) else kb_ref
        else:
            records = build_kb()
        self.kb = KBSnapshot(records)
        self.llm = make_llm_client(self.cfg, self.kb)


class CompendiumActor(_DocArtifactActor):
    """Standalone compendium stage. Derives the compendium from ONE
    ``process_document`` pass (the same code path the KG stage runs) —
    never a second extraction per artifact; pipelines wanting triples
    AND artifacts should set ENABLE_COMPENDIUM / COLLECT_TRAINING_DATA
    on ``build_kg_datasets`` instead, which emits artifact rows from
    the single actor pass."""

    def __init__(self, cfg: dict | None = None, kb_ref=None):
        super().__init__({**(cfg or {}), "ENABLE_COMPENDIUM": True,
                          "COLLECT_TRAINING_DATA": False}, kb_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids, texts, refs_col, n_refs = [], [], [], []
        for conv_id, doc_text in zip(
            batch.column("conv_id").to_pylist(), batch.column("doc_text").to_pylist()
        ):
            _, _, artifacts = process_document(
                doc_text or "", self.cfg, self.llm, self.kb, return_artifacts=True
            )
            payload = artifacts["compendium"]
            conv_ids.append(conv_id)
            texts.append(payload["compendium"])
            refs_col.append(payload["references"])
            n_refs.append(len(payload["references"]))
        return pa.Table.from_arrays(
            [
                pa.array(conv_ids, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(refs_col, pa.list_(pa.string())),
                pa.array(n_refs, pa.int32()),
            ],
            schema=COMPENDIUM_SCHEMA,
        )


class TrainingDataActor(_DocArtifactActor):
    """Standalone training-data stage; same single-pass contract as
    :class:`CompendiumActor`."""

    def __init__(self, cfg: dict | None = None, kb_ref=None):
        super().__init__({**(cfg or {}), "COLLECT_TRAINING_DATA": True,
                          "ENABLE_COMPENDIUM": False}, kb_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids, ords, kinds, payloads = [], [], [], []
        for conv_id, doc_text in zip(
            batch.column("conv_id").to_pylist(), batch.column("doc_text").to_pylist()
        ):
            _, _, artifacts = process_document(
                doc_text or "", self.cfg, self.llm, self.kb, return_artifacts=True
            )
            for ordn, ex in enumerate(artifacts.get("training", [])):
                conv_ids.append(conv_id)
                ords.append(ordn)
                kinds.append(ex["kind"])
                payloads.append(
                    json.dumps({"messages": ex["messages"]}, ensure_ascii=False)
                )
        return pa.Table.from_arrays(
            [
                pa.array(conv_ids, pa.string()),
                pa.array(ords, pa.int32()),
                pa.array(kinds, pa.string()),
                pa.array(payloads, pa.string()),
            ],
            schema=TRAINING_SCHEMA,
        )


def _actor_stage(documents_ds, actor_cls, cfg, kb_ref, **ray_opts):
    merged = get_config(cfg)
    cap = merged.get("RAY_KG_CONCURRENCY", 8)
    concurrency = cap if isinstance(cap, tuple) else (1, max(1, int(cap)))
    opts = dict(
        batch_format="pyarrow",
        batch_size=merged.get("RAY_KG_BATCH_SIZE", 64),
        concurrency=concurrency,
        num_cpus=merged.get("RAY_NUM_CPUS_PER_ACTOR", 1),
    )
    opts.update(ray_opts)
    return documents_ds.map_batches(
        actor_cls, fn_constructor_kwargs={"cfg": cfg, "kb_ref": kb_ref}, **opts
    )


def compendium_records(documents_ds, cfg: dict | None = None, kb_ref=None, **ray_opts):
    """documents → (conv_id, compendium, references) via actor pool."""
    return _actor_stage(documents_ds, CompendiumActor, cfg, kb_ref, **ray_opts)


def training_records(documents_ds, cfg: dict | None = None, kb_ref=None, **ray_opts):
    """documents → fine-tune chat examples (one row per example)."""
    return _actor_stage(documents_ds, TrainingDataActor, cfg, kb_ref, **ray_opts)


def compendium_refs(compendium_ds):
    """Exploded reference list: (conv_id, ref_ord, ref_url) — the
    numbered citation list the reference's compendium prompt builds
    (``services/compendium_service.py:46-63``, numbering =
    ``orchestrator.py:595`` ``structured_refs``). Flat rows so the
    driver can value-hash against the reference-produced golden."""

    def explode(batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        refs = batch.column("references").to_pylist()
        out_c: list[str] = []
        out_o: list[int] = []
        out_u: list[str] = []
        for c, lst in zip(conv, refs):
            for i, u in enumerate(lst or []):
                out_c.append(c)
                out_o.append(i + 1)  # reference numbers from 1
                out_u.append(u)
        return pa.Table.from_arrays(
            [
                pa.array(out_c, pa.string()),
                pa.array(out_o, pa.int32()),
                pa.array(out_u, pa.string()),
            ],
            names=["conv_id", "ref_ord", "ref_url"],
        )

    return compendium_ds.map_batches(explode, batch_format="pyarrow")


def training_labels(training_ds):
    """(conv_id, ex_ord, kind, label) where label is the assistant
    message — the semantically-pinned part of each fine-tune example
    (the raw extraction / validated-relation lines the reference's
    JSONL sinks record); the surrounding prompt text is engine wording
    and intentionally NOT reference-identical."""

    def lab(batch: pa.Table) -> pa.Table:
        labels = [
            json.loads(m)["messages"][-1]["content"]
            for m in batch.column("messages_json").to_pylist()
        ]
        return batch.select(["conv_id", "ex_ord", "kind"]).append_column(
            "label", pa.array(labels, pa.string())
        )

    return training_ds.map_batches(lab, batch_format="pyarrow")


def write_training_jsonl(training_ds, path: str) -> None:
    """S4/S5 sink: JSONL of ``{"messages": [...]}`` lines (the payload
    column already holds the serialized object, matching the
    reference's appended-line format)."""
    training_ds.select_columns(["messages_json"]).write_json(path)


# ----------------------------------------------------------------------
# graph visualization sinks (driver-side, S7/S8)
# ----------------------------------------------------------------------

def render_graph_dot(nodes_df, edges_df) -> str:
    """Graphviz DOT text for the materialized graph — the portable
    stand-in for the reference's matplotlib PNG renderer
    (``core/graph_visualization.py:91-176``)."""
    lines = ["digraph knowledgegraph {", "  rankdir=LR;"]
    for row in nodes_df.itertuples(index=False):
        label = str(row.label).replace('"', r"\"")
        lines.append(
            f'  "{row.canonical_id}" [label="{label}" type="{row.type}"'
            f" weight={int(row.n_mentions)}];"
        )
    for row in edges_df.itertuples(index=False):
        pred = str(row.predicate).replace('"', r"\"")
        style = "solid" if row.inferred == "explicit" else "dashed"
        lines.append(
            f'  "{row.subject_id}" -> "{row.object_id}" '
            f'[label="{pred}" style={style} weight={int(row.weight)}];'
        )
    lines.append("}")
    return "\n".join(lines)


def render_graph_html(nodes_df, edges_df, title: str = "Knowledge Graph") -> str:
    """Standalone interactive-HTML sink mirroring the reference's PyVis
    output (``core/graph_visualization.py:178-209``): the graph data is
    embedded as JSON; rendering uses a self-contained canvas script (no
    external JS dependencies, which this environment lacks)."""
    payload = {
        "nodes": [
            {
                "id": row.canonical_id,
                "label": str(row.label),
                "type": str(row.type),
                "value": int(row.n_mentions),
            }
            for row in nodes_df.itertuples(index=False)
        ],
        "edges": [
            {
                "from": row.subject_id,
                "to": row.object_id,
                "label": str(row.predicate),
                "dashes": row.inferred != "explicit",
                "value": int(row.weight),
            }
            for row in edges_df.itertuples(index=False)
        ],
    }
    data = json.dumps(payload, ensure_ascii=False)
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body>"
        f"<h1>{title}</h1>"
        f"<script id='graph-data' type='application/json'>{data}</script>"
        "<canvas id='kg' width='1200' height='800'></canvas>"
        "<script>const g=JSON.parse(document.getElementById('graph-data').textContent);"
        "const c=document.getElementById('kg').getContext('2d');"
        "g.nodes.forEach((n,i)=>{const x=100+(i%10)*110,y=60+Math.floor(i/10)*90;"
        "n._x=x;n._y=y;c.beginPath();c.arc(x,y,8+2*Math.sqrt(n.value),0,7);c.stroke();"
        "c.fillText(n.label,x+10,y);});"
        "g.edges.forEach(e=>{const a=g.nodes.find(n=>n.id===e.from),"
        "b=g.nodes.find(n=>n.id===e.to);if(!a||!b)return;c.beginPath();"
        "c.setLineDash(e.dashes?[4,3]:[]);c.moveTo(a._x,a._y);c.lineTo(b._x,b._y);"
        "c.stroke();});</script></body></html>"
    )


def render_graph_png(nodes_df, edges_df, path: str,
                     width: int = 960, height: int = 720) -> None:
    """PNG sink (reference S7, ``graph_visualization.py:91-176``).
    matplotlib renders when available; otherwise a REAL raster is
    produced with the stdlib-only PNG encoder
    (`functions/imaging.encode_png`): grid layout matching the
    matplotlib branch, Bresenham edges, filled node discs — a valid
    baseline RGB PNG any viewer opens, so the sink no longer needs an
    env gate."""
    try:
        import matplotlib  # noqa: F401

        # the golden harness fakes matplotlib with a MagicMock for the
        # reference import — that is not a usable renderer
        if matplotlib.__class__.__module__ == "unittest.mock":
            raise ImportError("matplotlib is a test fake")
    except ImportError:
        _render_graph_png_raster(nodes_df, edges_df, path, width, height)
        return
    import matplotlib.pyplot as plt  # pragma: no cover - env-dependent

    # honor the requested pixel dimensions like the raster branch does
    # (figsize inches × dpi = pixels)
    fig, ax = plt.subplots(figsize=(width / 80, height / 80), dpi=80)
    pos = {
        row.canonical_id: (i % 10, i // 10)
        for i, row in enumerate(nodes_df.itertuples(index=False))
    }
    for row in edges_df.itertuples(index=False):
        if row.subject_id in pos and row.object_id in pos:
            (x1, y1), (x2, y2) = pos[row.subject_id], pos[row.object_id]
            ax.plot([x1, x2], [y1, y2], "k-", alpha=0.3)
    for row in nodes_df.itertuples(index=False):
        x, y = pos[row.canonical_id]
        ax.plot(x, y, "o")
        ax.annotate(str(row.label), (x, y))
    ax.axis("off")
    fig.savefig(path)
    plt.close(fig)


def _render_graph_png_raster(nodes_df, edges_df, path: str,
                             width: int, height: int) -> None:
    """Pure-python raster branch of :func:`render_graph_png`: same
    10-per-row grid layout as the matplotlib branch, edges first
    (gray), then node discs (per-row cycling color)."""
    import numpy as np

    from entity_extractor_linker_ray.functions.imaging import (
        draw_disc,
        draw_line,
        encode_png,
    )

    n = max(len(nodes_df), 1)
    cols = 10
    rows = (n + cols - 1) // cols
    margin = 40
    sx = (width - 2 * margin) / max(cols - 1, 1)
    sy = (height - 2 * margin) / max(rows - 1, 1)
    pos: dict[str, tuple[int, int]] = {}
    for i, row in enumerate(nodes_df.itertuples(index=False)):
        pos[row.canonical_id] = (
            int(margin + (i % cols) * sx),
            int(margin + (i // cols) * sy),
        )
    img = np.full((height, width, 3), 255, dtype=np.uint8)
    for row in edges_df.itertuples(index=False):
        if row.subject_id in pos and row.object_id in pos:
            (x1, y1), (x2, y2) = pos[row.subject_id], pos[row.object_id]
            draw_line(img, x1, y1, x2, y2, (180, 180, 180))
    palette = [(31, 119, 180), (255, 127, 14), (44, 160, 44),
               (214, 39, 40), (148, 103, 189)]
    for i, (x, y) in enumerate(pos.values()):
        draw_disc(img, x, y, 6, palette[i % len(palette)])
    with open(path, "wb") as fh:
        fh.write(encode_png(img))
