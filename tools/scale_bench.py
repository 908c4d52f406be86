"""Scale-bench the dedup/pretrain family on a replicated corpus.

The sf0.1 documents table is 5,000 docs; the headline KG pipeline has
×128-replication scaling evidence but the dedup/pretrain family did
not. This tool builds a ×R corpus with the SAME statistical shape —
each replica is a hash-perturbed copy (every word is independently
replaced by a replica-salted variant with probability ~30%), so gram
document frequencies stay realistic instead of multiplying by R the
way verbatim replication would (which the df window [2, cap] would
simply drop) — then times `ngram_jaccard_pairs`, `minhash_candidates`,
`curate_documents` and `pretrain_corpus` at each R and reports walls,
docs/sec, and the df-cap drop rate (share of distinct grams above the
cap — the knob that bounds pair fan-out at scale).

Quadratic detection: wall(R=hi) / wall(R=lo) ≈ hi/lo for linear
machinery; a ratio near (hi/lo)^2 flags a hidden all-pairs.

Usage: python tools/scale_bench.py [R ...]   (default: 16 64)
Writes one JSON line; record results in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd

SRC_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
PERTURB_PCT = 30  # % of words replaced per replica


def _perturb_batch(batch: pd.DataFrame, rep: int) -> pd.DataFrame:
    """Replica ``rep`` of a documents batch: deterministic word-level
    perturbation keyed on (WORD CONTENT, rep) — two near-identical docs
    inside one replica share their words, so they get the SAME
    replacements and stay near-dups (the base corpus's planted pair
    structure multiplies ×R); across replicas the salt differs, so
    cross-replica gram overlap decays and document frequencies grow
    sublinearly instead of ×R (which the df window would just drop)."""
    import zlib

    texts = batch["text"].fillna("").tolist()
    doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
    words_per_doc = []
    all_words = []
    for t in texts:
        w = t.split()
        words_per_doc.append(len(w))
        all_words.extend(w)
    if all_words:
        series = pd.Series(all_words, dtype=object)
        uniq = series.unique()
        # hash once per DISTINCT word (Zipf vocabulary ≪ token count)
        threshold = PERTURB_PCT * (2**32) // 100
        lut = {
            w: (zlib.crc32(f"{w}|{rep}".encode()) < threshold) and rep > 0
            for w in uniq
        }
        replace = series.map(lut).to_numpy()
        words = series.to_numpy()
        variants = np.char.add(
            np.asarray(all_words, dtype=str), f"~r{rep}"
        ).astype(object)
        words = np.where(replace, variants, words)
        out_texts = []
        pos = 0
        for n in words_per_doc:
            out_texts.append(" ".join(words[pos:pos + n]))
            pos += n
    else:
        out_texts = texts
    out = batch.copy()
    out["doc_id"] = doc_ids + np.int64(rep) * np.int64(10_000_000)
    out["text"] = out_texts
    out["n_chars"] = pd.Series(out_texts).str.len().astype("int64").values
    return out


def build_corpus(repeat: int, out_dir: str) -> int:
    """×repeat perturbed corpus + symlinks for the other tables."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t == "documents":
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC_SF, f"{t}.parquet"), dst)
    docs_dir = os.path.join(out_dir, "documents.parquet")
    if os.path.isdir(docs_dir):
        shutil.rmtree(docs_dir)

    base = rd.read_parquet(os.path.join(SRC_SF, "documents.parquet"))

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [_perturb_batch(batch, rep) for rep in range(repeat)],
            ignore_index=True,
        )

    ds = base.map_batches(kernel, batch_format="pandas")
    ds.repartition(max(8, repeat // 2)).write_parquet(docs_dir)
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(os.path.join(docs_dir, f)).num_rows
        for f in os.listdir(docs_dir) if f.endswith(".parquet")
    )


def df_cap_drop_rate(sf_dir: str) -> dict:
    """Share of distinct word-5-grams whose document frequency exceeds
    the pair machinery's df cap (those grams generate no candidate
    pairs — the documented fan-out bound)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.dedupe import NGRAM_DF_CAP, NGRAM_K
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        gs: list[int] = []
        for t in batch["text"].fillna(""):
            w = t.split()
            seen = {
                hash(" ".join(w[i:i + NGRAM_K])) & 0x7FFFFFFFFFFFFFFF
                for i in range(len(w) - NGRAM_K + 1)
            }
            gs.extend(seen)
        out = pd.DataFrame({"g": np.asarray(gs, dtype=np.int64)})
        out["df"] = np.int64(1)
        return out.groupby("g", sort=False, as_index=False)["df"].sum()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("g", sort=False, as_index=False)["df"].sum()
        d = g["df"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"total": [np.int64(len(d))],
             "over_cap": [np.int64((d > NGRAM_DF_CAP).sum())],
             "in_window": [np.int64(((d >= 2) & (d <= NGRAM_DF_CAP)).sum())]}
        )

    parts = grouped_aggregate(
        docs.map_batches(grams, batch_format="pandas"), ["g"], final,
        num_partitions=16,
    ).to_pandas()
    total = int(parts["total"].sum())
    over = int(parts["over_cap"].sum())
    window = int(parts["in_window"].sum())
    return {
        "distinct_grams": total,
        "grams_over_cap": over,
        "drop_rate_pct": round(100.0 * over / total, 3) if total else 0.0,
        "grams_in_pair_window": window,
    }


def main() -> int:
    repeats = [int(x) for x in sys.argv[1:]] or [16, 64]

    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from entity_extractor_linker_ray.ops import dedupe, pretrain
    from entity_extractor_linker_ray.pipelines import curation

    results = {}
    for repeat in repeats:
        out_dir = f"/tmp/scale_sf_x{repeat}"
        t0 = time.time()
        n_docs = build_corpus(repeat, out_dir)
        build_s = round(time.time() - t0, 2)
        stats = df_cap_drop_rate(out_dir)
        entry = {"n_docs": n_docs, "build_sec": build_s, **stats}
        for name, fn in [
            ("ngram_jaccard_pairs", dedupe.ngram_jaccard_pairs),
            ("minhash_candidates", dedupe.minhash_candidates),
            ("curate_documents", curation.curate_documents),
            ("pretrain_corpus", pretrain.pretrain_corpus),
        ]:
            t0 = time.time()
            out = fn(out_dir)
            n_rows = len(out.to_pandas()) if hasattr(out, "to_pandas") else len(out)
            wall = round(time.time() - t0, 2)
            entry[name] = {
                "wall_sec": wall,
                "rows": n_rows,
                "docs_per_sec": round(n_docs / wall, 1),
            }
        results[f"x{repeat}"] = entry
    # linearity verdict: wall ratio vs size ratio for the two extremes
    if len(repeats) >= 2:
        lo, hi = f"x{repeats[0]}", f"x{repeats[-1]}"
        size_ratio = repeats[-1] / repeats[0]
        for name in ("ngram_jaccard_pairs", "minhash_candidates",
                     "curate_documents", "pretrain_corpus"):
            ratio = results[hi][name]["wall_sec"] / max(
                results[lo][name]["wall_sec"], 1e-9
            )
            results[f"{name}_wall_ratio_{lo}_to_{hi}"] = round(ratio, 2)
        results["size_ratio"] = size_ratio
    print(json.dumps({"scale_bench": results, "num_cpus": NUM_CPUS,
                      "src": SRC_SF}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
