"""sf0.1 → sf1 scale-step demo (VERDICT r3 task #5).

Runs the full chain — extraction, minhash LSH near-dup, simhash hamming
near-dup, exact-substring removal + curation — at TWO corpus scales a
decade apart on the same generating distributions:

- extraction: the deterministic synth law corpus (docling_spark.synth)
  at 12,000 docs (the sf0.1 bench scale) and 120,000 docs ("sf1"),
- dedup/curation: the deterministic documents table
  (docling_spark.synth_docs) at 5,000 docs (the sf0.1 testdata shape)
  and 50,000 docs,

and reports wall time plus the two 100 TB early-warning instruments at
both levels:

- minhash `candidate_ratio_e6` / candidates-per-doc (LSH selectivity —
  a per-doc figure that grows with N means the band geometry is
  degenerating toward all-pairs),
- simhash `block_candidates_per_doc_e3` / `block_collision_ratio_e9`
  (pigeonhole block-join selectivity — same reading).

"Flat" across the step means: candidates-per-doc roughly constant
(true-dup pairs grow O(N) at a constant planted dup rate) and the
vs-all-pairs ratios FALLING ~1/N. Timing follows the BASELINE.md
steady-state protocol (one untimed warm-up per stage, min over two timed
passes) — the chain is a demonstration of scale behavior, not a
microbenchmark, so two passes suffice.

Usage:
  python tools/bench_scale_step.py                # both levels, print JSON
  python tools/bench_scale_step.py --small-only   # quick probe
  python tools/bench_scale_step.py --write        # append BENCH/HISTORY.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _cached(path_tpl: str, n: int, build) -> str:
    path = path_tpl.format(n=n)
    if not os.path.exists(path):
        build(path, n)
    return path


def _extract_corpus(n: int) -> str:
    from docling_spark.synth import write_corpus_parquet

    return _cached(
        "/tmp/docling_spark_scalestep_corpus_{n}.parquet", n,
        lambda p, n: write_corpus_parquet(p, n, seed=42),
    )


def _documents(n: int) -> str:
    from docling_spark.synth_docs import write_documents_parquet

    return _cached(
        "/tmp/docling_spark_scalestep_docs_{n}.parquet", n,
        lambda p, n: write_documents_parquet(p, n, seed=42),
    )


def _embeddings(n: int) -> str:
    from docling_spark.synth_docs import write_embeddings_parquet

    return _cached(
        "/tmp/docling_spark_scalestep_emb_{n}.parquet", n,
        lambda p, n: write_embeddings_parquet(p, n, seed=42),
    )


def _timed(fn, passes: int = 2):
    """Steady-state: one untimed warm-up, then min wall over `passes`."""
    fn()
    wall = None
    out = None
    for _ in range(passes):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        wall = dt if wall is None else min(wall, dt)
    return wall, out


def run_level(spark, n_extract: int, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from docling_spark.ops.dedup import (
        minhash_band_pairs, minhash_candidate_stats,
        remove_duplicate_substrings, simhash_block_stats,
        simhash_neardup_pairs)
    from docling_spark.ops.textstats import curation_pipeline
    from docling_spark.pipeline import extract

    level: dict = {"extract_docs": n_extract, "dedup_docs": n_docs}

    corpus = spark.read.parquet(_extract_corpus(n_extract))
    wall, row = _timed(
        lambda: extract(corpus)
        .agg(F.count("*").alias("n"), F.sum(F.size("spans")).alias("spans"))
        .collect()[0]
    )
    level["extract"] = {
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_extract / wall, 1),
        "spans": row["spans"],
    }

    docs = spark.read.parquet(_documents(n_docs))

    wall, rows = _timed(lambda: minhash_candidate_stats(docs).collect())
    st = rows[0].asDict()
    wall_pairs, n_pairs = _timed(lambda: minhash_band_pairs(docs).count())
    level["minhash"] = {
        "wall_sec": round(wall + wall_pairs, 2),
        "candidate_pairs": st["n_candidate_pairs"],
        "candidate_ratio_e6": st["candidate_ratio_e6"],
        "candidates_per_doc": round(st["n_candidate_pairs"] / st["n_docs"], 3),
        "band_pairs": n_pairs,
    }

    wall, rows = _timed(lambda: simhash_block_stats(docs).collect())
    st = rows[0].asDict()
    _, rows_k1 = _timed(lambda: simhash_block_stats(docs, max_hamming=1).collect())
    st_k1 = rows_k1[0].asDict()
    wall_pairs, n_pairs = _timed(
        lambda: simhash_neardup_pairs(docs, max_hamming=3).count()
    )
    level["simhash"] = {
        "wall_sec": round(wall + wall_pairs, 2),
        "block_candidate_pairs": st["n_block_candidate_pairs"],
        "block_candidates_per_doc_e3": st["block_candidates_per_doc_e3"],
        "block_collision_ratio_e9": st["block_collision_ratio_e9"],
        # the re-tuned geometry (k=1 → two 32-bit blocks) the instrument
        # demands on this low-entropy word-salad corpus — see HISTORY note
        "k1_candidates_per_doc_e3": st_k1["block_candidates_per_doc_e3"],
        "k1_collision_ratio_e9": st_k1["block_collision_ratio_e9"],
        "verified_pairs": n_pairs,
    }
    # round-5: the width knob itself — 128-bit two-long fingerprint, 32-bit
    # blocks at the SAME k=3; the collision ratio should fall ~2^16 vs the
    # 64-bit geometry on this corpus (the r4 instrument's named fix)
    wall128, rows128 = _timed(
        lambda: simhash_block_stats(docs, bits=128).collect())
    st128 = rows128[0].asDict()
    level["simhash128"] = {
        "wall_sec": round(wall128, 2),
        "block_candidate_pairs": st128["n_block_candidate_pairs"],
        "block_candidates_per_doc_e3": st128["block_candidates_per_doc_e3"],
        "block_collision_ratio_e9": st128["block_collision_ratio_e9"],
        "verified_pairs": st128["n_verified_pairs"],
    }

    def curate():
        dd = remove_duplicate_substrings(docs, window=10, min_df=2).select(
            "doc_id", F.col("text_dedup").alias("text")
        )
        return curation_pipeline(dd, min_quality=0.3, lang="en").count()

    wall, survivors = _timed(curate)
    level["curation_e2e"] = {
        "wall_sec": round(wall, 2),
        "survivors": survivors,
        "survivor_frac": round(survivors / n_docs, 4),
    }

    # round-4 additions: C4 span dedup and SemDeDup, with their own
    # selectivity instruments
    from docling_spark.ops.textstats import c4_clean

    def c4():
        out = c4_clean(docs).agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("survived"), 1).otherwise(0)).alias("kept"),
            F.sum("n_dropped_dup").alias("excised"),
        ).collect()[0]
        return out

    wall, row = _timed(c4)
    level["c4_clean"] = {
        "wall_sec": round(wall, 2),
        "survived_frac": round(row["kept"] / max(row["n"], 1), 4),
        "excised_sentences_per_doc_e3": round(1000 * row["excised"] / max(row["n"], 1)),
    }

    from docling_spark.ops.similarity import ivf_assign, semdedup

    emb = spark.read.parquet(_embeddings(n_docs))
    # the paper's scale knob: cluster count grows with the corpus so the
    # within-cell pair budget Σ|cell|²/2 stays a constant fraction. The
    # instrument (cell pair counts — cheap) is reported at BOTH a fixed
    # and a scaled cell count; the dedup itself runs only on the scaled
    # geometry — paying the quadratic wall on the known-degenerate fixed
    # case is exactly what the instrument exists to prevent. Threshold
    # 0.9: the planted near-dups sit at cosine ≈ 0.999, random 64-dim
    # gaussian pairs far below.
    for label, n_cells in (("fixed32", 32), ("scaled", max(32, n_docs // 156))):
        wall, cells = _timed(
            lambda: ivf_assign(emb, n_cells=n_cells, dim=64, seed=11)
            .groupBy("cell").count().collect()
        )
        pairs_in_cells = sum(c["count"] * (c["count"] - 1) // 2 for c in cells)
        all_pairs = n_docs * (n_docs - 1) // 2
        entry = {
            "n_cells": n_cells,
            "assign_wall_sec": round(wall, 2),
            "cell_pairs_per_doc": round(pairs_in_cells / n_docs, 1),
            "cell_pair_ratio_e6": round(1e6 * pairs_in_cells / all_pairs),
        }
        if label == "scaled":
            # round-5 instrument: the same top-1 assignment FORCED down the
            # flat N×C path (centroids passed as a frame only, so the
            # two-level walk can't engage) — the super-linear term the
            # hierarchical quantizer exists to remove. Both walls appear in
            # the health section; at cells ∝ N the hier wall should step
            # ~linearly with N (per-doc cost √C) while the flat wall steps
            # super-linearly (per-doc cost C).
            from docling_spark.ops.similarity import (
                _assign_cells, _centroid_df, _centroids)

            flat_wall, _ = _timed(
                lambda: _assign_cells(
                    emb, n_cells, 64, 11, "vec_id", "embedding", top_n=1,
                    cents=_centroid_df(spark, _centroids(n_cells, 64, 11)),
                ).groupBy("cell").count().collect()
            )
            entry["assign_flat_wall_sec"] = round(flat_wall, 2)
            wall, kept = _timed(
                lambda: semdedup(emb, n_cells=n_cells, threshold=0.9)
                .filter("kept").count()
            )
            entry["wall_sec"] = round(wall, 2)
            entry["kept_frac"] = round(kept / n_docs, 4)
        level[f"semdedup_{label}"] = entry
    return level


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-only", action="store_true")
    ap.add_argument("--write", action="store_true",
                    help="append the result section to BENCH/HISTORY.md")
    args = ap.parse_args()

    from docling_spark.session import get_spark

    spark = get_spark(app="scale-step", master=f"local[{CORES}]",
                      shuffle_partitions=CORES,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "512k",
                                  "spark.sql.files.openCostInBytes": "0",
                                  "spark.sql.execution.arrow.maxRecordsPerBatch": "256"})
    levels = [("sf0.1", 12_000, 5_000)]
    if not args.small_only:
        levels.append(("sf1", 120_000, 50_000))
    out = {}
    for name, n_extract, n_docs in levels:
        out[name] = run_level(spark, n_extract, n_docs)
        print(f"== {name}: {json.dumps(out[name])}", file=sys.stderr)
    spark.stop()

    if "sf1" in out:
        s, b = out["sf0.1"], out["sf1"]
        out["health"] = {
            "minhash_candidates_per_doc": [
                s["minhash"]["candidates_per_doc"],
                b["minhash"]["candidates_per_doc"],
            ],
            "minhash_ratio_e6": [
                s["minhash"]["candidate_ratio_e6"],
                b["minhash"]["candidate_ratio_e6"],
            ],
            "simhash_candidates_per_doc_e3": [
                s["simhash"]["block_candidates_per_doc_e3"],
                b["simhash"]["block_candidates_per_doc_e3"],
            ],
            "simhash_ratio_e9": [
                s["simhash"]["block_collision_ratio_e9"],
                b["simhash"]["block_collision_ratio_e9"],
            ],
            "simhash_k1_candidates_per_doc_e3": [
                s["simhash"]["k1_candidates_per_doc_e3"],
                b["simhash"]["k1_candidates_per_doc_e3"],
            ],
            "simhash128_candidates_per_doc_e3": [
                s["simhash128"]["block_candidates_per_doc_e3"],
                b["simhash128"]["block_candidates_per_doc_e3"],
            ],
            "simhash128_ratio_e9": [
                s["simhash128"]["block_collision_ratio_e9"],
                b["simhash128"]["block_collision_ratio_e9"],
            ],
            "survivor_frac": [
                s["curation_e2e"]["survivor_frac"],
                b["curation_e2e"]["survivor_frac"],
            ],
            "c4_survived_frac": [
                s["c4_clean"]["survived_frac"],
                b["c4_clean"]["survived_frac"],
            ],
            "semdedup_fixed_cell_pairs_per_doc": [
                s["semdedup_fixed32"]["cell_pairs_per_doc"],
                b["semdedup_fixed32"]["cell_pairs_per_doc"],
            ],
            "semdedup_scaled_cell_pairs_per_doc": [
                s["semdedup_scaled"]["cell_pairs_per_doc"],
                b["semdedup_scaled"]["cell_pairs_per_doc"],
            ],
            # hier vs flat assignment walls at cells ∝ N (round-5 task 1):
            # the hier pair should step ~×10 (linear in N), the flat pair
            # super-linearly (the removed N×C term)
            "assign_hier_wall_sec": [
                s["semdedup_scaled"]["assign_wall_sec"],
                b["semdedup_scaled"]["assign_wall_sec"],
            ],
            "assign_flat_wall_sec": [
                s["semdedup_scaled"]["assign_flat_wall_sec"],
                b["semdedup_scaled"]["assign_flat_wall_sec"],
            ],
        }
    print(json.dumps(out))

    if args.write and "sf1" in out:
        _write_history(out)


def _write_history(out: dict) -> None:
    s, b, h = out["sf0.1"], out["sf1"], out["health"]
    lines = [
        "",
        "## Scale-step demo: sf0.1 → sf1 (10× corpus, same distribution)",
        "",
        f"`tools/bench_scale_step.py` at local[{CORES}], steady-state "
        "protocol; extraction corpus = docling_spark.synth (seed 42), "
        "documents corpus = docling_spark.synth_docs (seed 42, planted "
        "2% exact / 5% near dups at both scales).",
        "",
        "| stage | sf0.1 wall (s) | sf1 wall (s) | ratio (10× data) |",
        "|---|---|---|---|",
    ]
    for key, label in [
        ("extract", f"extraction ({s['extract_docs']//1000}k → "
                    f"{b['extract_docs']//1000}k docs)"),
        ("minhash", "minhash LSH stats + band pairs"),
        ("simhash", "simhash block stats + verified pairs"),
        ("curation_e2e", "substring removal + curation"),
        ("c4_clean", "C4 line filters + span dedup"),
        ("semdedup_scaled", "SemDeDup (cells scaled with N)"),
    ]:
        ws, wb = s[key]["wall_sec"], b[key]["wall_sec"]
        lines.append(f"| {label} | {ws} | {wb} | {round(wb / ws, 2)}× |")
    lines += [
        "",
        f"Extraction throughput: {s['extract']['docs_per_sec']} → "
        f"{b['extract']['docs_per_sec']} docs/s at 10× input.",
        "",
        "Health instruments (flat-per-doc = safe to keep scaling; the "
        "vs-all-pairs ratios fall ~1/N as they should in a non-degenerate "
        "corpus):",
        "",
        "| metric | sf0.1 | sf1 |",
        "|---|---|---|",
        f"| minhash candidates/doc | {h['minhash_candidates_per_doc'][0]} | "
        f"{h['minhash_candidates_per_doc'][1]} |",
        f"| minhash candidate ratio (e6) | {h['minhash_ratio_e6'][0]} | "
        f"{h['minhash_ratio_e6'][1]} |",
        f"| simhash k=3 block candidates/doc (e3) | "
        f"{h['simhash_candidates_per_doc_e3'][0]} | "
        f"{h['simhash_candidates_per_doc_e3'][1]} |",
        f"| simhash k=3 block collision ratio (e9) | {h['simhash_ratio_e9'][0]} | "
        f"{h['simhash_ratio_e9'][1]} |",
        f"| simhash k=1 block candidates/doc (e3) | "
        f"{h['simhash_k1_candidates_per_doc_e3'][0]} | "
        f"{h['simhash_k1_candidates_per_doc_e3'][1]} |",
        f"| simhash128 k=3 block candidates/doc (e3) | "
        f"{h['simhash128_candidates_per_doc_e3'][0]} | "
        f"{h['simhash128_candidates_per_doc_e3'][1]} |",
        f"| simhash128 k=3 block collision ratio (e9) | "
        f"{h['simhash128_ratio_e9'][0]} | {h['simhash128_ratio_e9'][1]} |",
        f"| curation survivor fraction | {h['survivor_frac'][0]} | "
        f"{h['survivor_frac'][1]} |",
        f"| C4 survived fraction | {h['c4_survived_frac'][0]} | "
        f"{h['c4_survived_frac'][1]} |",
        f"| semdedup cell pairs/doc (fixed 32 cells) | "
        f"{h['semdedup_fixed_cell_pairs_per_doc'][0]} | "
        f"{h['semdedup_fixed_cell_pairs_per_doc'][1]} |",
        f"| semdedup cell pairs/doc (cells ∝ N) | "
        f"{h['semdedup_scaled_cell_pairs_per_doc'][0]} | "
        f"{h['semdedup_scaled_cell_pairs_per_doc'][1]} |",
        f"| assignment wall, hierarchical (cells ∝ N, s) | "
        f"{h['assign_hier_wall_sec'][0]} | {h['assign_hier_wall_sec'][1]} |",
        f"| assignment wall, flat N×C forced (cells ∝ N, s) | "
        f"{h['assign_flat_wall_sec'][0]} | {h['assign_flat_wall_sec'][1]} |",
        "",
        "Reading: interpret per-doc candidates together with the collision "
        "ratio. Minhash: flat per-doc, ratio falling ~1/N — healthy, keep "
        "scaling (its features are content shingles, entropy independent "
        "of N). Simhash: ratio constant in N at each geometry → per-doc "
        "candidates grow linearly — the instrument firing: low-entropy "
        "fingerprints (31-word vocabulary) collide distributionally, not "
        "in the uniform N²/2^(64/(k+1)) regime. The k=1 row shows the "
        "width knob (×~280 lower collision probability at the same 64-bit "
        "budget); on a corpus this low-entropy the verdict is to use "
        "minhash or widen past one long (128-bit = two block columns, "
        "same pigeonhole join) before a full-corpus pass.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "HISTORY.md"), "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
