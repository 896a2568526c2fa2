"""Two-parallelism-level scaling measurement (BASELINE.md protocol — the
sandbox substitute for N vs 4N executors).

Runs the identical extraction job on the identical corpus at local[N] and
local[4N] in separate JVMs (subprocesses), reports throughput at both plus
scaling efficiency = (T_N / T_4N) / 4, and checks the output table hash is
identical at both levels. Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [--docs 30000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from docling_spark.session import get_spark
from docling_spark.pipeline import extract
from pyspark.sql import functions as F

spark = get_spark(app="scaling", master="local[{cores}]",
                  shuffle_partitions={cores},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "512k",
                              "spark.sql.files.openCostInBytes": "0",
                              "spark.sql.execution.arrow.maxRecordsPerBatch": "256"}})
df = spark.read.parquet({corpus!r})
# warm-up: a sampled full-width pass spawns the whole python worker pool
# (sample is a filter — it touches every partition) so the measured run is
# steady-state, as a long-lived cluster job would be
extract(df.sample(0.08, seed=1)).count()
t0 = time.time()
out = extract(df)
# content digest doubles as the all-levels-identical check: xor of row hashes
agg = out.select(
    F.sum(F.size("spans")).alias("n_spans"),
    F.expr("bit_xor(xxhash64(doc_id, to_json(spans)))").alias("digest"),
    F.count("*").alias("n_docs"),
).collect()[0]
wall = time.time() - t0
print(json.dumps({{"cores": {cores}, "wall_sec": wall,
                  "docs": agg["n_docs"], "spans": agg["n_spans"],
                  "digest": str(agg["digest"]),
                  "docs_per_sec": agg["n_docs"] / wall}}))
spark.stop()
"""


def run_level(cores: int, corpus: str) -> dict:
    code = _RUN_SNIPPET.format(repo=REPO, cores=cores, corpus=corpus)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output from local[{cores}]:\n{res.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=48000)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument(
        "--write",
        action="store_true",
        help="update BENCH/BASELINE.md (without this flag the run is a probe "
        "and the canonical report is left untouched)",
    )
    args = ap.parse_args()

    import hashlib

    from docling_spark import synth as _synth

    with open(_synth.__file__, "rb") as f:
        _ver = hashlib.sha256(f.read()).hexdigest()[:10]
    corpus = f"/tmp/docling_spark_scaling_{args.docs}_{_ver}.parquet"
    if not os.path.exists(corpus):
        print(f"synthesizing {args.docs}-doc corpus ...", file=sys.stderr)
        _synth.write_corpus_parquet(corpus, n_docs=args.docs, seed=42)

    lo = run_level(args.n, corpus)
    hi = run_level(args.n * 4, corpus)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    identical = lo["digest"] == hi["digest"] and lo["spans"] == hi["spans"]

    summary = {
        "corpus_docs": args.docs,
        "throughput_low": round(lo["docs_per_sec"], 1),
        "throughput_high": round(hi["docs_per_sec"], 1),
        "cores_low": args.n,
        "cores_high": args.n * 4,
        "wall_low_sec": round(lo["wall_sec"], 1),
        "wall_high_sec": round(hi["wall_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "outputs_identical": identical,
    }
    print(json.dumps(summary, indent=2))

    if not args.write:
        print("probe run — BENCH/BASELINE.md not updated (pass --write)", file=sys.stderr)
        return
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling measurement (protocol: BASELINE.md)

Same extraction job, same {args.docs}-doc deterministic corpus (seed 42),
two local parallelism levels in separate JVMs (sandbox substitute for N vs
4N executors).

| level | cores | wall (s) | throughput (docs/sec) |
|---|---|---|---|
| N  | {args.n}  | {lo['wall_sec']:.1f} | {lo['docs_per_sec']:.1f} |
| 4N | {args.n * 4} | {hi['wall_sec']:.1f} | {hi['docs_per_sec']:.1f} |

**Scaling efficiency = (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target ≥ 0.8)

Output-table digest identical at both levels: **{identical}**
(xor-sum of xxhash64(doc_id, spans) plus span counts — correctness under
parallelism).

Measured by `tools/bench_scaling.py`; per-query timings live in the
per-round BENCH_r{{N}}.json from `bench.py`.
"""
        )
    print(f"wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
