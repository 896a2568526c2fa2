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
# warm-up: one full untimed pass spawns the python worker pool AND lets the
# JVM JIT the arrow/python-runner path (a cold pass pays one-time JIT that a
# long-lived cluster job amortizes away); then min over three timed passes —
# the host shows bursty CPU-steal, so the least-interfered run is the
# steady-state estimate. Both levels use the identical protocol, so the
# efficiency ratio stays apples-to-apples.
def one_pass():
    out = extract(df)
    # content digest doubles as the all-levels-identical check: xor of row hashes
    return out.select(
        F.sum(F.size("spans")).alias("n_spans"),
        F.expr("bit_xor(xxhash64(doc_id, to_json(spans)))").alias("digest"),
        F.count("*").alias("n_docs"),
    ).collect()[0]

one_pass()
wall = None
for _ in range(3):
    t0 = time.time()
    agg = one_pass()
    dt = time.time() - t0
    wall = dt if wall is None else min(wall, dt)
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


def run_pair(n: int, corpus: str, repeats: int = 2) -> tuple:
    """Measure the (N, 4N) pair with INTERLEAVED repeats — lo, hi, lo, hi —
    so a sustained noisy-neighbor window on the shared host cannot sit on
    all passes of one level while missing the other (which would corrupt the
    efficiency ratio in either direction). Per-level result = min wall
    across repeats; digests must agree across every run."""
    los, his = [], []
    for _ in range(repeats):
        los.append(run_level(n, corpus))
        his.append(run_level(n * 4, corpus))
    lo = min(los, key=lambda r: r["wall_sec"])
    hi = min(his, key=lambda r: r["wall_sec"])
    identical = len({r["digest"] for r in los + his}) == 1 and len(
        {r["spans"] for r in los + his}
    ) == 1
    return lo, hi, identical


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=72000)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument(
        "--write",
        action="store_true",
        help="update BENCH/BASELINE.md (without this flag the run is a probe "
        "and the canonical report is left untouched)",
    )
    ap.add_argument(
        "--repeats",
        type=int,
        default=2,
        help="interleaved (lo, hi) pair repetitions; per-level min is reported",
    )
    ap.add_argument(
        "--secondary",
        action="store_true",
        help="with --write: also measure the 2N vs 8N saturation pair and "
        "include it in the report",
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

    lo, hi, identical = run_pair(args.n, corpus, repeats=args.repeats)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0

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

    sec = None
    if args.secondary:
        s_lo, s_hi, s_ident0 = run_pair(args.n * 2, corpus, repeats=1)
        s_eff = (s_hi["docs_per_sec"] / s_lo["docs_per_sec"]) / 4.0
        sec = (s_lo, s_hi, s_eff, s_ident0)

    secondary_md = ""
    if sec:
        s_lo, s_hi, s_eff, s_ident = sec
        secondary_md = f"""
## Secondary: N={args.n * 2} vs 4N={args.n * 8} (full-machine saturation)

| level | cores | wall (s) | throughput (docs/sec) |
|---|---|---|---|
| N  | {args.n * 2}  | {s_lo['wall_sec']:.1f} | {s_lo['docs_per_sec']:.1f} |
| 4N | {args.n * 8} | {s_hi['wall_sec']:.1f} | {s_hi['docs_per_sec']:.1f} |

Efficiency {s_eff:.2f}, outputs identical: {s_ident}. This pair saturates the
host: the box has 32 physical cores, and in local mode every Spark task runs
1 JVM thread + 1 Python worker process — at local[{args.n * 8}] that is ~{args.n * 16}
runnable processes on 32 cores, so the "4N" side is resource-starved in a way
real 4N *executors* (each with dedicated cores for their Python workers)
would not be. The {args.n}→{args.n * 4} pair keeps both levels un-starved and is
therefore the faithful proxy for the N→4N executor criterion; both are
reported for transparency.
"""

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling measurement (protocol: /root/repo/BASELINE.md)

Same extraction job (sniff → HTML/PDF normalize → hierarchy state machine →
normalized spans), same {args.docs}-doc deterministic corpus (seed 42,
heavy-tailed sizes incl. ~1.5% mega-laws), run at two local parallelism
levels in separate JVMs — the sandbox substitute for N vs 4N executors.
Measured by `tools/bench_scaling.py --write` (steady-state protocol: per
level, one full untimed warm-up pass per JVM — spawns the whole Python
worker pool and JITs the arrow/python-runner path — then min over three
timed passes; the (N, 4N) pair is additionally run as interleaved repeats
(lo, hi, lo, hi; per-level min across JVMs) so a sustained noisy-neighbor
window on the shared host cannot bias the efficiency ratio).

## Primary: N={args.n} vs 4N={args.n * 4}

| level | cores | wall (s) | throughput (docs/sec) |
|---|---|---|---|
| N  | {args.n}  | {lo['wall_sec']:.1f} | {lo['docs_per_sec']:.1f} |
| 4N | {args.n * 4} | {hi['wall_sec']:.1f} | {hi['docs_per_sec']:.1f} |

**Scaling efficiency = ({hi['docs_per_sec']:.1f} / {lo['docs_per_sec']:.1f}) / 4 = {eff:.3f}** —
target ≥ 0.8: **{"met" if eff >= 0.8 else "NOT met"}**.

Output-table digest identical at both levels (bit_xor of
xxhash64(doc_id, spans) + exact span counts): **{str(identical).lower()}** — correctness under
parallelism.
{secondary_md}
## Why this scales to 100 TB

The extraction plan contains **no exchange** (asserted by
`tests/test_spark_pipeline.py::test_plan_is_shuffle_free`): parallelism is
input-split-bound (row-group/file granularity on Iceberg), skew is bounded by
Arrow batch caps + optional weight-balanced salting
(`operators/salting.py`), and resume is an anti-join against completed bucket
lineage — nothing in the plan has a term that grows with cluster size except
the scan itself.
"""
        )
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
