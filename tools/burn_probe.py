#!/usr/bin/env python
"""Ambient-load probe: N identical single-thread busy loops for `secs`;
reports per-worker throughput spread (max/min). On an idle dedicated host
the spread is ~1.0x; CPU steal from noisy neighbors shows up as a wide
spread — the context any scaling-efficiency reading must be interpreted
against (VERDICT r4 task 10).

    python tools/burn_probe.py [n_workers] [secs]
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(secs: float) -> int:
    end = time.time() + secs
    it = 0
    x = 1.0001
    while time.time() < end:
        for _ in range(10_000):
            x = x * 1.0000001 % 10.0
        it += 1
    return it


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    with mp.Pool(n) as pool:
        counts = pool.map(_burn, [secs] * n)
    spread = max(counts) / max(min(counts), 1)
    print(json.dumps({
        "n_workers": n, "secs": secs,
        "iters_min": min(counts), "iters_max": max(counts),
        "spread": round(spread, 3),
    }))


if __name__ == "__main__":
    main()
