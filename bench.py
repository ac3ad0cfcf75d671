"""Headline benchmark: count-only adaptive join throughput on the real chip.

Mirrors the reference's flagship measurement (BASELINE.md "derived anchors"):
adaptive_join_count on a Q5-shaped case (build rows == probe rows, uniform
uint64 keys, ~100% match rate like db-benchmark J1 big-table joins).
Baseline: reference CPU 4e7-Q5 count = 0.316 s ~= 127M probe rows/s
(benchmark_join_count.png, all cores).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "probe_rows_per_sec", "vs_baseline": N}
Diagnostics go to stderr.  Scale with --n (default 4e7 to match baseline).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_ROWS_PER_SEC = 4e7 / 0.316  # reference CPU anchor, 4e7-Q5 count


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40_000_000,
                    help="build rows == probe rows (Q5 shape)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    log("devices:", jax.devices())
    import flash_hash_join_tpu as fj
    fj.initialize()

    n = args.n
    rng = np.random.default_rng(2026)
    # db-benchmark J1 Q5: big-table join, keys ~ uniform over ~1.1*n range
    build_keys = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    build_values = rng.integers(0, 2**63, n, dtype=np.uint64)
    probe_keys = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    expected = None
    if n <= 10_000_000:  # oracle check only at sizes where numpy is quick
        expected = int(np.isin(probe_keys, np.unique(build_keys)).sum())

    # warmup (compile + first run)
    count, t = fj.adaptive_join_count(build_keys, build_values, probe_keys)
    log(f"warmup: count={count} t={t:.4f}s")
    if expected is not None:
        assert count == expected, (count, expected)

    best = float("inf")
    for i in range(args.repeats):
        c, t = fj.adaptive_join_count(build_keys, build_values, probe_keys)
        assert c == count
        best = min(best, t)
        log(f"run {i}: {t:.4f}s")

    rows_per_sec = n / best
    print(json.dumps({
        "metric": f"adaptive_join_count probe rows/s ({n/1e6:.0f}M build x "
                  f"{n/1e6:.0f}M probe, Q5 shape, incl. build)",
        "value": round(rows_per_sec),
        "unit": "probe_rows_per_sec",
        "vs_baseline": round(rows_per_sec / BASELINE_ROWS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
