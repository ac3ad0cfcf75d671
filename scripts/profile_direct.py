"""Device-time sweep of the dense-domain direct bitmap count strategy.

Measures fj.measure_device_seconds on J1 Q1/Q2-shaped cases across probe
sizes and domain spans, next to the adaptive non-direct path (forced via
strategy='partitioned'), to (a) validate the ~0.05-0.1 ns/row cost model
on hardware, (b) place the domain-cap crossover vs the blockwise path.

Usage: python scripts/profile_direct.py [--n 4e7]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=4e7)
    args = ap.parse_args()
    n = int(args.n)

    import numpy as np

    import flash_hash_join_tpu as fj

    fj.initialize()
    rng = np.random.default_rng(0)

    cases = []
    for name, nb in (("Q1", max(n // 1_000_000, 1)), ("Q2", n // 1_000),
                     ("Q5", n)):
        universe = max(int(nb * 1.1), 2)
        bk = rng.integers(0, universe, nb, dtype=np.uint64)
        bv = rng.integers(1, 101, nb, dtype=np.uint64)
        pk = rng.integers(0, universe, n, dtype=np.uint64)
        cases.append((name, bk, bv, pk))
    # domain-span sweep at fixed nb=40K: span 64K..1M (d_rows 16..256)
    for span_pow in (16, 18, 20):
        span = 1 << span_pow
        bk = rng.integers(0, span, 40_000, dtype=np.uint64)
        bv = rng.integers(1, 101, 40_000, dtype=np.uint64)
        pk = rng.integers(0, span, n, dtype=np.uint64)
        cases.append((f"span2^{span_pow}", bk, bv, pk))

    for name, bk, bv, pk in cases:
        for strat in ("direct", "partitioned"):
            try:
                c, dev, single, chained = fj.measure_device_seconds(
                    bk, bv, pk, mode="count", strategy=strat)
            except ValueError as e:
                print(f"RESULT,Case={name},Strategy={strat},SKIP={e}")
                continue
            nsrow = dev * 1e9 / len(pk)
            print(f"RESULT,Case={name},Build={len(bk)},Probe={len(pk)},"
                  f"Strategy={strat},Device={dev:.4f},Single={single:.4f},"
                  f"Chained={chained},NsPerRow={nsrow:.3f},Count={c}",
                  flush=True)


if __name__ == "__main__":
    main()
