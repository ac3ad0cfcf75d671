"""Device-time sweep of dense-domain MATERIALIZE vs the default route.

Calibrates the adaptive gates in ops/direct_bitmap.py (MAT_MIN_PROBE_ROWS,
MAT_STAGED_MIN_PROBE_ROWS, MAT_SCAN_MAX_V_ROWS) by measuring both bands of
direct_join_materialize against the engine's non-direct materialize route
on J1 Q1/Q2-shaped cases (the cells where the reference's count-then-write
exact-offset strategy, /root/reference/hash_join.cpp:394-444, was winning
0.57-0.88x in round 3).

Usage: python scripts/profile_dense_mat.py [--n 1e7 2e7 4e7] [--wide]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, nargs="+",
                    default=[1e7, 2e7, 4e7])
    ap.add_argument("--wide", action="store_true",
                    help="u64 values (two planes) instead of narrow u32")
    ap.add_argument("--strategies", nargs="+",
                    default=["direct", "adaptive"])
    args = ap.parse_args()

    import numpy as np

    import flash_hash_join_tpu as fj
    from flash_hash_join_tpu.ops import direct_bitmap as db

    fj.initialize()
    rng = np.random.default_rng(0)
    vmax = 2**45 if args.wide else 100

    for n_f in args.n:
        n = int(n_f)
        for name, nb in (("Q1", max(n // 1_000_000, 1)),
                         ("Q2", n // 1_000)):
            universe = max(int(nb * 1.1), 2)
            bk = rng.integers(0, universe, nb, dtype=np.uint64)
            bv = rng.integers(1, vmax + 1, nb, dtype=np.uint64)
            pk = rng.integers(0, universe, n, dtype=np.uint64)
            span = int(bk.max() - bk.min() + 1)
            v_rows = db.v_rows_for(span)
            band = ("scan" if v_rows <= db.MAT_SCAN_MAX_V_ROWS
                    else "staged")
            for strat in args.strategies:
                try:
                    c, dev, single, chained = fj.measure_device_seconds(
                        bk, bv, pk, mode="materialize", strategy=strat)
                except ValueError as e:
                    print(f"RESULT,Case={name},N={n},Strategy={strat},"
                          f"SKIP={e}", flush=True)
                    continue
                nsrow = dev * 1e9 / n
                print(f"RESULT,Case={name},N={n},Build={nb},VRows={v_rows},"
                      f"Band={band},Strategy={strat},Device={dev:.4f},"
                      f"Single={single:.4f},Chained={chained},"
                      f"NsPerRow={nsrow:.3f},Count={c}", flush=True)


if __name__ == "__main__":
    main()
