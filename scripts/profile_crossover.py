"""Direct-vs-partitioned crossover sweep over (nb, npr).

Round 4 routed every dense span in (2^20, 2^26] through the direct
dense-bitmap strategy based on a 4e7-probe sweep; the 1e7 J1 suite then
showed direct LOSING at nb=npr=1e7 (5.8 vs ~3.5 ns/row).  This script
measures the 2D (nb, npr) surface so the adaptive gate can route only
the measured win region.

Usage: python scripts/profile_crossover.py [--npr 1e7 2e7] [--nb 2.5e6 1e7]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npr", type=float, nargs="*",
                    default=[1e7, 2e7])
    ap.add_argument("--nb", type=float, nargs="*",
                    default=[2.5e6, 5e6, 1e7, 2e7])
    args = ap.parse_args()

    import numpy as np

    import flash_hash_join_tpu as fj

    fj.initialize()
    rng = np.random.default_rng(0)

    for npr_f in args.npr:
        npr = int(npr_f)
        for nb_f in args.nb:
            nb = int(nb_f)
            if nb > 4 * npr:
                print(f"SKIP,nb={nb},npr={npr},reason=nb>4*npr", flush=True)
                continue
            universe = int(nb * 1.1)
            if universe <= (1 << 20):
                # outside the large-direct band
                print(f"SKIP,nb={nb},npr={npr},reason=universe<=2^20",
                      flush=True)
                continue
            bk = rng.integers(0, universe, nb, dtype=np.uint64)
            bv = rng.integers(1, 101, nb, dtype=np.uint64)
            pk = rng.integers(0, universe, npr, dtype=np.uint64)
            row = [f"nb={nb}", f"npr={npr}"]
            for strat in ("direct", "partitioned"):
                try:
                    c, dev, single, chained = fj.measure_device_seconds(
                        bk, bv, pk, mode="count", strategy=strat)
                except ValueError as e:
                    row.append(f"{strat}=SKIP({e})")
                    continue
                row.append(f"{strat}={dev*1e9/npr:.3f}ns ({dev:.4f}s)")
            print("RESULT," + ",".join(row), flush=True)


if __name__ == "__main__":
    main()
