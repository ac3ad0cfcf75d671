"""Round-3 materialize measurement on the real chip.

Measures steady-state device seconds (fj.measure_device_seconds) for the
flagship materialize shapes from VERDICT round 2:
  - 4e7 x 4e7 J1-shaped (values < 2^32, narrow-value specialization)
  - 4e7 x 4e7 with full 64-bit values
  - 1e7-Q5 shape (1e7 x 1e7)
Reference CPU anchors (BASELINE.md): 4e7-Q5 adaptive materialize 0.444 s,
1e7-Q5 0.081 s.

Usage: PYTHONPATH=/root/.axon_site python scripts/measure_materialize.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    import flash_hash_join_tpu as fj
    fj.initialize()

    rng = np.random.default_rng(2026)
    for name, n, vbits in (("1e7-Q5-j1vals", 10_000_000, 31),
                           ("4e7-Q5-j1vals", 40_000_000, 31),
                           ("4e7-Q5-u64vals", 40_000_000, 63)):
        bk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
        bv = rng.integers(0, 2**vbits, n, dtype=np.uint64)
        pk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
        count, dev, single, chained = fj.measure_device_seconds(
            bk, bv, pk, mode="materialize", reps=3, number=3)
        print(f"{name}: count={count} device={dev:.4f}s "
              f"single={single:.4f}s chained={chained} "
              f"({n/dev/1e6:.1f}M rows/s)", flush=True)


if __name__ == "__main__":
    main()
