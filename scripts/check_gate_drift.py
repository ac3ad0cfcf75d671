"""Gate-drift check: re-measure the adaptive crossover gates on hardware.

The adaptive tier's direct-vs-partitioned routing gates
(ops/direct_bitmap.py: LARGE_MIN_PROBE_ROWS / large_span_wins,
MAT_MIN_PROBE_ROWS / MAT_STAGED_MIN_PROBE_ROWS / mat_wins) encode
point-calibrated v5e sweeps (scripts/profile_crossover.py,
scripts/profile_dense_mat.py).  Any kernel change can silently invalidate
them.  This script re-measures one sentinel point on each side of every
gate and prints PASS/FAIL per gate:

  PASS  = the measured winner agrees with the gate's routing decision
          (within --tol slack, because a crossover point is by definition
          a near-tie).
  FAIL  = the gate routes to the measurably slower strategy by more than
          --tol; rerun the full sweep and recalibrate the constant.

Run it after any change to the dense-bitmap / dense-values / pack /
range-probe kernels or the blockwise sort.  Exit code 0 iff all PASS.

Usage: python scripts/check_gate_drift.py [--tol 0.15] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(fj, bk, bv, pk, mode, strategy):
    c, dev, single, chained = fj.measure_device_seconds(
        bk, bv, pk, mode=mode, strategy=strategy)
    return dev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=0.15,
                    help="relative slack before a disagreement FAILs")
    ap.add_argument("--quick", action="store_true",
                    help="halve the large-gate shapes (faster, noisier)")
    args = ap.parse_args()

    import numpy as np

    import flash_hash_join_tpu as fj
    from flash_hash_join_tpu.ops import direct_bitmap as db

    fj.initialize()
    rng = np.random.default_rng(0)
    scale = 2 if args.quick else 1

    # One sentinel point per side of each gate:
    #   (label, mode, nb, npr, gate_routes_direct)
    n_in = 40_000_000 // scale
    n_out = 16_000_000 // scale
    checks = [
        ("large_count_in", "count", n_in, n_in,
         db.large_span_wins(n_in, n_in)),
        ("large_count_out", "count", n_out, n_out,
         db.large_span_wins(n_out, n_out)),
        ("mat_scan_in", "materialize", 10_000, 10_000_000,
         db.mat_wins(db.v_rows_for(11_000), 10_000_000)),
        ("mat_scan_out", "materialize", 64, 4_096,
         db.mat_wins(8, 4_096)),
        ("mat_staged_in", "materialize", 40_000, 40_000_000,
         db.mat_wins(db.v_rows_for(44_000), 40_000_000)),
        ("mat_staged_out", "materialize", 40_000, 2_000_000,
         db.mat_wins(db.v_rows_for(44_000), 2_000_000)),
    ]

    failures = 0
    for label, mode, nb, npr, routes_direct in checks:
        universe = max(int(nb * 1.1), 2)
        bk = rng.integers(0, universe, nb, dtype=np.uint64)
        bv = rng.integers(1, 101, nb, dtype=np.uint64)
        pk = rng.integers(0, universe, npr, dtype=np.uint64)
        try:
            t_dir = _measure(fj, bk, bv, pk, mode, "direct")
        except ValueError as e:
            print(f"SKIP,{label},direct ineligible: {e}", flush=True)
            continue
        alt = "partitioned" if mode == "count" else "merge"
        t_alt = _measure(fj, bk, bv, pk, mode, alt)
        direct_wins = t_dir < t_alt
        agree = direct_wins == routes_direct
        margin = abs(t_dir - t_alt) / max(min(t_dir, t_alt), 1e-9)
        ok = agree or margin <= args.tol
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status},{label},nb={nb},npr={npr},direct={t_dir:.4f}s,"
              f"{alt}={t_alt:.4f}s,gate_routes="
              f"{'direct' if routes_direct else alt},"
              f"measured_winner={'direct' if direct_wins else alt},"
              f"margin={margin:.1%}", flush=True)

    print(f"{'PASS' if failures == 0 else 'FAIL'},total,"
          f"failures={failures}", flush=True)
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
