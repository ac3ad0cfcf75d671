"""End-to-end benchmark + parity harness (reference benchmark.py equivalent).

Parity with the reference harness's structure (SURVEY.md §2 C14): suite
discovery from db-benchmark J1 CSVs (--data-dir) OR native generated suites
(--gen N, replacing generate-data.sh's R dependency), all engine
implementations run for count + materialize, machine-parseable
`RESULT,Library=...,Task=...,Threads=...,Time=...,Result=...` lines, and an
oracle cross-check — upgraded from the reference's eyeball-comparison to hard
assertions (exit 1 on any count divergence).

The oracle is numpy (np.isin) or the native C++ host oracle when built
(csrc/, much faster at scale).  DuckDB is not available in this image; the
numpy/C++ oracle plays its role.

Usage:
  python benchmark.py --gen 1e7            # generated J1-shaped suite
  python benchmark.py --data-dir ./data    # db-benchmark CSVs if present
  python benchmark.py --gen 1e6 --impls adaptive_join flash_join
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np


def log(*a):
    print(*a, flush=True)


def run_one(label: str, task: str, fn, oracle_count: int, results: list):
    t0 = time.perf_counter()
    count, core = fn()
    total = time.perf_counter() - t0
    ok = count == oracle_count
    log(f"    RESULT,Library={label},Task={task},Threads=1,"
        f"Time={total:.4f},Core={core:.4f},Result={count}")
    if not ok:
        log(f"    PARITY FAILURE: {label}/{task}: got {count}, oracle {oracle_count}")
    results.append(
        {"label": label, "task": task, "total": total, "core": core,
         "count": count, "ok": ok})
    return ok


def load_csv_suites(data_dir: str):
    """Discover db-benchmark J1 CSV suites (same layout the reference scans)."""
    import pandas as pd
    suites = []
    groups = defaultdict(dict)
    for f in glob.glob(os.path.join(data_dir, "J1_*.csv")):
        m = re.match(r"J1_(\de\d+)_(.+)_0_0\.csv", os.path.basename(f))
        if not m:
            continue
        groups[m.group(1)][m.group(2)] = f
    for gname, files in sorted(groups.items()):
        base = gname[0]
        need = {"x": gname, "small": f"{base}e1", "medium": f"{base}e4",
                "big": f"{base}e7"}
        if not all(v in files for v in need.values()):
            continue
        tables = {}
        for role, key in need.items():
            tables[role] = pd.read_csv(files[key])
        cases = []
        for qid, right, keycol in (("Q1", "small", "id1"),
                                   ("Q2", "medium", "id2"),
                                   ("Q5", "big", "id3")):
            bdf, pdf = tables[right], tables["x"]
            if keycol not in bdf or keycol not in pdf or "v2" not in bdf:
                continue
            cases.append((f"{gname}-{qid}",
                          bdf[keycol].to_numpy().astype(np.uint64),
                          bdf["v2"].to_numpy().astype(np.uint64),
                          pdf[keycol].to_numpy().astype(np.uint64)))
        suites.append((gname, cases))
    return suites


def gen_suites(n: int, seed: int):
    from flash_hash_join_tpu.models.workload import j1_suite
    cases = [(c.name, c.build_keys, c.build_values, c.probe_keys)
             for c in j1_suite(n, seed)]
    return [(f"{n:.0e}".replace("+", ""), cases)]


def oracle(bk, pk) -> int:
    try:
        from flash_hash_join_tpu.utils.native import host_join_count
        return host_join_count(bk, pk)
    except Exception:
        return int(np.isin(pk, np.unique(bk)).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", type=str, default=None)
    ap.add_argument("--gen", type=float, default=None,
                    help="generate a J1-shaped suite with this many probe rows")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--impls", nargs="*", default=None)
    args = ap.parse_args()

    import flash_hash_join_tpu as fj
    fj.initialize()
    log("flash_hash_join_tpu initialized.")

    if args.data_dir:
        suites = load_csv_suites(args.data_dir)
    elif args.gen:
        suites = gen_suites(int(args.gen), args.seed)
    else:
        suites = gen_suites(1_000_000, args.seed)
    if not suites:
        log("No suites found.")
        sys.exit(1)

    impl_map = {
        "adaptive_join": (fj.adaptive_join_count, fj.adaptive_join),
        "adaptive_bloom": (fj.adaptive_join_count_bloom, fj.adaptive_join_bloom),
        "flash_join": (fj.hash_join_count, fj.hash_join),
        "flash_join_radix": (fj.hash_join_count_radix, fj.hash_join_radix),
        "flash_join_bloom": (fj.hash_join_count_bloom, fj.hash_join_bloom),
        "flash_join_radix_bloom": (fj.hash_join_count_radix_bloom,
                                   fj.hash_join_radix_bloom),
    }
    if args.impls:
        impl_map = {k: v for k, v in impl_map.items() if k in args.impls}

    results = []
    all_ok = True
    for gname, cases in suites:
        log("=" * 70)
        log(f"Suite {gname}")
        for case_id, bk, bv, pk in cases:
            expected = oracle(bk, pk)
            log(f"-- case {case_id}: build={len(bk)} probe={len(pk)} "
                f"oracle_count={expected}")
            for label, (count_fn, mat_fn) in impl_map.items():
                all_ok &= run_one(label, "join_count",
                                  lambda f=count_fn: f(bk, bv, pk),
                                  expected, results)
                all_ok &= run_one(label, "join_materialize",
                                  lambda f=mat_fn: f(bk, bv, pk),
                                  expected, results)

    log("=" * 70)
    n_fail = sum(1 for r in results if not r["ok"])
    log(f"{len(results)} runs, {n_fail} parity failures")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
