"""Headline benchmark: count-only adaptive join throughput on the real chip.

Mirrors the reference's flagship measurement (BASELINE.md "derived anchors"):
adaptive_join_count on a Q5-shaped case (build rows == probe rows, uniform
uint64 keys, ~100% match rate like db-benchmark J1 big-table joins).
Baseline: reference CPU 4e7-Q5 count = 0.316 s ~= 127M probe rows/s
(benchmark_join_count.png, all cores).

Measurement (round 3): the headline is STEADY-STATE DEVICE TIME, measured
by chaining K joins inside one compiled scan — each step xors both key
columns with a per-step constant (a key-space bijection, so the count is
invariant and asserted) — and reporting (t(K2)-t(K1))/(K2-K1).  This
cancels the ~31 ms flat dispatch+fetch overhead of this image's axon TPU
tunnel, which a real deployment does not pay per call and the reference's
in-process SimpleTimer never sees (hash_join.cpp:45-55 starts after pybind
marshaling).  The conventional single-call API time (which still includes
that tunnel overhead) is reported alongside in `single_call_seconds`.

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


def chained_device_seconds(bk, bv, pk, n, reps_pair=(2, 6), number=3):
    """Per-join device seconds via the chained-delta method (same graph the
    adaptive API dispatches for this shape: partitioned, narrow order)."""
    import jax
    import jax.numpy as jnp
    from flash_hash_join_tpu.ops import range_table as rt
    from flash_hash_join_tpu.utils import u64

    kh, kl = u64.split_u64(bk)
    ph, pl = u64.split_u64(pk)
    narrow = int(bk.max()) < 2**32 and int(pk.max()) < 2**32
    zeros_b = jnp.zeros((n,), jnp.uint32)

    def run(kl_, pl_, reps):
        def step(carry, i):
            # xor-remix both sides with the same constant: bijective on the
            # key space, so matches (and the count) are preserved exactly
            r = (i * jnp.uint32(0x9E3779B9)) ^ jnp.uint32(0x55AA55AA)
            cnt, special = rt.range_join_count(
                zeros_b, kl_ ^ r, zeros_b, zeros_b,
                jnp.zeros((pl_.shape[0],), jnp.uint32), pl_ ^ r,
                n, pl_.shape[0], narrow=narrow)
            return carry + cnt + special[3].astype(jnp.int32), None
        tot, _ = jax.lax.scan(step, jnp.int32(0),
                              jnp.arange(reps, dtype=jnp.uint32))
        return tot

    kl_d, pl_d = jnp.asarray(kl), jnp.asarray(pl)
    r1, r2 = reps_pair
    f1 = jax.jit(lambda a, b: run(a, b, r1)).lower(kl_d, pl_d).compile()
    f2 = jax.jit(lambda a, b: run(a, b, r2)).lower(kl_d, pl_d).compile()
    tot1 = int(np.asarray(f1(kl_d, pl_d)))
    tot2 = int(np.asarray(f2(kl_d, pl_d)))
    assert tot1 * r2 == tot2 * r1, (tot1, tot2)  # count invariant per step

    def best(f):
        b = float("inf")
        for _ in range(number):
            t0 = time.perf_counter()
            np.asarray(f(kl_d, pl_d))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(f1), best(f2)
    return (t2 - t1) / (r2 - r1), tot1 // r1


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

    # single-call API path (includes ~31 ms axon-tunnel dispatch overhead)
    count, t = fj.adaptive_join_count(build_keys, build_values, probe_keys)
    log(f"warmup: count={count} t={t:.4f}s")
    if expected is not None:
        assert count == expected, (count, expected)
    single = float("inf")
    for i in range(args.repeats):
        c, t = fj.adaptive_join_count(build_keys, build_values, probe_keys)
        assert c == count
        single = min(single, t)
        log(f"single-call run {i}: {t:.4f}s")

    dev_seconds, chained_count = chained_device_seconds(
        build_keys, build_values, probe_keys, n)
    assert chained_count == count, (chained_count, count)
    log(f"steady-state device time: {dev_seconds:.4f}s "
        f"(single-call best {single:.4f}s)")

    rows_per_sec = n / dev_seconds
    print(json.dumps({
        "metric": f"adaptive_join_count probe rows/s ({n/1e6:.0f}M build x "
                  f"{n/1e6:.0f}M probe, Q5 shape, incl. build; steady-state "
                  "device time via chained-delta, see docs/DESIGN.md "
                  "'Measurement-honesty note')",
        "value": round(rows_per_sec),
        "unit": "probe_rows_per_sec",
        "vs_baseline": round(rows_per_sec / BASELINE_ROWS_PER_SEC, 3),
        "device_seconds": round(dev_seconds, 4),
        "single_call_seconds": round(single, 4),
        "single_call_rows_per_sec": round(n / single),
    }))


if __name__ == "__main__":
    main()
