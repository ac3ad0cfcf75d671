"""On-TPU validation + timing of the round-4 pack-stage compaction kernel.

Checks `compact_by_mask_pack` (sort-free in-kernel lane pack + MXU
permutation matmul) bit-for-bit against numpy on device, then times it
against the round-3 `compact_by_mask_stream` (blockwise pack-sort +
shingled concat) at flagship scale.  Reference strategy being beaten:
count-then-write exact offsets, hash_join.cpp:394-444.

Usage: PYTHONPATH=/root/.axon_site python scripts/profile_pack_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    from flash_hash_join_tpu.ops.pallas import stream_compact as sc

    # --- correctness on device ---
    rng = np.random.default_rng(7)
    for n, dens, V, bm in ((1_000_000, 0.6, 4, 256), (500_000, 0.05, 2, 256),
                           (262144, 1.0, 4, 256), (100_000, 0.0, 1, 256),
                           (777_777, 0.5, 4, 512)):
        mask = rng.random(n) < dens
        cols = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(V)]
        count, outs = sc.compact_by_mask_pack(
            jnp.asarray(mask), tuple(jnp.asarray(c) for c in cols),
            block_rows=bm)
        count = int(count)
        assert count == int(mask.sum()), (count, int(mask.sum()))
        for o, c in zip(outs, cols):
            np.testing.assert_array_equal(np.asarray(o)[:count], c[mask])
        log(f"OK n={n} dens={dens} V={V} bm={bm} count={count}")

    # --- timing: pack vs stream at 4e7, V in (2, 4) ---
    n = 40_000_000
    mask = jnp.asarray(rng.random(n) < 0.95)
    cols4 = tuple(jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
                  for _ in range(4))

    def timed(name, fn, V, reps=6, number=3):
        cols = cols4[:V]

        def scanned(m, *cs):
            def step(carry, i):
                cnt, outs = fn(m ^ (i & 1).astype(jnp.uint32), cs)
                return carry + cnt + outs[0][::4097].astype(jnp.int32).sum(), None
            tot, _ = jax.lax.scan(step, jnp.int32(0),
                                  jnp.arange(reps, dtype=jnp.uint32))
            return tot

        compiled = jax.jit(scanned).lower(mask.astype(jnp.uint32),
                                          *cols).compile()
        np.asarray(compiled(mask.astype(jnp.uint32), *cols))
        best = float("inf")
        for _ in range(number):
            t0 = time.perf_counter()
            np.asarray(compiled(mask.astype(jnp.uint32), *cols))
            best = min(best, time.perf_counter() - t0)
        per = best / reps
        print(f"{name:40s} {per*1e3:9.3f} ms  {per/n*1e9:7.3f} ns/row")

    for V in (2, 4):
        timed(f"stream (blockwise sort) V={V}",
              lambda m, cs: sc.compact_by_mask_stream(m, cs, n_out=n), V)
        for bm in (256, 512, 1024):
            timed(f"pack (sort-free) V={V} bm={bm}",
                  lambda m, cs, bm=bm: sc.compact_by_mask_pack(
                      m, cs, n_out=n, block_rows=bm), V)


if __name__ == "__main__":
    main()
