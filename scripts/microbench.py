"""Primitive microbenchmarks with in-graph repetition (round 2).

Round-1 profiling timed ONE dispatch per op through the axon TPU tunnel, so
per-call overhead polluted every number (e.g. "gather RANDOM idx" came out
faster than sorted).  Here every op runs REPS times inside one jitted
lax.scan, with the iteration counter xor'd into the inputs so XLA cannot
hoist the work out of the loop; per-rep time = (total - overhead) / REPS.

Usage: python scripts/microbench.py [--n 10000000] [--reps 8] [--only pat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, args, n_rows, reps, number=3):
    """fn(counter, *args) -> array; scan reps times, time best of `number`."""
    import jax
    import jax.numpy as jnp

    def scanned(*xs):
        def step(carry, i):
            out = fn(i, *xs)
            out = out[-1] if isinstance(out, tuple) else out
            # Position-weighted fold: plain sum is permutation-invariant, so
            # XLA hoists sorts/permutes out of the rep loop (burned us once).
            w = jnp.arange(out.size, dtype=jnp.uint32).reshape(out.shape)
            return carry + jnp.sum(out.astype(jnp.uint32) * (w ^ i)), None
        tot, _ = jax.lax.scan(step, jnp.uint32(0),
                              jnp.arange(reps, dtype=jnp.uint32))
        return tot

    compiled = jax.jit(scanned).lower(*args).compile()
    np.asarray(compiled(*args))  # warmup; VALUE fetch — under the axon
    best = float("inf")          # plugin block_until_ready does not block
    for _ in range(number):
        t0 = time.perf_counter()
        np.asarray(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    per_rep = best / reps
    print(f"{name:58s} {per_rep*1e3:9.3f} ms   {per_rep/n_rows*1e9:8.3f} ns/row")
    return per_rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    n = args.n
    reps = args.reps
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    b32 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

    def want(name):
        return args.only in name

    from flash_hash_join_tpu.ops.hashing import hash_u64

    if want("hash"):
        bench("hash_u64 (n)", lambda i, a, b: hash_u64(a ^ i, b),
              (a32, b32), n, reps)

    if want("sort"):
        def sort1(i, a):
            return jax.lax.sort((a ^ i,), num_keys=1, is_stable=False)[0]
        bench("lax.sort 1 col u32", sort1, (a32,), n, reps)

        def sort2(i, a, b):
            return jax.lax.sort((a ^ i, b), num_keys=1, is_stable=False)[1]
        bench("lax.sort 1 key + 1 payload", sort2, (a32, b32), n, reps)

        def sort_pid(i, a, b):
            pid = (a ^ i) >> jnp.uint32(25)  # 7-bit key
            return jax.lax.sort((pid, a, b), num_keys=1, is_stable=False)[1]
        bench("lax.sort 7-bit key + 2 payload", sort_pid, (a32, b32), n, reps)

        def sort5(i, a, b):
            return jax.lax.sort((a ^ i, b, a, b, a), num_keys=3,
                                is_stable=True)[1]
        bench("lax.sort 3-key 5-col stable", sort5, (a32, b32), n, reps)

    if want("argsortgather"):
        def sortidx_gather(i, a, b):
            pid = (a ^ i) >> jnp.uint32(25)
            idx = jnp.arange(n, dtype=jnp.uint32)
            _, idx_s = jax.lax.sort((pid, idx), num_keys=1, is_stable=False)
            return b[idx_s.astype(jnp.int32)]
        bench("argsort(7bit) + apply-gather 1 col", sortidx_gather,
              (a32, b32), n, reps)

    if want("scatter"):
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        def scat(i, a, p):
            out = jnp.zeros((n,), jnp.uint32)
            return out.at[p].set(a ^ i, mode="drop", unique_indices=True)
        bench("scatter set unique (n->n perm)", scat, (a32, perm), n, reps)

    if want("gather"):
        gidx = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
        def gath(i, a, g):
            return a[(g ^ jnp.int32(0)) + jnp.int32(0) + (i.astype(jnp.int32) % 2)]
        bench("gather elems random idx", gath, (a32, gidx), n, reps)

        tab = jnp.asarray(
            rng.integers(0, 2**32, (n // 8, 16), dtype=np.uint32))
        ridx = jnp.asarray(rng.integers(0, n // 8, n, dtype=np.int32))
        def gathrow(i, t, g):
            return t[g + (i.astype(jnp.int32) % 2)]
        bench("gather (n,16)u32 rows random idx", gathrow, (tab, ridx), n, reps)

    if want("scan"):
        bench("cumsum u32", lambda i, a: jnp.cumsum(a ^ i), (a32,), n, reps)
        bench("cummax i32",
              lambda i, a: jax.lax.cummax((a ^ i).astype(jnp.int32)),
              (a32,), n, reps)

    if want("pallas_copy"):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def copy_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + jnp.uint32(1)

        m = n // 128
        x2d = a32[: m * 128].reshape(m, 128)
        blk = 2048

        def pcopy(i, x):
            return pl.pallas_call(
                copy_kernel,
                grid=(m // blk,),
                in_specs=[pl.BlockSpec((blk, 128), lambda j: (j, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((blk, 128), lambda j: (j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, 128), jnp.uint32),
            )(x ^ i)
        bench("pallas stream copy (r+w) roofline", pcopy, (x2d,), m * 128, reps)

    log("done")


if __name__ == "__main__":
    main()
