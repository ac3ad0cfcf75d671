"""Roofline validation (round 3, VERDICT item 1).

Round 2 concluded "streaming pass ~0.37 ns/row => ~50 GB/s effective BW" and
ranked every design decision against that.  But the round-2 recipe wrapped the
op as  sum((f(x ^ i)) * (w ^ i))  — the xor pass and the weighted-sum fold are
each a full streaming pass themselves, so the "copy" number billed ~3 passes
as one.

This script measures each primitive as a CARRY-CHAINED scan step: the op's
output IS the next step's input, so XLA can neither hoist nor CSE it, and the
step contains nothing but the op.  per-step time = (t(reps=R2) - t(reps=R1))
/ (R2 - R1), which also cancels the flat axon-tunnel fetch overhead (~25 ms).

Usage: PYTHONPATH=/root/.axon_site python scripts/profile_roofline.py
       [--n 100000000] [--only pat]
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


def bench_chain(name, step_fn, x0, n_rows, bytes_per_row, reps_pair=(8, 40),
                number=3):
    """step_fn(carry_array) -> array of same shape/dtype.  Chained scan."""
    import jax
    import jax.numpy as jnp

    def run(x, reps):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        # Fold to ONE scalar so the fetch is tiny; scalar blocks truthfully.
        return jnp.sum(out.astype(jnp.uint32))

    r1, r2 = reps_pair
    f1 = jax.jit(lambda x: run(x, r1)).lower(x0).compile()
    f2 = jax.jit(lambda x: run(x, r2)).lower(x0).compile()
    np.asarray(f1(x0)); np.asarray(f2(x0))  # warmup both

    def best_of(f):
        best = float("inf")
        for _ in range(number):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = best_of(f1), best_of(f2)
    per_step = (t2 - t1) / (r2 - r1)
    ns_row = per_step / n_rows * 1e9
    gbs = bytes_per_row * n_rows / per_step / 1e9
    print(f"{name:52s} {per_step*1e3:9.3f} ms/step {ns_row:8.4f} ns/row "
          f"{gbs:8.1f} GB/s", flush=True)
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("devices:", jax.devices())
    m = max(args.n // 128 // 8192, 1) * 8192  # divisible by every blk below
    n = m * 128
    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.integers(0, 2**32, (m, 128), dtype=np.uint32))

    def want(s):
        return args.only in s

    # --- 1. XLA elementwise pass (x+1): the compiler's own streaming pass ---
    if want("xla_add"):
        bench_chain("XLA x+1 (r8B+w4B? fused=r4+w4)", lambda c: c + 1,
                    x2d, n, 8, (8, 40))

    # --- 2. Pallas grid-pipelined copy at several block heights ---
    if want("pallas_copy"):
        def copy_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + jnp.uint32(1)

        for blk in (512, 2048, 8192):
            if m % blk:
                continue
            def pcopy(c, blk=blk):
                return pl.pallas_call(
                    copy_kernel,
                    grid=(m // blk,),
                    in_specs=[pl.BlockSpec((blk, 128), lambda j: (j, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((blk, 128), lambda j: (j, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((m, 128), jnp.uint32),
                )(c)
            bench_chain(f"pallas copy blk={blk} (r4B+w4B)", pcopy, x2d, n, 8)

    # --- 3. Pallas read-only pass (sum per block): r4B only ---
    if want("pallas_read"):
        def rsum_kernel(x_ref, o_ref):
            o_ref[0, :] = jnp.sum(x_ref[:], axis=0)

        blk = 2048
        def pread(c):
            s = pl.pallas_call(
                rsum_kernel,
                grid=(m // blk,),
                in_specs=[pl.BlockSpec((blk, 128), lambda j: (j, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128), lambda j: (j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m // blk, 128), jnp.uint32),
            )(c)
            # fold the tiny sums back into the carry shape cheaply:
            return c + jnp.sum(s)
        # NOTE: the c + scalar re-broadcast is itself a pass (r4+w4); report
        # raw and subtract the xla_add cost mentally.
        bench_chain("pallas blocksum + rebroadcast (r4+w4 +r4)", pread,
                    x2d, n, 12)

    # --- 4. lax.sort chained (LCG remix keeps data random) ---
    if want("sort"):
        def srt(c):
            c = c * jnp.uint32(1664525) + jnp.uint32(1013904223)
            return jax.lax.sort((c.reshape(-1),), num_keys=1,
                                is_stable=False)[0].reshape(m, 128)
        bench_chain("LCG remix + lax.sort 1-col u32", srt, x2d, n, 8,
                    (2, 8), number=2)

    if want("sort_payload"):
        def srtp(c):
            k = c * jnp.uint32(1664525) + jnp.uint32(1013904223)
            kk = k.reshape(-1)
            out = jax.lax.sort((kk, kk ^ jnp.uint32(0xDEADBEEF)),
                               num_keys=1, is_stable=False)[1]
            return out.reshape(m, 128)
        bench_chain("LCG remix + lax.sort 1key+1payload", srtp, x2d, n, 8,
                    (2, 8), number=2)

    # --- 5. blockwise (vmapped) sort at several block sizes M ---
    if want("bsort"):
        for M in (8192, 65536, 262144, 2097152):
            nb = max(n // M, 1)
            xb = jnp.asarray(rng.integers(0, 2**32, (nb, M),
                                          dtype=np.uint32))
            def bs(c):
                k = c * jnp.uint32(1664525) + jnp.uint32(1013904223)
                return jax.lax.sort((k,), num_keys=1, is_stable=False,
                                    dimension=1)[0]
            bench_chain(f"LCG + blockwise sort M={M} 1-col", bs, xb,
                        nb * M, 8, (2, 8), number=2)

    if want("bsort_payload"):
        for M in (65536, 2097152):
            nb = max(n // M, 1)
            xb = jnp.asarray(rng.integers(0, 2**32, (nb, M),
                                          dtype=np.uint32))
            def bsp(c):
                k = c * jnp.uint32(1664525) + jnp.uint32(1013904223)
                return jax.lax.sort((k, k ^ jnp.uint32(0xABCD)), num_keys=1,
                                    is_stable=False, dimension=1)[1]
            bench_chain(f"LCG + blockwise sort M={M} +1 payload", bsp, xb,
                        nb * M, 8, (2, 8), number=2)

    # --- 6. does dtype change sort cost? ---
    if want("sort_dtype"):
        def srt16(c):
            k = (c * jnp.uint32(1664525) + jnp.uint32(1013904223))
            k16 = (k >> jnp.uint32(16)).astype(jnp.uint16).reshape(-1)
            out = jax.lax.sort((k16,), num_keys=1, is_stable=False)[0]
            return (out.astype(jnp.uint32).reshape(m, 128) ^ c)
        bench_chain("LCG + lax.sort 1-col u16 (+casts)", srt16, x2d, n, 8,
                    (2, 8), number=2)

        def srtf(c):
            k = (c * jnp.uint32(1664525) + jnp.uint32(1013904223))
            kf = (k >> jnp.uint32(8)).astype(jnp.float32).reshape(-1)
            out = jax.lax.sort((kf,), num_keys=1, is_stable=False)[0]
            return out.astype(jnp.uint32).reshape(m, 128) ^ c
        bench_chain("LCG + lax.sort 1-col f32 (+casts)", srtf, x2d, n, 8,
                    (2, 8), number=2)

    log("done")


if __name__ == "__main__":
    main()
