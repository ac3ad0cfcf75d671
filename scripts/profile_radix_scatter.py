"""Envelope measurement: one multi-stream radix-scatter pass on TPU.

The round-4 roofline (docs/DESIGN.md "Roofline / MFU") says the only
route past ~265M rows/s on structureless keys is a grouping primitive at
<0.5 ns/row/side, and names the candidate: a radix-scatter kernel with
>=8 concurrent DMA output streams per block sustaining >=1K-element
pieces, P~64-256 destinations per level, two levels to reach window
granularity.  This script BUILDS that pass and measures it end to end,
stage by stage:

  stage A  blockwise sort of M-element blocks by partition id (XLA
           vmapped lax.sort -- the only in-VMEM grouping primitive;
           there is no vertical dynamic addressing to histogram-scatter)
  stage B  per-(block, partition) run starts (vmapped searchsorted)
  stage C  Pallas scatter: per block, P concurrent async DMA copies of
           quota-padded runs (rounded to 128-lane rows) from the
           VMEM-staged sorted block to per-partition HBM regions

Reported per variant (M, P): stage-A-only, stage-C-only, full pass, and
the implied 2-level composition vs the 1.66 ns/row global-sort floor.
Piece size = M/P elements (the >=1K constraint binds which (M, P) are
legal).  Quota slack: uniform keys concentrate counts at M/P +- few
sigma; overflow rows are COUNTED (printed) so the envelope stays honest
-- a real integration would retry oversubscribed blocks.

Run: python scripts/profile_radix_scatter.py [--n 33554432] [--reps 8]
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_bench(name, fn, x, n_rows, reps, number=3):
    """Carry-chained steady-state: output feeds the next step's input
    (profile_roofline.py recipe -- cancels the flat axon dispatch)."""
    import jax
    import jax.numpy as jnp

    def chained(x):
        def step(c, i):
            out = fn(x ^ c)
            return jnp.max(out[-8:]) | i, None
        c, _ = jax.lax.scan(step, jnp.uint32(0),
                            jnp.arange(reps, dtype=jnp.uint32))
        return c

    compiled = jax.jit(chained).lower(x).compile()
    np.asarray(compiled(x))
    best = float("inf")
    for _ in range(number):
        t0 = time.perf_counter()
        np.asarray(compiled(x))
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(f"{name:52s} {per*1e3:9.3f} ms  {per/n_rows*1e9:7.3f} ns/row",
          flush=True)
    return per / n_rows * 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32 * 1024 * 1024)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--slack", type=float, default=1.25)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("devices:", jax.devices())
    n, reps = args.n, args.reps
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

    # -- reference floor: one global sort ---------------------------------
    if not args.variants or "global" in args.variants:
        chain_bench("global lax.sort u32 (floor)",
                    lambda v: jax.lax.sort((v,), num_keys=1,
                                           is_stable=False)[0], x, n, reps)

    def variant(M, P):
        """Build the full pass at block size M elements, P partitions."""
        blocks = n // M
        rows_per_block = M // 128
        pbits = int(math.log2(P))
        mean_rows = M // P // 128
        W = int(mean_rows * args.slack) + 2        # quota rows per piece
        out_rows = blocks * P * W

        def stage_a(v):
            b = v.reshape(blocks, M)
            (s,) = jax.lax.sort((b,), num_keys=1, is_stable=False,
                                dimension=1)
            return s

        def stage_b(s):
            # run starts per (block, partition), rounded DOWN to rows
            edges = (jnp.arange(P, dtype=jnp.uint32) << jnp.uint32(32 - pbits))
            starts = jax.vmap(
                lambda row: jnp.searchsorted(row, edges))(s)
            row_starts = (starts // 128).astype(jnp.int32)
            # overflow: rows needed beyond quota (envelope honesty)
            ends = jnp.concatenate(
                [row_starts[:, 1:],
                 jnp.full((blocks, 1), rows_per_block, jnp.int32)], axis=1)
            over = jnp.sum(jnp.maximum(ends - row_starts - (W - 2), 0))
            return row_starts, over

        def scatter_kernel(starts_ref, src_hbm, o_hbm, stage, sems):
            blk = pl.program_id(0)

            def body(read_sem):
                cp_in = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(blk * rows_per_block, rows_per_block)],
                    stage, read_sem)
                cp_in.start()
                cp_in.wait()
                for p in range(P):
                    src = jnp.minimum(starts_ref[blk, p],
                                      rows_per_block - W)
                    pltpu.make_async_copy(
                        stage.at[pl.ds(src, W)],
                        o_hbm.at[pl.ds(p * blocks * W + blk * W, W)],
                        sems.at[p],
                    ).start()
                for p in range(P):
                    src = jnp.minimum(starts_ref[blk, p],
                                      rows_per_block - W)
                    pltpu.make_async_copy(
                        stage.at[pl.ds(src, W)],
                        o_hbm.at[pl.ds(p * blocks * W + blk * W, W)],
                        sems.at[p],
                    ).wait()
            pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((rows_per_block, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((P,)),
            ],
        )
        pc = pl.pallas_call(
            scatter_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        def full(v):
            s = stage_a(v)
            row_starts, over = stage_b(s)
            out = pc(row_starts, s.reshape(-1, 128))
            return out[:, 0] + over.astype(jnp.uint32)

        def a_only(v):
            return stage_a(v).reshape(-1)

        def c_only(v):
            # pre-sorted input path: measures scatter alone (plus B)
            s = v.reshape(blocks, M)
            row_starts, _ = stage_b(s)
            return pc(row_starts, s.reshape(-1, 128))[:, 0]

        return a_only, c_only, full, W

    piece_min = 1024
    for M in (1 << 16, 1 << 18, 1 << 20):
        for P in (16, 64, 256):
            if M // P < piece_min or M > n:
                continue
            if args.variants and f"M{M}P{P}" not in args.variants \
                    and "all" not in args.variants:
                continue
            a_only, c_only, full, W = variant(M, P)
            label = f"M=2^{int(math.log2(M))} P={P} W={W}r"
            na = chain_bench(f"  {label} stageA sort", a_only, x, n, reps)
            nc = chain_bench(f"  {label} stageC scatter", c_only, x, n, reps)
            nf = chain_bench(f"  {label} FULL pass", full, x, n, reps)
            print(f"  => {label}: full={nf:.3f} ns/row; 2-level "
                  f"composition ~{2*nf*args.slack:.3f} (x{args.slack} "
                  f"slack-inflated L2) vs global-sort 1.66", flush=True)


if __name__ == "__main__":
    main()
