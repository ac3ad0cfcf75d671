"""Profile the primitives the partitioned-join design depends on (round 2).

Decisions this feeds (see ops/partition.py):
  * in-block grouping: XLA vmapped per-block sort vs global sort — cost/row?
  * Pallas W-window dynamic-offset DMA writes: per-DMA overhead at F
    copies per block?
  * bucket-probe kernel cost at R in {64,128,256,512} — sets the target
    partition size (keys per partition ~ 64*R at load 0.5).

Run: python scripts/profile_partition_prims.py [--n 8388608] [--reps 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, make_compiled, args, n_rows, reps, number=3):
    import numpy as _np
    compiled = make_compiled(*args)
    _np.asarray(compiled(*args))  # warmup; VALUE fetch — block_until_ready
    best = float("inf")           # does not actually block under axon
    for _ in range(number):
        t0 = time.perf_counter()
        _np.asarray(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    per_rep = best / reps
    print(f"{name:58s} {per_rep*1e3:9.3f} ms   {per_rep/n_rows*1e9:8.3f} ns/row",
          flush=True)
    return per_rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8 * 1024 * 1024)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("devices:", jax.devices())
    n, reps = args.n, args.reps
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    b32 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

    def want(name):
        return args.only in name

    def scan_jit(fn, *xs):
        def scanned(*xs):
            def step(c, i):
                out = fn(i, *xs)
                out = out[-1] if isinstance(out, tuple) else out
                w = jnp.arange(out.size, dtype=jnp.uint32).reshape(out.shape)
                return c + jnp.sum(out.astype(jnp.uint32) * (w ^ i)), None
            tot, _ = jax.lax.scan(step, jnp.uint32(0),
                                  jnp.arange(reps, dtype=jnp.uint32))
            return tot
        return jax.jit(scanned).lower(*xs).compile()

    # ---- blockwise vmapped sort vs global sort --------------------------
    if want("blocksort"):
        for M in (2048, 8192, 32768):
            nb = n // M
            def bsort(i, a, b, M=M, nb=nb):
                pid = ((a ^ i) >> jnp.uint32(25)).reshape(nb, M)
                pay = b.reshape(nb, M)
                _, out = jax.lax.sort((pid, pay), num_keys=1,
                                      is_stable=False, dimension=1)
                return out.reshape(-1)
            bench(f"blockwise sort M={M} 7bit key+1 payload",
                  lambda a, b: scan_jit(bsort, a, b), (a32, b32), n, reps)

    # ---- Pallas: W-window dynamic-offset DMA writes ---------------------
    # Emulates the partition scatter's write pattern: per block, F async
    # copies of W rows each from VMEM staging to dynamic offsets in HBM.
    if want("dma"):
        M_ROWS = 2048                      # staging rows per block (x128 lanes)
        # W (rows per copy) = M_ROWS//F: measures pure per-DMA issue
        # overhead at each fan-out without overlapping the staging slices
        for F, W in ((16, 128), (64, 32), (128, 16), (256, 8)):
            blocks = n // (M_ROWS * 128)
            if blocks == 0:
                continue
            # per (block, f) destination row offsets, precomputed on host:
            # partition regions stride so writes never collide.
            dest = np.zeros((blocks, F), np.int32)
            region = blocks * (M_ROWS // F) + W
            for f in range(F):
                dest[:, f] = f * region + np.arange(blocks) * (M_ROWS // F)
            dest_j = jnp.asarray(dest)
            out_rows = F * region
            x2d = a32[: blocks * M_ROWS * 128].reshape(blocks * M_ROWS, 128)

            def kernel(dest_ref, x_hbm, o_hbm, stage, sems):
                blk = pl.program_id(0)

                def body(read_sem):
                    cp_in = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(blk * M_ROWS, M_ROWS)], stage, read_sem)
                    cp_in.start()
                    cp_in.wait()
                    for f in range(F):
                        off = dest_ref[blk, f]
                        cp = pltpu.make_async_copy(
                            stage.at[pl.ds(f * (M_ROWS // F), W)],
                            o_hbm.at[pl.ds(off, W)],
                            sems.at[f],
                        )
                        cp.start()
                    for f in range(F):
                        pltpu.make_async_copy(
                            stage.at[pl.ds(f * (M_ROWS // F), W)],
                            o_hbm.at[pl.ds(0, W)],
                            sems.at[f],
                        ).wait()
                pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(blocks,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[
                    pltpu.VMEM((M_ROWS, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA((F,)),
                ],
            )
            pc = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )

            def dma_fn(i, d, x):
                return pc(d, x)[:8]
            nrows_eff = blocks * M_ROWS * 128
            bench(f"pallas {F} dma copies/blk W={W} rows (+1 read)",
                  lambda d, x: scan_jit(dma_fn, d, x), (dest_j, x2d),
                  nrows_eff, reps)

    # ---- Pallas: bucket probe at large R --------------------------------
    if want("probe"):
        from flash_hash_join_tpu.ops.pallas import bucket_probe as bp
        for R in (32, 64, 128, 256, 512):
            tab_h = jnp.asarray(
                rng.integers(0, 2**32, (R, 128), dtype=np.uint32))
            tab_l = jnp.asarray(
                rng.integers(0, 2**32, (R, 128), dtype=np.uint32))
            m = n // 128
            ph = a32[: m * 128].reshape(m, 128)
            pl_ = b32[: m * 128].reshape(m, 128)
            pbkt = jnp.asarray(
                rng.integers(0, 128, (m, 128), dtype=np.int32))

            def probe_fn(i, th, tl, p1, p2, bk, R=R):
                return bp.probe_count_vmem(th, tl, p1 ^ i, p2, bk,
                                           r_slots=R)[None]
            bench(f"bucket probe kernel R={R}",
                  lambda *xs: scan_jit(probe_fn, *xs),
                  (tab_h, tab_l, ph, pl_, pbkt), m * 128, reps)

    # ---- Pallas: in-kernel histogram compare loop -----------------------
    if want("hist"):
        for F in (32, 64, 128):
            M_ROWS = 2048
            blocks = n // (M_ROWS * 128)
            x2d = a32[: blocks * M_ROWS * 128].reshape(blocks * M_ROWS, 128)

            def hist_kernel(x_ref, o_ref, F=F):
                pid = x_ref[:] >> jnp.uint32(32 - F.bit_length() + 1)
                acc = jnp.zeros((8, 128), jnp.int32)
                for f in range(F):
                    acc += jnp.sum(
                        jnp.where(pid == jnp.uint32(f), 1, 0)
                    ) * jnp.where(
                        (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
                        & (jax.lax.broadcasted_iota(
                            jnp.int32, (8, 128), 1) == f % 128), 1, 0)
                o_ref[:] = acc

            def hist_fn(i, x, F=F, blocks=blocks):
                return pl.pallas_call(
                    functools.partial(hist_kernel),
                    grid=(blocks,),
                    in_specs=[pl.BlockSpec((M_ROWS, 128), lambda j: (j, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((8, 128), lambda j: (j, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((blocks * 8, 128),
                                                   jnp.int32),
                )(x ^ i)
            bench(f"pallas histogram compare-loop F={F}",
                  lambda x: scan_jit(hist_fn, x), (x2d,),
                  blocks * M_ROWS * 128, reps)

    log("done")


if __name__ == "__main__":
    main()
