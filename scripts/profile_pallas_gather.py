"""Decisive experiment: per-lane dynamic gather in Pallas on this toolchain.

Form A: jnp.take_along_axis(t, ix, axis=0), t (S,128), ix (B,128)
Form B: t[ix] fancy indexing 2D
Then: a realistic bucket-probe kernel — table (S,128) in VMEM, probe chunk
streamed, each probe key gathers its bucket row and compares — measuring
probes/sec with everything in one grid.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def timeit(name, fn, *args, reps=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return out, best


def try_form(name, kernel, t, ix, want):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(ix.shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = jax.block_until_ready(jax.jit(f)(t, ix))
        print(f"{name}: COMPILES correct={np.array_equal(np.asarray(got), want)}",
              flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:200]}", flush=True)
        return False


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    S = 4096
    t = jnp.asarray(rng.integers(0, 2**32, (S, 128), dtype=np.uint32))
    ix = jnp.asarray(rng.integers(0, S, (8, 128), dtype=np.int32))
    want = np.take_along_axis(np.asarray(t), np.asarray(ix), axis=0)

    def kA(t_ref, ix_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], ix_ref[:], axis=0)
    try_form("A take_along_axis (8,128)", kA, t, ix, want)

    ix_big = jnp.asarray(rng.integers(0, S, (256, 128), dtype=np.int32))
    want_big = np.take_along_axis(np.asarray(t), np.asarray(ix_big), axis=0)
    try_form("A take_along_axis (256,128)", kA, t, ix_big, want_big)

    # Realistic probe kernel: table (S,128) keys in VMEM; probe chunk (B,128)
    # keys + (B,128) precomputed row ids; count matches.
    n = 1 << 22  # 4M probes per call
    B = n // 128
    CH = 512  # rows per grid step
    pk = rng.integers(0, 2**32, (B, 128), dtype=np.uint32)
    prow = rng.integers(0, S, (B, 128), dtype=np.int32)

    def probe_kernel(tab_ref, pk_ref, pr_ref, out_ref):
        w = jnp.take_along_axis(tab_ref[:], pr_ref[:], axis=0)
        hit = (w == pk_ref[:]).astype(jnp.int32)
        out_ref[0, 0] = jnp.sum(hit)

    grid = (B // CH,)
    f = pl.pallas_call(
        probe_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
    )
    try:
        fn = jax.jit(lambda t_, k_, r_: jnp.sum(f(t_, k_, r_)))
        out, best = timeit("pallas probe 4M keys vs VMEM (S=4096)", fn,
                           t, jnp.asarray(pk), jnp.asarray(prow))
        print(f"  -> {n/ (best):,.0f} probe-gathers/s", flush=True)
    except Exception as e:
        print("probe kernel FAILED:", str(e)[:400], flush=True)


if __name__ == "__main__":
    main()
