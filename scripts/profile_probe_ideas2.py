"""Microbench round 2: merge-join with doubling scan, trimmed builds,
and Pallas in-kernel dynamic gather feasibility."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_hash_join_tpu.ops.hashing import hash_u64
from flash_hash_join_tpu.ops.segmented import segmented_scan


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3:9.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return out, best


def main():
    n = 10_000_000
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    bk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    pk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    bkh = jnp.asarray((bk >> 32).astype(np.uint32)); bkl = jnp.asarray(bk.astype(np.uint32))
    pkh = jnp.asarray((pk >> 32).astype(np.uint32)); pkl = jnp.asarray(pk.astype(np.uint32))
    expected = int(np.isin(pk, np.unique(bk)).sum())

    # --- merge-join count via concat sort + doubling seg-OR ---
    def merge_count(bh, bl, ph, pl):
        ch = jnp.concatenate([bh, ph])
        cl = jnp.concatenate([bl, pl])
        flag = jnp.concatenate([
            jnp.zeros((n,), jnp.uint32), jnp.ones((n,), jnp.uint32)])
        hs, chs, cls, fs = jax.lax.sort(
            (hash_u64(ch, cl), ch, cl, flag), num_keys=3)
        newk = jnp.concatenate([
            jnp.ones((1,), jnp.bool_),
            (chs[1:] != chs[:-1]) | (cls[1:] != cls[:-1])])
        segid = jnp.cumsum(newk.astype(jnp.int32)) - 1
        isb = (fs == 0).astype(jnp.uint32)
        hasb = segmented_scan(lambda a, b: a | b, isb, segid)
        return jnp.sum(jnp.where(fs == 1, hasb, 0), dtype=jnp.uint32)

    out, _ = timeit("merge-join count 10Mx10M (no gather)",
                    jax.jit(merge_count), bkh, bkl, pkh, pkl)
    print("  merge count:", int(out), "expected:", expected, flush=True)

    # --- doubling seg-OR alone at 20M ---
    seg = jnp.asarray(np.sort(rng.integers(0, n, 2 * n)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 2**32, 2 * n, dtype=np.uint32))
    timeit("doubling seg-OR scan 20M",
           jax.jit(lambda v, s: jnp.sum(
               segmented_scan(lambda a, b: a | b, v, s), dtype=jnp.uint32)),
           vals, seg)

    # --- two-scatter build (count-mode: keys only) ---
    G = 8
    gbits = 22
    ntot = (1 << gbits) + 64
    from flash_hash_join_tpu.ops import hash_table as ht
    bvh = jnp.zeros((n,), jnp.uint32)
    build_novals = jax.jit(lambda a, b: ht.build_table(
        a, b, bvh, bvh, n, gbits=gbits, group_size=G,
        overflow_groups=64, with_bloom=False))
    timeit("build_table incl. vals (status quo)", build_novals, bkh, bkl)

    # dispatch floor
    one = jnp.ones((8,), jnp.uint32)
    timeit("dispatch floor (tiny op)", jax.jit(lambda x: x + 1), one)

    # --- Pallas: in-kernel dynamic gather from VMEM? ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 2048  # table rows in VMEM
    tab = jnp.arange(T, dtype=jnp.uint32)
    idx = jnp.asarray(rng.integers(0, T, 8 * 128, dtype=np.int32)).reshape(8, 128)

    def gather_kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]          # (T,) or (T,1)?
        ix = idx_ref[:]         # (8,128)
        out_ref[:] = t[ix]      # dynamic vector gather

    try:
        f = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = jax.block_until_ready(jax.jit(f)(tab, idx))
        ok = np.array_equal(np.asarray(got), np.asarray(tab)[np.asarray(idx)])
        print("PALLAS vector gather from VMEM: COMPILES, correct =", ok, flush=True)
    except Exception as e:
        print("PALLAS vector gather from VMEM: FAILED:", str(e)[:300], flush=True)

    # --- Pallas: brute-force compare probe (MXU/VPU saturation test) ---
    TB = 1024   # table block
    PB = 1024   # probe block
    tabk = jnp.asarray(rng.integers(0, 2**32, TB, dtype=np.uint32))
    probk = jnp.asarray(rng.integers(0, 2**32, PB, dtype=np.uint32))

    def bf_kernel(tab_ref, prob_ref, out_ref):
        t = tab_ref[:].reshape(1, TB)
        p = prob_ref[:].reshape(PB, 1)
        eq = (t == p)  # (PB, TB)
        out_ref[:] = jnp.sum(eq.astype(jnp.int32), axis=1, keepdims=True)

    try:
        f2 = pl.pallas_call(
            bf_kernel,
            out_shape=jax.ShapeDtypeStruct((PB, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got2 = jax.block_until_ready(jax.jit(f2)(tabk, probk))
        want2 = (np.asarray(probk)[:, None] == np.asarray(tabk)[None, :]).sum(1)
        print("PALLAS brute-force probe: COMPILES, correct =",
              np.array_equal(np.asarray(got2)[:, 0], want2), flush=True)
        _, t_bf = timeit("pallas brute-force 1024x1024", jax.jit(f2), tabk, probk)
    except Exception as e:
        print("PALLAS brute-force probe: FAILED:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
