"""Per-component timing on the real chip: where do the milliseconds go?

Run: python scripts/profile_components.py [--n 10000000]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_hash_join_tpu.ops import hash_table as ht
from flash_hash_join_tpu.ops.hashing import hash_u64
from flash_hash_join_tpu.utils import u64
from flash_hash_join_tpu.utils.config import DEFAULT_CONFIG as CFG


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:10.2f} ms")
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    args = ap.parse_args()
    n = args.n
    print("devices:", jax.devices())

    rng = np.random.default_rng(0)
    bk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    bv = rng.integers(0, 2**63, n, dtype=np.uint64)
    pk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    kh, kl = map(jnp.asarray, u64.split_u64(bk))
    vh, vl = map(jnp.asarray, u64.split_u64(bv))
    ph, pl = map(jnp.asarray, u64.split_u64(pk))
    jax.block_until_ready((kh, kl, vh, vl, ph, pl))

    gbits = CFG.group_bits(n)
    G = CFG.group_size
    ntot = (1 << gbits) + CFG.overflow_groups
    print(f"n={n} gbits={gbits} ngroups={1<<gbits} ntot={ntot} slots={ntot*G}")

    timeit("hash", jax.jit(lambda a, b: hash_u64(a, b)), kh, kl)

    sort5 = jax.jit(lambda h, a, b, c, d: jax.lax.sort((h, a, b, c, d), num_keys=3, is_stable=True))
    h = hash_u64(kh, kl)
    home = (h >> jnp.uint32(32 - gbits)).astype(jnp.uint32)
    timeit("sort 5-operand num_keys=3", sort5, home, kh, kl, vh, vl)

    sort2 = jax.jit(lambda h, i: jax.lax.sort((h, i), num_keys=1, is_stable=True))
    idx = jnp.arange(n, dtype=jnp.uint32)
    timeit("sort 2-operand num_keys=1", sort2, home, idx)

    timeit("cummax", jax.jit(lambda x: jax.lax.cummax(x)), home.astype(jnp.int32))

    # scatter n values into ntot*2G flat table
    tgt = jnp.zeros((ntot * 2 * G,), jnp.uint32)
    sl = jnp.asarray(rng.permutation(np.arange(n)).astype(np.int32))  # unique random
    timeit("scatter n->table (set, unique)",
           jax.jit(lambda t, i, v: t.at[i].set(v, mode="drop", unique_indices=True)),
           tgt, sl, kh)

    # gather rows (chunked like probe): (n,) random group ids -> (n, 2G)
    tab2d = jnp.zeros((ntot, 2 * G), jnp.uint32)
    gidx = jnp.asarray(rng.integers(0, ntot, n, dtype=np.int32))

    def gather_rows(tab, g):
        return jnp.sum(tab[g], dtype=jnp.uint32)
    timeit("gather (n,16) rows one-shot", jax.jit(gather_rows), tab2d, gidx)

    def gather_scalar(tab_flat, g):
        return jnp.sum(tab_flat[g], dtype=jnp.uint32)
    timeit("gather (n,) elements one-shot", jax.jit(gather_scalar),
           tab2d.reshape(-1), gidx)

    # full build
    build = jax.jit(lambda a, b, c, d: ht.build_table(
        a, b, c, d, n, gbits=gbits, group_size=G,
        overflow_groups=CFG.overflow_groups, with_bloom=False))
    table, _ = timeit("build_table (no bloom)", build, kh, kl, vh, vl)

    build_b = jax.jit(lambda a, b, c, d: ht.build_table(
        a, b, c, d, n, gbits=gbits, group_size=G,
        overflow_groups=CFG.overflow_groups, with_bloom=True))
    timeit("build_table (bloom)", build_b, kh, kl, vh, vl)

    static = dict(gbits=gbits, group_size=G, total_groups=ntot,
                  use_bloom=False, bloom_k=CFG.bloom_k,
                  max_iters=CFG.max_probe_iters)
    probe = jax.jit(lambda t, a, b: ht.probe_count(
        t, a, b, n, probe_chunk=CFG.probe_chunk, **static))
    timeit("probe_count (chunk=1M)", probe, table, ph, pl)

    for chunk in (1 << 18, 1 << 22, n):
        probe_c = jax.jit(lambda t, a, b, c=chunk: ht.probe_count(
            t, a, b, n, probe_chunk=c, **static))
        timeit(f"probe_count (chunk={chunk})", probe_c, table, ph, pl)

    # single unrolled window round, no while loop: how much is loop overhead?
    def one_round(tab, a, b):
        h = hash_u64(a, b)
        g = (h >> jnp.uint32(32 - gbits)).astype(jnp.int32)
        w = tab[g]
        eq = (w[:, :G] == a[:, None]) & (w[:, G:] == b[:, None])
        return jnp.sum(jnp.any(eq, axis=1))
    timeit("probe lower bound: 1 gather round", jax.jit(one_round),
           table.keys, ph, pl)


if __name__ == "__main__":
    main()
