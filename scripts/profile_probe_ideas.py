"""Microbench: candidate probe designs on the real chip.

Q: random gather is ~145ms/10M — does sorting the probe side make gathers
coherent/cheap?  How does a no-gather concat-sort merge join compare?
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_hash_join_tpu.ops.hashing import hash_u64


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:10.2f} ms", flush=True)
    return out, best


def main():
    n = 10_000_000
    ntot = 4_194_368
    G = 8
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    tab = jnp.zeros((ntot, 2 * G), jnp.uint32)
    gidx_rand = jnp.asarray(rng.integers(0, ntot, n, dtype=np.int32))
    gidx_sorted = jnp.asarray(np.sort(np.asarray(gidx_rand)))

    f = jax.jit(lambda t, g: jnp.sum(t[g], dtype=jnp.uint32))
    timeit("gather rows RANDOM idx", f, tab, gidx_rand)
    timeit("gather rows SORTED idx", f, tab, gidx_sorted)

    tab_flat = tab.reshape(-1)
    fe = jax.jit(lambda t, g: jnp.sum(t[g], dtype=jnp.uint32))
    timeit("gather elems SORTED idx", fe, tab_flat, gidx_sorted)

    # sort + gather + scatter-back (full sorted-probe pipeline cost)
    def sorted_probe(t, g):
        gi, orig = jax.lax.sort((g.astype(jnp.uint32),
                                 jnp.arange(n, dtype=jnp.uint32)), num_keys=1)
        w = t[gi.astype(jnp.int32)]
        hit = (w[:, 0] == jnp.uint32(1))
        # scatter hits back to original positions (materialize-order cost)
        out = jnp.zeros((n,), jnp.uint32)
        out = out.at[orig.astype(jnp.int32)].set(
            hit.astype(jnp.uint32), unique_indices=True)
        return jnp.sum(out, dtype=jnp.uint32)
    timeit("sort+gather+scatterback", jax.jit(sorted_probe), tab, gidx_rand)

    def sorted_probe_count(t, g):
        gi = jax.lax.sort((g.astype(jnp.uint32),), num_keys=1)[0]
        w = t[gi.astype(jnp.int32)]
        return jnp.sum((w[:, 0] == jnp.uint32(1)), dtype=jnp.uint32)
    timeit("sort+gather (count only)", jax.jit(sorted_probe_count), tab, gidx_rand)

    # concat-sort merge join count (no table, no gather)
    bk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    pk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    bkh = jnp.asarray((bk >> 32).astype(np.uint32)); bkl = jnp.asarray(bk.astype(np.uint32))
    pkh = jnp.asarray((pk >> 32).astype(np.uint32)); pkl = jnp.asarray(pk.astype(np.uint32))

    def merge_count(bh, bl, ph, pl):
        ch = jnp.concatenate([bh, ph])
        cl = jnp.concatenate([bl, pl])
        flag = jnp.concatenate([
            jnp.zeros((n,), jnp.uint32), jnp.ones((n,), jnp.uint32)])
        h = hash_u64(ch, cl)
        hs, chs, cls, fs = jax.lax.sort((h, ch, cl, flag), num_keys=4)
        # run of equal keys: does it contain a build row?  propagate via scan
        newk = jnp.concatenate([
            jnp.ones((1,), jnp.bool_),
            (chs[1:] != chs[:-1]) | (cls[1:] != cls[:-1])])
        segid = jnp.cumsum(newk.astype(jnp.int32)) - 1
        isb = (fs == 0).astype(jnp.uint32)

        def comb(a, b):
            va, ga = a
            vb, gb = b
            return jnp.where(ga == gb, va | vb, vb), gb
        hasb, _ = jax.lax.associative_scan(comb, (isb, segid))
        return jnp.sum(jnp.where(fs == 1, hasb, 0), dtype=jnp.uint32)
    out, _ = timeit("merge-join count (concat sort, 10Mx10M)",
                    jax.jit(merge_count), bkh, bkl, pkh, pkl)
    expected = int(np.isin(pk, np.unique(bk)).sum())
    print("merge count:", int(out), "expected:", expected, flush=True)

    # dispatch floor
    one = jnp.ones((8,), jnp.uint32)
    timeit("dispatch floor (tiny op)", jax.jit(lambda x: x + 1), one)


if __name__ == "__main__":
    main()
