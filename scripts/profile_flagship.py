"""Stage-level profile of the flagship narrow count join (round 3).

Uses the carry-chained recipe (see profile_roofline.py) to time each stage
of range_join_count at the flagship shape, so per-dispatch/tunnel overhead
and XLA hoisting cannot pollute the numbers:

  build  — build_range_table (sort + reshape + boundaries)
  prep   — _prep_probe (sort + pad + window starts)
  kernel — range_probe_count on fixed prepped planes
  full   — the whole join

Usage: PYTHONPATH=/root/.axon_site python scripts/profile_flagship.py
       [--n 40000000] [--only pat]
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


def bench_chain(name, step_fn, x0, n_rows, reps_pair=(2, 6), number=2):
    import jax
    import jax.numpy as jnp

    def run(x, reps):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(out.astype(jnp.uint32))

    r1, r2 = reps_pair
    f1 = jax.jit(lambda x: run(x, r1)).lower(x0).compile()
    f2 = jax.jit(lambda x: run(x, r2)).lower(x0).compile()
    np.asarray(f1(x0)); np.asarray(f2(x0))

    def best_of(f):
        best = float("inf")
        for _ in range(number):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = best_of(f1), best_of(f2)
    per_step = (t2 - t1) / (r2 - r1)
    print(f"{name:52s} {per_step*1e3:9.3f} ms/step "
          f"{per_step/n_rows*1e9:8.4f} ns/row", flush=True)
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40_000_000)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flash_hash_join_tpu.ops import range_table as rt
    from flash_hash_join_tpu.ops.pallas import range_probe as rp

    log("devices:", jax.devices())
    n = args.n
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.permutation(n).astype(np.uint32))
    # DISTINCT probe array: feeding the same array to both sides lets XLA
    # CSE the build sort and the probe sort into ONE (burned us once:
    # "full" came out at 2.6 ns/row when the true cost is ~4.1).
    probe = jnp.asarray(
        rng.integers(0, n, n, dtype=np.uint32))
    zeros = jnp.zeros((n,), jnp.uint32)

    def want(s):
        return args.only in s

    C, TM = rp.DEFAULT_C, rp.DEFAULT_TILE_M
    W = rt.plan_window(n, n, C=C, tile_m=TM)
    log(f"W={W} C={C} TM={TM}")

    def remix(c):
        # permutation-preserving remix: xor with a constant keeps u32
        # uniqueness, so match structure stays put
        return c ^ jnp.uint32(0x5A5A5A5A)

    if want("full"):
        def full(c):
            k = remix(c)
            # probe = k xor'd differently so the two sorts cannot be CSE'd
            p = probe ^ (c[0] if c.ndim else c)
            cnt, special = rt.range_join_count(
                zeros, k, zeros, zeros, zeros, p, n, n, narrow=True)
            return (k ^ cnt.astype(jnp.uint32) ^ special[3]).astype(
                jnp.uint32)
        bench_chain("full narrow count join", full, keys, n)

    if want("build"):
        def build(c):
            k = remix(c)
            tab = rt.build_range_table(zeros, k, zeros, zeros, n, C=C,
                                       with_values=False, order="narrow")
            return k ^ tab.bnds[0][0, 0, 0] ^ tab.tks[0][0, 0, 0]
        bench_chain("build_range_table (sort+reshape+bnds)", build, keys, n)

    if want("sortonly"):
        def so(c):
            k = remix(c)
            return jax.lax.sort((k,), num_keys=1, is_stable=False)[0]
        bench_chain("bare 1-col sort at n", so, keys, n)

    if want("prep"):
        tab = rt.build_range_table(zeros, keys, zeros, zeros, n, C=C,
                                   with_values=False, order="narrow")
        tab = jax.tree.map(jax.device_put, tab)

        def prep(c):
            k = remix(c)
            planes, wstart, spc = rt._prep_probe(
                tab, zeros, k, n, W=W, C=C, tile_m=TM, order="narrow",
                small=False)
            return k ^ planes[0][0, 0] ^ wstart[0].astype(jnp.uint32) ^ \
                spc.astype(jnp.uint32)
        bench_chain("_prep_probe (sort+pad+wstart)", prep, keys, n)

    if want("sweep"):
        # kernel-only cost across (C, TM) at the W each config needs for
        # this shape pair (W from plan_window's span formula).
        for (c_, tm_) in ((32, 32), (16, 32), (8, 32), (32, 64), (16, 64),
                          (8, 64), (16, 128), (32, 16), (16, 16)):
            w_ = rt.plan_window(n, n, C=c_, tile_m=tm_)
            try:
                tab = rt.build_range_table(zeros, keys, zeros, zeros, n,
                                           C=c_, with_values=False,
                                           order="narrow")
                planes, wstart, _ = rt._prep_probe(
                    tab, zeros, probe, n, W=w_, C=c_, tile_m=tm_,
                    order="narrow", small=False)
                plane0 = jax.device_put(planes[0])
                ws = jax.device_put(wstart)
                bnds = jax.tree.map(jax.device_put, tab.bnds)
                tks = jax.tree.map(jax.device_put, tab.tks)

                def kern(x, bnds=bnds, tks=tks, ws=ws, w_=w_, c_=c_,
                         tm_=tm_):
                    cnt, unres = rp.range_probe_count(
                        bnds, tks, (x,), ws, W=w_, C=c_, tile_m=tm_,
                        layout=rp.NARROW)
                    return x ^ (cnt ^ unres).astype(jnp.uint32)
                bench_chain(f"kernel C={c_} TM={tm_} W={w_}", kern,
                            plane0, n, (2, 10))
            except Exception as e:  # noqa: BLE001
                print(f"kernel C={c_} TM={tm_} W={w_}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)

    if want("kernel"):
        tab = rt.build_range_table(zeros, keys, zeros, zeros, n, C=C,
                                   with_values=False, order="narrow")
        planes, wstart, _ = rt._prep_probe(
            tab, zeros, keys, n, W=W, C=C, tile_m=TM, order="narrow",
            small=False)
        plane0 = jax.device_put(planes[0])
        wstart = jax.device_put(wstart)
        bnds = jax.tree.map(jax.device_put, tab.bnds)
        tks = jax.tree.map(jax.device_put, tab.tks)

        def kern(c):
            cnt, unres = rp.range_probe_count(
                bnds, tks, (c,), wstart, W=W, C=C, tile_m=TM,
                layout=rp.NARROW)
            # remix the carry so each step's kernel input differs; cost of
            # the xor pass is ~0.01 ns/row
            return c ^ (cnt ^ unres).astype(jnp.uint32)
        bench_chain(f"range_probe_count kernel W={W}", kern, plane0,
                    n, (2, 10))

    log("done")


if __name__ == "__main__":
    main()
