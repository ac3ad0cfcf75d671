"""Stage breakdown of the partitioned (range) join at flagship shape.

Times build_range_table / probe prep / kernel separately (value-fetch
barriers) so the next optimization target is measured, not guessed.

Run: python scripts/profile_range.py [--n 40000000] [--narrow]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40_000_000)
    ap.add_argument("--narrow", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flash_hash_join_tpu  # noqa: F401  (compile cache config)
    from flash_hash_join_tpu.ops import range_table as rt
    from flash_hash_join_tpu.utils import u64

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    n = args.n
    narrow = args.narrow
    rng = np.random.default_rng(0)
    hi = 1 if narrow else 2**40
    bk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64) * np.uint64(1) + (
        np.uint64(0))
    pk = rng.integers(0, int(n * 1.1), n, dtype=np.uint64)
    if not narrow:
        bk = bk + np.uint64(2**40)
        pk = pk + np.uint64(2**40)
    bv = rng.integers(0, 2**63, n, dtype=np.uint64)

    kh, kl = u64.split_u64(bk)
    vh, vl = u64.split_u64(bv)
    ph, pl = u64.split_u64(pk)
    dev = [jnp.asarray(x) for x in (kh, kl, vh, vl, ph, pl)]
    kh, kl, vh, vl, ph, pl = dev

    W = rt.plan_window(n, n)
    print(f"W={W} narrow={narrow}", file=sys.stderr, flush=True)

    def timed(name, fn, *xs, reps=3):
        out = fn(*xs)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out)
        # fetch one scalar-ish element for a true barrier
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*xs)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            np.asarray(leaf.reshape(-1)[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:32s} {best*1e3:9.1f} ms  {best/n*1e9:6.2f} ns/row",
              flush=True)
        return out

    build = jax.jit(lambda a, b, c, d: rt.build_range_table(
        a, b, c, d, n, with_values=False, narrow=narrow))
    table = timed("build_range_table (count)", build, kh, kl, vh, vl)

    prep = jax.jit(lambda t, a, b: rt._prep_probe(
        t, a, b, n, W=W, C=32, tile_m=32, narrow=narrow))
    planes, wstart, spc = timed("probe prep (hash+sort+wstart)",
                                prep, table, ph, pl)

    from flash_hash_join_tpu.ops.pallas import range_probe as rp
    layout = rp.NARROW if narrow else rp.WIDE
    kern = jax.jit(lambda b, t, p, w: rp.range_probe_count(
        b, t, p, w, W=W, layout=layout))
    timed("probe kernel", kern, table.bnds, table.tks, planes, wstart)

    full = jax.jit(lambda *a: rt.range_join_count(
        *a, jnp.int32(n), jnp.int32(n), W=W, narrow=narrow))
    timed("full count graph", full, kh, kl, vh, vl, ph, pl)


if __name__ == "__main__":
    main()
