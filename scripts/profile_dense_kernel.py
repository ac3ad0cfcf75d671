"""Stage isolation for the large-span dense-bitmap kernel (Q5 shape).

The fused kernel measured 17.4 ns/row on 4e7-Q5 (vs 4.39 for the
partitioned sort route) — ~9x above its op-count estimate.  This script
splits the cost: blockwise sort alone, build phase alone (one sentinel
probe block), probe phase alone (one sentinel build block), across
sels in {2,4} and d_rows in {2048, 16384}, to find where the time goes.

Usage: python scripts/profile_dense_kernel.py [--n 4e7]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128


def bench(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=4e7)
    ap.add_argument("--sort-block", type=int, default=1 << 20)
    args = ap.parse_args()
    n = int(args.n)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from flash_hash_join_tpu.ops import direct_bitmap as db
    from flash_hash_join_tpu.ops.pallas import dense_bitmap as dbm

    rng = np.random.default_rng(0)
    BM = dbm.DEFAULT_BLOCK_ROWS
    SB = args.sort_block

    def make_sorted(nrows, span):
        idx = rng.integers(0, span, nrows, dtype=np.uint32)
        f = jax.jit(lambda x: db._blockwise_sorted_idx(x, SB))
        return f(jnp.asarray(idx))

    def rowstarts(sorted_idx, d_rows, sels):
        rs = jnp.clip((sorted_idx[:, 0] >> jnp.uint32(12)).astype(jnp.int32),
                      0, d_rows - sels)
        return rs.reshape(-1, 1, BM)

    sent_block = jnp.full((BM, LANES), 0xFFFFFFFF, jnp.uint32)

    # --- sort-block cost curve (one side, u32) -------------------------
    for sb_pow in (16, 17, 18, 19, 20):
        sb = 1 << sb_pow
        f = jax.jit(functools.partial(db._blockwise_sorted_idx,
                                      sort_block=sb))
        t_sort, _ = bench(f, jnp.asarray(
            rng.integers(0, 1 << 26, n, dtype=np.uint32)), reps=5)
        print(f"sort SB=2^{sb_pow}: {t_sort*1e3:8.2f} ms  "
              f"{t_sort*1e9/n:6.3f} ns/row", flush=True)

    # --- kernel phase cost vs sels at the Q5 span ----------------------
    # full-density blocks (n chosen divisible) emulate the strided block
    # assignment that removes the ragged-tail density drop
    span = int(n * 1.1)
    d_rows = db.d_rows_for(span)
    for sb_pow, sels_list in ((20, (4,)), (19, (5, 6)), (18, (8, 10)),
                              (17, (13,))):
        sb = 1 << sb_pow
        nfit = (n // sb) * sb
        bs = jax.jit(functools.partial(db._blockwise_sorted_idx,
                                       sort_block=sb))(
            jnp.asarray(rng.integers(0, span, nfit, dtype=np.uint32)))
        for sels in sels_list:
            idx_all = jnp.concatenate([bs, sent_block])
            rs_all = rowstarts(idx_all, d_rows, sels)
            nbb = bs.shape[0] // BM
            t_b, out = bench(dbm.fused_bitmap_join, idx_all, rs_all,
                             nbb=nbb, d_rows=d_rows, sels=sels)
            print(f"SB=2^{sb_pow} sels={sels:2d} BUILD-only: "
                  f"{t_b*1e3:8.2f} ms  {t_b*1e9/nfit:6.3f} ns/row  "
                  f"unres_b={int(out[1])}", flush=True)
            idx_all = jnp.concatenate([sent_block, bs])
            rs_all = rowstarts(idx_all, d_rows, sels)
            t_p, out = bench(dbm.fused_bitmap_join, idx_all, rs_all,
                             nbb=1, d_rows=d_rows, sels=sels)
            print(f"SB=2^{sb_pow} sels={sels:2d} PROBE-only: "
                  f"{t_p*1e3:8.2f} ms  {t_p*1e9/nfit:6.3f} ns/row  "
                  f"unres_p={int(out[2])}", flush=True)
