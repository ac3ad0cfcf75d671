"""A/B: bloom-tag plane + tile-consensus scan skip inside the range kernel.

VERDICT r3 item 6 — the one untried bloom placement: a per-lane-column
tag word (OR of the 32-bin top-5-hash-bit tags of its C keys) checked
after the column search; a window row where no active probe's bit is
present skips its whole C-row scan (lax.cond).  Reference placement being
matched: the radix path's 16-bit tag pre-check, hash_join.cpp:165,183-189.

Measures QB5-shaped cases (5% match) and a 0.1% match extreme at several
build sizes, steady-state device time, plain vs FHJ_RANGE_BLOOM=1.

Usage: PYTHONPATH=/root/.axon_site python scripts/profile_range_bloom.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_count(tag, nb, npr, match, seed=5):
    import jax
    import jax.numpy as jnp

    from flash_hash_join_tpu.ops import range_table as rt
    from flash_hash_join_tpu.utils import u64

    rng = np.random.default_rng(seed)
    key_range = max(int(nb / match), nb + 1)
    bk = rng.permutation(key_range)[:nb].astype(np.uint64)
    pk = rng.integers(0, key_range, npr, dtype=np.uint64)
    bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
    kh, kl = u64.split_u64(bk)
    vh, vl = u64.split_u64(bv)
    ph, pl = u64.split_u64(pk)
    args = [jnp.asarray(a) for a in (kh, kl, vh, vl, ph, pl)]

    def run(kh, kl, vh, vl, ph, pl):
        c, s = rt.range_join_count(kh, kl, vh, vl, ph, pl,
                                   jnp.int32(nb), jnp.int32(npr))
        return c, s

    fn = jax.jit(run)
    c, s = fn(*args)
    c.block_until_ready()
    expected = int(np.isin(pk, bk).sum())
    assert int(c) == expected, (int(c), expected, tag)
    assert int(np.asarray(s)[3]) == 0, tag
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        c, s = fn(*args)
        c.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT,case={tag},nb={nb},npr={npr},match={match},"
          f"core={best:.4f},ns_per_row={best / npr * 1e9:.3f}")
    return best


def main():
    import jax
    log("devices:", jax.devices())
    cases = [
        ("qb5-2e5", 200_000, 2_000_000, 0.05),
        ("qb5-2p5e6", 2_500_000, 10_000_000, 0.05),
        ("qb5-10m", 10_000_000, 40_000_000, 0.05),
        ("sparse-10m", 10_000_000, 40_000_000, 0.001),
        ("q2-40k", 40_000, 40_000_000, 0.5),
    ]
    bloom = os.environ.get("FHJ_RANGE_BLOOM", "0")
    log(f"FHJ_RANGE_BLOOM={bloom}")
    for tag, nb, npr, match in cases:
        timed_count(f"{tag}-bloom{bloom}", nb, npr, match)


if __name__ == "__main__":
    main()
