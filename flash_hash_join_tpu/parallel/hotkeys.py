"""Sampled heavy-hitter detection for the distributed hash shuffle.

Zipf-skewed probe keys concentrate on one hash-home device and overflow any
fixed all_to_all quota (SURVEY.md §5 "distributed communication backend").
The classic remedy — replicate the hot build rows, keep their probes local
— needs a GLOBAL consensus hot-key set; we build one from a strided sample:

  1. each shard samples S probe keys (stride n/S — cheap, deterministic);
  2. one all_gather makes the (ndev*S,) sample replicated;
  3. keys covering >= 1/CAP of the sample become the hot set (at most CAP
     keys can each hold a 1/CAP share, so a fixed CAP-slot table provably
     never truncates the qualifying set).

The threshold frequency (~1/CAP of all probes) sits far below the quota
overflow point (a key overflows a factor-f quota only above ~f/ndev of all
probes), so sampling error is covered by margin; residual overflow is still
counted and retried with a grown quota (distributed_join_exact).

NOT PRESENT in the reference (single-node; its radix partitioner is exact
by construction, hash_join.cpp:210-252) — this is the multi-chip design
SURVEY.md §2 demands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HOT_CAP = 32          # hot-set slots; threshold = 1/HOT_CAP of the sample
SAMPLES_PER_SHARD = 512


class HotSet:
    """Replicated hot-key table: (CAP,) key words + used mask."""

    def __init__(self, kh, kl, used):
        self.kh = kh
        self.kl = kl
        self.used = used


def detect_hot_keys(ph, pl, valid, *, axis_name: str,
                    cap: int = HOT_CAP,
                    samples_per_shard: int = SAMPLES_PER_SHARD) -> HotSet:
    """Consensus hot-key set from a strided probe sample (replicated)."""
    n = ph.shape[0]
    s = min(samples_per_shard, n)
    stride = max(n // s, 1)
    idx = jnp.arange(s, dtype=jnp.int32) * stride
    # invalid rows sample as the impossible marker (never matches: the
    # used-mask also guards membership tests)
    skh = jnp.where(valid[idx], ph[idx].astype(jnp.uint32), jnp.uint32(0))
    skl = jnp.where(valid[idx], pl[idx].astype(jnp.uint32), jnp.uint32(0))
    sval = valid[idx]

    gkh = jax.lax.all_gather(skh, axis_name).reshape(-1)
    gkl = jax.lax.all_gather(skl, axis_name).reshape(-1)
    gval = jax.lax.all_gather(sval, axis_name).reshape(-1)
    total = gkh.shape[0]
    thresh = max(total // cap, 2)

    # run lengths over the sorted sample; invalid samples sort as a
    # (MAX, MAX) run that is excluded via the validity column
    kh_s, kl_s, val_s = jax.lax.sort(
        (jnp.where(gval, gkh, jnp.uint32(0xFFFFFFFF)),
         jnp.where(gval, gkl, jnp.uint32(0xFFFFFFFF)),
         gval.astype(jnp.uint32)),
        num_keys=2, is_stable=False)
    new_run = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (kh_s[1:] != kh_s[:-1]) | (kl_s[1:] != kl_s[:-1])])
    run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    run_len = jax.ops.segment_sum(jnp.ones((total,), jnp.int32), run_id,
                                  num_segments=total)
    starts = new_run
    hot_row = starts & (run_len[run_id] >= thresh) & (val_s > 0)

    slot = jnp.cumsum(hot_row.astype(jnp.int32)) - 1
    slot = jnp.where(hot_row & (slot < cap), slot,
                     cap + jnp.arange(total, dtype=jnp.int32))
    hot_kh = jnp.zeros((cap,), jnp.uint32).at[slot].set(
        kh_s, mode="drop", unique_indices=True)
    hot_kl = jnp.zeros((cap,), jnp.uint32).at[slot].set(
        kl_s, mode="drop", unique_indices=True)
    used = jnp.zeros((cap,), jnp.bool_).at[slot].set(
        jnp.ones((total,), jnp.bool_), mode="drop", unique_indices=True)
    return HotSet(hot_kh, hot_kl, used)


def is_member(kh, kl, hot: HotSet) -> jnp.ndarray:
    """(n,) bool: key in the hot set."""
    eq = ((kh.astype(jnp.uint32)[:, None] == hot.kh[None, :])
          & (kl.astype(jnp.uint32)[:, None] == hot.kl[None, :])
          & hot.used[None, :])
    return jnp.any(eq, axis=1)


def gather_hot_build_rows(kh, kl, vh, vl, valid, hot: HotSet, *,
                          axis_name: str):
    """All-gather each shard's first local (key, value) row per hot key.

    First-match dedup means ONE row per hot key per shard suffices; the
    replicated table build dedups across shards deterministically (stable
    sort winner, ops/hash_table.py).  Returns (cap*ndev,) columns + valid.
    """
    cap = hot.kh.shape[0]
    eq = ((kh.astype(jnp.uint32)[:, None] == hot.kh[None, :])
          & (kl.astype(jnp.uint32)[:, None] == hot.kl[None, :])
          & valid[:, None] & hot.used[None, :])          # (n, cap)
    found = jnp.any(eq, axis=0)                          # (cap,)
    first = jnp.argmax(eq, axis=0)                       # (cap,)
    rows = [c.astype(jnp.uint32)[first] for c in (kh, kl, vh, vl)]
    rows = [jax.lax.all_gather(r, axis_name).reshape(-1) for r in rows]
    rvalid = jax.lax.all_gather(found & hot.used, axis_name).reshape(-1)
    return rows[0], rows[1], rows[2], rows[3], rvalid
