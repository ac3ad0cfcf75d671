"""Segmented scans over sorted runs — the engine's reduction workhorse.

TPU-native replacement for every "per-bucket accumulate" in the reference
(atomic fetch_or into the bloom directory hash_join.cpp:122, per-thread
histogram merges :224-236): rows arrive sorted by segment id (we always sort
for table builds / partitioning anyway), a `jax.lax.associative_scan` with a
segment-aware combiner folds each run, and the last element of each run is
the segment's reduction — all vector ops, no atomics, no scatter conflicts.

u64 arithmetic is exact via (hi, lo) uint32 pairs with carry propagation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seg_ends(seg_ids: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of the last element of each run of equal seg_ids."""
    return jnp.concatenate(
        [seg_ids[1:] != seg_ids[:-1], jnp.ones((1,), jnp.bool_)]
    )


def seg_starts(seg_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), seg_ids[1:] != seg_ids[:-1]]
    )


def segmented_scan(combine, values, seg_ids: jnp.ndarray):
    """Inclusive scan of `values` (pytree) with `combine`, restarting at each
    new run of seg_ids.  Returns the scanned pytree."""

    def seg_combine(a, b):
        va, ga = a
        vb, gb = b
        same = ga == gb
        merged = jax.tree_util.tree_map(
            lambda x, y: jnp.where(same, x, y), combine(va, vb), vb
        )
        return merged, gb

    scanned, _ = jax.lax.associative_scan(seg_combine, (values, seg_ids))
    return scanned


def add_u64(a, b):
    """(hi, lo) + (hi, lo) mod 2**64 with carry."""
    ahi, alo = a
    bhi, blo = b
    lo = alo + blo
    carry = (lo < blo).astype(jnp.uint32)
    return ahi + bhi + carry, lo


def min_u64(a, b):
    ahi, alo = a
    bhi, blo = b
    a_lt = (ahi < bhi) | ((ahi == bhi) & (alo < blo))
    return jnp.where(a_lt, ahi, bhi), jnp.where(a_lt, alo, blo)


def max_u64(a, b):
    ahi, alo = a
    bhi, blo = b
    a_gt = (ahi > bhi) | ((ahi == bhi) & (alo > blo))
    return jnp.where(a_gt, ahi, bhi), jnp.where(a_gt, alo, blo)


def or_u32(a, b):
    return a | b
