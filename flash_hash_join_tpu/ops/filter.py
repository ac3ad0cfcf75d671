"""Predicate filter + stream compaction — north-star primitive.

The compaction pattern (mask -> exclusive positions -> conflict-free
scatter) is the same one the materialize driver uses (ops/hash_table.py
probe_materialize); here it is exposed as a standalone column op.  Replaces
the reference's per-thread result vectors + prefix-sum + memcpy merge
(hash_join.cpp:446-492) with a single vectorized pass.
"""

from __future__ import annotations

import jax.numpy as jnp


# --- u64 predicates on (hi, lo) pairs ---------------------------------------

def eq_u64(kh, kl, chi: int, clo: int):
    return (kh == jnp.uint32(chi)) & (kl == jnp.uint32(clo))


def lt_u64(kh, kl, chi: int, clo: int):
    return (kh < jnp.uint32(chi)) | ((kh == jnp.uint32(chi)) & (kl < jnp.uint32(clo)))


def gt_u64(kh, kl, chi: int, clo: int):
    return (kh > jnp.uint32(chi)) | ((kh == jnp.uint32(chi)) & (kl > jnp.uint32(clo)))


def le_u64(kh, kl, chi: int, clo: int):
    return ~gt_u64(kh, kl, chi, clo)


def ge_u64(kh, kl, chi: int, clo: int):
    return ~lt_u64(kh, kl, chi, clo)


def between_u64(kh, kl, lo_const: tuple[int, int], hi_const: tuple[int, int]):
    return ge_u64(kh, kl, *lo_const) & le_u64(kh, kl, *hi_const)


# --- compaction ---------------------------------------------------------------

def filter_columns(mask: jnp.ndarray, *cols: jnp.ndarray):
    """Compact rows where mask is True to the front of each column.

    Returns (count, *compacted) — compacted arrays keep the input length
    (static shapes); the first `count` rows are the selected rows in input
    order, the rest are zeros.
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.where(mask, pos, n + jnp.arange(n, dtype=jnp.int32))
    count = jnp.sum(mask).astype(jnp.int32)
    outs = []
    for c in cols:
        out = jnp.zeros((n,), c.dtype)
        outs.append(out.at[idx].set(c, mode="drop", unique_indices=True))
    return (count, *outs)
