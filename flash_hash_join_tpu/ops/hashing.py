"""Vectorized hashing of u64 keys held as (hi, lo) uint32 pairs.

The reference hashes with the SSE4.2 CRC32 instruction plus an odd-constant
multiply (hash_join.cpp:40-44).  TPUs have no CRC32 instruction and parity
does not require the same hash (inner-join counts are hash-independent), so
we use a murmur3-style multiply-xorshift finalizer over the two 32-bit
halves — pure VPU ops, ~10 instructions per key, full avalanche.

All functions take/return jnp.uint32 arrays and are shape-polymorphic.
"""

from __future__ import annotations

import jax.numpy as jnp

_C1 = jnp.uint32(0x85EBCA6B)
_C2 = jnp.uint32(0xC2B2AE35)
_GOLDEN = jnp.uint32(0x9E3779B9)


def fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer (public-domain constants)."""
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * _C1
    h = h ^ (h >> 13)
    h = h * _C2
    h = h ^ (h >> 16)
    return h


def hash_u64(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """32-bit hash of a u64 (hi, lo) pair with good top-bit avalanche.

    Top bits are the ones that matter: the home group is taken from the top
    (hash >> (32 - group_bits)), mirroring the reference's top-byte radix
    split (get_partition_idx = hash >> 56, hash_join.cpp:209) so that device
    partition ids, radix partition ids, and home groups nest by construction.
    """
    h = fmix32(lo.astype(jnp.uint32))
    h = fmix32(h ^ (hi.astype(jnp.uint32) * _GOLDEN))
    return h


def bloom_word(h: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-key bloom signature: k bits set in a 32-bit word.

    Plays the role of the reference's constexpr 16-bit tag table
    (hash_join.cpp:60-74) but is computed in-register from a secondary mix of
    the hash instead of a lookup (TPU gathers are the thing we are avoiding).
    """
    g = h * _GOLDEN + jnp.uint32(1)
    word = jnp.zeros_like(h)
    for i in range(k):
        bit = (g >> jnp.uint32(5 * i)) & jnp.uint32(31)
        word = word | (jnp.uint32(1) << bit)
    return word
