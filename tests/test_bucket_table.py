"""Bucket table + Pallas VMEM probe kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flash_hash_join_tpu.ops import bucket_table as bt
from flash_hash_join_tpu.utils import u64
from tests.oracle import oracle_count, oracle_materialize


def _args(bk, bv, pk):
    kh, kl = u64.split_u64(bk)
    vh, vl = u64.split_u64(bv)
    ph, pl = u64.split_u64(pk)
    return (jnp.asarray(kh), jnp.asarray(kl), jnp.asarray(vh),
            jnp.asarray(vl), jnp.asarray(ph), jnp.asarray(pl))


def _count(bk, bv, pk, r_slots=64):
    a = _args(bk, bv, pk)
    c, special = bt.bucket_join_count(
        *a, len(bk), len(pk), r_slots=r_slots, interpret=True)
    assert int(special[3]) == 0
    return int(c)


@pytest.mark.parametrize("nb,npr", [(500, 9000), (3000, 20000)])
def test_bucket_count_random(nb, npr):
    rng = np.random.default_rng(nb)
    bk = rng.integers(0, 2**64, nb, dtype=np.uint64)
    bv = rng.integers(0, 2**64, nb, dtype=np.uint64)
    pk = np.concatenate([rng.choice(bk, npr // 2),
                         rng.integers(0, 2**64, npr - npr // 2, dtype=np.uint64)])
    assert _count(bk, bv, pk) == oracle_count(bk, pk)


def test_bucket_count_sentinel_and_dups():
    M = np.uint64(2**64 - 1)
    bk = np.array([M, 1, 1, 2] * 50, dtype=np.uint64)
    bv = np.arange(200, dtype=np.uint64)
    pk = np.array([M, 1, 2, 9, M], dtype=np.uint64)
    assert _count(bk, bv, pk) == 4


def test_bucket_materialize():
    rng = np.random.default_rng(7)
    bk = np.unique(rng.integers(0, 2**63, 2000, dtype=np.uint64))
    bv = rng.integers(0, 2**64, len(bk), dtype=np.uint64)
    pk = np.concatenate([rng.choice(bk, 1500),
                         rng.integers(0, 2**63, 700, dtype=np.uint64)])
    a = _args(bk, bv, pk)
    count, okh, okl, ovh, ovl, special = bt.bucket_join_materialize(
        *a, len(bk), len(pk), r_slots=32, interpret=True)
    count = int(count)
    o_count, o_keys, o_vals = oracle_materialize(bk, bv, pk)
    assert count == o_count
    keys = u64.join_u64(np.asarray(okh), np.asarray(okl))[:count]
    vals = u64.join_u64(np.asarray(ovh), np.asarray(ovl))[:count]
    np.testing.assert_array_equal(keys, o_keys)
    np.testing.assert_array_equal(vals, o_vals)


def test_bucket_overflow_reported():
    """>128 deduped keys forced into one bucket (s_bits=0 -> 1 bucket) must
    be counted as drops, never silently wrong."""
    rng = np.random.default_rng(8)
    bk = np.unique(rng.integers(0, 2**63, 4000, dtype=np.uint64))
    bv = rng.integers(0, 2**64, len(bk), dtype=np.uint64)
    pk = bk[:50]
    a = _args(bk, bv, pk)
    # r_slots=8 -> 1024-slot capacity << ~3900 unique keys -> drops
    c, special = bt.bucket_join_count(*a, len(bk), len(pk), r_slots=8,
                                      interpret=True)
    assert int(special[3]) > 0  # drops loudly reported


def test_bucket_padding_path():
    """probe length not a multiple of the block size exercises padding."""
    rng = np.random.default_rng(9)
    bk = rng.integers(0, 1000, 300, dtype=np.uint64)
    bv = rng.integers(0, 2**64, 300, dtype=np.uint64)
    pk = rng.integers(0, 1000, 777, dtype=np.uint64)
    assert _count(bk, bv, pk, r_slots=16) == oracle_count(bk, pk)
