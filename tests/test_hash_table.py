"""Core hash-table build/probe correctness vs the numpy oracle, on the
adversarial distributions SURVEY.md §4 calls for: duplicates, 0%/100% match
rates, skew, sentinel keys, tiny/padded shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flash_hash_join_tpu.ops import hash_table as ht
from flash_hash_join_tpu.utils import u64
from flash_hash_join_tpu.utils.config import JoinConfig
from tests.oracle import oracle_count, oracle_materialize

CFG = JoinConfig(probe_chunk=1 << 12)


def _build(keys, vals, cfg=CFG, with_bloom=False, n_valid=None):
    kh, kl = u64.split_u64(keys)
    vh, vl = u64.split_u64(vals)
    n = len(keys) if n_valid is None else n_valid
    gbits = cfg.group_bits(len(keys))
    table = ht.build_table(
        jnp.asarray(kh), jnp.asarray(kl), jnp.asarray(vh), jnp.asarray(vl),
        n, gbits=gbits, group_size=cfg.group_size,
        overflow_groups=cfg.overflow_groups, with_bloom=with_bloom,
        bloom_k=cfg.bloom_k,
    )
    static = dict(
        gbits=gbits, group_size=cfg.group_size,
        total_groups=(1 << gbits) + cfg.overflow_groups,
        use_bloom=with_bloom, bloom_k=cfg.bloom_k,
        max_iters=cfg.max_probe_iters,
    )
    return table, static


def _count(table, static, probe_keys, n_valid=None, cfg=CFG):
    ph, pl = u64.split_u64(probe_keys)
    n = len(probe_keys) if n_valid is None else n_valid
    return int(ht.probe_count(table, jnp.asarray(ph), jnp.asarray(pl), n,
                              probe_chunk=cfg.probe_chunk, **static))


def _materialize(table, static, probe_keys, n_valid=None, cfg=CFG):
    ph, pl = u64.split_u64(probe_keys)
    n = len(probe_keys) if n_valid is None else n_valid
    count, okh, okl, ovh, ovl = ht.probe_materialize(
        table, jnp.asarray(ph), jnp.asarray(pl), n,
        probe_chunk=cfg.probe_chunk, **static)
    count = int(count)
    keys = u64.join_u64(np.asarray(okh), np.asarray(okl))[:count]
    vals = u64.join_u64(np.asarray(ovh), np.asarray(ovl))[:count]
    return count, keys, vals


def _rand_u64(rng, n, hi=2**64):
    return rng.integers(0, hi, size=n, dtype=np.uint64)


@pytest.mark.parametrize("with_bloom", [False, True])
@pytest.mark.parametrize("nb,npr", [(100, 1000), (1000, 100), (5000, 5000)])
def test_count_random(with_bloom, nb, npr):
    rng = np.random.default_rng(nb * 7 + npr)
    bk = _rand_u64(rng, nb)
    bv = _rand_u64(rng, nb)
    # ~50% match rate: half the probes drawn from build keys
    pk = np.concatenate([rng.choice(bk, npr // 2), _rand_u64(rng, npr - npr // 2)])
    rng.shuffle(pk)
    table, static = _build(bk, bv, with_bloom=with_bloom)
    assert _count(table, static, pk) == oracle_count(bk, pk)
    assert int(table.special[3]) == 0  # nothing dropped


@pytest.mark.parametrize("with_bloom", [False, True])
def test_materialize_random_unique_build(with_bloom):
    rng = np.random.default_rng(42)
    bk = np.unique(_rand_u64(rng, 4000))
    bv = _rand_u64(rng, len(bk))
    pk = np.concatenate([rng.choice(bk, 3000), _rand_u64(rng, 3000)])
    rng.shuffle(pk)
    table, static = _build(bk, bv, with_bloom=with_bloom)
    count, keys, vals = _materialize(table, static, pk)
    o_count, o_keys, o_vals = oracle_materialize(bk, bv, pk)
    assert count == o_count
    np.testing.assert_array_equal(keys, o_keys)
    np.testing.assert_array_equal(vals, o_vals)


def test_duplicate_build_keys_dedup():
    """Duplicate build keys: one output per matching probe occurrence, value
    from one of the duplicates (first-writer-wins analog)."""
    rng = np.random.default_rng(3)
    base = _rand_u64(rng, 50)
    bk = np.concatenate([base] * 40)  # heavy duplication
    bv = _rand_u64(rng, len(bk))
    pk = np.concatenate([base, _rand_u64(rng, 100)])
    table, static = _build(bk, bv)
    assert _count(table, static, pk) == oracle_count(bk, pk)
    count, keys, vals = _materialize(table, static, pk)
    assert count == oracle_count(bk, pk)
    # every returned value must be one of the values of that key
    val_sets = {}
    for k, v in zip(bk, bv):
        val_sets.setdefault(k, set()).add(v)
    for k, v in zip(keys, vals):
        assert v in val_sets[k]


def test_all_same_key():
    """Pathological: the entire build side is one key (chain length == n in a
    naive table).  Dedup-at-build must keep this O(1)."""
    bk = np.full(10_000, 12345, dtype=np.uint64)
    bv = np.arange(10_000, dtype=np.uint64)
    pk = np.array([12345, 12346, 12345], dtype=np.uint64)
    table, static = _build(bk, bv)
    assert int(table.special[3]) == 0
    assert _count(table, static, pk) == 2
    count, keys, vals = _materialize(table, static, pk)
    assert count == 2
    assert set(keys) == {12345}
    assert vals[0] in set(bv) and vals[0] == vals[1]


def test_zero_and_full_match_rates():
    rng = np.random.default_rng(4)
    bk = np.unique(_rand_u64(rng, 2000, hi=2**32))
    bv = _rand_u64(rng, len(bk))
    table, static = _build(bk, bv)
    # 0% match: disjoint key space
    pk0 = _rand_u64(rng, 5000) | np.uint64(1 << 33)
    pk0 = pk0[~np.isin(pk0, bk)]
    assert _count(table, static, pk0) == 0
    # 100% match
    pk1 = rng.choice(bk, 5000)
    assert _count(table, static, pk1) == 5000


def test_sentinel_max_key():
    """Key 2**64-1 collides with the EMPTY encoding; the special side channel
    must resolve it exactly, in both directions."""
    M = np.uint64(2**64 - 1)
    bk = np.array([1, 2, M, 7], dtype=np.uint64)
    bv = np.array([10, 20, 99, 70], dtype=np.uint64)
    pk = np.array([M, 1, 5, M], dtype=np.uint64)
    table, static = _build(bk, bv)
    assert _count(table, static, pk) == 3
    count, keys, vals = _materialize(table, static, pk)
    assert count == 3
    got = dict(zip(keys, vals))
    assert got[M] == 99 and got[np.uint64(1)] == 10
    # and absence: build WITHOUT the max key, probe WITH it
    table2, static2 = _build(bk[:2], bv[:2])
    assert _count(table2, static2, pk) == 1


def test_zipf_skewed_probe():
    rng = np.random.default_rng(5)
    bk = np.unique(_rand_u64(rng, 3000))
    bv = _rand_u64(rng, len(bk))
    ranks = rng.zipf(1.3, size=20_000)
    pk = bk[np.minimum(ranks - 1, len(bk) - 1)]
    table, static = _build(bk, bv)
    assert _count(table, static, pk) == len(pk)


def test_padding_validity():
    """Rows past n_valid on either side must be ignored (the distributed
    shuffle relies on this)."""
    rng = np.random.default_rng(6)
    bk = _rand_u64(rng, 1000)
    bv = _rand_u64(rng, 1000)
    pk = rng.choice(bk[:600], 500)
    pad_b = np.concatenate([bk, bk[:200]])  # padding rows duplicate real keys
    pad_v = np.concatenate([bv, bv[:200]])
    table, static = _build(pad_b, pad_v, n_valid=600)
    pad_p = np.concatenate([pk, bk[:64]])
    got = _count(table, static, pad_p, n_valid=500)
    assert got == oracle_count(bk[:600], pk)


def test_tiny_and_single_row():
    bk = np.array([5], dtype=np.uint64)
    bv = np.array([50], dtype=np.uint64)
    pk = np.array([5, 6, 5], dtype=np.uint64)
    table, static = _build(bk, bv)
    assert _count(table, static, pk) == 2
    count, keys, vals = _materialize(table, static, pk)
    assert count == 2 and (vals == 50).all()


def test_probe_chunking_matches_unchunked():
    rng = np.random.default_rng(7)
    bk = np.unique(_rand_u64(rng, 512))
    bv = _rand_u64(rng, len(bk))
    pk = np.concatenate([rng.choice(bk, 700), _rand_u64(rng, 333)])
    small = JoinConfig(probe_chunk=128)
    table, static = _build(bk, bv, cfg=small)
    c1 = _count(table, static, pk, cfg=small)
    table2, static2 = _build(bk, bv)
    c2 = _count(table2, static2, pk)
    assert c1 == c2 == oracle_count(bk, pk)


def test_build_deterministic():
    rng = np.random.default_rng(8)
    bk = _rand_u64(rng, 2000)
    bv = _rand_u64(rng, 2000)
    t1, _ = _build(bk, bv, with_bloom=True)
    t2, _ = _build(bk, bv, with_bloom=True)
    for a, b in zip(t1, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
