import numpy as np
import jax.numpy as jnp

from flash_hash_join_tpu.ops.hashing import fmix32, hash_u64, bloom_word
from flash_hash_join_tpu.utils import u64


def test_split_join_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    hi, lo = u64.split_u64(x)
    assert hi.dtype == np.uint32 and lo.dtype == np.uint32
    np.testing.assert_array_equal(u64.join_u64(hi, lo), x)
    # hi/lo actually carry the right halves
    np.testing.assert_array_equal(hi, (x >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(lo, (x & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def test_fmix32_bijective_on_sample():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**32, size=100_000, dtype=np.uint32)
    x = np.unique(x)
    h = np.asarray(fmix32(jnp.asarray(x)))
    assert len(np.unique(h)) == len(x)  # fmix32 is a bijection


def test_hash_u64_avalanche_top_bits():
    """Home groups come from top hash bits; sequential keys must spread."""
    n = 1 << 16
    keys = np.arange(n, dtype=np.uint64)
    hi, lo = u64.split_u64(keys)
    h = np.asarray(hash_u64(jnp.asarray(hi), jnp.asarray(lo)))
    top = h >> 22  # 1024 buckets
    counts = np.bincount(top, minlength=1024)
    mean = n / 1024
    # chi-square-ish sanity: no bucket pathologically hot or empty
    assert counts.max() < 3 * mean
    assert counts.min() > mean / 3


def test_hash_u64_uses_high_half():
    hi = jnp.asarray(np.arange(1024, dtype=np.uint32))
    lo = jnp.zeros(1024, jnp.uint32)
    h = np.asarray(hash_u64(hi, lo))
    assert len(np.unique(h)) == 1024


def test_bloom_word_popcount():
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.integers(0, 2**32, size=4096, dtype=np.uint32))
    w = np.asarray(bloom_word(h, 3))
    pops = np.array([bin(int(x)).count("1") for x in w])
    assert (pops >= 1).all() and (pops <= 3).all()
    assert pops.mean() > 2.5  # mostly distinct bits
