"""hash-aggregate / filter / radix-sort / partition primitives vs numpy."""

import numpy as np
import jax.numpy as jnp

from flash_hash_join_tpu.ops.aggregate import hash_aggregate
from flash_hash_join_tpu.ops.filter import filter_columns, lt_u64, between_u64
from flash_hash_join_tpu.ops.sort import sort_u64, radix_partition_by_hash
from flash_hash_join_tpu.ops.hashing import hash_u64
from flash_hash_join_tpu.utils import u64


def _split(x):
    hi, lo = u64.split_u64(x)
    return jnp.asarray(hi), jnp.asarray(lo)


def test_hash_aggregate_exact():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, 5000, dtype=np.uint64)  # heavy duplication
    vals = rng.integers(0, 2**64, 5000, dtype=np.uint64)  # full-range sums
    kh, kl = _split(keys)
    vh, vl = _split(vals)
    res = hash_aggregate(kh, kl, vh, vl, 5000, gbits=8)
    ng = int(res.n_groups)
    got_keys = u64.join_u64(np.asarray(res.key_hi), np.asarray(res.key_lo))[:ng]
    got_count = np.asarray(res.count)[:ng]
    got_sum = u64.join_u64(np.asarray(res.sum_hi), np.asarray(res.sum_lo))[:ng]
    got_min = u64.join_u64(np.asarray(res.min_hi), np.asarray(res.min_lo))[:ng]
    got_max = u64.join_u64(np.asarray(res.max_hi), np.asarray(res.max_lo))[:ng]

    uniq = np.unique(keys)
    assert ng == len(uniq)
    assert set(got_keys.tolist()) == set(uniq.tolist())
    order = {k: i for i, k in enumerate(got_keys)}
    for k in uniq:
        sel = vals[keys == k]
        i = order[k]
        assert got_count[i] == len(sel)
        # modular u64 sum
        assert got_sum[i] == np.uint64(sum(int(v) for v in sel) % 2**64)
        assert got_min[i] == sel.min()
        assert got_max[i] == sel.max()


def test_hash_aggregate_validity():
    keys = np.array([1, 1, 2, 9, 9, 9], dtype=np.uint64)
    vals = np.array([5, 6, 7, 1, 1, 1], dtype=np.uint64)
    kh, kl = _split(keys)
    vh, vl = _split(vals)
    res = hash_aggregate(kh, kl, vh, vl, 3, gbits=4)  # only first 3 rows
    ng = int(res.n_groups)
    assert ng == 2
    got = {}
    for i in range(ng):
        k = int(u64.join_u64(np.asarray(res.key_hi[i]), np.asarray(res.key_lo[i])))
        got[k] = (int(res.count[i]),
                  int(u64.join_u64(np.asarray(res.sum_hi[i]), np.asarray(res.sum_lo[i]))))
    assert got == {1: (2, 11), 2: (1, 7)}


def test_filter_compaction():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**64, 4000, dtype=np.uint64)
    y = rng.integers(0, 2**32, 4000, dtype=np.uint64)
    xh, xl = _split(x)
    yh, yl = _split(y)
    thresh = np.uint64(2**63)
    mask = lt_u64(xh, xl, int(thresh >> np.uint64(32)), int(thresh & np.uint64(0xFFFFFFFF)))
    count, oxh, oxl = filter_columns(mask, xh, xl)
    count = int(count)
    got = u64.join_u64(np.asarray(oxh), np.asarray(oxl))[:count]
    want = x[x < thresh]
    np.testing.assert_array_equal(got, want)


def test_between_predicate():
    x = np.array([0, 10, 20, 30, 2**63, 2**64 - 1], dtype=np.uint64)
    xh, xl = _split(x)
    m = between_u64(xh, xl, (0, 10), (0, 30))
    np.testing.assert_array_equal(np.asarray(m), [False, True, True, True, False, False])


def test_sort_u64():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**64, 10000, dtype=np.uint64)
    payload = np.arange(10000, dtype=np.uint32)
    xh, xl = _split(x)
    sh, sl, sp = sort_u64(xh, xl, jnp.asarray(payload))
    got = u64.join_u64(np.asarray(sh), np.asarray(sl))
    np.testing.assert_array_equal(got, np.sort(x))
    # payload permuted consistently
    np.testing.assert_array_equal(x[np.asarray(sp)], got)


def test_radix_partition_contiguous_and_complete():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**64, 8192, dtype=np.uint64)
    xh, xl = _split(x)
    res = radix_partition_by_hash((xh, xl), xh, xl, pbits=4)
    offs = np.asarray(res.offsets)
    assert offs[0] == 0 and offs[-1] == 8192
    pid = np.asarray(res.pid)
    assert (np.diff(pid.astype(np.int64)) >= 0).all()  # contiguous partitions
    # partition id really is the top-4 hash bits of every row in it
    gh = np.asarray(hash_u64(res.cols[0], res.cols[1]))
    np.testing.assert_array_equal(gh >> 28, pid)
    # all rows survive
    got = u64.join_u64(np.asarray(res.cols[0]), np.asarray(res.cols[1]))
    np.testing.assert_array_equal(np.sort(got), np.sort(x))
