"""Tests for the exact-offset stream-compaction kernel (interpret mode).

Oracle: numpy boolean-mask compaction.  Covers empty blocks, all-hit
blocks, single partial block, carry straddling row boundaries, and the
full hybrid wrapper at several sizes/mask densities.
"""

import numpy as np
import pytest

from flash_hash_join_tpu.ops.pallas import stream_compact as sc


def _np_concat(planes, counts, bm):
    outs = []
    for p in planes:
        flat = np.asarray(p).reshape(-1)
        segs = [
            flat[b * bm * 128 : b * bm * 128 + int(counts[b])]
            for b in range(len(counts))
        ]
        outs.append(np.concatenate(segs) if segs else flat[:0])
    return outs


@pytest.mark.parametrize("bm,nblocks,seed", [
    (8, 1, 0), (8, 3, 1), (16, 5, 2), (8, 4, 3),
])
def test_concat_ragged_blocks(bm, nblocks, seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    rows = nblocks * bm
    planes = tuple(
        jnp.asarray(rng.integers(0, 2**32, (rows, 128), dtype=np.uint32))
        for _ in range(2)
    )
    counts = rng.integers(0, bm * 128 + 1, nblocks).astype(np.int32)
    if seed == 1:
        counts[0] = 0            # empty leading block
        counts[-1] = bm * 128    # full trailing block
    if seed == 3:
        counts[:] = [1, 0, 127, 130][:nblocks]  # tiny carries straddling
    outs = sc.concat_ragged_blocks(planes, jnp.asarray(counts),
                                   block_rows=bm, interpret=True)
    total = int(counts.sum())
    expected = _np_concat(planes, counts, bm)
    for o, e in zip(outs, expected):
        got = np.asarray(o).reshape(-1)[:total]
        np.testing.assert_array_equal(got, e)


@pytest.mark.parametrize("n,density,seed", [
    (1000, 0.5, 0), (4096, 1.0, 1), (70000, 0.03, 2), (131072, 0.0, 3),
    (65536, 0.97, 4), (5, 0.8, 5),
])
def test_compact_by_mask_stream(n, density, seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mask = rng.random(n) < density
    cols = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(3)]
    count, outs = sc.compact_by_mask_stream(
        jnp.asarray(mask), tuple(jnp.asarray(c) for c in cols),
        block_rows=16, interpret=True)
    assert int(count) == int(mask.sum())
    for o, c in zip(outs, cols):
        np.testing.assert_array_equal(
            np.asarray(o)[: int(count)], c[mask])  # stable: input order


@pytest.mark.parametrize("n,density,seed,bm,V", [
    (1000, 0.5, 0, 128, 2), (70000, 0.03, 2, 256, 4),
    (131072, 0.0, 3, 256, 3), (65536, 0.97, 4, 512, 4),
    (5, 0.8, 5, 128, 1), (40000, 1.0, 6, 256, 2),
    (99999, 0.33, 7, 1024, 4), (4096, 1.0, 8, 256, 1),
])
def test_compact_by_mask_pack(n, density, seed, bm, V):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mask = rng.random(n) < density
    cols = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(V)]
    count, outs = sc.compact_by_mask_pack(
        jnp.asarray(mask), tuple(jnp.asarray(c) for c in cols),
        block_rows=bm, interpret=True)
    assert int(count) == int(mask.sum())
    for o, c in zip(outs, cols):
        np.testing.assert_array_equal(
            np.asarray(o)[: int(count)], c[mask])  # stable: input order


def test_pack_matches_stream():
    """The sort-free pack kernel and the blockwise-sort hybrid agree
    bit-for-bit (both stable in input order)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 150000
    mask = rng.random(n) < 0.6
    cols = tuple(
        jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        for _ in range(4)
    )
    c1, o1 = sc.compact_by_mask_stream(jnp.asarray(mask), cols, n_out=n,
                                       interpret=True)
    c2, o2 = sc.compact_by_mask_pack(jnp.asarray(mask), cols, n_out=n,
                                     interpret=True)
    assert int(c1) == int(c2)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(
            np.asarray(a)[: int(c1)], np.asarray(b)[: int(c1)])


def test_compact_stream_matches_compact_by_mask():
    import jax.numpy as jnp
    from flash_hash_join_tpu.ops.compact import compact_by_mask

    rng = np.random.default_rng(9)
    n = 30000
    mask = rng.random(n) < 0.4
    cols = tuple(
        jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        for _ in range(4)
    )
    c1, o1 = compact_by_mask(jnp.asarray(mask), cols, n_out=n, stable=True)
    c2, o2 = sc.compact_by_mask_stream(jnp.asarray(mask), cols, n_out=n,
                                       block_rows=16, interpret=True)
    assert int(c1) == int(c2)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(
            np.asarray(a)[: int(c1)], np.asarray(b)[: int(c1)])
