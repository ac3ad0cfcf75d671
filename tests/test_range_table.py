"""Range table + windowed Pallas probe (interpret mode on CPU).

The partitioned ("radix") strategy's engine: hash-sorted build reshaped
into rank-balanced lane-columns, hash-sorted probes resolved by a windowed
binary-search-plus-scan kernel (ops/range_table.py, ops/pallas/range_probe).
Oracle parity across adversarial distributions plus the unresolved-probe
fallback protocol.
"""

import collections

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flash_hash_join_tpu.ops import range_table as rt
from flash_hash_join_tpu.utils import u64
from tests.oracle import oracle_count

M64 = np.uint64(2**64 - 1)


def _args(bk, bv, pk, nb=None, npr=None):
    kh, kl = u64.split_u64(bk)
    vh, vl = u64.split_u64(bv)
    ph, pl = u64.split_u64(pk)
    return (jnp.asarray(kh), jnp.asarray(kl), jnp.asarray(vh),
            jnp.asarray(vl), jnp.asarray(ph), jnp.asarray(pl),
            jnp.int32(nb if nb is not None else len(bk)),
            jnp.int32(npr if npr is not None else len(pk)))


def _count(bk, bv, pk, allow_unresolved=False, **kw):
    c, special = rt.range_join_count(*_args(bk, bv, pk), interpret=True, **kw)
    if not allow_unresolved:
        assert int(special[3]) == 0
    return int(c), int(special[3])


def _materialize(bk, bv, pk, **kw):
    out = rt.range_join_materialize(*_args(bk, bv, pk), interpret=True, **kw)
    count = int(out[0])
    keys = u64.join_u64(np.asarray(out[1]), np.asarray(out[2]))[:count]
    vals = u64.join_u64(np.asarray(out[3]), np.asarray(out[4]))[:count]
    return count, keys, vals, int(out[5][3])


@pytest.mark.parametrize("nb,npr", [(700, 5000), (20_000, 60_000),
                                    (60_000, 20_000)])
def test_range_count_random(nb, npr):
    rng = np.random.default_rng(nb + npr)
    bk = rng.integers(0, int(nb * 1.5), nb, dtype=np.uint64)
    bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
    pk = rng.integers(0, int(nb * 1.5), npr, dtype=np.uint64)
    c, _ = _count(bk, bv, pk)
    assert c == oracle_count(bk, pk)


def test_range_count_match_extremes():
    rng = np.random.default_rng(0)
    bk = rng.integers(0, 2**63, 10_000, dtype=np.uint64)
    bv = bk + np.uint64(1)
    # 0% match: disjoint key ranges
    pk = rng.integers(2**63, 2**64 - 2, 30_000, dtype=np.uint64)
    c, _ = _count(bk, bv, pk)
    assert c == 0
    # 100% match
    pk = rng.choice(bk, 30_000)
    c, _ = _count(bk, bv, pk)
    assert c == 30_000


def test_range_count_sentinel_key():
    rng = np.random.default_rng(1)
    bk = rng.integers(0, 1000, 5000, dtype=np.uint64)
    bk[17] = M64
    bv = np.arange(5000, dtype=np.uint64)
    pk = np.concatenate([rng.integers(0, 1000, 7000, dtype=np.uint64),
                         np.full(9, M64, np.uint64)])
    c, _ = _count(bk, bv, pk)
    assert c == oracle_count(bk, pk)
    # and when the build does NOT contain the max key
    bk2 = np.where(bk == M64, np.uint64(5), bk)
    c2, _ = _count(bk2, bv, pk)
    assert c2 == oracle_count(bk2, pk)


def test_range_count_zipf_skew():
    rng = np.random.default_rng(2)
    zipf = np.minimum(rng.zipf(1.3, 40_000), 2**40).astype(np.uint64)
    bk = zipf
    bv = bk * np.uint64(3)
    pk = np.minimum(rng.zipf(1.3, 90_000), 2**40).astype(np.uint64)
    c, unres = _count(bk, bv, pk, allow_unresolved=True)
    if unres == 0:
        assert c == oracle_count(bk, pk)


def test_range_unresolved_triggers_on_giant_dup_run():
    """Millions of copies of one build key inflate ranks past any window;
    the kernel must REPORT unresolved probes (engine then falls back) —
    never silently undercount."""
    nb = 120_000
    bk = np.full(nb, 42, np.uint64)
    bk[: 2000] = np.arange(2000, dtype=np.uint64) + 100
    bv = np.arange(nb, dtype=np.uint64)
    rng = np.random.default_rng(3)
    pk = rng.integers(0, 4000, 50_000, dtype=np.uint64)
    c, unres = _count(bk, bv, pk, allow_unresolved=True)
    if unres == 0:
        assert c == oracle_count(bk, pk)
    else:
        assert unres > 0  # exactness protocol: caller must rerun


def test_range_count_padding_and_nvalid():
    rng = np.random.default_rng(4)
    bk = rng.integers(0, 500, 3000, dtype=np.uint64)
    bv = rng.integers(0, 2**63, 3000, dtype=np.uint64)
    pk = rng.integers(0, 500, 10_000, dtype=np.uint64)
    args = _args(bk, bv, pk, nb=2000, npr=7000)
    c, special = rt.range_join_count(*args, interpret=True)
    assert int(special[3]) == 0
    assert int(c) == oracle_count(bk[:2000], pk[:7000])


def test_range_materialize_values_unique_keys():
    rng = np.random.default_rng(5)
    bk = rng.permutation(np.arange(30_000, dtype=np.uint64))
    bv = bk * np.uint64(7) + np.uint64(1)
    pk = rng.integers(0, 60_000, 50_000, dtype=np.uint64)
    c, keys, vals, unres = _materialize(bk, bv, pk)
    assert unres == 0
    assert c == oracle_count(bk, pk)
    # exact value parity on unique build keys
    assert np.all(vals == keys * np.uint64(7) + np.uint64(1))
    # key multiset parity
    want = collections.Counter(
        k for k in pk.tolist() if k < 30_000)
    assert collections.Counter(keys.tolist()) == want


def test_range_materialize_dups_and_sentinel():
    rng = np.random.default_rng(6)
    bk = rng.integers(0, 300, 4000, dtype=np.uint64)
    bk[7] = M64
    bv = rng.integers(0, 2**63, 4000, dtype=np.uint64)
    pk = np.concatenate([rng.integers(0, 400, 9000, dtype=np.uint64),
                         np.full(3, M64, np.uint64)])
    c, keys, vals, unres = _materialize(bk, bv, pk)
    assert unres == 0
    assert c == oracle_count(bk, pk)
    first = {}
    for k, v in zip(bk.tolist(), bv.tolist()):
        first.setdefault(k, v)
    assert all(k in first for k in keys.tolist())
    want = collections.Counter(k for k in pk.tolist() if k in first)
    assert collections.Counter(keys.tolist()) == want
    # sentinel value is the first max-key build row's value
    for k, v in zip(keys.tolist(), vals.tolist()):
        if k == int(M64):
            assert v == first[int(M64)]


def test_range_tiny_build_and_probe():
    bk = np.array([5, 9], dtype=np.uint64)
    bv = np.array([50, 90], dtype=np.uint64)
    pk = np.array([9, 9, 5, 1], dtype=np.uint64)
    c, keys, vals, unres = _materialize(bk, bv, pk)
    assert unres == 0
    assert c == 3
    assert sorted(zip(keys.tolist(), vals.tolist())) == [
        (5, 50), (9, 90), (9, 90)]


def test_plan_window_bounds():
    assert rt.plan_window(10, 10) >= 1
    assert rt.plan_window(40_000_000, 40_000_000) >= 2
    # huge build / small probe stays capped
    assert rt.plan_window(100_000_000, 1_000) <= 64
    # window never exceeds the table's super-row count
    C = 32
    S = max(1, -(-1000 // (128 * C)))
    assert rt.plan_window(1000, 10_000_000) <= S


# ---- narrow (32-bit key) variant ----------------------------------------

def test_range_narrow_count_and_values():
    rng = np.random.default_rng(7)
    nb, npr = 25_000, 70_000
    bk = rng.permutation(np.arange(nb, dtype=np.uint64) * np.uint64(2))
    bv = bk + np.uint64(9)
    pk = rng.integers(0, 2 * nb, npr, dtype=np.uint64)
    c, unres = _count(bk, bv, pk, narrow=True)
    assert c == oracle_count(bk, pk)
    c2, keys, vals, unres2 = _materialize(bk, bv, pk, narrow=True)
    assert unres2 == 0
    assert c2 == oracle_count(bk, pk)
    assert np.all(vals == keys + np.uint64(9))


def test_range_narrow_sentinel_u32max():
    rng = np.random.default_rng(8)
    bk = rng.integers(0, 1000, 5000, dtype=np.uint64)
    bk[11] = 2**32 - 1
    bv = np.arange(5000, dtype=np.uint64)
    pk = np.concatenate([rng.integers(0, 1200, 8000, dtype=np.uint64),
                         np.full(5, 2**32 - 1, np.uint64)])
    c, _ = _count(bk, bv, pk, narrow=True)
    assert c == oracle_count(bk, pk)


def test_api_narrow_detection_routes_and_matches():
    import flash_hash_join_tpu as fj
    rng = np.random.default_rng(9)
    bk = rng.integers(0, 50_000, 30_000, dtype=np.uint64)  # 32-bit keys
    bv = rng.integers(0, 2**63, 30_000, dtype=np.uint64)   # 64-bit values
    pk = rng.integers(0, 50_000, 50_000, dtype=np.uint64)
    c, _ = fj.join_count(bk, bv, pk, strategy="partitioned")
    assert c == oracle_count(bk, pk)
    # wide keys on the same shapes still work (separate compile cache key)
    bk64 = bk + np.uint64(2**40)
    pk64 = pk + np.uint64(2**40)
    c2, _ = fj.join_count(bk64, bv, pk64, strategy="partitioned")
    assert c2 == oracle_count(bk64, pk64)


# ---- small mode (window == whole table, probes unsorted) ------------------

@pytest.mark.parametrize("narrow", [False, True])
def test_range_small_mode_exact(narrow):
    rng = np.random.default_rng(20)
    nb, npr = 9000, 40000
    bk = rng.integers(0, 12000, nb, dtype=np.uint64)
    bk[5] = (2**32 - 1) if narrow else np.uint64(2**64 - 1)
    bv = rng.integers(0, 2**62, nb, dtype=np.uint64)
    pk = rng.integers(0, 15000, npr, dtype=np.uint64)
    pk[:4] = bk[5]
    assert rt.small_mode(nb)
    c, unres = _count(bk, bv, pk, narrow=narrow)
    assert unres == 0
    assert c == oracle_count(bk, pk)
    c2, keys, vals, unres2 = _materialize(bk, bv, pk, narrow=narrow)
    assert unres2 == 0 and c2 == c
    first = {}
    for k, v in zip(bk.tolist(), bv.tolist()):
        first.setdefault(k, v)
    want = collections.Counter(k for k in pk.tolist() if k in first)
    assert collections.Counter(keys.tolist()) == want


def test_range_small_mode_always_exact_on_dups():
    """Small mode has no window to overflow: even an all-duplicate build
    resolves exactly with unresolved == 0 (no fallback needed)."""
    bk = np.full(10000, 7, np.uint64)
    bv = np.arange(10000, dtype=np.uint64)
    pk = np.array([7, 8, 7, 9] * 2500, dtype=np.uint64)
    c, unres = _count(bk, bv, pk)
    assert unres == 0
    assert c == 5000


def test_range_narrow_values_specialization():
    """32-bit values keep the hi plane out of the sort/table/kernel; the
    engine detects it host-side (api) — exercised here at the op level."""
    rng = np.random.default_rng(21)
    nb, npr = 20_000, 50_000
    bk = rng.permutation(np.arange(nb, dtype=np.uint64))
    bv = rng.integers(0, 2**31, nb, dtype=np.uint64)
    pk = rng.integers(0, 2 * nb, npr, dtype=np.uint64)
    args = _args(bk, bv, pk)
    # w_mult=4: pk spans 2x bk's key range, so the matched-density window
    # estimate undercovers in the un-hashed narrow order; the api ladder
    # retries with exactly this widened window (covered by
    # test_api_narrow_density_mismatch_ladder)
    out = rt.range_join_materialize(*args, narrow=True, narrow_values=True,
                                    w_mult=4, interpret=True)
    c = int(out[0])
    assert int(out[-1][3]) == 0
    assert c == oracle_count(bk, pk)
    keys = u64.join_u64(np.asarray(out[1]), np.asarray(out[2]))[:c]
    vals = u64.join_u64(np.asarray(out[3]), np.asarray(out[4]))[:c]
    lut = dict(zip(bk.tolist(), bv.tolist()))
    assert all(lut[k] == v for k, v in zip(keys.tolist(), vals.tolist()))


# ---- key-order (64-bit keys, no hash column) -----------------------------

def test_range_keyorder_wide_exact():
    rng = np.random.default_rng(22)
    nb, npr = 30_000, 90_000
    bk = rng.integers(2**40, 2**63, nb, dtype=np.uint64)
    bv = rng.integers(0, 2**62, nb, dtype=np.uint64)
    pk = np.concatenate([rng.choice(bk, npr // 2),
                         rng.integers(2**40, 2**63, npr // 2,
                                      dtype=np.uint64)])
    c, sp = rt.range_join_count(*_args(bk, bv, pk), order="key",
                                interpret=True)
    assert int(sp[3]) == 0
    assert int(c) == oracle_count(bk, pk)


def test_api_order_retry_ladder_on_density_mismatch():
    """Clustered 32-bit build keys + uniform probes overflow the narrow
    (key-ordered) windows; the api must retry with the hash order and
    stay exact."""
    import flash_hash_join_tpu as fj
    rng = np.random.default_rng(23)
    nb, npr = 30_000, 90_000
    bk = rng.integers(50_000, 250_000, nb, dtype=np.uint64)  # dense cluster
    bv = rng.integers(0, 2**62, nb, dtype=np.uint64)
    pk = np.concatenate([rng.choice(bk, 1000),
                         rng.integers(0, 2**31, npr - 1000,
                                      dtype=np.uint64)])
    c, _ = fj.join_count(bk, bv, pk, strategy="partitioned")
    assert c == oracle_count(bk, pk)


def test_small_mode_tile_and_window_caps():
    from flash_hash_join_tpu.ops import range_table as rt
    from flash_hash_join_tpu.ops.pallas import range_probe as rp

    # SMALL mode bumps the probe tile (per-tile overhead amortization)
    assert rt.default_tile_m(True, rp.DEFAULT_TILE_M) == rt.SMALL_TILE_M
    # explicit tile_m is respected
    assert rt.default_tile_m(True, 64) == 64
    assert rt.default_tile_m(False, rp.DEFAULT_TILE_M) == rp.DEFAULT_TILE_M
    # plan_window never exceeds the structural kernel cap, and a widened
    # retry (w_mult) must re-cap: probe much smaller than build maxes the
    # span estimate
    W = rt.plan_window(10_000_000, 4096, C=8)
    assert W <= rt.MAX_W
    assert min(W * 4, rt.MAX_W) <= rt.MAX_W


def test_blockwise_probe_mode_exact():
    """Mid-size build + big probe side triggers BLOCKWISE probe prep
    (full 64K blocks sorted blockwise, ragged tail unsorted with a
    whole-table window).  Count and materialize must stay exact,
    including max-key sentinels and duplicate build keys."""
    import jax.numpy as jnp
    from flash_hash_join_tpu.ops import range_table as rt

    nb, npr = 30_000, 200_000  # npr = 3 full blocks + 3392-row tail
    assert rt.blockwise_ok(nb, npr, rt.default_C(nb), 32)
    rng = np.random.default_rng(5)
    bk = rng.integers(0, 40_000, nb, dtype=np.uint32)
    bk[7] = 2**32 - 1              # max-key sentinel in the build
    bv = rng.integers(0, 2**31, nb, dtype=np.uint32)
    pk = rng.integers(0, 40_000, npr, dtype=np.uint32)
    pk[123:150] = 2**32 - 1        # max-key probes in a full block
    pk[-20:] = 2**32 - 1           # ... and in the ragged tail
    expected = int(np.isin(pk, bk).sum())

    z = jnp.zeros((nb,), jnp.uint32)
    zp = jnp.zeros((npr,), jnp.uint32)
    count, special = rt.range_join_count(
        z, jnp.asarray(bk), z, jnp.asarray(bv), zp, jnp.asarray(pk),
        nb, npr, narrow=True, interpret=True)
    assert int(special[3]) == 0
    assert int(count) == expected

    out = rt.range_join_materialize(
        z, jnp.asarray(bk), z, jnp.asarray(bv), zp, jnp.asarray(pk),
        nb, npr, narrow=True, narrow_values=True, interpret=True)
    cnt = int(out[0])
    assert int(out[-1][3]) == 0
    assert cnt == expected
    keys = np.asarray(out[2])[:cnt]
    vals = np.asarray(out[4])[:cnt]
    # key multiset parity
    mask = np.isin(pk, bk)
    assert np.array_equal(np.sort(keys), np.sort(pk[mask].astype(np.uint32)))
    # every (key, value) pair must exist in the build
    lut = {}
    for k, v in zip(bk.tolist(), bv.tolist()):
        lut.setdefault(k, set()).add(v)
    assert all(v in lut[k] for k, v in zip(keys.tolist(), vals.tolist()))


def test_blockwise_validity_tail():
    """Validity boundaries under the blockwise band stay exact:
    (a) boundary in the unsorted ragged tail — blockwise stays on;
    (b) boundary MID-BLOCK — callers with validity tails (api host
        chunking) pass full_valid=False, which disables blockwise and
        keeps the natively-exact global sort."""
    import jax.numpy as jnp
    from flash_hash_join_tpu.ops import range_table as rt

    nb, npr = 20_000, 160_000
    rng = np.random.default_rng(6)
    bk = rng.integers(0, 25_000, nb, dtype=np.uint32)
    pk = rng.integers(0, 25_000, npr, dtype=np.uint32)
    z = jnp.zeros((nb,), jnp.uint32)
    zp = jnp.zeros((npr,), jnp.uint32)
    for nvalid, full_valid in ((140_000, True),   # boundary in ragged tail
                               (66_536, False)):  # boundary mid-block
        expected = int(np.isin(pk[:nvalid], bk).sum())
        count, special = rt.range_join_count(
            z, jnp.asarray(bk), z, z, zp, jnp.asarray(pk), nb, nvalid,
            narrow=True, full_valid=full_valid, interpret=True)
        if int(special[3]):
            # a large validity tail shrinks the effective probe density,
            # inflating per-tile spans past the planned window — the op
            # contract reports it unresolved and the api ladder widens
            # (rung 2, w_mult=4); mirror that here
            count, special = rt.range_join_count(
                z, jnp.asarray(bk), z, z, zp, jnp.asarray(pk), nb, nvalid,
                narrow=True, full_valid=full_valid, w_mult=4,
                interpret=True)
        assert int(special[3]) == 0, (nvalid, int(special[3]))
        assert int(count) == expected, (nvalid,)


@pytest.mark.parametrize("nb,npr,seed", [
    (700, 5000, 0),        # small mode
    (20_000, 40_000, 1),   # mid-size
    (5_000, 9_000, 2),
])
def test_range_bloom_tags_parity(nb, npr, seed, monkeypatch):
    """FHJ_RANGE_BLOOM=1 (in-kernel tag plane + tile-consensus scan skip)
    must be result-identical to the plain kernel — the bloom has no false
    negatives, so skipped scans can never lose hits (VERDICT r3 item 6)."""
    rng = np.random.default_rng(seed)
    bk = rng.integers(0, int(nb * 20), nb, dtype=np.uint64)  # ~5% match
    bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
    pk = rng.integers(0, int(nb * 20), npr, dtype=np.uint64)
    c0, _ = _count(bk, bv, pk, allow_unresolved=True)
    monkeypatch.setenv("FHJ_RANGE_BLOOM", "1")
    c1, _ = _count(bk, bv, pk, allow_unresolved=True)
    assert c0 == c1 == oracle_count(bk, pk)


def test_range_bloom_tags_materialize_and_sentinel(monkeypatch):
    rng = np.random.default_rng(7)
    nb, npr = 3_000, 12_000
    bk = rng.integers(0, 60_000, nb, dtype=np.uint64)
    bk[11] = np.uint64(2**64 - 1)  # max-key sentinel via special channel
    bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
    pk = rng.integers(0, 60_000, npr, dtype=np.uint64)
    pk[3:9] = np.uint64(2**64 - 1)
    c0, k0, v0, u0 = _materialize(bk, bv, pk)
    monkeypatch.setenv("FHJ_RANGE_BLOOM", "1")
    c1, k1, v1, u1 = _materialize(bk, bv, pk)
    assert (c0, u0) == (c1, u1)
    assert collections.Counter(k0.tolist()) == collections.Counter(k1.tolist())
    assert collections.Counter(v0.tolist()) == collections.Counter(v1.tolist())
