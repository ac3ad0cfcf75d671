"""Public API contract: all 13 reference functions, strategy selection,
overflow fallback, extended materialize arrays."""

import numpy as np
import pytest

import flash_hash_join_tpu as fj
from flash_hash_join_tpu.models.cost import choose_plan
from flash_hash_join_tpu.utils.config import DEFAULT_CONFIG
from tests.oracle import oracle_count

ALL_FNS = [
    "adaptive_join", "adaptive_join_bloom", "adaptive_join_count",
    "adaptive_join_count_bloom", "hash_join", "hash_join_bloom",
    "hash_join_radix", "hash_join_radix_bloom", "hash_join_count",
    "hash_join_count_bloom", "hash_join_count_radix",
    "hash_join_count_radix_bloom",
]


def test_initialize():
    assert fj.initialize() is True


def test_all_reference_functions_agree():
    rng = np.random.default_rng(0)
    bk = rng.integers(0, 20_000, 10_000, dtype=np.uint64)
    bv = rng.integers(0, 2**63, 10_000, dtype=np.uint64)
    pk = rng.integers(0, 20_000, 30_000, dtype=np.uint64)
    expected = oracle_count(bk, pk)
    for name in ALL_FNS:
        count, secs = getattr(fj, name)(bk, bv, pk)
        assert count == expected, name
        assert secs >= 0.0


def test_vmem_strategy_used_and_exact():
    """The vmem bucket strategy stays available explicitly (the adaptive
    plan routes everything to the measured-faster partitioned tier)."""
    assert choose_plan(30_000, 200_000, DEFAULT_CONFIG).strategy == (
        "partitioned")
    rng = np.random.default_rng(1)
    bk = rng.integers(0, 2**64, 1_000, dtype=np.uint64)
    bv = rng.integers(0, 2**63, 1_000, dtype=np.uint64)
    pk = np.concatenate([rng.choice(bk, 100_000),
                         rng.integers(0, 2**64, 100_000, dtype=np.uint64)])
    count, _ = fj.adaptive_join_count(bk, bv, pk)
    assert count == oracle_count(bk, pk)
    count2, _, keys, vals = fj.join_materialize(bk, bv, pk,
                                                return_arrays=True)
    assert count2 == count
    assert len(keys) == count


def test_vmem_overflow_falls_back_exactly(monkeypatch):
    """Force bucket overflow (r_slots too small for the key count) and check
    the API silently reruns with merge and stays exact."""
    from flash_hash_join_tpu.ops import bucket_table as bt
    monkeypatch.setattr(bt, "r_slots_for", lambda n: 8)
    from flash_hash_join_tpu import engine
    engine._compiled.cache_clear()
    rng = np.random.default_rng(2)
    bk = np.unique(rng.integers(0, 2**63, 5_000, dtype=np.uint64))
    bv = rng.integers(0, 2**63, len(bk), dtype=np.uint64)
    pk = np.concatenate([rng.choice(bk, 20_000),
                         rng.integers(0, 2**63, 20_000, dtype=np.uint64)])
    count, _ = fj.join_count(bk, bv, pk, strategy="vmem")
    assert count == oracle_count(bk, pk)
    engine._compiled.cache_clear()


def test_merge_strategy_via_extended_api():
    rng = np.random.default_rng(3)
    bk = rng.integers(0, 5_000, 4_000, dtype=np.uint64)
    bv = rng.integers(0, 2**63, 4_000, dtype=np.uint64)
    pk = rng.integers(0, 5_000, 4_000, dtype=np.uint64)
    c1, _ = fj.join_count(bk, bv, pk, strategy="merge")
    c2, _ = fj.join_count(bk, bv, pk, strategy="global")
    c3, _ = fj.join_count(bk, bv, pk, strategy="vmem")
    assert c1 == c2 == c3 == oracle_count(bk, pk)


def test_api_narrow_density_mismatch_ladder():
    """Probe keys spanning a wider range than build keys overflow the
    narrow order's matched-density window plan; the retry ladder
    (narrow w_mult=4 -> hash -> merge) must keep the result exact."""
    import flash_hash_join_tpu as fj

    rng = np.random.default_rng(31)
    nb, npr = 20_000, 50_000
    bk = rng.permutation(np.arange(nb, dtype=np.uint64))
    bv = rng.integers(0, 2**31, nb, dtype=np.uint64)
    pk = rng.integers(0, 2 * nb, npr, dtype=np.uint64)
    expected = int(np.isin(pk, bk).sum())
    count, _ = fj.adaptive_join_count(bk, bv, pk)
    assert count == expected
    count2, _, keys, vals = fj.join_materialize(bk, bv, pk,
                                                return_arrays=True)
    assert count2 == expected
    lut = dict(zip(bk.tolist(), bv.tolist()))
    assert all(lut[k] == v for k, v in zip(keys.tolist(), vals.tolist()))


def test_measure_device_seconds_chained_invariance():
    """The chained-delta device timer must reproduce the exact count on
    every remixed step (engine._compiled_chained) for count AND
    materialize, on both the partitioned and global strategies."""
    rng = np.random.default_rng(7)
    nb, npr = 30_000, 60_000
    bk = rng.integers(0, 40_000, nb, dtype=np.uint64)
    bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
    pk = rng.integers(0, 40_000, npr, dtype=np.uint64)
    want = oracle_count(bk, pk)
    for mode in ("count", "materialize"):
        for strat in ("adaptive", "global"):
            count, dev, single, chained = fj.measure_device_seconds(
                bk, bv, pk, mode=mode, strategy=strat, reps=3, number=1)
            assert count == want, (mode, strat, count, want)
            assert dev > 0 and single > 0


def test_bloom_alias_introspection():
    # bloom only changes the compiled graph on the global strategy
    assert fj.bloom_is_distinct(10_000, 10_000, strategy="global")
    assert not fj.bloom_is_distinct(10_000, 10_000, strategy="partitioned")
    assert fj.plan_strategy(10_000, 10_000) in (
        "partitioned", "vmem", "global", "merge")


def test_bloom_alias_reuses_compiled_program():
    """use_bloom must not change the compile-cache key off the global
    strategy — the alias twins share one AOT-compiled program."""
    from flash_hash_join_tpu.engine import default_engine

    eng = default_engine()
    a = eng.prepare(1000, 2000, "count", "partitioned", False)
    b = eng.prepare(1000, 2000, "count", "partitioned", True)
    assert a is b
    g1 = eng.prepare(1000, 2000, "count", "global", False)
    g2 = eng.prepare(1000, 2000, "count", "global", True)
    assert g1 is not g2
