"""Direct-address bitmap count strategy (ops/direct_bitmap.py).

The dense-domain count tier: parity vs the numpy oracle across domain
offsets, duplicates, misses, wide (>=2^32) probe keys, and validity
tails; the out-of-domain special-channel fallback; and the adaptive
upgrade/eligibility rules api.py applies.
"""

import numpy as np
import pytest

import flash_hash_join_tpu as fj
from flash_hash_join_tpu import api
from flash_hash_join_tpu.ops import direct_bitmap as db
from flash_hash_join_tpu.utils import u64

from tests.oracle import oracle_count


def _case(rng, nb, universe, npr, offset=0, wide_probes=0):
    bk = (rng.integers(0, universe, nb) + offset).astype(np.uint64)
    bv = rng.integers(1, 101, nb).astype(np.uint64)
    pk = (rng.integers(0, int(universe * 1.2) + 1, npr) + offset).astype(
        np.uint64)
    if wide_probes:
        pk[:wide_probes] = rng.integers(2**32, 2**40, wide_probes)
    return bk, bv, pk


@pytest.mark.parametrize("offset", [0, 1_000_000, 4_000_000_000])
def test_direct_count_parity(offset):
    rng = np.random.default_rng(11 + offset % 7)
    bk, bv, pk = _case(rng, 4_000, 4_400, 50_000, offset=offset,
                       wide_probes=64 if offset == 0 else 0)
    want = oracle_count(bk, pk)
    count, _ = fj.join_count(bk, bv, pk, strategy="direct")
    assert count == want


def test_direct_q1_tiny_build():
    rng = np.random.default_rng(5)
    bk, bv, pk = _case(rng, 40, 44, 30_000)
    assert fj.join_count(bk, bv, pk, strategy="direct")[0] == \
        oracle_count(bk, pk)


def test_direct_duplicate_build_keys_count_once():
    bk = np.array([7, 7, 7, 9, 9], np.uint64)
    bv = np.arange(5).astype(np.uint64)
    pk = np.array([7, 9, 9, 8, 7], np.uint64)
    # first-match semantics: probe multiplicity counts, build's does not
    assert fj.join_count(bk, bv, pk, strategy="direct")[0] == 4


def test_direct_rejects_wide_or_sparse():
    rng = np.random.default_rng(1)
    bv = np.ones(100, np.uint64)
    pk = rng.integers(0, 100, 1000).astype(np.uint64)
    wide = rng.integers(2**32, 2**40, 100).astype(np.uint64)
    with pytest.raises(ValueError):
        fj.join_count(wide, bv, pk, strategy="direct")
    sparse = rng.integers(0, 2**28, 100).astype(np.uint64)  # span > 2^20
    with pytest.raises(ValueError):
        fj.join_count(sparse, bv, sparse, strategy="direct")


def test_adaptive_upgrades_dense_count_only():
    rng = np.random.default_rng(2)
    bk, bv, pk = _case(rng, 40_000, 44_000, 1 << 17)
    _, _, info = api._run_join(bk, bv, pk, mode="count",
                               strategy="adaptive", use_bloom=False,
                               return_info=True)
    assert info["strategy"] == "direct" and info["d_rows"] > 0
    # materialize must NOT take the bitmap path (membership has no values)
    _, _, info = api._run_join(bk, bv, pk, mode="materialize",
                               strategy="adaptive", use_bloom=False,
                               return_info=True)
    assert info["strategy"] != "direct"
    # sparse 64-bit keys: adaptive silently keeps the regular plan
    wide = rng.integers(0, 2**62, 40_000).astype(np.uint64)
    wpk = rng.integers(0, 2**62, 1 << 17).astype(np.uint64)
    _, _, info = api._run_join(wide, bv, wpk, mode="count",
                               strategy="adaptive", use_bloom=False,
                               return_info=True)
    assert info["strategy"] != "direct"


def test_adaptive_gates_by_measured_crossover(monkeypatch):
    # Adaptive routes direct inside the measured win regions: the SCAN
    # band (span <= ADAPTIVE_SCAN_DOMAIN_BITS = 2^19) and the LARGE
    # dense_bitmap band (span in (2^20, 2^26] passing BOTH the
    # large_span_ok density gate and the large_span_wins perf gate —
    # round-4 2D crossover sweep, profile_crossover.py).  The hole
    # (2^19, 2^20] stays partitioned: the 256-row scan rung measured
    # slower there.  Sparse large spans (failing large_span_ok) must
    # also stay partitioned.  The perf gate is forced open here so the
    # structural gates are what this test exercises at CPU-sized probe
    # counts; the gate itself is unit-tested below.
    from flash_hash_join_tpu.ops import direct_bitmap as db
    monkeypatch.setattr(db, "large_span_wins", lambda nb, npr: True)
    rng = np.random.default_rng(6)
    nb = 1 << 16
    span = (1 << 20) + 4096
    bk = rng.integers(0, span, nb).astype(np.uint64)
    bv = rng.integers(1, 101, nb).astype(np.uint64)
    pk = rng.integers(0, int(span * 1.1), 1 << 16).astype(np.uint64)
    count, _, info = api._run_join(bk, bv, pk, mode="count",
                                   strategy="adaptive", use_bloom=False,
                                   return_info=True)
    assert info["strategy"] == "direct"  # dense large span: routed
    assert info["d_rows"] > 256
    assert count == oracle_count(bk, pk)
    # scan-band hole (2^19, 2^20]: stays partitioned
    bk_h = rng.integers(0, (1 << 19) + 4096, nb).astype(np.uint64)
    _, _, info = api._run_join(bk_h, bv, pk, mode="count",
                               strategy="adaptive", use_bloom=False,
                               return_info=True)
    assert info["strategy"] != "direct"
    # sparse large span (fails the density gate): stays partitioned
    bk_s = (rng.integers(0, 1 << 12, nb).astype(np.uint64)
            << np.uint64(13))  # span ~2^25, only 2^12 distinct clusters
    _, _, info = api._run_join(bk_s, bv, pk, mode="count",
                               strategy="adaptive", use_bloom=False,
                               return_info=True)
    assert info["strategy"] != "direct"
    # in-region span (2^18 <= 2^19): adaptive upgrades
    bk2 = rng.integers(0, 1 << 18, 40_000).astype(np.uint64)
    bv2 = rng.integers(1, 101, 40_000).astype(np.uint64)
    pk2 = rng.integers(0, 1 << 18, 1 << 17).astype(np.uint64)
    count2, _, info = api._run_join(bk2, bv2, pk2, mode="count",
                                    strategy="adaptive", use_bloom=False,
                                    return_info=True)
    assert info["strategy"] == "direct"
    assert count2 == oracle_count(bk2, pk2)


def test_large_span_wins_pins_measured_crossover():
    # Pin the measured v5e win/lose points (profile_crossover.py round 4;
    # constants in ops/direct_bitmap.py).  Losing points at <= 2e7 probes
    # must stay partitioned; the 4e7-probe row must route direct.
    from flash_hash_join_tpu.ops import direct_bitmap as db
    for nb in (2_500_000, 10_000_000):
        assert not db.large_span_wins(nb, 10_000_000)
        assert not db.large_span_wins(nb, 20_000_000)
        assert db.large_span_wins(nb, 40_000_000)
    assert not db.large_span_wins(20_000_000, 20_000_000)
    assert db.large_span_wins(40_000_000, 40_000_000)   # flagship
    assert db.large_span_wins(100_000_000, 100_000_000)  # 1e8 J1 Q5
    # no measured win for build >> probe: stays partitioned
    assert not db.large_span_wins(60_000_000, 40_000_000)


def test_out_of_domain_special_channel():
    # engine-level: a rung too small for the span must COUNT the overflow
    # (the api retry ladder then reruns on merge), never miscount silently
    rng = np.random.default_rng(3)
    bk = rng.integers(0, 100_000, 2_000).astype(np.uint64)  # span > 8 rows
    pk = rng.integers(0, 100_000, 9_000).astype(np.uint64)
    kh, kl = u64.split_u64(bk)
    ph, pl = u64.split_u64(pk)
    count, special = db.direct_join_count(
        kh, kl, ph, pl, np.int32(len(bk)), np.int32(len(pk)),
        d_rows=8, interpret=True)
    assert int(special[3]) > 0


def test_direct_validity_tail():
    rng = np.random.default_rng(4)
    bk, bv, pk = _case(rng, 1_000, 1_100, 9_000)
    kh, kl = u64.split_u64(bk)
    ph, pl = u64.split_u64(pk)
    valid = 7_333
    count, special = db.direct_join_count(
        kh, kl, ph, pl, np.int32(len(bk)), np.int32(valid),
        d_rows=db.d_rows_for(1_100), interpret=True)
    assert int(special[3]) == 0
    assert int(count) == oracle_count(bk, pk[:valid])


def test_d_rows_rungs():
    assert db.d_rows_for(1) == 8
    assert db.d_rows_for(8 * 4096) == 8
    assert db.d_rows_for(8 * 4096 + 1) == 16
    assert db.d_rows_for(44_000) == 16
    assert db.d_rows_for(1 << 20) == 256
