"""On-device (real TPU) correctness smoke for the Pallas kernels.

Runs the VMEM bucket probe and the range-table probe COMPILED (not
interpret mode) against the numpy oracle — the round-1 gap was that kernel
numerics on hardware were vouched for only by benchmark runs
(VERDICT round-1 "What's weak" item 4).

Exit codes: 0 = all checks passed, 3 = no TPU available, 1 = failure.
Invoked by tests/test_tpu_device.py (skips on 3) or manually.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import signal

    import jax

    # A downed axon tunnel makes jax.devices() HANG rather than raise;
    # bound discovery so the caller sees a clean "no TPU" skip instead of
    # eating test_tpu_device.py's whole 1500 s subprocess timeout.
    def _hung(signum, frame):
        raise TimeoutError("device discovery timed out (tunnel down?)")

    signal.signal(signal.SIGALRM, _hung)
    signal.alarm(int(os.environ.get("FHJ_TPU_DISCOVERY_TIMEOUT", "150")))
    try:
        devs = jax.devices()
    except Exception as e:
        print(f"no TPU: {e}")
        return 3
    finally:
        signal.alarm(0)
    if not devs or devs[0].platform == "cpu":
        print(f"no TPU: devices={devs}")
        return 3
    print("devices:", devs, flush=True)

    import numpy as np
    import flash_hash_join_tpu as fj

    rng = np.random.default_rng(42)

    # vmem bucket kernel across R regimes (small + the once-OOMing R=32+)
    for nb, npr in ((400, 120_000), (3_000, 150_000), (30_000, 200_000)):
        bk = rng.integers(0, int(nb * 1.3), nb, dtype=np.uint64)
        bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
        pk = rng.integers(0, int(nb * 1.3), npr, dtype=np.uint64)
        want = int(np.isin(pk, np.unique(bk)).sum())
        c, _ = fj.join_count(bk, bv, pk, strategy="vmem")
        assert c == want, ("vmem count", nb, c, want)
        c, _, keys, vals = fj.join_materialize(
            bk, bv, pk, strategy="vmem", return_arrays=True)
        assert c == want, ("vmem materialize", nb, c, want)
        print(f"vmem nb={nb} OK", flush=True)

    # range (partitioned) kernel, wide + narrow, count + materialize values
    nb, npr = 60_000, 200_000
    bk = rng.permutation(np.arange(nb, dtype=np.uint64) * np.uint64(3))
    bv = bk + np.uint64(5)
    pk = rng.integers(0, 3 * nb, npr, dtype=np.uint64)
    want = int(np.isin(pk, bk).sum())
    c, _ = fj.join_count(bk, bv, pk, strategy="partitioned")  # narrow
    assert c == want, ("partitioned narrow", c, want)
    c, _, keys, vals = fj.join_materialize(
        bk, bv, pk, strategy="partitioned", return_arrays=True)
    assert c == want
    assert np.all(vals == keys + np.uint64(5)), "narrow values"
    print("partitioned narrow OK", flush=True)

    bk64 = bk + np.uint64(2**40)
    pk64 = pk + np.uint64(2**40)
    c, _ = fj.join_count(bk64, bv, pk64, strategy="partitioned")  # wide
    assert c == want, ("partitioned wide", c, want)
    c, _, keys, vals = fj.join_materialize(
        bk64, bv, pk64, strategy="partitioned", return_arrays=True)
    assert c == want
    assert np.all(vals == (keys - np.uint64(2**40)) + np.uint64(5))
    print("partitioned wide OK", flush=True)

    # sentinel keys through the compiled kernels
    bk2 = np.array([2**64 - 1, 7, 9] * 2000, dtype=np.uint64)
    bv2 = np.arange(6000, dtype=np.uint64)
    pk2 = np.array([2**64 - 1, 7, 8] * 40000, dtype=np.uint64)
    want = int(np.isin(pk2, np.unique(bk2)).sum())
    for strat in ("vmem", "partitioned"):
        c, _ = fj.join_count(bk2, bv2, pk2, strategy=strat)
        assert c == want, (strat, c, want)
    print("sentinel OK", flush=True)

    # dense STAGED materialize at a multi-sort-block shape with a pad
    # tail: pins the round-5 XLA:TPU fusion miscompile of the blockwise
    # sort (+128 spurious hits at 20 blocks; fixed by routing the sorted
    # array through dv.materialize_copy — see that docstring).  npr=2e7
    # was the observed failure; 5 blocks + ragged pad reproduces the
    # shape class at a quarter of the cost.
    rng2 = np.random.default_rng(99)
    nb3, npr3 = 40_000, 5 * (1 << 20) + 77_777
    bk3 = rng2.integers(0, 44_000, nb3, dtype=np.uint64)
    bv3 = rng2.integers(0, 2**31, nb3, dtype=np.uint64)
    pk3 = rng2.integers(0, 44_000, npr3, dtype=np.uint64)
    want3 = int(np.isin(pk3, np.unique(bk3)).sum())
    c, _ = fj.join_materialize(bk3, bv3, pk3, strategy="direct")
    assert c == want3, ("dense staged materialize", c, want3)
    print("dense staged materialize OK", flush=True)
    print("ALL TPU KERNEL CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
