"""Workload / data-distribution models for benchmarks and tests.

Replaces the reference's external R datagen (generate-data.sh ->
db-benchmark join-datagen.R) with native generators shaped like the same
suites: J1-style uniform key tables at small/medium/big build ratios, plus
the skew models (Zipf) the distributed tier must survive.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class JoinCase:
    """One benchmark case: build side (keys+values) and probe side (keys)."""
    name: str
    build_keys: np.ndarray
    build_values: np.ndarray
    probe_keys: np.ndarray


def j1_suite(n: int, seed: int = 0) -> list[JoinCase]:
    """db-benchmark J1-shaped suite for probe size n.

    Q1: build = n/1e6 rows (tiny), Q2: n/1e3 (medium), Q5: n (big) —
    the numeric-key cases benchmark.py actually runs (Q4's factor key is
    skipped there too, benchmark.py:223-228).  Keys are uniform over
    1.1x the build count, like join-datagen's key universe.
    """
    rng = np.random.default_rng(seed)
    cases = []
    for qid, ratio in (("Q1", 1_000_000), ("Q2", 1_000), ("Q5", 1)):
        nb = max(n // ratio, 1)
        universe = max(int(nb * 1.1), 2)
        bk = rng.integers(0, universe, nb, dtype=np.uint64)
        # db-benchmark's v2 payload is a small int column (join-datagen.R
        # draws 1..100); the reference benchmark casts it to uint64
        # (/root/reference/benchmark.py:233-237)
        bv = rng.integers(1, 101, nb, dtype=np.uint64)
        pk = rng.integers(0, universe, n, dtype=np.uint64)
        cases.append(JoinCase(f"{n:.0e}-{qid}".replace("+", ""), bk, bv, pk))
    return cases


def uniform_case(n_build: int, n_probe: int, match_rate: float = 1.0,
                 seed: int = 0) -> JoinCase:
    """Uniform keys with a controlled probe match rate (bloom benchmarks:
    BASELINE.json config #3 runs 5% match)."""
    rng = np.random.default_rng(seed)
    bk = rng.integers(0, 2**62, n_build, dtype=np.uint64)
    bv = rng.integers(0, 2**63, n_build, dtype=np.uint64)
    n_hit = int(n_probe * match_rate)
    pk = np.concatenate([
        rng.choice(bk, n_hit),
        # disjoint range => guaranteed miss
        rng.integers(2**62, 2**63, n_probe - n_hit, dtype=np.uint64),
    ])
    rng.shuffle(pk)
    return JoinCase(f"uniform_{match_rate:.0%}", bk, bv, pk)


def zipf_probe_case(n_build: int, n_probe: int, a: float = 1.2,
                    seed: int = 0) -> JoinCase:
    """Zipf-skewed probe side over the build keys (hot-key stressor for the
    distributed shuffle)."""
    rng = np.random.default_rng(seed)
    bk = np.unique(rng.integers(0, 2**62, n_build, dtype=np.uint64))
    bv = rng.integers(0, 2**63, len(bk), dtype=np.uint64)
    ranks = rng.zipf(a, size=n_probe)
    pk = bk[np.minimum(ranks - 1, len(bk) - 1)]
    return JoinCase(f"zipf_{a}", bk, bv, pk)
