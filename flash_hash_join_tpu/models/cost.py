"""Cost model for adaptive strategy selection.

The reference dispatches on a single hard-coded row threshold
(`build_size < RADIX_JOIN_THRESHOLD` = 1e6, hash_join.cpp:576-594).  The TPU
replacement dispatches on measured per-row primitive costs (v5e, round-2
scripts/microbench.py, value-fetch timed so async dispatch cannot lie):

    lax.sort               ~3.0-5 ns/row (cols-dependent)  [merge, range]
    XLA HBM gather         ~7-12 ns/row                    [global]
    XLA scatter            ~8.5 ns/row                     [global build]
    Pallas VMEM probe      ~0.4-1 ns/row                   [vmem, range]
    streaming pass         ~0.4 ns/row

Policy:
  * vmem       — build fits the 128-bucket VMEM table and the probe side
                 is large enough to amortize building it.
  * partitioned — everything else: hash-sorted range table + windowed
                 Pallas probe (ops/range_table.py) costs ~5.5 ns/row/side,
                 beating merge (~10 ns/row over nb+np) and global
                 (~12 ns/probe) across the measured space.
  * merge      — the always-exact fallback (no window/quota failure
                 modes); selected only by explicit request or fallback.
  * global     — explicit request only.
"""

from __future__ import annotations

import dataclasses

from flash_hash_join_tpu.utils.config import JoinConfig

# Usable VMEM per TPU core after pipeline buffers (of ~16 MiB physical).
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# HBM capacity guardrail for a single-chip join (v5e: 16 GiB).
HBM_BUDGET_BYTES = 14 * 1024**3


@dataclasses.dataclass(frozen=True)
class JoinPlan:
    strategy: str       # "vmem" | "partitioned" | "merge" | "global"
    gbits: int          # home-group bits for the global-table graph
    table_bytes: int    # global-table footprint (diagnostic)
    bloom_bytes: int
    fits_vmem: bool


def table_bytes(n_build: int, cfg: JoinConfig) -> tuple[int, int]:
    """(keys-table bytes, bloom bytes) for the global-table strategy."""
    ntot = cfg.total_groups(n_build)
    per_group = 2 * cfg.group_size * 4  # uint32 hi+lo per slot
    return ntot * per_group, ntot * 4


def choose_plan(n_build: int, n_probe: int, cfg: JoinConfig) -> JoinPlan:
    """Pick the probe strategy for a build/probe size pair.

    Measured head-to-head on v5e (docs/RESULTS.md): the partitioned range
    table wins EVERY regime — small builds via its SMALL mode (window ==
    whole table, no probe sort, rank-balanced columns beat the
    Poisson-padded vmem buckets: Q1/Q2 shapes ~1.8x), mid builds 20K-40K
    x 10M probes (47 ms vs 80 ms for the vmem bucket path), and large
    builds by construction.  vmem/global/merge remain explicit strategies
    and fallback tiers; the adaptive plan is simply "partitioned".
    """
    kb, bb = table_bytes(n_build, cfg)
    fits_vmem = kb + bb <= VMEM_BUDGET_BYTES
    return JoinPlan("partitioned", cfg.group_bits(n_build), kb, bb,
                    fits_vmem)
