"""Cost model for adaptive strategy selection.

The reference dispatches on a single hard-coded row threshold
(`build_size < RADIX_JOIN_THRESHOLD` = 1e6, hash_join.cpp:576-594).  The TPU
replacement models the actual hardware constraint: does the working set of
the probe phase (the keys table, plus the bloom directory when enabled) fit
in VMEM, in on-chip-cacheable HBM, or neither — and picks the execution
strategy accordingly (SURVEY.md §2 C11 "cost model over partition fits in
VMEM").
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
    strategy: str  # "global" | "partitioned"
    gbits: int
    table_bytes: int
    bloom_bytes: int
    num_partitions: int  # >1 only for "partitioned"
    fits_vmem: bool


def table_bytes(n_build: int, cfg: JoinConfig) -> tuple[int, int]:
    """(keys-table bytes, bloom bytes) for a build side of n_build rows."""
    ntot = cfg.total_groups(n_build)
    per_group = 2 * cfg.group_size * 4  # uint32 hi+lo per slot
    return ntot * per_group, ntot * 4


def choose_plan(n_build: int, n_probe: int, cfg: JoinConfig) -> JoinPlan:
    """Pick the probe strategy for a build/probe size pair.

    "global": one table in HBM, probe via bucketized gathers.  Best when the
    table is small enough that gathers stay cache/VMEM-friendly, or when the
    probe side is small relative to the partitioning cost.

    "partitioned": radix-partition both sides by top hash bits so each
    partition's table fits in VMEM, then run the Pallas partition-local
    probe.  Worth it when the probe side is large enough to amortize
    partitioning it (the reference's radix path pays the same toll:
    partitioning the probe side, hash_join.cpp:321).
    """
    kb, bb = table_bytes(n_build, cfg)
    fits_vmem = kb + bb <= VMEM_BUDGET_BYTES

    # Measured on v5e (scripts/profile_*):
    #   * Pallas VMEM bucket probe: ~0.5ns/probe at small builds (2.3B/s).
    #   * lax.sort: ~6.5ns/row  ->  merge join ~ (nb+np) * 6.5ns.
    #   * XLA HBM gather: ~12ns/probe flat -> global table path.
    from flash_hash_join_tpu.ops.bucket_table import max_build_rows
    if n_build <= max_build_rows() and n_probe >= 2 * n_build:
        return JoinPlan("vmem", cfg.group_bits(n_build), 0, 0, 1, True)

    # When the probe side is not much larger than the build side, the
    # gather-free sort-merge join wins — sorting (nb+np) rows beats an
    # nb-row table build + np gathers.
    if n_probe < 4 * n_build:
        return JoinPlan("merge", cfg.group_bits(n_build), 0, 0, 1, False)

    if fits_vmem:
        return JoinPlan("global", cfg.group_bits(n_build), kb, bb, 1, True)

    # Partition count that brings one partition's keys table under budget.
    parts = 1
    while True:
        per_part_rows = -(-n_build // parts)
        pk, pb = table_bytes(per_part_rows, cfg)
        if pk + pb <= VMEM_BUDGET_BYTES or parts >= 1 << 12:
            break
        parts *= 2

    return JoinPlan("partitioned", cfg.group_bits(n_build), kb, bb, parts, False)
