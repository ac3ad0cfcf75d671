"""Cost + feasibility model for adaptive strategy selection.

The reference dispatches on a single hard-coded row threshold
(`build_size < RADIX_JOIN_THRESHOLD` = 1e6, hash_join.cpp:576-594) and has
no capacity planning at all (a too-large probe side simply OOMs the host).
The TPU replacement has two jobs:

1. STRATEGY (measured, round-3 chained profiling — scripts/
   profile_roofline.py, profile_flagship.py): the partitioned range table
   wins every regime head-to-head (docs/RESULTS.md) — small builds via its
   SMALL mode, large builds by construction — so the adaptive strategy is
   the constant "partitioned"; vmem/global/merge remain explicit tiers and
   exactness fallbacks.

2. FEASIBILITY (this is what the reference's morsel loop does implicitly,
   hash_join.cpp:302,:347 — bounded working set regardless of probe
   length): the partitioned tier sorts the probe side, whose transient
   sort/pad/plane buffers scale with the CHUNK it processes, not the whole
   stream.  `choose_plan` sizes probe chunks so that

       persistent (input planes)  16*nb + 8*np          bytes
     + range table                ~16*nb (+8*nb values) bytes
     + transient per chunk        ~32 (count) / ~64 (materialize) B/row

   stays inside HBM_BUDGET_BYTES.  Calibration anchors (v5e 16 GiB):
   4e8-probe joins ran single-shot in round 2 (transient <= ~31 B/row) and
   1e9 single-shot OOMs — so 1e9 probes plan ~6 chunks and stream
   (docs/RESULTS.md "BASELINE config #3").
"""

from __future__ import annotations

import dataclasses

from flash_hash_join_tpu.utils.config import JoinConfig

# Usable VMEM per TPU core after pipeline buffers (of ~16 MiB physical).
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# HBM working-set budget for a single-chip join (v5e: 16 GiB physical,
# minus XLA runtime/fragmentation headroom).
HBM_BUDGET_BYTES = 14 * 1024**3

# Transient device bytes per probe row while a chunk is in flight
# (sort in/out copies, padded planes, kernel outputs).  Conservative upper
# bounds calibrated against round-2/3 runs (see module docstring).
TRANSIENT_BYTES_COUNT = 32
TRANSIENT_BYTES_MATERIALIZE = 64


@dataclasses.dataclass(frozen=True)
class JoinPlan:
    strategy: str       # "vmem" | "partitioned" | "merge" | "global"
    gbits: int          # home-group bits for the global-table graph
    probe_chunks: int   # partitioned tier: probe chunks that fit HBM


def table_bytes(n_build: int, cfg: JoinConfig) -> tuple[int, int]:
    """(keys-table bytes, bloom bytes) for the global-table strategy."""
    ntot = cfg.total_groups(n_build)
    per_group = 2 * cfg.group_size * 4  # uint32 hi+lo per slot
    return ntot * per_group, ntot * 4


def plan_probe_chunks(n_build: int, n_probe: int, mode: str,
                      budget_bytes: int = HBM_BUDGET_BYTES) -> int:
    """Number of probe chunks the partitioned tier must stream in.

    1 means single-shot (the common case).  Materialize outputs are
    probe-sized, so they count as persistent there.
    """
    persistent = 16 * n_build + 8 * n_probe
    table = 16 * n_build + (8 * n_build if mode == "materialize" else 0)
    if mode == "materialize":
        persistent += 16 * n_probe  # compacted output planes
        per_row = TRANSIENT_BYTES_MATERIALIZE
    else:
        per_row = TRANSIENT_BYTES_COUNT
    avail = budget_bytes - persistent - table
    if avail <= 0:
        # Inputs alone exceed the chip: no chunking can fix it; the caller
        # gets the most-chunked plan we can express and XLA's allocator
        # has the final word (multi-chip is the real answer — parallel/).
        return max(1, -(-n_probe // max(1, n_probe // 64)))
    chunk_rows = avail // per_row
    if chunk_rows >= n_probe:
        return 1
    return -(-n_probe // max(chunk_rows, 1))


def choose_plan(n_build: int, n_probe: int, cfg: JoinConfig,
                mode: str = "count",
                budget_bytes: int = HBM_BUDGET_BYTES) -> JoinPlan:
    """Pick strategy + chunking for a build/probe size pair.

    Strategy is measured-constant "partitioned" (see module docstring);
    the real decision surface is feasibility: probe_chunks > 1 switches
    the engine to the streamed-probe graph (range_join_count_chunked).
    """
    return JoinPlan(
        "partitioned",
        cfg.group_bits(n_build),
        plan_probe_chunks(n_build, n_probe, mode, budget_bytes),
    )
