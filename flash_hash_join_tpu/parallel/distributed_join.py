"""Distributed hash join over a TPU device mesh (shard_map + all_to_all).

NOT PRESENT in the reference (single-process CPU, SURVEY.md §2 "Parallelism
strategies").  Design per SURVEY.md §5/§7 distributed tier:

  1. Both sides arrive sharded along mesh axis "x" (row-sharded columns).
  2. Each device hash-shuffles its rows so device d holds every row whose
     hash's top log2(ndev) bits equal d (parallel/shuffle.py — the
     distributed analog of the reference's radix partitioner C5/C6).
  3. Each device builds its local table over its received build rows using
     hash bits BELOW the device bits (pre_shift) and probes its received
     probe rows — pure local compute, no further communication.
  4. count = psum of local counts; materialized rows stay sharded.

Join semantics are preserved exactly: key -> device is a function of the key,
so first-match/dedup semantics hold globally.  Quota overflow (skew beyond
the safety factor) is surfaced as a psum'd drop counter; the engine raises.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from flash_hash_join_tpu.ops import hash_table as ht
from flash_hash_join_tpu.parallel.shuffle import hash_shuffle, dest_device
from flash_hash_join_tpu.utils.config import JoinConfig, DEFAULT_CONFIG


class DistJoinResult(NamedTuple):
    count: jnp.ndarray      # () int32 — global match count (replicated)
    overflow: jnp.ndarray   # () int32 — rows dropped by quota overflow


def _local_join(
    kh, kl, vh, vl, ph, pl,
    *,
    axis_name: str,
    ndev: int,
    quota_b: int,
    quota_p: int,
    cfg: JoinConfig,
    use_bloom: bool,
    materialize: bool,
):
    """Per-shard body (runs under shard_map)."""
    dbits = max(ndev.bit_length() - 1, 0)

    ones_b = jnp.ones(kh.shape, jnp.bool_)
    ones_p = jnp.ones(ph.shape, jnp.bool_)

    (rkh, rkl, rvh, rvl), bvalid, overflow_b = hash_shuffle(
        (kh, kl, vh, vl), dest_device(kh, kl, dbits), ones_b,
        ndev=ndev, quota=quota_b, axis_name=axis_name,
    )
    (rph, rpl), pvalid, overflow_p = hash_shuffle(
        (ph, pl), dest_device(ph, pl, dbits), ones_p,
        ndev=ndev, quota=quota_p, axis_name=axis_name,
    )

    n_recv_b = rkh.shape[0]
    gbits = cfg.group_bits(n_recv_b)
    table = ht.build_table(
        rkh, rkl, rvh, rvl, n_recv_b,
        gbits=gbits, group_size=cfg.group_size,
        overflow_groups=cfg.overflow_groups,
        with_bloom=use_bloom, bloom_k=cfg.bloom_k,
        pre_shift=dbits, valid_mask=bvalid,
        max_probe_iters=cfg.max_probe_iters,
    )
    static = dict(
        gbits=gbits, group_size=cfg.group_size,
        total_groups=(1 << gbits) + cfg.overflow_groups,
        use_bloom=use_bloom, bloom_k=cfg.bloom_k,
        max_iters=cfg.max_probe_iters, pre_shift=dbits,
    )
    # Fold in keys the LOCAL table build dropped (chain/table overflow,
    # special[3]) so callers see every exactness hazard in one counter —
    # the single-chip path falls back on this signal (api.py); distributed
    # callers must treat overflow > 0 the same way.
    build_drops = jax.lax.psum(table.special[3].astype(jnp.int32), axis_name)
    overflow = overflow_b + overflow_p + build_drops
    if materialize:
        count, okh, okl, ovh, ovl = ht.probe_materialize(
            table, rph, rpl, rph.shape[0],
            probe_chunk=cfg.probe_chunk, valid_mask=pvalid, **static,
        )
        gcount = jax.lax.psum(count, axis_name)
        return gcount, overflow, count[None], okh, okl, ovh, ovl
    count = ht.probe_count(
        table, rph, rpl, rph.shape[0],
        probe_chunk=cfg.probe_chunk, valid_mask=pvalid, **static,
    )
    return jax.lax.psum(count, axis_name), overflow


def build_distributed_join(
    mesh: Mesh,
    n_build_shard: int,
    n_probe_shard: int,
    *,
    cfg: JoinConfig = DEFAULT_CONFIG,
    use_bloom: bool = False,
    materialize: bool = False,
    quota_factor: float = 2.0,
    axis_name: str = "x",
):
    """Returns a jitted distributed join over `mesh`.

    The returned fn takes 6 sharded columns (build kh/kl/vh/vl, probe ph/pl,
    each (ndev * n_*_shard,) row-sharded on axis_name) and returns
    DistJoinResult (count mode) or (count, overflow, local outputs) in
    materialize mode (outputs stay sharded).

    quota_factor oversizes the per-(src,dst) exchange buckets relative to the
    uniform expectation n_shard/ndev; Zipf-skewed keys need hot-key splitting
    (future tier) or a larger factor.
    """
    ndev = mesh.devices.size
    quota_b = max(int(n_build_shard / ndev * quota_factor) + 16, 16)
    quota_p = max(int(n_probe_shard / ndev * quota_factor) + 16, 16)

    body = functools.partial(
        _local_join,
        axis_name=axis_name, ndev=ndev, quota_b=quota_b, quota_p=quota_p,
        cfg=cfg, use_bloom=use_bloom, materialize=materialize,
    )
    sh = P(axis_name)
    if materialize:
        out_specs = (P(), P(), sh, sh, sh, sh, sh)
    else:
        out_specs = (P(), P())
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(sh,) * 6,
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def shard_columns(mesh: Mesh, arrays, axis_name: str = "x"):
    """Device_put row columns with sharding P(axis_name) on mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return [jax.device_put(a, sharding) for a in arrays]
