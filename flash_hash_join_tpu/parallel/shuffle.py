"""Ragged hash shuffle over a device mesh axis.

The distributed generalization of the reference's radix partitioner
(parallel_radix_partition_kv/_k, hash_join.cpp:209-292): partition id = top
bits of the SAME hash used for table bucketing, but here the partition id
selects the destination DEVICE and the exchange rides ICI via
`jax.lax.all_to_all` instead of a shared-memory scatter.

XLA collectives need static shapes, so the ragged exchange uses fixed-quota
buckets: each device sorts its rows by destination, packs them into an
(ndev, quota) send tensor, all_to_alls it, and exchanges per-bucket counts
the same way so receivers can mask padding.  Rows beyond the quota are
dropped and COUNTED (returned as `overflow`, psum'd) — callers size the quota
with a safety factor and must treat overflow > 0 as an error/resize signal.
Skew beyond the safety factor is the hot-key problem (SURVEY.md §5
"distributed communication backend"); heavy-hitter splitting lands on top of
this primitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flash_hash_join_tpu.ops.hashing import hash_u64


def dest_device(kh, kl, dbits: int) -> jnp.ndarray:
    """Destination device id = top dbits of the key hash (0 if dbits == 0)."""
    if dbits == 0:
        return jnp.zeros(kh.shape, jnp.uint32)
    h = hash_u64(kh, kl)
    return h >> jnp.uint32(32 - dbits)


def hash_shuffle(
    cols: tuple[jnp.ndarray, ...],
    dest: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    ndev: int,
    quota: int,
    axis_name: str,
):
    """Exchange rows so device d receives every row with dest == d.

    cols: equal-length uint32 row columns on this shard.
    dest: (n,) uint32 destination device per row.
    valid: (n,) bool; invalid rows are not sent.

    Returns (recv_cols, recv_valid, overflow):
      recv_cols: tuple of (ndev * quota,) uint32 arrays (padded),
      recv_valid: (ndev * quota,) bool mask of real rows,
      overflow: () int32, GLOBAL count of rows dropped for quota overflow.
    """
    n = dest.shape[0]
    dest = jnp.where(valid, dest.astype(jnp.uint32), jnp.uint32(ndev))

    # Sort rows by destination; invalid rows (dest=ndev) sink to the end.
    sort_ops = jax.lax.sort((dest,) + tuple(c.astype(jnp.uint32) for c in cols),
                            num_keys=1, is_stable=False)
    dest_s, cols_s = sort_ops[0], sort_ops[1:]

    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), dest_s.astype(jnp.int32),
        num_segments=ndev + 1
    )[:ndev]
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    dest_i = dest_s.astype(jnp.int32)
    safe_dest = jnp.minimum(dest_i, ndev - 1)
    rank = jnp.arange(n, dtype=jnp.int32) - starts[safe_dest]

    sendable = (dest_i < ndev) & (rank < quota)
    overflow_local = jnp.sum((dest_i < ndev) & (rank >= quota)).astype(jnp.int32)

    flat = safe_dest * quota + rank
    flat = jnp.where(sendable, flat, ndev * quota + jnp.arange(n, dtype=jnp.int32))

    send_counts = jnp.minimum(counts, quota)
    recv_cols = []
    for c in cols_s:
        send = jnp.zeros((ndev * quota,), jnp.uint32)
        send = send.at[flat].set(c, mode="drop", unique_indices=True)
        recv = jax.lax.all_to_all(
            send.reshape(ndev, quota), axis_name, split_axis=0, concat_axis=0,
            tiled=False,
        )
        recv_cols.append(recv.reshape(ndev * quota))

    recv_counts = jax.lax.all_to_all(
        send_counts.reshape(ndev, 1), axis_name, split_axis=0, concat_axis=0,
        tiled=False,
    ).reshape(ndev)
    lane = jnp.arange(quota, dtype=jnp.int32)
    recv_valid = (lane[None, :] < recv_counts[:, None]).reshape(ndev * quota)

    overflow = jax.lax.psum(overflow_local, axis_name)
    return tuple(recv_cols), recv_valid, overflow
