"""Bucket hash table for the Pallas VMEM probe kernel (slot-major layout).

Layout: (R, 128) uint32 planes — 128 buckets (lanes), R slots per bucket
(rows).  bucket(key) = top-7 hash bits after pre_shift; slot = insertion
rank from the sorted, deduped construction (same sort + rank machinery as
ops/hash_table.py, but dense ranks, no inter-bucket chaining).  A deduped
bucket overflowing R slots is dropped and counted in special[3] — mirroring
the reference's full-table drop (hash_join.cpp:149) — and the engine falls
back to the merge strategy on special[3] != 0, so results stay exact.

Probing is ops/pallas/bucket_probe.py (R vector steps per probe tile); this
module is the host/XLA side: build (sort + rank + conflict-free scatter) and
probe-stream prep.  Capacity = 128 * R keys; at the default load (~0.5) the
strategy covers the reference's small-build regime (Q1/Q2 shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from flash_hash_join_tpu.ops.hashing import hash_u64
from flash_hash_join_tpu.ops.hash_table import home_group
from flash_hash_join_tpu.ops.pallas import bucket_probe as bp
from flash_hash_join_tpu.utils.config import next_pow2

EMPTY32 = np.uint32(0xFFFFFFFF)  # numpy: importing this module must not init the XLA backend
#           (jax.distributed.initialize ordering, scripts/multihost_worker.py)
LANES = 128
BUCKET_BITS = 7          # 128 buckets = one lane each
MAX_R_SLOTS = 512        # 64K slots, 256KB/plane VMEM ceiling
PROBE_BLOCK_M = 512      # probe tile rows per kernel grid step
# Largest build side the VMEM strategy accepts (r_slots_for stays <= MAX).
MAX_BUILD_ROWS = 40_000


def r_slots_for(n_build: int) -> int:
    """Slots per bucket for n_build deduped keys across 128 buckets.

    Bucket occupancy is ~Poisson(lambda = n/128); R = lambda + 8*sqrt(lambda)
    + 8 puts the per-bucket overflow probability below ~1e-9, so the
    drop-then-fallback path (special[3] != 0 -> engine reruns with the merge
    strategy) fires essentially never on hashed keys while R — the per-probe
    work — stays proportional to the actual load.
    """
    lam = max(n_build, 1) / LANES
    want = int(lam + 8.0 * lam ** 0.5 + 8.0)
    return min(max(next_pow2(want), 8), MAX_R_SLOTS)


def max_build_rows() -> int:
    return MAX_BUILD_ROWS


class BucketTable(NamedTuple):
    tk_hi: jnp.ndarray   # (R, 128) uint32
    tk_lo: jnp.ndarray
    tv_hi: jnp.ndarray   # (R, 128) or (1, 128) when values omitted
    tv_lo: jnp.ndarray
    special: jnp.ndarray  # (4,) uint32: has_max, max_vh, max_vl, n_dropped


def build_bucket_table(kh, kl, vh, vl, n_valid, *, r_slots: int,
                       with_values: bool, pre_shift: int = 0,
                       valid_mask=None) -> BucketTable:
    n = kh.shape[0]
    R = r_slots
    n_valid = jnp.asarray(n_valid, jnp.int32)
    row_valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    if valid_mask is not None:
        row_valid = row_valid & valid_mask

    kh = jnp.where(row_valid, kh.astype(jnp.uint32), EMPTY32)
    kl = jnp.where(row_valid, kl.astype(jnp.uint32), EMPTY32)
    vh = vh.astype(jnp.uint32)
    vl = vl.astype(jnp.uint32)

    is_max_in = (kh == EMPTY32) & (kl == EMPTY32) & row_valid
    has_max = jnp.any(is_max_in)
    first_max = jnp.argmax(is_max_in)
    max_vh = jnp.where(has_max, vh[first_max], jnp.uint32(0))
    max_vl = jnp.where(has_max, vl[first_max], jnp.uint32(0))

    h = hash_u64(kh, kl)
    bucket = home_group(h, BUCKET_BITS, pre_shift)

    b_s, kh_s, kl_s, vh_s, vl_s = jax.lax.sort(
        (bucket, kh, kl, vh, vl), num_keys=3, is_stable=True)

    is_max_s = (kh_s == EMPTY32) & (kl_s == EMPTY32)
    first_occ = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (kh_s[1:] != kh_s[:-1]) | (kl_s[1:] != kl_s[:-1]),
    ])
    keep = first_occ & ~is_max_s

    excl = jnp.cumsum(keep.astype(jnp.int32)) - keep.astype(jnp.int32)
    b_start = jnp.concatenate([
        jnp.ones((1,), jnp.bool_), b_s[1:] != b_s[:-1]])
    base = jax.lax.cummax(jnp.where(b_start, excl, jnp.int32(-1)))
    rank = excl - base

    place = keep & (rank < R)
    n_dropped = jnp.sum(keep & ~place).astype(jnp.uint32)
    slot = rank * LANES + b_s.astype(jnp.int32)   # slot-major (R, 128)
    oob = R * LANES + jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(place, slot, oob)

    def scat(vals, init):
        flat = jnp.full((R * LANES,), init, jnp.uint32)
        return flat.at[idx].set(vals, mode="drop",
                                unique_indices=True).reshape(R, LANES)

    tk_hi = scat(kh_s, EMPTY32)
    tk_lo = scat(kl_s, EMPTY32)
    if with_values:
        tv_hi = scat(vh_s, jnp.uint32(0))
        tv_lo = scat(vl_s, jnp.uint32(0))
    else:
        tv_hi = jnp.zeros((1, LANES), jnp.uint32)
        tv_lo = jnp.zeros((1, LANES), jnp.uint32)

    special = jnp.stack([has_max.astype(jnp.uint32), max_vh, max_vl,
                         n_dropped])
    return BucketTable(tk_hi, tk_lo, tv_hi, tv_lo, special)


def _prep_probe(ph, pl, n_valid, *, pre_shift: int, valid_mask=None,
                block_m: int = PROBE_BLOCK_M):
    """Pad + reshape the probe stream into (n_blocks*block_m, 128) kernel
    blocks and precompute bucket lanes."""
    n = ph.shape[0]
    n_valid = jnp.asarray(n_valid, jnp.int32)
    valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    if valid_mask is not None:
        valid = valid & valid_mask

    ph = jnp.where(valid, ph.astype(jnp.uint32), EMPTY32)
    pl = jnp.where(valid, pl.astype(jnp.uint32), EMPTY32)

    block = block_m * LANES
    npad = -(-n // block) * block
    if npad != n:
        pad = npad - n
        ph = jnp.concatenate([ph, jnp.full((pad,), EMPTY32, jnp.uint32)])
        pl = jnp.concatenate([pl, jnp.full((pad,), EMPTY32, jnp.uint32)])

    h = hash_u64(ph, pl)
    pbkt = home_group(h, BUCKET_BITS, pre_shift).astype(jnp.int32)
    # u64-max probes (incl. padding) only ever match empty-looking slots,
    # which the kernel masks; bucket 0 is a safe landing spot.
    is_max = (ph == EMPTY32) & (pl == EMPTY32)
    pbkt = jnp.where(is_max, 0, pbkt)

    return (ph.reshape(-1, LANES), pl.reshape(-1, LANES),
            pbkt.reshape(-1, LANES), is_max[:n] & valid)


def bucket_join_count(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                      r_slots: int, pre_shift: int = 0,
                      interpret: bool = False):
    """Fused build+probe count via the VMEM kernel.  Returns (count, special)."""
    table = build_bucket_table(kh, kl, vh, vl, nb_valid, r_slots=r_slots,
                               with_values=False, pre_shift=pre_shift)
    ph_b, pl_b, pbkt_b, probe_is_max = _prep_probe(
        ph, pl, np_valid, pre_shift=pre_shift)
    kernel_count = bp.probe_count_vmem(
        table.tk_hi, table.tk_lo, ph_b, pl_b, pbkt_b, r_slots=r_slots,
        interpret=interpret)
    sp = jnp.sum(probe_is_max) * (table.special[0] > 0)
    return kernel_count.astype(jnp.int32) + sp.astype(jnp.int32), table.special


def bucket_join_materialize(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                            r_slots: int, pre_shift: int = 0,
                            interpret: bool = False):
    """Fused build+probe materialize: (count, out_kh, out_kl, out_vh,
    out_vl, special), matched rows compacted in probe order."""
    n = ph.shape[0]
    table = build_bucket_table(kh, kl, vh, vl, nb_valid, r_slots=r_slots,
                               with_values=True, pre_shift=pre_shift)
    ph_b, pl_b, pbkt_b, probe_is_max = _prep_probe(
        ph, pl, np_valid, pre_shift=pre_shift)
    hit_b, vh_b, vl_b = bp.probe_materialize_vmem(
        table.tk_hi, table.tk_lo, table.tv_hi, table.tv_lo,
        ph_b, pl_b, pbkt_b, r_slots=r_slots, interpret=interpret)

    hit = hit_b.reshape(-1)[:n].astype(jnp.bool_)
    mvh = vh_b.reshape(-1)[:n]
    mvl = vl_b.reshape(-1)[:n]
    has_max = table.special[0] > 0
    hit = hit | (probe_is_max & has_max)
    mvh = jnp.where(probe_is_max, table.special[1], mvh)
    mvl = jnp.where(probe_is_max, table.special[2], mvl)

    from flash_hash_join_tpu.ops.compact import compact_by_mask
    count, outs = compact_by_mask(
        hit, (ph.astype(jnp.uint32), pl.astype(jnp.uint32), mvh, mvl))
    return (count, *outs, table.special)
