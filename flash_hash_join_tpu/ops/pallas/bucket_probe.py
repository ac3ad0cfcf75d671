"""Pallas TPU kernel: VMEM-resident bucket hash-table probe.

The speed-of-light probe path for small-build joins (probe >> build) — the
reference's cached-small-table regime (1e7-Q1 runs at ~2.5G rows/s on all
CPU cores because the table lives in L1; BASELINE.md).  TPU-native
equivalent: the table lives in VMEM and probes resolve in R vector steps.

Hardware facts driving the design (measured on v5e, scripts/profile_*):
  * XLA HBM gather: ~12ns/row flat — unusable as the hot probe loop.
  * Mosaic `tpu.dynamic_gather` only gathers within ONE vreg along the
    gather dimension, and the index array must be shaped like the operand.
    => per-lane (dim 1) gather over 128 lanes is the fast primitive.
  * fori_loop carries ~50-100 cycles/iteration overhead: iteration count
    must be small and each iteration must do vreg-scale work.

Table layout ("slot-major"): (R, 128) uint32 planes — 128 BUCKETS (lanes),
R slots per bucket (rows).  Key -> bucket = top-7 hash bits (after
pre_shift); slot = dense insertion rank (sorted, deduped build:
ops/bucket_table.py).  Capacity 128*R keys; rank >= R drops are counted and
the engine falls back, so results stay exact.

Probe kernel, per (M,128) probe tile (M*128 probes at once):
    for r in fori(R):                         # R = slots per bucket
      row   = broadcast(table[r, :])          # (M,128) sublane broadcast
      got   = dynamic_gather_dim1(row, bucket)  # every probe reads slot r
      hit  |= (got == key) & !empty             #   of ITS OWN bucket
Total ~8 vector ops per slot-row per tile: ~R/16 cycles per probe.
Empty slots are the u64-max pattern; real u64-max keys go through the
caller's special side channel; padding probes are u64-max so the empty mask
drops them (ops/bucket_table.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EMPTY32_INT = 0xFFFFFFFF
LANES = 128


def _slot_row(tab, r, shape):
    """Broadcast table slot-row r (1,128) to a (M,128) tile.

    r may be traced (fori_loop counter) — dynamic-slice read from VMEM.
    """
    return jnp.broadcast_to(tab[pl.ds(r, 1), :], shape)


def _gather_lanes(row_tile, bucket_ix):
    """y[i,j] = row_tile[i, bucket_ix[i,j]] — per-lane dynamic gather."""
    return jnp.take_along_axis(row_tile, bucket_ix, axis=1)


def _count_kernel(R, tk_hi_ref, tk_lo_ref, ph_ref, pl_ref, pbkt_ref, out_ref):
    ph = ph_ref[:]
    pl_ = pl_ref[:]
    bkt = pbkt_ref[:]
    shape = ph.shape
    empty = jnp.uint32(EMPTY32_INT)

    def body(r, hit):
        # fori_loop (not an unrolled python loop): Mosaic stack-allocates
        # each unrolled iteration's temporaries, OOMing VMEM at R >= 32.
        # Carries are uint32, not bool — i1 vector loop carries fail to
        # legalize (packed/unpacked layout mismatch in scf.for).
        g_hi = _gather_lanes(_slot_row(tk_hi_ref, r, shape), bkt)
        g_lo = _gather_lanes(_slot_row(tk_lo_ref, r, shape), bkt)
        eq = ((g_hi ^ ph) | (g_lo ^ pl_)) == jnp.uint32(0)
        not_empty = ~((g_hi == empty) & (g_lo == empty))
        return hit | (eq & not_empty).astype(jnp.uint32)

    hit = jax.lax.fori_loop(0, R, body, jnp.zeros(shape, jnp.uint32))
    total = jnp.sum(hit.astype(jnp.int32))
    r_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    out_ref[:] = jnp.where((r_ == 0) & (c_ == 0), total, 0)


def _materialize_kernel(R, tk_hi_ref, tk_lo_ref, tv_hi_ref, tv_lo_ref,
                        ph_ref, pl_ref, pbkt_ref,
                        hit_ref, vh_ref, vl_ref):
    ph = ph_ref[:]
    pl_ = pl_ref[:]
    bkt = pbkt_ref[:]
    shape = ph.shape
    empty = jnp.uint32(EMPTY32_INT)
    zero = jnp.uint32(0)

    zeros = jnp.zeros(shape, jnp.uint32)

    def body(r, carry):
        hit, vh, vl = carry  # uint32 carries: i1 carries fail to legalize
        g_hi = _gather_lanes(_slot_row(tk_hi_ref, r, shape), bkt)
        g_lo = _gather_lanes(_slot_row(tk_lo_ref, r, shape), bkt)
        eq = ((g_hi ^ ph) | (g_lo ^ pl_)) == jnp.uint32(0)
        not_empty = ~((g_hi == empty) & (g_lo == empty))
        h = eq & not_empty          # at most one r hits per probe (dedup)
        v_hi = _gather_lanes(_slot_row(tv_hi_ref, r, shape), bkt)
        v_lo = _gather_lanes(_slot_row(tv_lo_ref, r, shape), bkt)
        return (hit | h.astype(jnp.uint32),
                jnp.where(h, v_hi, vh), jnp.where(h, v_lo, vl))

    hit, vh, vl = jax.lax.fori_loop(
        0, R, body, (jnp.zeros(shape, jnp.uint32), zeros, zeros))
    hit_ref[:] = hit
    vh_ref[:] = vh
    vl_ref[:] = vl


@functools.partial(jax.jit, static_argnames=("r_slots", "block_m", "interpret"))
def probe_count_vmem(tk_hi, tk_lo, ph_blocks, pl_blocks, pbkt_blocks, *,
                     r_slots: int, block_m: int = 512, interpret: bool = False):
    """ph/pl/pbkt blocks: (n_blocks * block_m, 128); returns total hits."""
    M = min(block_m, ph_blocks.shape[0])
    n_blocks = ph_blocks.shape[0] // M
    table_spec = pl.BlockSpec((r_slots, LANES), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    block_spec = pl.BlockSpec((M, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_count_kernel, r_slots),
        grid=(n_blocks,),
        in_specs=[table_spec, table_spec, block_spec, block_spec, block_spec],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, LANES), jnp.int32),
        interpret=interpret,
    )(tk_hi, tk_lo, ph_blocks, pl_blocks, pbkt_blocks)
    return jnp.sum(out)


@functools.partial(jax.jit, static_argnames=("r_slots", "block_m", "interpret"))
def probe_materialize_vmem(tk_hi, tk_lo, tv_hi, tv_lo,
                           ph_blocks, pl_blocks, pbkt_blocks, *,
                           r_slots: int, block_m: int = 512,
                           interpret: bool = False):
    """Returns (hit_mask, v_hi, v_lo) in probe order."""
    M = min(block_m, ph_blocks.shape[0])
    n_blocks = ph_blocks.shape[0] // M
    table_spec = pl.BlockSpec((r_slots, LANES), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    block_spec = pl.BlockSpec((M, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(ph_blocks.shape, jnp.uint32)
    hit, vh, vl = pl.pallas_call(
        functools.partial(_materialize_kernel, r_slots),
        grid=(n_blocks,),
        in_specs=[table_spec, table_spec, table_spec, table_spec,
                  block_spec, block_spec, block_spec],
        out_specs=(block_spec, block_spec, block_spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(tk_hi, tk_lo, tv_hi, tv_lo, ph_blocks, pl_blocks, pbkt_blocks)
    return hit, vh, vl
