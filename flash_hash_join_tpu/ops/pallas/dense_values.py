"""Pallas TPU kernel: large-span dense-domain value gather (materialize).

The materialize twin of ops/pallas/dense_bitmap.py for spans past the
scan-affordable band but whose VALUE planes still fit VMEM (span <= 2^20
slots: 4 MB per u32 plane).  Covers the db-benchmark Q2 shapes at 2e7/4e7
probes — the last cells where the reference's count-then-write exact-offset
materialize (/root/reference/hash_join.cpp:394-444) was winning.

Mechanism: probe keys are mapped to lo-relative domain indices and
BLOCKWISE-sorted (ONE u32 column, no payload — the output order is free
per the parity contract, and the matched probe key reconstructs as
lo + idx, so nothing else needs to ride the sort).  Each 128-element
tile-row of a sorted block then spans ~span*128/valid-per-block slots —
a handful — so SELS consecutive 128-slot value rows staged per sublane
with dynamic-row copies cover it.  The kernel lane-gathers each staged
plane by idx&127 and selects on idx>>7 == staged row.

Presence rides as plane 0 (1 where the slot is occupied by a build key,
0 otherwise), built by the same XLA scatter that builds the value planes
(ops/direct_bitmap.py), so hit detection shares the staging loop instead
of needing a separate bitmap window.

Exactness: valid probes whose value row falls outside the SELS-row window
of their tile-row (local key-space gaps) are counted `unresolved`; the
caller's retry ladder reruns on the always-exact sort route.  Probes
outside the domain are provably matchless and masked to the sentinel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SENTINEL = 0xFFFFFFFF
DEFAULT_SELS = 4


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def materialize_copy(x, *, interpret: bool = False):
    """Identity grid copy through a Pallas kernel: an XLA-opaque
    materialization point (one streaming pass, ~0.025 ns/element).

    XLA:TPU MISCOMPILES the staged band's [pad-concat -> strided
    transpose -> batched lax.sort] producer when its result is fused
    into multiple consumers: at npr=2e7 (20 sort blocks) the last
    128-lane row of the sorted array reached the consumers as a
    broadcast duplicate of one value instead of the pad sentinels (+128
    spurious hits, caught round 5 by a cross-strategy count mismatch).
    Eager and isolated-jit runs were exact; is_stable=True, a dim-0
    sort, optimization_barrier on either side, and a no-op self-concat
    all failed to dodge the bad fusion as the graph grew.  pallas_call
    boundaries are opaque to XLA fusion on both sides, so routing the
    sorted array through this copy forces every consumer to read one
    true buffer.  (The count path, direct_join_count_large, does not
    need it: its two-sided concatenate materializes the same way and is
    parity-validated at scale.)"""
    rows = x.shape[0]
    bm = 4096 if rows % 4096 == 0 else 128
    return pl.pallas_call(
        _copy_kernel,
        grid=(rows // bm,),
        in_specs=[pl.BlockSpec((bm, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


def _kernel(BM, v_rows, sels, V, rs_ref, *refs):
    planes = refs[:V]          # plane 0 = presence, 1.. = values
    idx_ref = refs[V]
    mask_ref = refs[V + 1]
    keys_ref = refs[V + 2]         # idx pass-through (see docstring)
    outs = refs[V + 3:V + 2 + V]   # gathered value planes (V-1 of them)
    unres_ref = refs[2 * V + 2]
    rowbuf = refs[2 * V + 3]       # VMEM (V, 8, 128) staging

    # The sorted-idx plane is re-emitted VERBATIM so the caller derives
    # output keys from a KERNEL OUTPUT instead of adding a third XLA
    # consumer to the blockwise-sort result — XLA:TPU miscompiled the
    # [pad-concat -> strided transpose -> batched sort] producer under
    # >= 3 fused consumers (see ops/direct_bitmap.py staged band); as a
    # bonus the idx tile is already in VMEM, saving an HBM read.
    keys_ref[:] = idx_ref[:]

    T = BM // 8

    def tile_step(t, unres):
        idx = idx_ref[pl.ds(t * 8, 8), :]
        valid = idx != jnp.uint32(SENTINEL)
        row_v = (idx >> jnp.uint32(7)).astype(jnp.int32)
        lane_v = (idx & jnp.uint32(LANES - 1)).astype(jnp.int32)
        r0v = jnp.minimum(row_v[:, 0:1], v_rows - sels)
        hit = jnp.zeros((8, LANES), jnp.uint32)
        vals = [jnp.zeros((8, LANES), jnp.uint32) for _ in range(V - 1)]
        for s in range(sels):
            for m in range(8):
                r = rs_ref[0, 0, t * 8 + m] + s
                for v in range(V):
                    rowbuf[v, m:m + 1, :] = planes[v][pl.ds(r, 1), :]
            sel = row_v == r0v + s
            g0 = jnp.take_along_axis(rowbuf[0], lane_v, axis=1)
            hit = hit | jnp.where(sel, g0, jnp.uint32(0))
            for v in range(V - 1):
                gv = jnp.take_along_axis(rowbuf[v + 1], lane_v, axis=1)
                vals[v] = jnp.where(sel & (g0 != jnp.uint32(0)), gv,
                                    vals[v])
        hit = jnp.where(valid, hit, jnp.uint32(0))
        mask_ref[pl.ds(t * 8, 8), :] = hit
        for v in range(V - 1):
            outs[v][pl.ds(t * 8, 8), :] = vals[v]
        return unres + jnp.sum((valid & (row_v >= r0v + sels))
                               .astype(jnp.int32))

    unres = jax.lax.fori_loop(0, T, tile_step, jnp.int32(0))
    r_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    unres_ref[:] = jnp.where((r_ == 0) & (c_ == 0), unres, 0)


@functools.partial(jax.jit,
                   static_argnames=("v_rows", "block_rows", "sels",
                                    "interpret"))
def probe_gather_staged(planes, idx_sorted, rs_all, *, v_rows: int,
                        block_rows: int = 512, sels: int = DEFAULT_SELS,
                        interpret: bool = False):
    """planes: tuple of (v_rows, 128) u32 — plane 0 is 0/1 presence, the
    rest are dense value planes.  idx_sorted: (NB*BM, 128) u32 domain
    indices, ascending within each sort block (sentinel-padded).  rs_all:
    (NB, 1, BM) int32 per-tile-row value-row starts, pre-clipped to
    [0, v_rows - sels].

    Returns (mask, keys, values..., unres) — mask/keys/values are
    (NB*BM, 128) u32 aligned to idx_sorted (keys = idx_sorted passed
    through the kernel; see _kernel), unres an int32 scalar of valid
    probes whose value row overflowed the window (caller must fall back
    when nonzero).
    """
    V = len(planes)
    BM = block_rows
    NB = idx_sorted.shape[0] // BM
    fixed = lambda b: (0, 0)  # noqa: E731
    blk = lambda b: (b, 0)  # noqa: E731
    plane_shape = jax.ShapeDtypeStruct((NB * BM, LANES), jnp.uint32)
    out = pl.pallas_call(
        functools.partial(_kernel, BM, v_rows, sels, V),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, BM), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec((v_rows, LANES), fixed, memory_space=pltpu.VMEM)
             ] * V
        + [pl.BlockSpec((BM, LANES), blk, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((BM, LANES), blk, memory_space=pltpu.VMEM)
                   ] * (V + 1)
        + [pl.BlockSpec((8, LANES), blk, memory_space=pltpu.VMEM)],
        out_shape=tuple(plane_shape for _ in range(V + 1))
        + (jax.ShapeDtypeStruct((NB * 8, LANES), jnp.int32),),
        scratch_shapes=[pltpu.VMEM((V, 8, LANES), jnp.uint32)],
        interpret=interpret,
    )(rs_all, *planes, idx_sorted)
    mask, keys, vals, unres_blocks = out[0], out[1], out[2:V + 1], out[V + 1]
    unres = jnp.sum(unres_blocks.reshape(NB, 8, LANES)[:, 0, 0])
    return (mask, keys, *vals, unres)
