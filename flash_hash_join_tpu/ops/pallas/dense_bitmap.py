"""Pallas TPU kernel: large-span dense-domain bitmap count join.

Extends the direct-address bitmap strategy (ops/pallas/bitmap_probe.py,
DuckDB's perfect-hash-join move) past the scan-affordable 2^20-slot cap to
VMEM-sized domains (<= 2^26 slots = 8 MB bitmap) — the db-benchmark Q5
flagship shape, where 4e7 build keys live in a ~4.4e7-slot dense universe.
Reference cells being beaten: the radix/scalar count drivers
(/root/reference/hash_join.cpp:498-534, :536-567).

Why this escapes the measured ~4 ns/row sort floor (docs/ROADMAP.md): the
sort-routed join needs TWO global orders (build and probe) so windowed
kernels can pair them; membership over a dense domain only needs each
128-element tile-row to touch FEW bitmap rows.  A cheap BLOCKWISE sort
(independent 2^20-element blocks — measured ~4x cheaper per row than the
global sort) already gives tile-rows a span of ~domain*128/2^20 slots
(~1-2 bitmap rows at flagship density), and per-tile-row bitmap rows can
be addressed with scalar dynamic-row slices.  No global order, no hash
table, no scatter.

One fused kernel, sequential grid, two phases over one concatenated input:

  build blocks (b < NBB): tile (8,128) of sorted domain indices ->
    word/bit split; in-row segmented OR merges duplicate words (sorted =>
    runs are lane-contiguous); a 7-step per-row lane binary search places
    each window row's word values at their lanes (the inverse-gather
    lane-scatter — the VPU has lane gather but no lane scatter); per
    sublane, a dynamic-row RMW-OR folds the placed row into the
    VMEM-resident bitmap scratch.  The scratch accumulates across the
    whole (sequential) grid.

  probe blocks (b >= NBB): per sublane, SELS consecutive bitmap rows are
    staged with dynamic-row copies; a lane gather + bit test counts
    membership.  ~0.1 cycles/element.

Exactness: rows whose bitmap row falls outside the SELS-row window of
their tile-row (possible only under local key-space gaps wider than the
window) are counted `unresolved`; the caller's retry ladder reruns on the
always-exact sort route.  Probe keys outside the domain are provably
matchless and masked to the sentinel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SENTINEL = 0xFFFFFFFF  # python int: jnp scalars would be captured consts
DEFAULT_SELS = 4
DEFAULT_SORT_BLOCK = 1 << 20
DEFAULT_BLOCK_ROWS = 512


def _kernel(NBB, BM, d_rows, sels, interpret, rs_ref, idx_ref, out_ref,
            bitmap, rowbuf):
    b = pl.program_id(0)
    T = BM // 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

    @pl.when(b == 0)
    def _():
        # zero the bitmap scratch in strips (keeps the unroll bounded;
        # d_rows rungs are powers of two >= 8, so strips divide evenly)
        ZR = min(128, d_rows)

        def zrow(i, _):
            bitmap[pl.ds(i * ZR, ZR), :] = jnp.zeros((ZR, LANES),
                                                     jnp.uint32)
            return 0

        jax.lax.fori_loop(0, d_rows // ZR, zrow, 0)

    @pl.when(b < NBB)
    def _build():
        def tile_step(t, unres):
            idx = idx_ref[pl.ds(t * 8, 8), :]
            valid = idx != jnp.uint32(SENTINEL)
            w = idx >> jnp.uint32(5)
            val = jnp.where(valid, jnp.uint32(1) << (idx & jnp.uint32(31)),
                            jnp.uint32(0))
            # in-row segmented OR over equal words: sorted order makes
            # word runs lane-contiguous, so 7 log-steps complete any run
            for k in (1, 2, 4, 8, 16, 32, 64):
                at = jnp.maximum(lane - k, 0)
                wp = jnp.take_along_axis(w, at, axis=1)
                vp = jnp.take_along_axis(val, at, axis=1)
                val = val | jnp.where((lane >= k) & (wp == w), vp,
                                      jnp.uint32(0))
            row = (idx >> jnp.uint32(12)).astype(jnp.int32)
            r0v = jnp.minimum(row[:, 0:1], d_rows - sels)
            unres_t = jnp.sum((valid & (row >= r0v + sels))
                              .astype(jnp.int32))
            for s in range(sels):
                tw = ((r0v + s) * LANES + lane).astype(jnp.uint32)
                # largest j with w[j] <= tw (w ascending per row;
                # sentinels sort to the end and are > any target)
                src = jnp.zeros((8, LANES), jnp.int32)
                for step in (64, 32, 16, 8, 4, 2, 1, 1):
                    trial = src + step
                    g = jnp.take_along_axis(
                        w, jnp.clip(trial - 1, 0, LANES - 1), axis=1)
                    src = jnp.where((g <= tw) & (trial <= LANES), trial,
                                    src)
                j = jnp.clip(src - 1, 0, LANES - 1)
                wj = jnp.take_along_axis(w, j, axis=1)
                vj = jnp.take_along_axis(val, j, axis=1)
                placed = jnp.where((src > 0) & (wj == tw), vj,
                                   jnp.uint32(0))
                for m in range(8):
                    r = rs_ref[0, 0, t * 8 + m] + s
                    cur = bitmap[pl.ds(r, 1), :]
                    bitmap[pl.ds(r, 1), :] = cur | placed[m:m + 1, :]
            return unres + unres_t

        unres = jax.lax.fori_loop(0, T, tile_step, jnp.int32(0))
        r_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        out_ref[:] = jnp.where((r_ == 0) & (lane == 1), unres, 0)

    @pl.when(b >= NBB)
    def _probe():
        def tile_step(t, carry):
            cnt, unres = carry
            idx = idx_ref[pl.ds(t * 8, 8), :]
            valid = idx != jnp.uint32(SENTINEL)
            w = idx >> jnp.uint32(5)
            lanew = (w & jnp.uint32(LANES - 1)).astype(jnp.int32)
            bit = idx & jnp.uint32(31)
            row = (idx >> jnp.uint32(12)).astype(jnp.int32)
            r0v = jnp.minimum(row[:, 0:1], d_rows - sels)
            hit = jnp.zeros((8, LANES), jnp.uint32)
            for s in range(sels):
                for m in range(8):
                    r = rs_ref[0, 0, t * 8 + m] + s
                    rowbuf[m:m + 1, :] = bitmap[pl.ds(r, 1), :]
                g = jnp.take_along_axis(rowbuf[:], lanew, axis=1)
                hit = hit | jnp.where(row == r0v + s,
                                      (g >> bit) & jnp.uint32(1),
                                      jnp.uint32(0))
            cnt = cnt + jnp.sum(jnp.where(valid, hit, jnp.uint32(0))
                                .astype(jnp.int32))
            unres = unres + jnp.sum((valid & (row >= r0v + sels))
                                    .astype(jnp.int32))
            return cnt, unres

        cnt, unres = jax.lax.fori_loop(0, T, tile_step,
                                       (jnp.int32(0), jnp.int32(0)))
        r_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        out_ref[:] = jnp.where((r_ == 0) & (lane == 0), cnt,
                               jnp.where((r_ == 0) & (lane == 2), unres, 0))


@functools.partial(jax.jit,
                   static_argnames=("nbb", "d_rows", "block_rows", "sels",
                                    "interpret"))
def fused_bitmap_join(idx_all, rs_all, *, nbb: int, d_rows: int,
                      block_rows: int = DEFAULT_BLOCK_ROWS,
                      sels: int = DEFAULT_SELS, interpret: bool = False):
    """Fused build+probe over one concatenated sorted-index stream.

    idx_all: (NB*BM, 128) u32 domain indices, sorted within each sort
    block (callers keep sort blocks aligned to grid blocks), sentinel
    0xFFFFFFFF for padding/invalid rows.  Blocks [0, nbb) are the build
    side, the rest are probes.  rs_all: (NB, 1, BM) int32 per-tile-row
    bitmap row starts, pre-clipped to [0, d_rows - sels] (the middle
    singleton keeps the SMEM block equal to the trailing array dims, the
    only 1-D-ish shape the TPU lowering accepts).

    Returns (count, unres_build, unres_probe) int32 scalars.
    """
    BM = block_rows
    NB = idx_all.shape[0] // BM
    out = pl.pallas_call(
        functools.partial(_kernel, nbb, BM, d_rows, sels, interpret),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, BM), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BM, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * 8, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((d_rows, LANES), jnp.uint32),   # the bitmap
            pltpu.VMEM((8, LANES), jnp.uint32),        # probe row staging
        ],
        interpret=interpret,
    )(rs_all, idx_all)
    per_block = out.reshape(NB, 8, LANES)
    count = jnp.sum(per_block[:, 0, 0])
    unres_b = jnp.sum(per_block[:, 0, 1])
    unres_p = jnp.sum(per_block[:, 0, 2])
    return count, unres_b, unres_p
