"""Pallas TPU kernel: direct-address bitmap membership probe.

The dense-key count path (DuckDB's "perfect hash join" move, TPU-native).
When the build keys live in a small contiguous domain [lo, lo+D) — the
db-benchmark Q1/Q2 shape: medium-table ids are dense ints — a COUNT join
is pure membership counting (first-match semantics count each probe row
at most once regardless of build duplicates, hash_join.cpp:177), and
membership over a dense domain needs no hash table at all: one bit per
domain slot.

D bits = D/4096 VMEM rows of (128 lanes x 32-bit words).  A probe's word
sits at (row = idx>>12, lane = (idx>>5)&127, bit = idx&31): the row is
sublane-dynamic — the one addressing mode the VPU lacks — so the kernel
scans all D_ROWS rows with a lane-gather + row-match select, which costs
~3 vector ops per row per (M,128) tile: ~D_ROWS*3/1024 cycles per probe
(0.03 cycles at the 40K-key Q2 shape, vs ~1.2 for the blockwise
sort+window path it replaces).  No probe sort, no hash, no table build
beyond packing the bitmap.

Invalid probes (validity tail, key >= 2^32, key outside the domain) carry
the sentinel index 0xFFFFFFFF: its row 0xFFFFF can never equal a scanned
r (D_ROWS <= 256), so they contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BITS_PER_ROW = 32 * LANES          # 4096 domain slots per bitmap row
MAX_D_ROWS = 256                   # 2^20-slot domain cap (64 KB bitmap)


def _gather_kernel(d_rows, v_rows, V, *refs):
    """Membership + dense-value gather scan (the materialize twin of
    _count_kernel).  refs: bitmap, V value planes, idx block -> hit-mask
    block + V gathered value blocks.

    Values live at slot granularity (row = idx>>7, lane = idx&127), so the
    value scan runs v_rows = 32*d_rows iterations of the same
    gather/compare/select step the bitmap scan uses — affordable exactly
    when the domain is small (the Q1/Q2 band; the sorted dense_values path
    takes over above the measured crossover).  Reference cells being
    beaten: the count-then-write exact-offset materialize strategy at
    /root/reference/hash_join.cpp:394-444.
    """
    bm_ref = refs[0]
    vps = refs[1:1 + V]
    idx_ref = refs[1 + V]
    mask_ref = refs[2 + V]
    outs = refs[3 + V:]

    idx = idx_ref[:]                              # (M,128) u32
    shape = idx.shape
    row_b = (idx >> 12).astype(jnp.int32)
    lane_b = ((idx >> 5) & jnp.uint32(LANES - 1)).astype(jnp.int32)
    bit = idx & jnp.uint32(31)

    def hbody(r, acc):
        g = jnp.take_along_axis(
            jnp.broadcast_to(bm_ref[pl.ds(r, 1), :], shape), lane_b, axis=1)
        hit = ((g >> bit) & jnp.uint32(1)) * (row_b == r).astype(jnp.uint32)
        return acc | hit

    hit = jax.lax.fori_loop(0, d_rows, hbody, jnp.zeros(shape, jnp.uint32))
    mask_ref[:] = hit

    row_v = (idx >> 7).astype(jnp.int32)
    lane_v = (idx & jnp.uint32(LANES - 1)).astype(jnp.int32)

    def vbody(r, vals):
        sel = row_v == r
        return tuple(
            jnp.where(sel,
                      jnp.take_along_axis(
                          jnp.broadcast_to(vp[pl.ds(r, 1), :], shape),
                          lane_v, axis=1),
                      v)
            for vp, v in zip(vps, vals))

    vals = jax.lax.fori_loop(
        0, v_rows, vbody,
        tuple(jnp.zeros(shape, jnp.uint32) for _ in range(V)))
    for o, v in zip(outs, vals):
        o[:] = v


@functools.partial(jax.jit,
                   static_argnames=("d_rows", "v_rows", "block_m",
                                    "interpret"))
def probe_gather_bitmap(bitmap, vplanes, idx_blocks, *, d_rows: int,
                        v_rows: int, block_m: int = 512,
                        interpret: bool = False):
    """bitmap: (d_rows, 128) u32; vplanes: tuple of (v_rows, 128) u32 dense
    value planes (slot s -> [s>>7, s&127]); idx_blocks: (n_blocks*M, 128)
    u32 domain indices (0xFFFFFFFF = no-match sentinel).  Returns
    (mask, *values), each (n_blocks*M, 128) u32 — mask is 0/1 membership,
    values are the gathered planes (zero where mask is 0)."""
    V = len(vplanes)
    M = min(block_m, idx_blocks.shape[0])
    n_blocks = idx_blocks.shape[0] // M
    fixed = lambda i: (0, 0)  # noqa: E731
    blk = lambda i: (i, 0)  # noqa: E731
    out_shape = jax.ShapeDtypeStruct((n_blocks * M, LANES), jnp.uint32)
    outs = pl.pallas_call(
        functools.partial(_gather_kernel, d_rows, v_rows, V),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((d_rows, LANES), fixed,
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((v_rows, LANES), fixed, memory_space=pltpu.VMEM)
           ] * V
        + [pl.BlockSpec((M, LANES), blk, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((M, LANES), blk, memory_space=pltpu.VMEM)
                   ] * (1 + V),
        out_shape=tuple(out_shape for _ in range(1 + V)),
        interpret=interpret,
    )(bitmap, *vplanes, idx_blocks)
    return outs


def _count_kernel(d_rows, bm_ref, idx_ref, out_ref):
    idx = idx_ref[:]                              # (M,128) u32
    shape = idx.shape
    row = (idx >> 12).astype(jnp.int32)
    lane = ((idx >> 5) & jnp.uint32(LANES - 1)).astype(jnp.int32)
    bit = idx & jnp.uint32(31)

    def body(r, acc):
        # fori_loop, not an unrolled python loop (Mosaic stack-allocates
        # unrolled iterations' temporaries in VMEM, ops/pallas/bucket_probe)
        g = jnp.take_along_axis(
            jnp.broadcast_to(bm_ref[pl.ds(r, 1), :], shape), lane, axis=1)
        hit = ((g >> bit) & jnp.uint32(1)) * (row == r).astype(jnp.uint32)
        return acc + hit

    hits = jax.lax.fori_loop(0, d_rows, body, jnp.zeros(shape, jnp.uint32))
    total = jnp.sum(hits.astype(jnp.int32))
    r_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    out_ref[:] = jnp.where((r_ == 0) & (c_ == 0), total, 0)


@functools.partial(jax.jit, static_argnames=("d_rows", "block_m", "interpret"))
def probe_count_bitmap(bitmap, idx_blocks, *, d_rows: int,
                       block_m: int = 512, interpret: bool = False):
    """bitmap: (d_rows, 128) u32; idx_blocks: (n_blocks*M, 128) u32 domain
    indices (0xFFFFFFFF = no-match sentinel).  Returns the total hit count."""
    M = min(block_m, idx_blocks.shape[0])
    n_blocks = idx_blocks.shape[0] // M
    bm_spec = pl.BlockSpec((d_rows, LANES), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec((M, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_count_kernel, d_rows),
        grid=(n_blocks,),
        in_specs=[bm_spec, blk_spec],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, LANES), jnp.int32),
        interpret=interpret,
    )(bitmap, idx_blocks)
    return jnp.sum(out)
