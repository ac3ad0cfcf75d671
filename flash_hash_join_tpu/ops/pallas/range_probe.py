"""Pallas TPU kernel: windowed probe of the hash-sorted range table.

The large-build probe path (reference regime: radix join, hash_join.cpp:
316-381, 498-534).  The TPU-native replacement for per-partition hash
tables is a RANGE table (ops/range_table.py): all build rows hash-sorted,
reshaped into (S, C, 128) blocks where lane-column (s, l) holds the C keys
ranked [s*128*C + l*C, +C) — rank-balanced columns, load factor 1.0, built
with zero scatters.

Probe rows arrive hash-sorted too, tiled (TM, 128).  Because both sides
share one lexicographic (hash, key) order, a probe tile's matches live in
a narrow, monotone band of table columns; the kernel loads a W-super-row
window over that band (start row scalar-prefetched per tile; Pallas skips
re-DMA when consecutive tiles map to the same window rows) and resolves
each probe with:

  1. column search: per window super-row, a 7-round binary search over the
     128 boundary lanes (lexicographic on (hash, key_hi, key_lo)) via
     per-lane dynamic_gather -> global column index, summed across rows;
  2. column scan: for each of the window's W*C slot-rows, gather the
     probe's own column lane and compare keys (same primitive as
     ops/pallas/bucket_probe.py).

Cost per probe ~ (8*W*C + 9*7*W)/1024 vector ops — ~0.6 at C=32, W=2 —
vs ~7-12 ns for an XLA HBM gather (scripts/microbench.py).

Exactness: a probe lexicographically >= the window's end boundary may have
matches beyond the window (possible only when duplicate/tie runs inflate
ranks, e.g. millions of copies of one build key); such probes are COUNTED
as unresolved and the engine falls back to the always-exact merge strategy
— the same special[3] protocol as bucket-table overflow (api.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EMPTY32_INT = 0xFFFFFFFF
LANES = 128
DEFAULT_C = 32
DEFAULT_TILE_M = 32


def _lex_le(bh, bkh, bkl, h, kh, kl):
    """(bh,bkh,bkl) <= (h,kh,kl) lexicographic on uint32 words."""
    return (bh < h) | ((bh == h) & ((bkh < kh) | ((bkh == kh) & (bkl <= kl))))


def _gather_lanes(row_tile, idx):
    """y[i,j] = row_tile[i, idx[i,j]] — per-lane dynamic gather."""
    return jnp.take_along_axis(row_tile, idx, axis=1)


def _row_search(bnd_h, bnd_kh, bnd_kl, h, kh, kl):
    """Per-probe count of one super-row's boundary lanes lex-<= probe.

    bnd_*: (1, 128) sorted boundary words; h/kh/kl: (TM, 128) probes.
    Returns (TM, 128) int32 insertion points in [0, 128] via a 7-step
    binary search (dynamic_gather per trial index).
    """
    shape = h.shape
    cnt = jnp.zeros(shape, jnp.int32)
    bh_t = jnp.broadcast_to(bnd_h, shape)
    bkh_t = jnp.broadcast_to(bnd_kh, shape)
    bkl_t = jnp.broadcast_to(bnd_kl, shape)
    # steps sum to 128 (the final repeated 1) so cnt can reach 128 when
    # every boundary is <= the probe; `at` stays in [0, 127] throughout.
    for step in (64, 32, 16, 8, 4, 2, 1, 1):
        trial = cnt + step
        at = trial - 1  # in [0, 127]
        gh = _gather_lanes(bh_t, at)
        gkh = _gather_lanes(bkh_t, at)
        gkl = _gather_lanes(bkl_t, at)
        ok = _lex_le(gh, gkh, gkl, h, kh, kl)
        cnt = jnp.where(ok, trial, cnt)
    return cnt


def _split_refs(refs, W, with_values):
    """Kernel ref layout shared by count and materialize kernels."""
    nb = W + 1
    bnd_h = refs[0:nb]
    bnd_kh = refs[nb : 2 * nb]
    bnd_kl = refs[2 * nb : 3 * nb]
    base = 3 * nb
    tk_hi = refs[base : base + W]
    tk_lo = refs[base + W : base + 2 * W]
    if with_values:
        tv_hi = refs[base + 2 * W : base + 3 * W]
        tv_lo = refs[base + 3 * W : base + 4 * W]
        rest = refs[base + 4 * W :]
        return bnd_h, bnd_kh, bnd_kl, tk_hi, tk_lo, tv_hi, tv_lo, rest
    rest = refs[base + 2 * W :]
    return bnd_h, bnd_kh, bnd_kl, tk_hi, tk_lo, None, None, rest


def _search_and_flags(W, bnd_h, bnd_kh, bnd_kl, h, ph, pl_):
    """Window-local column index + unresolved mask for a probe tile."""
    shape = h.shape
    empty = jnp.uint32(EMPTY32_INT)
    probe_is_empty = (ph == empty) & (pl_ == empty)

    col = jnp.full(shape, -1, jnp.int32)
    for w in range(W):
        col += _row_search(bnd_h[w][:][0], bnd_kh[w][:][0], bnd_kl[w][:][0],
                           h, ph, pl_)

    eb_h = jnp.broadcast_to(bnd_h[W][0, 0, 0], shape)
    eb_kh = jnp.broadcast_to(bnd_kh[W][0, 0, 0], shape)
    eb_kl = jnp.broadcast_to(bnd_kl[W][0, 0, 0], shape)
    unresolved = _lex_le(eb_h, eb_kh, eb_kl, h, ph, pl_) & ~probe_is_empty
    return col, unresolved


def _count_kernel(W, C, wstart_ref, *refs):
    bnd_h, bnd_kh, bnd_kl, tk_hi, tk_lo, _, _, rest = _split_refs(
        refs, W, with_values=False)
    h_ref, ph_ref, pl_ref, out_ref = rest
    h, ph, pl_ = h_ref[:], ph_ref[:], pl_ref[:]
    shape = h.shape
    empty = jnp.uint32(EMPTY32_INT)

    col, unresolved = _search_and_flags(W, bnd_h, bnd_kh, bnd_kl, h, ph, pl_)

    hit = jnp.zeros(shape, jnp.bool_)
    for w in range(W):
        lane = col - w * LANES
        active = (lane >= 0) & (lane < LANES)
        lane_c = jnp.clip(lane, 0, LANES - 1)
        for c in range(C):
            g_hi = _gather_lanes(
                jnp.broadcast_to(tk_hi[w][0, c : c + 1, :], shape), lane_c)
            g_lo = _gather_lanes(
                jnp.broadcast_to(tk_lo[w][0, c : c + 1, :], shape), lane_c)
            eq = ((g_hi ^ ph) | (g_lo ^ pl_)) == jnp.uint32(0)
            not_empty = ~((g_hi == empty) & (g_lo == empty))
            hit = hit | (eq & not_empty & active)

    total = jnp.sum(hit.astype(jnp.int32))
    n_unres = jnp.sum(unresolved.astype(jnp.int32))
    r_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    out_ref[:] = jnp.where((r_ == 0) & (c_ == 0), total,
                           jnp.where((r_ == 0) & (c_ == 1), n_unres, 0))


def _materialize_kernel(W, C, wstart_ref, *refs):
    bnd_h, bnd_kh, bnd_kl, tk_hi, tk_lo, tv_hi, tv_lo, rest = _split_refs(
        refs, W, with_values=True)
    h_ref, ph_ref, pl_ref, hit_ref, vh_ref, vl_ref, unres_ref = rest
    h, ph, pl_ = h_ref[:], ph_ref[:], pl_ref[:]
    shape = h.shape
    empty = jnp.uint32(EMPTY32_INT)

    col, unresolved = _search_and_flags(W, bnd_h, bnd_kh, bnd_kl, h, ph, pl_)

    hit = jnp.zeros(shape, jnp.bool_)
    vh = jnp.zeros(shape, jnp.uint32)
    vl = jnp.zeros(shape, jnp.uint32)
    for w in range(W):
        lane = col - w * LANES
        active = (lane >= 0) & (lane < LANES)
        lane_c = jnp.clip(lane, 0, LANES - 1)
        for c in range(C):
            g_hi = _gather_lanes(
                jnp.broadcast_to(tk_hi[w][0, c : c + 1, :], shape), lane_c)
            g_lo = _gather_lanes(
                jnp.broadcast_to(tk_lo[w][0, c : c + 1, :], shape), lane_c)
            eq = ((g_hi ^ ph) | (g_lo ^ pl_)) == jnp.uint32(0)
            not_empty = ~((g_hi == empty) & (g_lo == empty))
            new_hit = eq & not_empty & active & ~hit  # first slot wins
            gv_hi = _gather_lanes(
                jnp.broadcast_to(tv_hi[w][0, c : c + 1, :], shape), lane_c)
            gv_lo = _gather_lanes(
                jnp.broadcast_to(tv_lo[w][0, c : c + 1, :], shape), lane_c)
            vh = jnp.where(new_hit, gv_hi, vh)
            vl = jnp.where(new_hit, gv_lo, vl)
            hit = hit | new_hit

    hit_ref[:] = hit.astype(jnp.uint32)
    vh_ref[:] = vh
    vl_ref[:] = vl
    n_unres = jnp.sum(unresolved.astype(jnp.int32))
    r_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    unres_ref[:] = jnp.where((r_ == 0) & (c_ == 0), n_unres, 0)


def _in_specs(W, C, TM, with_values):
    def bnd_spec(w):
        # boundary arrays are (S+1, 1, 128); block = one super-row of them
        return pl.BlockSpec((1, 1, LANES),
                            lambda t, ws, w=w: (ws[t] + w, 0, 0),
                            memory_space=pltpu.VMEM)

    def tab_spec(w):
        return pl.BlockSpec((1, C, LANES),
                            lambda t, ws, w=w: (ws[t] + w, 0, 0),
                            memory_space=pltpu.VMEM)

    probe_spec = pl.BlockSpec((TM, LANES), lambda t, ws: (t, 0),
                              memory_space=pltpu.VMEM)
    specs = (
        [bnd_spec(w) for w in range(W + 1)]
        + [bnd_spec(w) for w in range(W + 1)]
        + [bnd_spec(w) for w in range(W + 1)]
        + [tab_spec(w) for w in range(W)]
        + [tab_spec(w) for w in range(W)]
    )
    if with_values:
        specs += [tab_spec(w) for w in range(W)]
        specs += [tab_spec(w) for w in range(W)]
    specs += [probe_spec] * 3
    return specs


@functools.partial(
    jax.jit, static_argnames=("W", "C", "tile_m", "interpret"))
def range_probe_count(bnd_h, bnd_kh, bnd_kl, tk_hi, tk_lo,
                      h_blocks, ph_blocks, pl_blocks, wstart, *,
                      W: int, C: int = DEFAULT_C,
                      tile_m: int = DEFAULT_TILE_M,
                      interpret: bool = False):
    """Count matches of hash-sorted probe tiles against the range table.

    bnd_*: (S+1, 128) column boundaries (row S = the MAX sentinel);
    tk_*: (S, C, 128) table key planes; *_blocks: (ntiles*tile_m, 128)
    hash-sorted probes; wstart: (ntiles,) int32 window start super-row per
    tile, pre-clipped to [0, S-W].  Returns (count, n_unresolved).
    """
    TM = tile_m
    ntiles = h_blocks.shape[0] // TM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=_in_specs(W, C, TM, with_values=False),
        out_specs=pl.BlockSpec((8, LANES), lambda t, ws: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    operands = (
        [bnd_h] * (W + 1) + [bnd_kh] * (W + 1) + [bnd_kl] * (W + 1)
        + [tk_hi] * W + [tk_lo] * W
        + [h_blocks, ph_blocks, pl_blocks]
    )
    out = pl.pallas_call(
        functools.partial(_count_kernel, W, C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * 8, LANES), jnp.int32),
        interpret=interpret,
    )(wstart, *operands)
    count = jnp.sum(out[::8, 0])
    unresolved = jnp.sum(out[::8, 1])
    return count, unresolved


@functools.partial(
    jax.jit, static_argnames=("W", "C", "tile_m", "interpret"))
def range_probe_materialize(bnd_h, bnd_kh, bnd_kl, tk_hi, tk_lo,
                            tv_hi, tv_lo,
                            h_blocks, ph_blocks, pl_blocks, wstart, *,
                            W: int, C: int = DEFAULT_C,
                            tile_m: int = DEFAULT_TILE_M,
                            interpret: bool = False):
    """Materializing variant: returns (hit, vh, vl, n_unresolved) with
    hit/vh/vl shaped like the probe blocks (probe-sorted order)."""
    TM = tile_m
    ntiles = h_blocks.shape[0] // TM
    probe_out = pl.BlockSpec((TM, LANES), lambda t, ws: (t, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=_in_specs(W, C, TM, with_values=True),
        out_specs=(probe_out, probe_out, probe_out,
                   pl.BlockSpec((8, LANES), lambda t, ws: (t, 0),
                                memory_space=pltpu.VMEM)),
    )
    operands = (
        [bnd_h] * (W + 1) + [bnd_kh] * (W + 1) + [bnd_kl] * (W + 1)
        + [tk_hi] * W + [tk_lo] * W + [tv_hi] * W + [tv_lo] * W
        + [h_blocks, ph_blocks, pl_blocks]
    )
    shape = jax.ShapeDtypeStruct(h_blocks.shape, jnp.uint32)
    hit, vh, vl, unres = pl.pallas_call(
        functools.partial(_materialize_kernel, W, C),
        grid_spec=grid_spec,
        out_shape=(shape, shape,
                   jax.ShapeDtypeStruct(h_blocks.shape, jnp.uint32),
                   jax.ShapeDtypeStruct((ntiles * 8, LANES), jnp.int32)),
        interpret=interpret,
    )(wstart, *operands)
    return hit, vh, vl, jnp.sum(unres[::8, 0])
