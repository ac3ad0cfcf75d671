"""Pallas TPU kernel: exact-offset ragged-block concatenation (compaction).

Replaces the sort-based stream compaction of materialize outputs
(reference analog: the count-then-write-at-exact-offsets strategy of
_hash_join_scalar_materialize, /root/reference/hash_join.cpp:394-442 —
per-thread counts -> prefix sum -> second pass writing at scanned
offsets).  The TPU-native obstacle is that per-element dynamic VERTICAL
addressing does not exist, so an in-register scatter to exact offsets is
impossible.  This kernel sidesteps it with DMA-level placement:

  * each input BLOCK (block_rows x 128 elements) arrives with its valid
    elements already compacted to a row-major prefix of length counts[b]
    (one cheap blockwise lax.sort does that; see compact_by_mask_stream);
  * the kernel keeps a running total L in SMEM scratch across the
    sequential grid, lane-ROTATES the block's stream by L mod 128 (a
    per-lane gather plus a sublane roll — both fast), merges the carried
    partial row from the previous block, and DMA-writes the block's rows
    at row offset L // 128;
  * the write is a STATIC-size DMA (block_rows + 8 rows) that clobbers
    forward into garbage territory; the next block's write starts at the
    shared partial row and re-merges it from VMEM carry scratch, so every
    row <= the final frontier ends up exact.  DMAs are ordered (wait on
    the previous block's semaphores before issuing) because consecutive
    writes overlap by one row.

Cost: one streaming read + one streaming write + ~10 vector ops per
element per plane — ~0.1-0.2 ns/row/plane vs ~1.3 ns/row/plane for the
sort-payload route it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_BLOCK_ROWS = 512  # 64K elements: the cheap blockwise-sort regime


def _roll_down1(x, interpret: bool):
    """Shift rows down by one (row i <- row i-1); row 0 becomes row -1
    (circular — its content is masked off by callers)."""
    if interpret:
        return jnp.roll(x, 1, axis=0)
    return pltpu.roll(x, 1, axis=0)


def _concat_kernel(V, BM, interpret, counts_ref, *refs):
    ins = refs[:V]
    outs = refs[V : 2 * V]
    staging, carry, lst, sems = refs[2 * V :]

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        lst[0] = jnp.int32(0)

    L = lst[0]
    s = jax.lax.rem(L, jnp.int32(LANES))
    d = jax.lax.div(L, jnp.int32(LANES))
    c = counts_ref[b]

    lane = jax.lax.broadcasted_iota(jnp.int32, (BM, LANES), 1)
    idx = jax.lax.rem(lane - s + jnp.int32(LANES), jnp.int32(LANES))
    ge = lane >= s
    # stream-local index of the partial row after appending c elements
    e = jax.lax.div(s + c, jnp.int32(LANES))

    # Ordering: our DMA overlaps the previous block's by one row, so the
    # previous writes must complete before ours start.  The wait sits
    # right before the staging stores so the gathers above it can overlap
    # the in-flight DMA.  The wait descriptor uses a FIXED ds(0, BM+8)
    # output offset while the issued copies target ds(d, BM+8): only the
    # size-matched semaphore count matters to wait(), and the previous
    # block's d is not carried — this is intentional, not a typo.
    @pl.when(b > 0)
    def _():
        for v in range(V):
            pltpu.make_async_copy(
                staging.at[v], outs[v].at[pl.ds(0, BM + 8)], sems.at[v]
            ).wait()

    for v in range(V):
        x = ins[v][:]
        xdn = _roll_down1(x, interpret)
        rot = jnp.take_along_axis(x, idx, axis=1)
        rotdn = jnp.take_along_axis(xdn, idx, axis=1)
        dst = jnp.where(ge, rot, rotdn)
        row0 = jnp.where(lane[0:1] < s, carry[v, 0:1, :], dst[0:1])
        # stream row BM only has lanes < s, sourced from x[BM-1]; gather at
        # (8,128) — Mosaic rejects (1,128)-shaped take_along_axis
        tail8 = jnp.take_along_axis(x[BM - 8 : BM], idx[0:8], axis=1)
        lastrow = jnp.where(lane[0:1] < s, tail8[7:8], jnp.uint32(0))
        staging[v, 0:1, :] = row0
        staging[v, pl.ds(1, BM - 1), :] = dst[1:BM]
        staging[v, BM : BM + 1, :] = lastrow
        staging[v, pl.ds(BM + 1, 7), :] = jnp.zeros((7, LANES), jnp.uint32)
        # next block's partial-row carry = stream row e of what we staged
        carry[v, 0:1, :] = staging[v, pl.ds(e, 1), :]

    for v in range(V):
        pltpu.make_async_copy(
            staging.at[v], outs[v].at[pl.ds(d, BM + 8)], sems.at[v]
        ).start()

    lst[0] = L + c

    # drain on the last block so the kernel's effects are complete
    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        for v in range(V):
            pltpu.make_async_copy(
                staging.at[v], outs[v].at[pl.ds(0, BM + 8)], sems.at[v]
            ).wait()


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def concat_ragged_blocks(planes, counts, *, block_rows: int =
                         DEFAULT_BLOCK_ROWS, interpret: bool = False):
    """Concatenate per-block row-major valid prefixes at exact offsets.

    planes: tuple of (nblocks*block_rows, 128) uint32 arrays where block
    b's valid data is its first counts[b] elements (row-major inside rows
    [b*block_rows, (b+1)*block_rows)).  counts: (nblocks,) int32.

    Returns a tuple of (nblocks*block_rows + 8, 128) uint32 arrays whose
    flat row-major prefix of sum(counts) elements is the concatenation;
    content beyond that is unspecified.
    """
    V = len(planes)
    BM = block_rows
    nblocks = planes[0].shape[0] // BM
    out_rows = nblocks * BM + 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BM, LANES), lambda b, cnts: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * V,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * V,
        scratch_shapes=[
            pltpu.VMEM((V, BM + 8, LANES), jnp.uint32),   # staging
            pltpu.VMEM((V, 8, LANES), jnp.uint32),        # carry rows
            pltpu.SMEM((1,), jnp.int32),                  # running total L
            pltpu.SemaphoreType.DMA((V,)),
        ],
    )
    shape = jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_concat_kernel, V, BM, interpret),
        grid_spec=grid_spec,
        out_shape=tuple(shape for _ in range(V)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(counts.astype(jnp.int32), *[p.astype(jnp.uint32) for p in planes])


def _roll(x, k, axis, interpret: bool):
    """Circular roll by +k along axis (row/lane i <- i-k)."""
    if k == 0:
        return x
    if interpret:
        return jnp.roll(x, k, axis=axis)
    return pltpu.roll(x, k, axis=axis)


def _shift_down(x, k, row_iota, interpret):
    """Rows shift down by k; vacated rows become 0."""
    return jnp.where(row_iota >= k, _roll(x, k, 0, interpret), 0)


def _lane_cumsum(m, lane, interpret):
    """Per-row inclusive prefix sum over the 128 lanes (log-step gathers)."""
    csum = m.astype(jnp.int32)
    for k in (1, 2, 4, 8, 16, 32, 64):
        at = jnp.maximum(lane - k, 0)
        csum = csum + jnp.where(lane >= k,
                                jnp.take_along_axis(csum, at, axis=1), 0)
    return csum


def _pack_kernel(V, BM, interpret, counts_ref, *refs):
    """Fused pack+concat: raw (mask, planes) blocks -> exact-offset stream.

    Replaces the blockwise pack-SORT stage of compact_by_mask_stream (the
    ~60% cost item) with in-kernel vector work plus one set of MXU
    permutation matmuls; the reference analog is still the
    count-then-write-at-exact-offsets strategy of hash_join.cpp:394-442.

    Per block: (1) each row's valid lanes are packed AND rotated to their
    global lane phase in one composed per-lane gather (binary search over
    the row's lane-cumsum at rank (lane - s_r) mod 128); (2) the rotated
    run of row r spans at most two staging rows d_r/d_r+1, so its `lo`
    spill rolls down one row and adds disjointly into the next row's `hi`;
    (3) a permutation matmul out[i] = sum_r P[i,r]*C[r] with
    P[i,r] = (d_r == i) places every row: P is 0/1, each output element
    receives EXACTLY one nonzero product (runs are lane-disjoint within a
    destination row), and the data rides as four u8 subplanes in bf16
    (u8 and 0/1 are bf16-exact; the MXU accumulates in f32), so the sum
    is exact selection, not arithmetic.  Destination rows d_r come from a
    lane-major scan of row counts (cntT input) because P's columns need d
    along LANES and there is no cheap sublane->lane transpose; the same
    scan runs in sublane orientation for the rotation phases.  The last
    row's spill (circularly wrapped by the roll) is ORed in with a
    dynamic-row RMW at the frontier row e instead.
    """
    cntT_ref, mask_ref = refs[0], refs[1]
    ins = refs[2 : 2 + V]
    outs = refs[2 + V : 2 + 2 * V]
    staging, carry, lst, sems = refs[2 + 2 * V :]
    G = BM // LANES

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        lst[0] = jnp.int32(0)

    L = lst[0]
    s0 = jax.lax.rem(L, jnp.int32(LANES))
    dbase = jax.lax.div(L, jnp.int32(LANES))
    c = counts_ref[b]
    e = jax.lax.div(s0 + c, jnp.int32(LANES))

    lane = jax.lax.broadcasted_iota(jnp.int32, (BM, LANES), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BM, LANES), 0)
    m = mask_ref[:]
    csum = _lane_cumsum(m, lane, interpret)
    cnt = jnp.broadcast_to(csum[:, LANES - 1 : LANES], (BM, LANES))

    # sublane-orientation exclusive scan of row counts -> this row's global
    # start phase s_r within the staging stream
    incl = cnt
    k = 1
    while k < BM:
        incl = incl + _shift_down(incl, k, rows, interpret)
        k *= 2
    start = s0 + incl - cnt
    s_r = jax.lax.rem(start, jnp.int32(LANES))

    # composed pack+rotate gather: output lane l of row r takes the row's
    # rank-((l - s_r) mod 128) valid element
    rot = jax.lax.rem(lane - s_r + jnp.int32(LANES), jnp.int32(LANES))
    dstmask = rot < cnt
    src = jnp.zeros((BM, LANES), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1, 1):
        trial = src + step
        at = jnp.clip(trial - 1, 0, LANES - 1)
        g = jnp.take_along_axis(csum, at, axis=1)
        src = jnp.where((g <= rot) & (trial <= LANES), trial, src)
    srcc = jnp.clip(src, 0, LANES - 1)

    # lane-orientation scan (cntT rows = 128-row groups) -> destination row
    # dT per source row, laid out along lanes for P construction
    laneT = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    rowsT = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    cT = cntT_ref[:]
    inclT = _lane_cumsum(cT, laneT, interpret)
    tot = jnp.broadcast_to(inclT[:, LANES - 1 : LANES], (8, LANES))
    pre = tot
    for k in (1, 2, 4):
        pre = pre + _shift_down(pre, k, rowsT, interpret)
    exclT = inclT - cT + (pre - tot)
    dT = jax.lax.div(s0 + exclT, jnp.int32(LANES))

    @pl.when(b > 0)
    def _():
        for v in range(V):
            # the wait descriptor's offset is irrelevant — only the
            # size-matched semaphore count is: use a fixed ds(0, BM+8)
            pltpu.make_async_copy(
                staging.at[v], outs[v].at[pl.ds(0, BM + 8)], sems.at[v]
            ).wait()

    iota_o = jax.lax.broadcasted_iota(jnp.int32, (BM + 8, LANES), 0)
    Pg = [
        (jnp.broadcast_to(dT[g : g + 1, :], (BM + 8, LANES)) == iota_o)
        .astype(jnp.bfloat16)
        for g in range(G)
    ]

    for v in range(V):
        x = ins[v][:]
        gx = jnp.take_along_axis(x, srcc, axis=1)
        contrib = jnp.where(dstmask, gx, jnp.uint32(0))
        hi = jnp.where(lane >= s_r, contrib, jnp.uint32(0))
        lo = contrib - hi
        lo_sh = jnp.where(rows == 0, jnp.uint32(0),
                          _roll(lo, 1, 0, interpret))
        Cp = hi + lo_sh  # disjoint lanes: spill of row r-1 ends where
        #                  row r's hi begins (same staging row)
        outv = jnp.zeros((BM + 8, LANES), jnp.uint32)
        for kk in range(4):
            # Mosaic lacks u32<->f32 casts; u8 subplanes fit i32 exactly,
            # so route both directions through i32.
            sub = ((Cp >> jnp.uint32(8 * kk)) & jnp.uint32(0xFF)) \
                .astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            acc = None
            for g in range(G):
                d = jnp.dot(Pg[g], sub[g * LANES : (g + 1) * LANES, :],
                            preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            outv = outv | (acc.astype(jnp.int32).astype(jnp.uint32)
                           << jnp.uint32(8 * kk))

        row0 = jnp.where(lane[0:1] < s0, carry[v, 0:1, :], outv[0:1])
        staging[v, 0:1, :] = row0
        staging[v, pl.ds(1, BM + 7), :] = outv[1:]
        # last row's spill: dest is the frontier row e when it exists,
        # zero content otherwise — a dynamic-row OR either way
        cur = staging[v, pl.ds(e, 1), :]
        staging[v, pl.ds(e, 1), :] = cur | lo[BM - 1 : BM, :]
        carry[v, 0:1, :] = staging[v, pl.ds(e, 1), :]

    for v in range(V):
        pltpu.make_async_copy(
            staging.at[v], outs[v].at[pl.ds(dbase, BM + 8)], sems.at[v]
        ).start()

    lst[0] = L + c

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        for v in range(V):
            pltpu.make_async_copy(
                staging.at[v], outs[v].at[pl.ds(0, BM + 8)], sems.at[v]
            ).wait()


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def pack_concat_blocks(mask2d, cntT, counts, planes, *, block_rows: int,
                       interpret: bool = False):
    """Pallas call wrapper for _pack_kernel.

    mask2d: (nblocks*BM, 128) uint32 0/1; cntT: (nblocks*8, 128) int32
    lane-major row counts (row g lane j = count of block-row 128g+j, rows
    >= BM/128 zero); counts: (nblocks,) int32 per-block totals; planes:
    tuple of (nblocks*BM, 128) uint32.  Returns (nblocks*BM+8, 128) planes
    whose flat prefix of sum(counts) elements is the compacted stream.
    """
    V = len(planes)
    BM = block_rows
    nblocks = mask2d.shape[0] // BM
    out_rows = nblocks * BM + 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda b, cnts: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, LANES), lambda b, cnts: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((BM, LANES), lambda b, cnts: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * V,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * V,
        scratch_shapes=[
            pltpu.VMEM((V, BM + 8, LANES), jnp.uint32),   # staging
            pltpu.VMEM((V, 8, LANES), jnp.uint32),        # carry rows
            pltpu.SMEM((1,), jnp.int32),                  # running total L
            pltpu.SemaphoreType.DMA((V,)),
        ],
    )
    shape = jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_pack_kernel, V, BM, interpret),
        grid_spec=grid_spec,
        out_shape=tuple(shape for _ in range(V)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(counts.astype(jnp.int32), cntT.astype(jnp.int32),
      mask2d.astype(jnp.uint32), *[p.astype(jnp.uint32) for p in planes])


DEFAULT_PACK_BLOCK_ROWS = 256


def compact_by_mask_pack(mask, cols, n_out: int | None = None, *,
                         block_rows: int = DEFAULT_PACK_BLOCK_ROWS,
                         interpret: bool = False):
    """Stable stream compaction with NO sort: (count, cols-with-hits-first).

    Same contract as compact_by_mask_stream (stable: hits keep input
    order), but the blockwise pack-sort is replaced by _pack_kernel's
    in-kernel lane pack + permutation matmul, so the only XLA-side work is
    the row-count reductions.  block_rows must be a multiple of 128 and
    <= 1024 (the lane-major count layout uses one (8,128) tile per block).
    """
    if block_rows % LANES or block_rows > 8 * LANES:
        raise ValueError("block_rows must be a multiple of 128, <= 1024")
    n = mask.shape[0]
    bm_el = block_rows * LANES
    nblocks = max(1, -(-n // bm_el))
    npad = nblocks * bm_el
    pad = npad - n

    hit = mask.astype(jnp.uint32)
    colsu = [c.astype(jnp.uint32) for c in cols]
    if pad:
        hit = jnp.concatenate([hit, jnp.zeros((pad,), jnp.uint32)])
        colsu = [jnp.concatenate([c, jnp.zeros((pad,), jnp.uint32)])
                 for c in colsu]

    mask2d = hit.reshape(-1, LANES)
    cnt_rows = jnp.sum(mask2d, axis=1, dtype=jnp.int32)
    G = block_rows // LANES
    cntT = cnt_rows.reshape(nblocks, G, LANES)
    if G < 8:
        cntT = jnp.concatenate(
            [cntT, jnp.zeros((nblocks, 8 - G, LANES), jnp.int32)], axis=1)
    counts = jnp.sum(cnt_rows.reshape(nblocks, block_rows), axis=1)
    outs = pack_concat_blocks(
        mask2d, cntT.reshape(-1, LANES), counts,
        tuple(c.reshape(-1, LANES) for c in colsu),
        block_rows=block_rows, interpret=interpret)
    total = jnp.sum(counts)
    lim = n if n_out is None else n_out
    return total, tuple(o.reshape(-1)[:lim] for o in outs)


def compact_by_mask_fast(mask, cols, n_out: int | None = None, *,
                         interpret: bool = False):
    """Dispatch to the fastest stable stream compaction.

    FHJ_COMPACT=pack (the default) uses the sort-free _pack_kernel —
    device-validated and measured 5-6x faster than the blockwise-sort
    hybrid (4e7, V=4: 13.5 ms vs 83.3 ms; scripts/profile_pack_kernel.py).
    FHJ_COMPACT=stream keeps the round-3 hybrid as the A/B lever and the
    fallback if a future Mosaic regression hits the pack kernel's matmul
    path.
    """
    import os

    if os.environ.get("FHJ_COMPACT", "pack") == "pack":
        return compact_by_mask_pack(mask, cols, n_out, interpret=interpret)
    return compact_by_mask_stream(mask, cols, n_out, interpret=interpret)


def compact_by_mask_stream(mask, cols, n_out: int | None = None, *,
                           block_rows: int = DEFAULT_BLOCK_ROWS,
                           interpret: bool = False):
    """Stable stream compaction: (count, cols-with-hits-first).

    Hybrid of one BLOCKWISE lax.sort (64K-element blocks sort 4x cheaper
    per row than a global sort — scripts/profile_roofline.py) and the
    exact-offset concat kernel above.  The block sort key packs
    (miss_flag << 31 | position), so hits keep input order: the result is
    stable, like compact_by_mask(stable=True), at ~1/3 the cost for
    4-plane outputs.
    """
    n = mask.shape[0]
    bm_el = block_rows * LANES
    nblocks = max(1, -(-n // bm_el))
    npad = nblocks * bm_el
    pad = npad - n

    hit = mask.astype(jnp.uint32)
    colsu = [c.astype(jnp.uint32) for c in cols]
    if pad:
        hit = jnp.concatenate([hit, jnp.zeros((pad,), jnp.uint32)])
        colsu = [jnp.concatenate([c, jnp.zeros((pad,), jnp.uint32)])
                 for c in colsu]

    counts = jnp.sum(hit.reshape(nblocks, bm_el), axis=1).astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.uint32, (nblocks, bm_el), 1)
    key = ((jnp.uint32(1) - hit.reshape(nblocks, bm_el))
           << jnp.uint32(31)) | pos
    sorted_ops = jax.lax.sort(
        (key,) + tuple(c.reshape(nblocks, bm_el) for c in colsu),
        num_keys=1, is_stable=False, dimension=1)
    planes = tuple(p.reshape(-1, LANES) for p in sorted_ops[1:])
    outs = concat_ragged_blocks(planes, counts, block_rows=block_rows,
                                interpret=interpret)
    total = jnp.sum(counts)
    lim = n if n_out is None else n_out
    return total, tuple(o.reshape(-1)[:lim] for o in outs)
