"""Range table: the TPU-native large-build join ("radix"/partitioned tier).

Reference regime being replaced: the radix join (hash_join.cpp:209-292
partitioners + :316-381/:498-534 per-partition tables).  The reference
radix-partitions both sides so each sub-join fits in cache; the TPU-native
equivalent keeps the same role — bound the random-access working set to
fast memory — but replaces every mechanism:

  * partitioning = ONE lax.sort by (hash, key) per side (TPU's native
    multi-pass device sort; measured ~2.6-5 ns/row) — no histograms, no
    scatter passes (XLA TPU scatter measured ~8.5 ns/row, a non-starter);
  * the per-partition hash table = nothing at all: the sorted build array
    reshaped (S, 128, C) -> transposed (S, C, 128) IS the table — 128
    rank-balanced lane-columns of C keys per super-row, load factor 1.0;
  * partition lookup = binary search over column boundaries (the hashes
    make both sides' sort orders uniform, so a probe tile's window is
    narrow) — see ops/pallas/range_probe.py for the kernel;
  * exactness under adversarial duplicate runs = unresolved-probe counter
    -> engine falls back to the merge strategy (special[3] protocol).

Semantics contract (SURVEY.md §3): inner first-match join; duplicate build
keys stay in the table (any one matches; the probe takes the first slot of
its column — deterministic for a fixed input); u64-max keys ride the
`special` side channel exactly like ops/hash_table.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from flash_hash_join_tpu.ops.hashing import hash_u64
from flash_hash_join_tpu.ops.pallas import range_probe as rp

EMPTY32 = jnp.uint32(0xFFFFFFFF)
LANES = 128


def plan_window(n_build: int, n_probe: int, *, C: int = rp.DEFAULT_C,
                tile_m: int = rp.DEFAULT_TILE_M) -> int:
    """Static window size W (super-rows) for a shape pair.

    A tile of tile_m*128 hash-sorted probes spans ~tile_m*128 * nb/np build
    ranks (both hash orders are uniform); one super-row covers 128*C ranks.
    +1 covers straddle; floor 2 covers jitter.  Pathological rank inflation
    (huge duplicate runs) beyond W is caught by the unresolved counter.
    """
    S = max(1, -(-n_build // (LANES * C)))
    span = (tile_m * LANES * n_build) / max(n_probe, 1)
    W = int(span // (LANES * C)) + 2
    return min(max(2, W), S, 64)  # never exceed the table's S super-rows


class RangeTable(NamedTuple):
    """Hash-sorted build side in probe-kernel layout (device arrays).

    tk_hi/tk_lo: (S, C, 128) key planes; tv_hi/tv_lo: values (or (1,1,128)
    zeros for count-only); bnd_h/bnd_kh/bnd_kl: (S+1, 128) lexicographic
    column boundaries, row S = MAX sentinel; special: (4,) uint32
    [has_max_key, max_val_hi, max_val_lo, reserved].
    """

    tk_hi: jnp.ndarray
    tk_lo: jnp.ndarray
    tv_hi: jnp.ndarray
    tv_lo: jnp.ndarray
    bnd_h: jnp.ndarray
    bnd_kh: jnp.ndarray
    bnd_kl: jnp.ndarray
    special: jnp.ndarray


def build_range_table(kh, kl, vh, vl, n_valid, *, C: int = rp.DEFAULT_C,
                      with_values: bool, valid_mask=None) -> RangeTable:
    """Sort build rows by (hash, key) and reshape into the range table.

    Zero scatters: sort -> pad -> reshape -> transpose; boundaries are
    strided slices of the sorted order.  Invalid rows and real u64-max keys
    are forced to the (MAX, MAX, MAX) sort sentinel so they pool with
    padding at the end as EMPTY slots (max-key values exit via `special`,
    as in ops/hash_table.py build_table).
    """
    n = kh.shape[0]
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
    # sentinel rows sort to the very end regardless of their hash
    is_empty = (kh == EMPTY32) & (kl == EMPTY32)
    h = jnp.where(is_empty, EMPTY32, h)

    S = max(1, -(-n // (LANES * C)))
    npad = S * LANES * C
    if npad != n:
        pad = npad - n
        full = lambda v: jnp.full((pad,), v, jnp.uint32)  # noqa: E731
        h = jnp.concatenate([h, full(0xFFFFFFFF)])
        kh = jnp.concatenate([kh, full(0xFFFFFFFF)])
        kl = jnp.concatenate([kl, full(0xFFFFFFFF)])
        if with_values:
            vh = jnp.concatenate([vh, full(0)])
            vl = jnp.concatenate([vl, full(0)])

    if with_values:
        # stable so duplicate keys keep input order (deterministic winner)
        h_s, kh_s, kl_s, vh_s, vl_s = jax.lax.sort(
            (h, kh, kl, vh, vl), num_keys=3, is_stable=True)
    else:
        h_s, kh_s, kl_s = jax.lax.sort((h, kh, kl), num_keys=3,
                                       is_stable=False)

    def to_table(x):
        return x.reshape(S, LANES, C).transpose(0, 2, 1)

    tk_hi = to_table(kh_s)
    tk_lo = to_table(kl_s)
    if with_values:
        tv_hi = to_table(vh_s)
        tv_lo = to_table(vl_s)
    else:
        tv_hi = jnp.zeros((1, 1, LANES), jnp.uint32)
        tv_lo = jnp.zeros((1, 1, LANES), jnp.uint32)

    def bounds(x):
        # (S+1, 1, 128): the unit middle dim makes the per-super-row block
        # (1, 1, 128) legal for Mosaic (last two dims must divide (8, 128)
        # or equal the array's), row S = the MAX sentinel end boundary.
        b = x.reshape(S, LANES, C)[:, :, 0]
        return jnp.concatenate(
            [b, jnp.full((1, LANES), 0xFFFFFFFF, jnp.uint32)]
        ).reshape(S + 1, 1, LANES)

    special = jnp.stack([has_max.astype(jnp.uint32), max_vh, max_vl,
                         jnp.uint32(0)])
    return RangeTable(tk_hi, tk_lo, tv_hi, tv_lo,
                      bounds(h_s), bounds(kh_s), bounds(kl_s), special)


def _prep_probe(table: RangeTable, ph, pl, n_valid, *, W: int, C: int,
                tile_m: int, with_values: bool, valid_mask=None):
    """Sort probes by (hash, key), pad to tiles, compute window starts.

    Returns (h_blocks, ph_blocks, pl_blocks, wstart, sp_count) where
    sp_count is the number of valid u64-max probes (resolved via the
    special channel, outside the kernel).
    """
    n = ph.shape[0]
    n_valid = jnp.asarray(n_valid, jnp.int32)
    valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    if valid_mask is not None:
        valid = valid & valid_mask

    ph = jnp.where(valid, ph.astype(jnp.uint32), EMPTY32)
    pl = jnp.where(valid, pl.astype(jnp.uint32), EMPTY32)
    is_max = (ph == EMPTY32) & (pl == EMPTY32)
    sp_count = jnp.sum(is_max & valid).astype(jnp.int32)

    h = hash_u64(ph, pl)
    h = jnp.where(is_max, EMPTY32, h)

    tile = tile_m * LANES
    npad = -(-n // tile) * tile
    if npad != n:
        pad = npad - n
        full = lambda: jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)  # noqa: E731
        h = jnp.concatenate([h, full()])
        ph = jnp.concatenate([ph, full()])
        pl = jnp.concatenate([pl, full()])

    h_s, ph_s, pl_s = jax.lax.sort((h, ph, pl), num_keys=3, is_stable=False)

    # window start per tile: L = #{boundaries with bnd_h < first probe h}
    # lower-bounds the first probe's column, so the window can only miss
    # HIGH (caught by the unresolved counter).
    S = table.tk_hi.shape[0]
    first_h = h_s[::tile]
    flat_bnd_h = table.bnd_h[:S].reshape(-1)
    L = jnp.searchsorted(flat_bnd_h, first_h, side="left").astype(jnp.int32)
    wstart = jnp.clip((L - 1) // LANES, 0, max(S - W, 0))

    shape2 = (-1, LANES)
    return (h_s.reshape(shape2), ph_s.reshape(shape2), pl_s.reshape(shape2),
            wstart, sp_count)


def range_join_count(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                     C: int = rp.DEFAULT_C, tile_m: int = rp.DEFAULT_TILE_M,
                     W: int | None = None, interpret: bool = False):
    """Fused build+probe count.  Returns (count, special4) where
    special[3] = unresolved probes (caller must fall back if != 0)."""
    if W is None:
        W = plan_window(kh.shape[0], ph.shape[0], C=C, tile_m=tile_m)
    table = build_range_table(kh, kl, vh, vl, nb_valid, C=C,
                              with_values=False)
    h_b, ph_b, pl_b, wstart, sp_count = _prep_probe(
        table, ph, pl, np_valid, W=W, C=C, tile_m=tile_m, with_values=False)
    count, unresolved = rp.range_probe_count(
        table.bnd_h, table.bnd_kh, table.bnd_kl, table.tk_hi, table.tk_lo,
        h_b, ph_b, pl_b, wstart, W=W, C=C, tile_m=tile_m,
        interpret=interpret)
    count = count + sp_count * (table.special[0] > 0)
    special = table.special.at[3].set(unresolved.astype(jnp.uint32))
    return count.astype(jnp.int32), special


def range_join_materialize(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                           C: int = rp.DEFAULT_C,
                           tile_m: int = rp.DEFAULT_TILE_M,
                           W: int | None = None, interpret: bool = False):
    """Fused build+probe materialize: (count, out_kh, out_kl, out_vh,
    out_vl, special).  Matched rows are compacted in (hash, key) order
    (deterministic; the reference's own output order is thread-interleaved,
    SURVEY.md §3, so any fixed order satisfies the contract)."""
    n = ph.shape[0]
    if W is None:
        W = plan_window(kh.shape[0], n, C=C, tile_m=tile_m)
    table = build_range_table(kh, kl, vh, vl, nb_valid, C=C, with_values=True)
    h_b, ph_b, pl_b, wstart, _ = _prep_probe(
        table, ph, pl, np_valid, W=W, C=C, tile_m=tile_m, with_values=True)
    hit_b, vh_b, vl_b, unresolved = rp.range_probe_materialize(
        table.bnd_h, table.bnd_kh, table.bnd_kl, table.tk_hi, table.tk_lo,
        table.tv_hi, table.tv_lo, h_b, ph_b, pl_b, wstart,
        W=W, C=C, tile_m=tile_m, interpret=interpret)

    npad = hit_b.size
    hit = hit_b.reshape(-1).astype(jnp.bool_)
    mvh = vh_b.reshape(-1)
    mvl = vl_b.reshape(-1)
    pks_h = ph_b.reshape(-1)
    pks_l = pl_b.reshape(-1)

    # u64-max probes: sorted to the tail (sentinel hash); match iff the
    # build had the max key.  They are EMPTY-keyed in the kernel, so they
    # never false-hit; resolve them here.
    has_max = table.special[0] > 0
    is_max = (pks_h == EMPTY32) & (pks_l == EMPTY32)
    # padding rows are also MAX-keyed; exclude them by position
    n_valid_sorted = jnp.asarray(np_valid, jnp.int32)
    # after sorting, valid non-max probes occupy the front; max-key valid
    # probes precede padding within the MAX run (both MAX-keyed, so the
    # first np_valid... count them explicitly instead:
    rank = jnp.arange(npad, dtype=jnp.int32)
    n_max_valid = jnp.sum(
        (jnp.arange(n, dtype=jnp.int32) < n_valid_sorted)
        & (ph.astype(jnp.uint32) == EMPTY32)
        & (pl.astype(jnp.uint32) == EMPTY32)).astype(jnp.int32)
    # the MAX run starts where non-max rows end; its first n_max_valid rows
    # are the real max-key probes (order within ties is irrelevant).
    n_real = npad - jnp.sum(is_max).astype(jnp.int32)
    is_real_max = is_max & (rank < n_real + n_max_valid)
    sp_hit = is_real_max & has_max
    hit = hit | sp_hit
    mvh = jnp.where(sp_hit, table.special[1], mvh)
    mvl = jnp.where(sp_hit, table.special[2], mvl)

    pos = jnp.cumsum(hit.astype(jnp.int32)) - 1
    idx = jnp.where(hit, pos, npad + rank)
    count = jnp.sum(hit).astype(jnp.int32)

    def compact(x):
        out = jnp.zeros((npad,), jnp.uint32)
        return out.at[idx].set(x, mode="drop", unique_indices=True)[:n]

    special = table.special.at[3].set(unresolved.astype(jnp.uint32))
    return (count, compact(pks_h), compact(pks_l), compact(mvh),
            compact(mvl), special)
