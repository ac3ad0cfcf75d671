"""Direct-address bitmap count join for dense narrow key domains.

The adaptive tier's answer to the reference's small/medium-build count
cells (hash_join.cpp:498-534 radix count, :536-567 scalar count) when the
build keys are dense integers — exactly the db-benchmark J1 Q1/Q2 shape,
where the build side is a permutation-like id column over [0, ~1.1*nb).
DuckDB's perfect-hash join exploits the same statistic; here it removes
BOTH sorts and the hash table: count = |{p : p in domain bitmap}| under
first-match semantics (each probe row counts at most once, independent of
build-side duplicates — SURVEY.md §3 semantics contract).

Split of work:
  host (api.py): detects the dense-domain opportunity from the numpy
    inputs (max < 2^32, span <= 2^20) and picks the d_rows compile rung.
  this module (in-graph): computes lo = min(valid build key), packs the
    domain bitmap, maps probe keys to domain indices, and runs the
    ops/pallas/bitmap_probe.py scan kernel.

Exactness: build rows that do not fit the declared domain (key hi-word
!= 0, or lo-relative index >= d_rows*4096 — impossible when api.py sized
the rung from the true span, possible under the chained-timing key remix)
are counted into special[3], and the caller's retry ladder reruns on the
always-exact merge path.  Probe keys outside the domain are provably
matchless and contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flash_hash_join_tpu.ops.pallas import bitmap_probe as bp

LANES = 128
SENTINEL = jnp.uint32(0xFFFFFFFF)

# Domain cap: 2^20 slots = 256 bitmap rows = 64 KB VMEM; the row scan at
# the cap costs ~0.75 cycles/probe — above it the blockwise sort+window
# path wins again.  Covers J1 Q1/Q2 up to the 1e9 suite (domain 1.1M is
# just over; 1e8's 110K is 27 rows).
MAX_DOMAIN_BITS = bp.MAX_D_ROWS * bp.BITS_PER_ROW   # 2^20
MAX_BUILD_ROWS = 1 << 20


def d_rows_for(span: int) -> int:
    """Compile rung: bitmap rows for a key span, pow2 so shapes cache."""
    need = -(-max(span, 1) // bp.BITS_PER_ROW)
    r = 8
    while r < need:
        r *= 2
    return r


def direct_join_count(kh, kl, ph, pl, nb_valid, np_valid, *, d_rows: int,
                      block_m: int = 512, interpret: bool = False):
    """In-graph dense-domain count.  Returns (count:i32, special4:u32).

    kh/kl, ph/pl: u32 hi/lo key planes (utils/u64.py SoA convention).
    special[3] = build rows outside the declared domain (caller must
    fall back when nonzero).
    """
    n = kh.shape[0]
    d_bits = d_rows * bp.BITS_PER_ROW

    bvalid = jnp.arange(n, dtype=jnp.int32) < nb_valid
    lo = jnp.min(jnp.where(bvalid, kl, SENTINEL))
    diff = kl - lo                       # u32; keys < lo wrap to huge
    bad = bvalid & ((kh != 0) | (diff >= d_bits))
    n_bad = jnp.sum(bad).astype(jnp.uint32)
    idx = jnp.where(bvalid & ~bad, diff, jnp.uint32(d_bits))  # OOB -> drop

    bits = jnp.zeros((d_bits,), jnp.bool_).at[idx].set(True, mode="drop")
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits.reshape(-1, 32).astype(jnp.uint32) * weights,
                    axis=1, dtype=jnp.uint32)
    bitmap = words.reshape(d_rows, LANES)

    npr = ph.shape[0]
    pvalid = jnp.arange(npr, dtype=jnp.int32) < np_valid
    pdiff = pl - lo
    pok = pvalid & (ph == 0) & (pdiff < d_bits)
    pidx = jnp.where(pok, pdiff, SENTINEL)

    rows = -(-npr // LANES)
    m = min(block_m, rows)
    rows_pad = -(-rows // m) * m
    pad = rows_pad * LANES - npr
    if pad:
        pidx = jnp.concatenate([pidx, jnp.full((pad,), SENTINEL)])

    count = bp.probe_count_bitmap(bitmap, pidx.reshape(rows_pad, LANES),
                                  d_rows=d_rows, block_m=m,
                                  interpret=interpret)
    zero = jnp.uint32(0)
    special = jnp.stack([zero, zero, zero, n_bad])
    return count.astype(jnp.int32), special
