"""Feasibility envelope for a Pallas 2-way merge level.

Measures the COMPUTE+DMA cost of one merge pass: per grid step, load one
2048-chunk from each of two runs at fixed offsets, bitonic-merge the 4096
elements in VMEM, write the sorted 4096 out.  A real merge-path level
adds pointer logic + ~2x read overfetch; if THIS envelope is not well
under ~0.12 ns/row, the merge-sort route cannot beat lax.sort (1.63) and
is dead.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CH = 2048          # per-side chunk (16 rows)
ROWS = CH // LANES


def bitonic_merge_4096(x):
    """x: (32, 128) — first 16 rows ascending run A, last 16 rows are run B
    REVERSED (so the whole is a bitonic sequence).  Returns fully sorted
    (32, 128) ascending, row-major."""
    n_rows = 2 * ROWS
    # strides >= LANES: pairwise row-block compare via reshape views
    stride_rows = n_rows // 2
    while stride_rows >= 1:
        g = x.reshape(-1, 2, stride_rows, LANES)
        a, b = g[:, 0], g[:, 1]
        lt = a < b     # Mosaic lacks vector minui/maxui; compare+select
        lo = jnp.where(lt, a, b)
        hi = jnp.where(lt, b, a)
        x = jnp.stack([lo, hi], axis=1).reshape(n_rows, LANES)
        stride_rows //= 2
    # strides < LANES: lane-level compare-exchange via static lane shuffle
    stride = LANES // 2
    while stride >= 1:
        idx = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 1)
               ^ stride)
        part = jnp.take_along_axis(x, idx, axis=1)
        is_lo = (jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, LANES), 1) & stride) == 0
        lt = x < part
        x = jnp.where(is_lo == lt, x, part)  # lo keeps min, hi keeps max
        stride //= 2
    return x


def _reverse(x):
    """Full element reversal of (R, 128) without `rev` (unsupported in
    Mosaic): block-swap recursion on rows + lane gather."""
    R = x.shape[0]
    s = R // 2
    while s >= 1:
        g = x.reshape(-1, 2, s, LANES)
        x = jnp.concatenate([g[:, 1], g[:, 0]], axis=1).reshape(R, LANES)
        s //= 2
    idx = (LANES - 1) - jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return jnp.take_along_axis(x, idx, axis=1)


def _kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]                      # (16, 128) ascending
    b = _reverse(b_ref[:])            # so [a; rev(b)] is bitonic
    o_ref[:] = bitonic_merge_4096(jnp.concatenate([a, b], axis=0))


def merge_level(a, b):
    n = a.shape[0]
    ntiles = n // CH
    spec_in = pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((2 * ROWS, LANES), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(ntiles,),
        in_specs=[spec_in, spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((2 * n // LANES, LANES), jnp.uint32),
    )(a.reshape(-1, LANES), b.reshape(-1, LANES))
    return out


def main():
    n = 20_000_000  # per side -> 4e7 merged
    n = (n // CH) * CH
    rng = np.random.default_rng(0)
    a = np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))
    b = np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))
    ad = jnp.asarray(a)
    bd = jnp.asarray(b)

    # correctness on one chunk
    small = merge_level(ad[:CH * 4], bd[:CH * 4])
    got = np.asarray(small).reshape(-1, CH * 2)
    for i in range(4):
        want = np.sort(np.concatenate(
            [a[i * CH:(i + 1) * CH], b[i * CH:(i + 1) * CH]]))
        assert np.array_equal(got[i].reshape(-1), want), f"chunk {i} wrong"
    print("kernel merges chunks correctly", flush=True)

    def run(x, y, reps):
        def body(c, i):
            xa, ya = c
            r = (i + jnp.uint32(1)) * jnp.uint32(0x9E3779B1)
            o = merge_level(xa, ya)
            # feed outputs forward (halves) so steps can't be CSE'd/hoisted
            half = o.reshape(-1)[: xa.shape[0]]
            return (half ^ r, ya ^ r), None
        (xa, ya), _ = jax.lax.scan(body, (x, y),
                                   jnp.arange(reps, dtype=jnp.uint32))
        return jnp.sum(xa, dtype=jnp.uint32) ^ jnp.sum(ya, dtype=jnp.uint32)

    f1 = jax.jit(lambda x, y: run(x, y, 2)).lower(ad, bd).compile()
    f2 = jax.jit(lambda x, y: run(x, y, 10)).lower(ad, bd).compile()
    np.asarray(f1(ad, bd)); np.asarray(f2(ad, bd))

    def best(f):
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f(ad, bd))
            t = min(t, time.perf_counter() - t0)
        return t

    t1, t2 = best(f1), best(f2)
    per = (t2 - t1) / 8
    total = 2 * n
    print(f"merge level envelope: {per*1e3:.3f} ms per pass over {total/1e6:.0f}M "
          f"elements = {per/total*1e9:.4f} ns/row", flush=True)


if __name__ == "__main__":
    main()
