"""Real-chip perf of the Pallas VMEM bucket probe: the 1B rows/s attempt."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_hash_join_tpu.ops import bucket_table as bt
from flash_hash_join_tpu.ops.pallas import bucket_probe as bp
from flash_hash_join_tpu.utils import u64


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3:9.2f} ms  (compile {comp:.1f}s)", flush=True)
    return out, best


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    nb = 400_000
    npr = 100_000_000
    bk = rng.integers(0, 2 * nb, nb, dtype=np.uint64)
    bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
    pk = rng.integers(0, 2 * nb, npr, dtype=np.uint64)

    kh, kl = map(jnp.asarray, u64.split_u64(bk))
    vh, vl = map(jnp.asarray, u64.split_u64(bv))
    ph, pl = map(jnp.asarray, u64.split_u64(pk))
    jax.block_until_ready((kh, kl, vh, vl, ph, pl))

    s_bits = 13  # S=8192 rows -> 1M slots, 8MB keys VMEM
    S = 1 << s_bits

    # fused build+probe count
    fused = jax.jit(lambda *a: bt.bucket_join_count(*a, s_bits=s_bits)[0])
    out, best = timeit(f"bucket_join_count {nb/1e3:.0f}K x {npr/1e6:.0f}M",
                       fused, kh, kl, vh, vl, ph, pl, nb, npr)
    print(f"  count={int(out)}  -> {npr/best/1e9:.3f} B probe rows/s", flush=True)
    expected = int(np.isin(pk[:1_000_000], np.unique(bk)).sum())
    got_1m = jax.jit(lambda *a: bt.bucket_join_count(*a, s_bits=s_bits)[0])(
        kh, kl, vh, vl, ph[:1_000_000], pl[:1_000_000], nb, 1_000_000)
    print(f"  1M-slice check: {int(got_1m)} vs numpy {expected}", flush=True)

    # kernel-only probe (table prebuilt, probe blocks prepped)
    table = jax.block_until_ready(jax.jit(
        lambda *a: bt.build_bucket_table(*a, s_bits=s_bits, with_values=False)
    )(kh, kl, vh, vl, nb))
    prep = jax.jit(lambda a, b: bt._prep_probe(a, b, npr, s_bits=s_bits,
                                               pre_shift=0)[:3])
    ph_b, pl_b, prow_b = jax.block_until_ready(prep(ph, pl))
    kern = jax.jit(lambda *a: bp.probe_count_vmem(*a, s_rows=S))
    out, best = timeit("kernel-only probe 100M", kern,
                       table.tk_hi, table.tk_lo, ph_b, pl_b, prow_b)
    print(f"  -> {npr/best/1e9:.3f} B probe rows/s (kernel only)", flush=True)

    # materialize fused
    fusedm = jax.jit(lambda *a: bt.bucket_join_materialize(*a, s_bits=12)[0])
    out, best = timeit("bucket_join_materialize 400K x 100M", fusedm,
                       kh, kl, vh, vl, ph, pl, nb, npr)
    print(f"  count={int(out)} -> {npr/best/1e9:.3f} B rows/s materialize",
          flush=True)


if __name__ == "__main__":
    main()
