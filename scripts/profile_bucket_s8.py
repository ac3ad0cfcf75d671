"""R=8 slot-major bucket kernel on real TPU: tiny build table, huge probe stream."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_hash_join_tpu.ops import bucket_table as bt
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
    nb = 400
    for npr in (10_000_000, 100_000_000):
        bk = rng.integers(0, 2 * nb, nb, dtype=np.uint64)
        bv = rng.integers(0, 2**63, nb, dtype=np.uint64)
        pk = rng.integers(0, 2 * nb, npr, dtype=np.uint64)
        kh, kl = map(jnp.asarray, u64.split_u64(bk))
        vh, vl = map(jnp.asarray, u64.split_u64(bv))
        ph, pl = map(jnp.asarray, u64.split_u64(pk))
        jax.block_until_ready((kh, kl, vh, vl, ph, pl))

        fused = jax.jit(lambda *a: bt.bucket_join_count(*a, r_slots=8)[0])
        out, best = timeit(f"bucket s8 count {nb} x {npr/1e6:.0f}M",
                           fused, kh, kl, vh, vl, ph, pl, nb, npr)
        expected = int(np.isin(pk, np.unique(bk)).sum())
        ok = int(out) == expected
        print(f"  count={int(out)} expected={expected} {'OK' if ok else 'FAIL'}"
              f" -> {npr/best/1e9:.3f} B probe rows/s", flush=True)

        fusedm = jax.jit(lambda *a: bt.bucket_join_materialize(*a, r_slots=8)[0])
        out, best = timeit(f"bucket s8 mat   {nb} x {npr/1e6:.0f}M",
                           fusedm, kh, kl, vh, vl, ph, pl, nb, npr)
        print(f"  count={int(out)} -> {npr/best/1e9:.3f} B rows/s", flush=True)


if __name__ == "__main__":
    main()
