import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    S = 4096
    t = jnp.asarray(rng.integers(0, 2**32, (S, 128), dtype=np.uint32))
    ix = jnp.asarray(rng.integers(0, S, (256, 128), dtype=np.int32))
    want = np.take_along_axis(np.asarray(t), np.asarray(ix), axis=0)

    variants = {}

    def kA(t_ref, ix_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], ix_ref[:], axis=0)
    variants["take_along_axis"] = kA

    def kB(t_ref, ix_ref, o_ref):
        o_ref[:] = t_ref[:][ix_ref[:], jax.lax.broadcasted_iota(jnp.int32, ix_ref.shape, 1)]
    variants["fancy [ix, iota]"] = kB

    def kC(t_ref, ix_ref, o_ref):
        # gather along axis 0 via jax.lax.gather-free one_hot matmul is out;
        # try dynamic_gather-ish via vmap-less indexing on the value
        tt = t_ref[:]
        o_ref[:] = jnp.where(True, tt[ix_ref[:], :][:, 0, :] * 0, 0)  # placeholder invalid
    # skip kC

    for name, k in variants.items():
        try:
            f = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct(ix.shape, jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            got = jax.block_until_ready(jax.jit(f)(t, ix))
            ok = np.array_equal(np.asarray(got), want)
            print(f"{name}: COMPILES correct={ok}", flush=True)
        except Exception as e:
            msg = "".join(traceback.format_exception_only(type(e), e))
            print(f"{name}: FAILED:\n{msg[:1500]}", flush=True)


if __name__ == "__main__":
    main()
