"""Composed query pipelines: filter -> join -> aggregate.

The north star frames the engine as a query-execution engine, not a
single-op library; this exercises the primitives composing end-to-end
(ops/filter, api join, ops/aggregate) against a pandas-free numpy oracle.
"""

import collections

import numpy as np
import jax.numpy as jnp

import flash_hash_join_tpu as fj
from flash_hash_join_tpu.ops.aggregate import hash_aggregate
from flash_hash_join_tpu.ops.filter import filter_columns, lt_u64
from flash_hash_join_tpu.utils import u64


def test_filter_join_aggregate_pipeline():
    """SELECT key, count(*), sum(v) FROM probe JOIN build USING(key)
    WHERE probe.key < CUT GROUP BY key — composed from the primitives."""
    rng = np.random.default_rng(30)
    nb, npr = 4000, 30000
    bk = rng.permutation(np.arange(nb, dtype=np.uint64) * np.uint64(5))
    bv = rng.integers(1, 1000, nb, dtype=np.uint64)
    pk = rng.integers(0, 5 * nb, npr, dtype=np.uint64)
    CUT = np.uint64(5 * nb // 3)

    # 1. filter the probe side: key < CUT
    ph, pl = u64.split_u64(pk)
    mask = lt_u64(jnp.asarray(ph), jnp.asarray(pl),
                  int(CUT >> np.uint64(32)), int(CUT & np.uint64(0xFFFFFFFF)))
    n_kept, fh, fl = filter_columns(mask, jnp.asarray(ph), jnp.asarray(pl))
    n_kept = int(n_kept)
    pk_f = u64.join_u64(np.asarray(fh), np.asarray(fl))[:n_kept]

    # 2. join the filtered probes against the build side
    count, _, jk, jv = fj.join_materialize(bk, bv, pk_f, return_arrays=True)

    # 3. aggregate the join output by key: count + sum of joined values
    kh, kl = u64.split_u64(jk)
    vh, vl = u64.split_u64(jv)
    res = hash_aggregate(jnp.asarray(kh), jnp.asarray(kl),
                         jnp.asarray(vh), jnp.asarray(vl), count, gbits=10)
    n_groups = int(res.n_groups)
    got = {}
    gk = u64.join_u64(np.asarray(res.key_hi), np.asarray(res.key_lo))
    gs = u64.join_u64(np.asarray(res.sum_hi), np.asarray(res.sum_lo))
    gc = np.asarray(res.count)
    for i in range(n_groups):
        got[int(gk[i])] = (int(gc[i]), int(gs[i]))

    # numpy oracle for the whole pipeline
    lut = dict(zip(bk.tolist(), bv.tolist()))
    want = collections.defaultdict(lambda: [0, 0])
    for k in pk.tolist():
        if k < CUT and k in lut:
            want[k][0] += 1
            want[k][1] += lut[k]
    assert count == sum(c for c, _ in want.values())
    assert n_groups == len(want)
    for k, (c, s) in want.items():
        assert got[k] == (c, s), (k, got.get(k), (c, s))


def test_join_then_filter_values():
    """Join then post-filter the materialized values (value predicate)."""
    rng = np.random.default_rng(31)
    bk = np.arange(2000, dtype=np.uint64)
    bv = rng.integers(0, 100, 2000, dtype=np.uint64)
    pk = rng.integers(0, 4000, 10000, dtype=np.uint64)
    count, _, jk, jv = fj.join_materialize(bk, bv, pk, return_arrays=True)
    vh, vl = u64.split_u64(jv)
    mask = lt_u64(jnp.asarray(vh), jnp.asarray(vl), 0, 50)
    n_kept, *_ = filter_columns(mask, jnp.asarray(vh), jnp.asarray(vl))
    lut = dict(zip(bk.tolist(), bv.tolist()))
    want = sum(1 for k in pk.tolist()
               if k in lut and lut[k] < 50)
    assert int(n_kept) == want
