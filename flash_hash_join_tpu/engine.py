"""Join engine: jitted end-to-end build+probe graphs with AOT compile caching.

Maps the reference's driver layer (_hash_join_{scalar,radix}_{count,
materialize}, hash_join.cpp:316-567) onto single jitted XLA programs, one
per (shape, strategy, mode) signature — compiled once, cached, so the timed
call measures pure device execution (the analog of the reference's
SimpleTimer starting after pybind marshaling, hash_join.cpp:45-55, :390).

Strategies (picked by models/cost.py for "adaptive"):
  merge   — gather-free sort-merge join (ops/merge_join.py); the always-
            exact fallback (no quota/window failure modes).
  vmem    — Pallas VMEM bucket-table probe (ops/bucket_table.py +
            ops/pallas/bucket_probe.py).  Kept as an explicit tier: at its
            best shape (400-row build x 100M probes) it measured 2.3B
            rows/s in round 2, but the partitioned SMALL mode beats it
            head-to-head at every J1 shape tried since (round-3: 2-5x at
            40-40K-row builds), so the adaptive plan never picks it.
  global  — HBM bucketized-gather table (ops/hash_table.py); kept for
            completeness (XLA HBM gathers measured ~7-12 ns/probe).
  partitioned — the reference's radix regime (hash_join.cpp:316-381,
            :498-534), TPU-native: hash-sorted range table + windowed
            Pallas probe (ops/range_table.py).  Default for large builds.

Every count graph returns (count, special4); materialize graphs return
(count, out_kh, out_kl, out_vh, out_vl, special4).  special[3] != 0 means
the strategy dropped keys (bucket overflow) — the caller MUST fall back to
an exact strategy (api.py reruns with merge), so results are always exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flash_hash_join_tpu.ops import hash_table as ht
from flash_hash_join_tpu.ops import merge_join as mj
from flash_hash_join_tpu.ops import bucket_table as bt
from flash_hash_join_tpu.ops import range_table as rt
from flash_hash_join_tpu.utils.config import JoinConfig, DEFAULT_CONFIG
from flash_hash_join_tpu.models.cost import choose_plan

_ZERO4 = lambda: jnp.zeros((4,), jnp.uint32)  # noqa: E731


def _table_static(cfg: JoinConfig, gbits: int, use_bloom: bool) -> dict:
    return dict(
        group_size=cfg.group_size,
        total_groups=(1 << gbits) + cfg.overflow_groups,
        use_bloom=use_bloom,
        bloom_k=cfg.bloom_k,
        max_iters=cfg.max_probe_iters,
    )


def join_count_graph(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                     cfg, gbits, use_bloom):
    table = ht.build_table(
        kh, kl, vh, vl, nb_valid, gbits=gbits, group_size=cfg.group_size,
        overflow_groups=cfg.overflow_groups, with_bloom=use_bloom,
        bloom_k=cfg.bloom_k, max_probe_iters=cfg.max_probe_iters)
    count = ht.probe_count(
        table, ph, pl, np_valid, probe_chunk=cfg.probe_chunk, gbits=gbits,
        **_table_static(cfg, gbits, use_bloom))
    return count, table.special


def join_materialize_graph(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                           cfg, gbits, use_bloom):
    table = ht.build_table(
        kh, kl, vh, vl, nb_valid, gbits=gbits, group_size=cfg.group_size,
        overflow_groups=cfg.overflow_groups, with_bloom=use_bloom,
        bloom_k=cfg.bloom_k, max_probe_iters=cfg.max_probe_iters)
    out = ht.probe_materialize(
        table, ph, pl, np_valid, probe_chunk=cfg.probe_chunk, gbits=gbits,
        **_table_static(cfg, gbits, use_bloom))
    return (*out, table.special)


def merge_count_graph(*args):
    return mj.merge_join_count(*args), _ZERO4()


def merge_materialize_graph(*args):
    return (*mj.merge_join_materialize(*args), _ZERO4())


def vmem_count_graph(*args, r_slots, interpret):
    count, special = bt.bucket_join_count(*args, r_slots=r_slots,
                                          interpret=interpret)
    return count, special


def vmem_materialize_graph(*args, r_slots, interpret):
    return bt.bucket_join_materialize(*args, r_slots=r_slots,
                                      interpret=interpret)


def direct_count_graph(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                       d_rows, interpret):
    from flash_hash_join_tpu.ops import direct_bitmap as db
    return db.direct_join_count(kh, kl, ph, pl, nb_valid, np_valid,
                                d_rows=d_rows, interpret=interpret)


def direct_materialize_graph(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *,
                             v_rows, narrow_values, interpret):
    from flash_hash_join_tpu.ops import direct_bitmap as db
    return db.direct_join_materialize(
        kh, kl, vh, vl, ph, pl, nb_valid, np_valid, v_rows=v_rows,
        narrow_values=narrow_values, interpret=interpret)


def _graph_fn(n_build: int, n_probe: int, mode: str, strategy: str,
              use_bloom: bool, cfg: JoinConfig, gbits: int,
              order: str = "hash", narrow_values: bool = False,
              w_mult: int = 1, full_valid: bool = True, d_rows: int = 0):
    """The uncompiled join graph for a shape/config signature."""
    if strategy == "direct":
        # dense-domain direct addressing (ops/direct_bitmap.py).  The
        # d_rows arg is the compile RUNG: bitmap rows (4096 slots each)
        # for count, value-plane rows (128 slots each) for materialize —
        # api.py sizes it with d_rows_for / v_rows_for respectively.
        interpret = jax.default_backend() == "cpu"
        if mode == "count":
            fn = functools.partial(direct_count_graph, d_rows=d_rows,
                                   interpret=interpret)
        else:
            fn = functools.partial(direct_materialize_graph, v_rows=d_rows,
                                   narrow_values=narrow_values,
                                   interpret=interpret)
    elif strategy == "merge":
        fn = merge_count_graph if mode == "count" else merge_materialize_graph
    elif strategy == "vmem":
        interpret = jax.default_backend() == "cpu"
        base = vmem_count_graph if mode == "count" else vmem_materialize_graph
        fn = functools.partial(base, r_slots=bt.r_slots_for(n_build),
                               interpret=interpret)
    elif strategy == "partitioned":
        interpret = jax.default_backend() == "cpu"
        # order: "narrow" (32-bit keys) / "key" (64-bit, no hash column)
        # / "hash" (robust to any distribution); narrow_values drops the
        # value-hi plane.  All checked/chosen by the caller (api.py).
        # NOTE: >HBM probe sides are streamed host-side (api.py chunk
        # loop per models/cost.py), so every compiled graph here is
        # single-shot; ops/range_table.py also offers an in-graph
        # lax.scan variant (range_join_count_chunked) for callers whose
        # probe fits device memory but whose transients do not.
        if mode == "count":
            # C and W are shape-adaptive (rt.default_C / rt.plan_window,
            # computed inside from the static arg shapes); w_mult widens
            # the window on density-mismatch retries (api.py ladder);
            # full_valid=False (host-chunk validity tails) disables the
            # blockwise probe mode (rt.blockwise_ok)
            fn = functools.partial(
                rt.range_join_count, order=order, w_mult=w_mult,
                full_valid=full_valid, interpret=interpret)
        else:
            fn = functools.partial(
                rt.range_join_materialize, order=order,
                narrow_values=narrow_values, w_mult=w_mult,
                full_valid=full_valid, interpret=interpret)
    else:  # "global"
        graph = join_count_graph if mode == "count" else join_materialize_graph
        fn = functools.partial(graph, cfg=cfg, gbits=gbits,
                               use_bloom=use_bloom)
    return fn


def _aot(fn, n_build: int, n_probe: int):
    u32 = jnp.uint32
    i32 = jnp.int32
    spec = lambda n: jax.ShapeDtypeStruct((n,), u32)  # noqa: E731
    sc = jax.ShapeDtypeStruct((), i32)
    return (
        jax.jit(fn)
        .lower(spec(n_build), spec(n_build), spec(n_build), spec(n_build),
               spec(n_probe), spec(n_probe), sc, sc)
        .compile()
    )


@functools.lru_cache(maxsize=256)
def _compiled(n_build: int, n_probe: int, mode: str, strategy: str,
              use_bloom: bool, cfg: JoinConfig, gbits: int,
              order: str = "hash", narrow_values: bool = False,
              w_mult: int = 1, full_valid: bool = True, d_rows: int = 0):
    """AOT-compile the join graph for a shape/config signature."""
    return _aot(_graph_fn(n_build, n_probe, mode, strategy, use_bloom, cfg,
                          gbits, order, narrow_values, w_mult, full_valid,
                          d_rows),
                n_build, n_probe)


@functools.lru_cache(maxsize=64)
def _compiled_chained(n_build: int, n_probe: int, mode: str, strategy: str,
                      use_bloom: bool, cfg: JoinConfig, gbits: int,
                      order: str, narrow_values: bool, w_mult: int,
                      reps: int, d_rows: int = 0):
    """`reps` joins chained inside one scan, each on key-remixed inputs.

    Used for steady-state device timing: per-join device seconds =
    (t_chained - t_single)/(reps - 1), which cancels the flat per-dispatch
    overhead of this image's axon tunnel (~31 ms) that a real deployment
    does not pay and the reference's in-process SimpleTimer never sees
    (hash_join.cpp:45-55 starts after pybind marshaling).

    The remix adds a per-step constant to the u64 keys of BOTH sides
    (carry-propagated add, a key-space bijection) so the match structure —
    and therefore the count — is invariant and assertable, while XLA can
    neither CSE steps against each other nor hoist the sorts out of the
    scan.  Addition (not xor) keeps the key-space density profile, so
    window planning behaves as on the real inputs.  Returns
    (count_sum, special3_sum, fold) — fold consumes materialize outputs so
    XLA cannot prune the output-writing work.
    """
    fn = _graph_fn(n_build, n_probe, mode, strategy, use_bloom, cfg, gbits,
                   order, narrow_values, w_mult, True, d_rows)

    def chained(kh, kl, vh, vl, ph, pl, nb, npv):
        def step(carry, i):
            r = (i + jnp.uint32(1)) * jnp.uint32(0x9E3779B1)
            if strategy == "direct":
                # the bitmap graph needs the remix to preserve the dense
                # lo-relative domain: a 30-bit shift (no hi carry for keys
                # < 3*2^30) keeps the span intact; if a key DOES wrap, the
                # graph's span check raises special[3] and the caller
                # falls back to single-call timing
                r = r & jnp.uint32(0x3FFFFFFF)
                out = fn(kh, kl + r, vh, vl, ph, pl + r, nb, npv)
                cnt = out[0].astype(jnp.int32)
                spec = out[-1][3].astype(jnp.int32)
                fold = jnp.uint32(0)
                if mode == "materialize":
                    fold = jnp.sum(out[1] ^ out[2] ^ out[3] ^ out[4],
                                   dtype=jnp.uint32)
                c_acc, s_acc, f_acc = carry
                return (c_acc + cnt, s_acc + spec, f_acc ^ fold), None
            lo_b = kl + r
            hi_b = kh + (lo_b < kl).astype(jnp.uint32)
            lo_p = pl + r
            hi_p = ph + (lo_p < pl).astype(jnp.uint32)
            out = fn(hi_b, lo_b, vh, vl, hi_p, lo_p, nb, npv)
            cnt = out[0].astype(jnp.int32)
            spec = out[-1][3].astype(jnp.int32)
            fold = jnp.uint32(0)
            if mode == "materialize":
                # consume every output plane so XLA cannot prune the
                # output-writing work (wrapping u32 sum; not asserted on)
                fold = jnp.sum(out[1] ^ out[2] ^ out[3] ^ out[4],
                               dtype=jnp.uint32)
            c_acc, s_acc, f_acc = carry
            return (c_acc + cnt, s_acc + spec, f_acc ^ fold), None

        init = (jnp.int32(0), jnp.int32(0), jnp.uint32(0))
        (c, s, f), _ = jax.lax.scan(
            step, init, jnp.arange(reps, dtype=jnp.uint32))
        return c, s, f

    return _aot(chained, n_build, n_probe)


class JoinEngine:
    """Host-side orchestration: packing, planning, compile cache, timing."""

    def __init__(self, cfg: JoinConfig | None = None):
        self.cfg = cfg or DEFAULT_CONFIG

    def plan(self, n_build: int, n_probe: int, mode: str = "count"):
        return choose_plan(n_build, n_probe, self.cfg, mode)

    def prepare(self, n_build, n_probe, mode, strategy, use_bloom,
                gbits=None, order="hash", narrow_values=False, w_mult=1,
                full_valid=True, d_rows=0):
        if gbits is None:
            gbits = self.cfg.group_bits(n_build)
        full_valid = full_valid or strategy != "partitioned"
        d_rows = d_rows if strategy == "direct" else 0
        if strategy == "partitioned":
            # a widened window capped back to the base window is the same
            # program — normalize so the cache reuses the base compile
            w_mult = rt.normalized_w_mult(n_build, n_probe, w_mult,
                                          full_valid)
        else:
            w_mult = 1
        return _compiled(
            n_build, n_probe, mode, strategy,
            # bloom only changes the global-strategy graph; normalize the
            # cache key so `_bloom` aliases reuse the identical compiled
            # program instead of paying a second minutes-long AOT compile
            use_bloom and strategy == "global", self.cfg, gbits,
            order, narrow_values and mode == "materialize",
            w_mult, full_valid, d_rows,
        )

    def prepare_chained(self, n_build, n_probe, mode, strategy, use_bloom,
                        reps, gbits=None, order="hash", narrow_values=False,
                        w_mult=1, d_rows=0):
        if gbits is None:
            gbits = self.cfg.group_bits(n_build)
        w_mult = (rt.normalized_w_mult(n_build, n_probe, w_mult)
                  if strategy == "partitioned" else 1)
        d_rows = d_rows if strategy == "direct" else 0
        return _compiled_chained(
            n_build, n_probe, mode, strategy,
            use_bloom and strategy == "global", self.cfg, gbits,
            order, narrow_values and mode == "materialize",
            w_mult, reps, d_rows)

    def run(self, compiled, device_args):
        out = compiled(*device_args)
        return jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)


_DEFAULT_ENGINE = JoinEngine()


def default_engine() -> JoinEngine:
    return _DEFAULT_ENGINE
