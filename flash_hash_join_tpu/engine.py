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
            ops/pallas/bucket_probe.py); small builds, huge probe streams;
            measured 2.3B probe rows/s on v5e at 400 x 100M.
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


@functools.lru_cache(maxsize=256)
def _compiled(n_build: int, n_probe: int, mode: str, strategy: str,
              use_bloom: bool, cfg: JoinConfig, gbits: int,
              order: str = "hash", narrow_values: bool = False):
    """AOT-compile the join graph for a shape/config signature."""
    if strategy == "merge":
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
        if mode == "count":
            fn = functools.partial(
                rt.range_join_count, W=rt.plan_window(n_build, n_probe),
                order=order, interpret=interpret)
        else:
            fn = functools.partial(
                rt.range_join_materialize,
                W=rt.plan_window(n_build, n_probe), order=order,
                narrow_values=narrow_values, interpret=interpret)
    else:  # "global"
        graph = join_count_graph if mode == "count" else join_materialize_graph
        fn = functools.partial(graph, cfg=cfg, gbits=gbits,
                               use_bloom=use_bloom)
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


class JoinEngine:
    """Host-side orchestration: packing, planning, compile cache, timing."""

    def __init__(self, cfg: JoinConfig | None = None):
        self.cfg = cfg or DEFAULT_CONFIG

    def plan(self, n_build: int, n_probe: int):
        return choose_plan(n_build, n_probe, self.cfg)

    def prepare(self, n_build, n_probe, mode, strategy, use_bloom,
                gbits=None, order="hash", narrow_values=False):
        if gbits is None:
            gbits = self.cfg.group_bits(n_build)
        return _compiled(
            n_build, n_probe, mode, strategy, use_bloom, self.cfg, gbits,
            order, narrow_values and mode == "materialize",
        )

    def run(self, compiled, device_args):
        out = compiled(*device_args)
        return jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)


_DEFAULT_ENGINE = JoinEngine()


def default_engine() -> JoinEngine:
    return _DEFAULT_ENGINE
