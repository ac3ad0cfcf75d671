"""Join engine: jitted end-to-end build+probe graphs with AOT compile caching.

Maps the reference's driver layer (_hash_join_{scalar,radix}_{count,
materialize}, hash_join.cpp:316-567) onto single jitted XLA programs.  Each
(shape, strategy, mode) pair is lowered and compiled once and cached, so the
timed call measures pure device execution — the analog of the reference's
SimpleTimer starting after pybind marshaling (hash_join.cpp:45-55, :390).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flash_hash_join_tpu.ops import hash_table as ht
from flash_hash_join_tpu.utils.config import JoinConfig, DEFAULT_CONFIG
from flash_hash_join_tpu.models.cost import choose_plan


def _static_kwargs(cfg: JoinConfig, gbits: int, use_bloom: bool) -> dict:
    return dict(
        gbits=gbits,
        group_size=cfg.group_size,
        total_groups=(1 << gbits) + cfg.overflow_groups,
        use_bloom=use_bloom,
        bloom_k=cfg.bloom_k,
        max_iters=cfg.max_probe_iters,
    )


def join_count_graph(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *, cfg, gbits, use_bloom):
    table = ht.build_table(
        kh, kl, vh, vl, nb_valid,
        gbits=gbits,
        group_size=cfg.group_size,
        overflow_groups=cfg.overflow_groups,
        with_bloom=use_bloom,
        bloom_k=cfg.bloom_k,
    )
    probe_static = _static_kwargs(cfg, gbits, use_bloom)
    probe_static.pop("gbits")
    return ht.probe_count(
        table, ph, pl, np_valid,
        probe_chunk=cfg.probe_chunk,
        gbits=gbits,
        **probe_static,
    )


def join_materialize_graph(kh, kl, vh, vl, ph, pl, nb_valid, np_valid, *, cfg, gbits, use_bloom):
    table = ht.build_table(
        kh, kl, vh, vl, nb_valid,
        gbits=gbits,
        group_size=cfg.group_size,
        overflow_groups=cfg.overflow_groups,
        with_bloom=use_bloom,
        bloom_k=cfg.bloom_k,
    )
    probe_static = _static_kwargs(cfg, gbits, use_bloom)
    probe_static.pop("gbits")
    return ht.probe_materialize(
        table, ph, pl, np_valid,
        probe_chunk=cfg.probe_chunk,
        gbits=gbits,
        **probe_static,
    )


@functools.lru_cache(maxsize=256)
def _compiled(n_build: int, n_probe: int, mode: str, strategy: str,
              use_bloom: bool, cfg: JoinConfig, gbits: int):
    """AOT-compile the join graph for a shape/config signature."""
    # "partitioned" currently shares the global-gather graph; the Pallas
    # partition-local probe plugs in here (ops/pallas) as it lands.
    graph = join_count_graph if mode == "count" else join_materialize_graph
    fn = functools.partial(graph, cfg=cfg, gbits=gbits, use_bloom=use_bloom)
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

    def prepare(self, n_build, n_probe, mode, strategy, use_bloom, gbits=None):
        if gbits is None:
            gbits = self.cfg.group_bits(n_build)
        return _compiled(
            n_build, n_probe, mode, strategy, use_bloom, self.cfg, gbits
        )

    def run(self, compiled, device_args):
        out = compiled(*device_args)
        return jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)


_DEFAULT_ENGINE = JoinEngine()


def default_engine() -> JoinEngine:
    return _DEFAULT_ENGINE
