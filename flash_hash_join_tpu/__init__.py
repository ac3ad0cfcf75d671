"""flash_hash_join_tpu — a TPU-native vectorized hash-join / query-execution
engine built from scratch in JAX/XLA/Pallas, with the capabilities of the
CPU reference `conanhujinming/flash_hash_join` (see SURVEY.md).

Public API mirrors the reference pybind module's 13 functions
(hash_join.cpp:598-640): adaptive_join[_bloom][, _count[_bloom]],
hash_join[_bloom], hash_join_radix[_bloom], hash_join_count[...],
plus `initialize()`.  All take numpy uint64 (build_keys, build_values,
probe_keys) and return (count, core_seconds).
"""

import os as _os

import jax as _jax

# Persistent compilation cache: the engine AOT-compiles one XLA program per
# (shape, strategy, mode) signature (engine.py) and TPU compiles cost
# minutes through a tunnel; caching them is the analog of the reference
# shipping a prebuilt .so.  Only set when the embedding application has not
# already configured a cache (never override host config); opt out entirely
# with FHJ_NO_COMPILE_CACHE=1.
if not _os.environ.get("FHJ_NO_COMPILE_CACHE"):
    try:
        if getattr(_jax.config, "jax_compilation_cache_dir", None) is None:
            _cache_dir = _os.environ.get(
                "FHJ_COMPILE_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".cache", "fhj_xla"))
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs

from flash_hash_join_tpu.api import (  # noqa: F401
    adaptive_join,
    adaptive_join_bloom,
    adaptive_join_count,
    adaptive_join_count_bloom,
    hash_join,
    hash_join_bloom,
    hash_join_radix,
    hash_join_radix_bloom,
    hash_join_count,
    hash_join_count_bloom,
    hash_join_count_radix,
    hash_join_count_radix_bloom,
    initialize,
    join_count,
    join_materialize,
    distributed_join_count,
    distributed_join_materialize,
    measure_device_seconds,
    plan_strategy,
    bloom_is_distinct,
)

__version__ = "0.3.0"
