"""Test environment: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths run without TPU hardware (SURVEY.md §4: simulated
mesh via xla_force_host_platform_device_count).

Note: under this image's axon TPU plugin the JAX_PLATFORMS env var alone does
not stick; jax.config.update is authoritative and also skips the slow TPU
tunnel handshake.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# --- fast/slow split (VERDICT r4 item 8) -------------------------------------
# The full suite costs ~17 min CPU-interpret + ~7 min on-TPU; that wall time
# was already shaping test design (single-shape pins to dodge interpret
# compile cost).  Tests below ~7 s stay in the default tier; the heavy
# interpret compiles / device cases carry the `slow` marker via this central
# list (durations measured round 5, full-suite --durations=50 run).  Every
# module keeps fast representatives, so `pytest -m "not slow"` (<5 min)
# still covers all core semantics; CI-equivalent sessions run the full set.
_SLOW_TESTS = {
    "test_api.py::test_measure_device_seconds_chained_invariance",
    "test_api.py::test_api_narrow_density_mismatch_ladder",
    "test_api.py::test_all_reference_functions_agree",
    "test_api.py::test_vmem_strategy_used_and_exact",
    "test_api.py::test_vmem_overflow_falls_back_exactly",
    "test_api.py::test_merge_strategy_via_extended_api",
    "test_api.py::test_bloom_alias_reuses_compiled_program",
    "test_range_table.py::test_blockwise_probe_mode_exact",
    "test_range_table.py::test_range_narrow_count_and_values",
    "test_range_table.py::test_range_unresolved_triggers_on_giant_dup_run",
    "test_range_table.py::test_range_bloom_tags_parity[20000-40000-1]",
    "test_range_table.py::test_blockwise_validity_tail",
    "test_range_table.py::test_range_materialize_dups_and_sentinel",
    "test_range_table.py::test_api_order_retry_ladder_on_density_mismatch",
    "test_range_table.py::test_range_count_zipf_skew",
    "test_range_table.py::test_range_materialize_values_unique_keys",
    "test_range_table.py::test_range_count_random[60000-20000]",
    "test_range_table.py::test_range_small_mode_exact[False]",
    "test_range_table.py::test_range_small_mode_exact[True]",
    "test_chunked.py::test_chunked_count_exact[20000-60000-3-False-2]",
    "test_chunked.py::test_chunked_count_exact[1000-5000-3-True-0]",
    "test_chunked.py::test_chunked_count_exact[1000-3000-2-True-3]",
    "test_chunked.py::test_chunked_matches_single_shot",
    "test_chunked.py::test_host_chunked_api_exact",
    "test_chunked.py::test_chunked_oom_doubles_and_retries",
    "test_chunked.py::test_chunked_dense_key_count_routes_direct",
    "test_chunked.py::test_chunked_materialize_keeps_sort_route",
    "test_stream_compact.py::test_compact_by_mask_pack[99999-0.33-7-1024-4]",
    "test_stream_compact.py::test_compact_by_mask_pack[65536-0.97-4-512-4]",
    "test_stream_compact.py::test_compact_by_mask_pack[70000-0.03-2-256-4]",
    "test_stream_compact.py::test_compact_by_mask_pack[131072-0.0-3-256-3]",
    "test_bucket_table.py::test_bucket_overflow_reported",
    "test_bucket_table.py::test_bucket_materialize",
    "test_bucket_table.py::test_bucket_padding_path",
    "test_bucket_table.py::test_bucket_count_random[500-9000]",
    "test_direct.py::test_adaptive_gates_by_measured_crossover",
    "test_direct.py::test_adaptive_upgrades_dense_count_only",
    "test_multihost.py::test_two_process_distributed_join",
    "test_pipeline.py::test_filter_join_aggregate_pipeline",
    "test_direct_mat.py::test_staged_gap_overflow_unresolved",
    "test_direct_mat.py::test_staged_band_parity[20000-40000-22000-False]",
    "test_direct_mat.py::test_validity_tails_both_bands",
    "test_direct_mat.py::test_scan_band_parity[40-6000-44-1000-False]",
    "test_direct_large.py::test_fuzz_small_shapes",
    "test_merge_join.py::test_merge_validity_padding",
    "test_merge_join.py::test_merge_count[50-5000]",
    "test_tpu_device.py::test_pallas_kernels_on_device",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
